"""Gradient (first-order) vs CEM solver cost on the flagship workload, one real TPU chip.

Differential chained timing (see bench.py): N data-chained solves inside one jit, scalar
readback, minus the N=1 time. Both solvers plan over the same 5-member MLP(3x500) ensemble,
H=50, S=17/U=6. The gradient solver's work is restarts x Adam-iters x (forward+backward)
rollouts; CEM's is population x iters forward rollouts — this measures whether exact
gradients buy a cheaper solve than a 1000-candidate sampled search at flagship scale.

Run: python benchmarks/gradient_solver_bench.py            (real TPU via axon)
Output: one JSONL row per config appended to benchmarks/results_r2.jsonl.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
from blackbox_mpc_tpu.rollout.evaluator import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import make_solver

N_CHAIN = 11
REPEATS = 5


def build_chain(n, solver_name, solver_kw):
    reward_fn = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    bounds = Bounds.of(-1.0, 1.0, dim=6)
    cfg = LearnedDynamicsConfig(
        dim_s=17, dim_u=6, hidden=(500, 500, 500), ensemble_size=5, propagation="mean"
    )
    init_model, dyn = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    evaluate = lambda d: make_trajectory_evaluator(partial(dyn, d), reward_fn)  # noqa: E731

    def chained(state, dp, obs, key):
        s = make_solver(solver_name, bounds, evaluate(dp), **solver_kw)

        def body(carry, k):
            st, ob = carry
            action, st, aux = s.solve(st, ob, jnp.asarray(0), k)
            ob = dyn(dp, ob, action)
            return (st, ob), aux.expected_reward[0]

        (_, _), rs = jax.lax.scan(body, (state, obs), jax.random.split(key, n))
        return rs[-1]

    s0 = make_solver(solver_name, bounds, lambda a, b: jnp.zeros(()), **solver_kw)
    state = jax.jit(s0.init)(jax.random.PRNGKey(1))
    return jax.jit(chained), (state, dp, jnp.zeros((1, 17)))


def measure(solver_name, solver_kw):
    totals = {}
    for n in (1, N_CHAIN):
        jfn, args = build_chain(n, solver_name, solver_kw)
        float(jfn(*args, jax.random.PRNGKey(9)))  # compile + warm
        lat = []
        for k in jax.random.split(jax.random.PRNGKey(5), REPEATS):
            t0 = time.perf_counter()
            float(jfn(*args, k))
            lat.append(time.perf_counter() - t0)
        totals[n] = float(np.min(lat))
    return (totals[N_CHAIN] - totals[1]) / (N_CHAIN - 1)


def main():
    device = jax.devices()[0].device_kind
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_r2.jsonl")
    rows = []
    configs = [
        ("CEM", dict(planning_horizon=50, population=1000, num_agents=1, num_elite=50,
                     max_iterations=5), "pop=1000 iters=5"),
        ("Gradient", dict(planning_horizon=50, population=16, num_agents=1,
                          max_iterations=20, learning_rate=0.1), "restarts=16 adam=20"),
        ("Gradient", dict(planning_horizon=50, population=64, num_agents=1,
                          max_iterations=20, learning_rate=0.1), "restarts=64 adam=20"),
        ("Gradient", dict(planning_horizon=50, population=16, num_agents=1,
                          max_iterations=5, learning_rate=0.2), "restarts=16 adam=5"),
        ("CEM-GD", dict(planning_horizon=50, population=1000, num_agents=1, num_elite=50,
                        max_iterations=5), "pop=1000 iters=5 + polish 8x10"),
    ]
    with open(out, "a") as f:
        for name, kw, label in configs:
            per_solve = measure(name, kw)
            row = {
                "bench": "gradient_vs_cem_flagship",
                "solver": name,
                "workload": label,
                "per_solve_ms": round(per_solve * 1e3, 3),
                "solves_per_s": round(1.0 / per_solve, 1),
                "device": device,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            rows.append(row)
            f.write(json.dumps(row) + "\n")
            print(json.dumps(row))


if __name__ == "__main__":
    main()
