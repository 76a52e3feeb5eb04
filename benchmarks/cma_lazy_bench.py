"""CMA-ES factor-refresh cost on the flagship workload, one real TPU chip.

The full-covariance solver's per-iteration eigh + Cholesky of C (n = H*U = 300) is its
dominant cost over CEM (measured 25.9 vs 8.9 ms/solve round 1, docs/performance.md).
``eigen_update_every`` (solvers/cma_es.py) lazily refreshes those factors — this measures
the exact-refresh default, the Hansen auto-gap, and sep-CMA (diagonal) on the same
5-member MLP(3x500) ensemble rollout workload, differential chained timing (see bench.py).

Run: python benchmarks/cma_lazy_bench.py            (real TPU via axon)
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


def build_chain(n, solver_kw):
    reward_fn = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    bounds = Bounds.of(-1.0, 1.0, dim=6)
    cfg = LearnedDynamicsConfig(
        dim_s=17, dim_u=6, hidden=(500, 500, 500), ensemble_size=5, propagation="mean"
    )
    init_model, dyn = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    evaluate = lambda d: make_trajectory_evaluator(partial(dyn, d), reward_fn)  # noqa: E731

    def chained(state, dp, obs, key):
        s = make_solver("CMA-ES", bounds, evaluate(dp), **solver_kw)

        def body(carry, k):
            st, ob = carry
            action, st, aux = s.solve(st, ob, jnp.asarray(0), k)
            ob = dyn(dp, ob, action)
            return (st, ob), aux.expected_reward[0]

        (_, _), rs = jax.lax.scan(body, (state, obs), jax.random.split(key, n))
        return rs[-1]

    s0 = make_solver("CMA-ES", bounds, lambda a, b: jnp.zeros(()), **solver_kw)
    state = jax.jit(s0.init)(jax.random.PRNGKey(1))
    return jax.jit(chained), (state, dp, jnp.zeros((1, 17)))


def measure(solver_kw):
    totals = {}
    for n in (1, N_CHAIN):
        jfn, args = build_chain(n, solver_kw)
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
    base = dict(planning_horizon=50, population=1000, num_agents=1, num_elite=50,
                max_iterations=5)
    configs = [
        (dict(base), "eigen_update_every=1 (exact, default)"),
        (dict(base, eigen_update_every=0), "eigen_update_every=0 (Hansen auto-gap)"),
        (dict(base, eigen_update_every=5), "eigen_update_every=5 (one refresh/solve)"),
        (dict(base, diagonal=True), "sep-CMA (diagonal)"),
    ]
    with open(out, "a") as f:
        for kw, label in configs:
            per_solve = measure(kw)
            row = {
                "bench": "cma_lazy_eigen_flagship",
                "workload": f"CMA-ES pop=1000 H=50 iters=5, {label}",
                "per_solve_ms": round(per_solve * 1e3, 3),
                "solves_per_s": round(1.0 / per_solve, 1),
                "device": device,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            f.write(json.dumps(row) + "\n")
            print(json.dumps(row))


if __name__ == "__main__":
    main()
