"""Shared harness for flagship-workload solver benchmarks (differential chained timing).

One chain = N data-chained MPC solves over the 5-member MLP(3x500) HalfCheetah-dims ensemble
inside one jit (action -> predicted next obs -> next solve), timed by scalar readback; the
marginal per-solve cost is (time(N) - time(1)) / (N - 1), cancelling the host<->device RTT
(see bench.py methodology notes). Used by gradient_solver_bench.py and cma_lazy_bench.py;
bench.py keeps its own self-contained copy so the driver-run headline has no intra-repo
imports to break.
"""
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
from blackbox_mpc_tpu.rollout.evaluator import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import make_solver

# Persistent compile cache for every harness user: flagship-shape compiles take 90-400 s
# over a tunneled frontend but cache-hit in seconds (same setup as bench.py).
os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_CHAIN = 11
REPEATS = 5


def build_chain(n, solver_name, solver_kw, evaluator_kw=None):
    reward_fn = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    bounds = Bounds.of(-1.0, 1.0, dim=6)
    cfg = LearnedDynamicsConfig(
        dim_s=17, dim_u=6, hidden=(500, 500, 500), ensemble_size=5, propagation="mean"
    )
    init_model, dyn = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    ekw = dict(evaluator_kw or {})
    evaluate = lambda d: make_trajectory_evaluator(partial(dyn, d), reward_fn, **ekw)  # noqa: E731

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


def measure(solver_name, solver_kw, n_chain=N_CHAIN, repeats=REPEATS, evaluator_kw=None):
    """Marginal seconds per solve for the given solver on the flagship workload."""
    if n_chain < 2:
        raise SystemExit("chain length must be >= 2 (differential timing)")
    totals = {}
    for n in (1, n_chain):
        jfn, args = build_chain(n, solver_name, solver_kw, evaluator_kw)
        float(jfn(*args, jax.random.PRNGKey(9)))  # compile + warm
        lat = []
        for k in jax.random.split(jax.random.PRNGKey(5), repeats):
            t0 = time.perf_counter()
            float(jfn(*args, k))
            lat.append(time.perf_counter() - t0)
        totals[n] = float(np.min(lat))
    return (totals[n_chain] - totals[1]) / (n_chain - 1)


def temp_memory_bytes(solver_name, solver_kw, evaluator_kw=None):
    """XLA temp-buffer allocation of one compiled solve chain (peak working set proxy).

    Uses the AOT path (lower -> compile -> memory_analysis) so no solve actually runs;
    returns None on backends that don't expose the analysis.
    """
    jfn, args = build_chain(1, solver_name, solver_kw, evaluator_kw)
    compiled = jfn.lower(*args, jax.random.PRNGKey(9)).compile()
    try:
        return int(compiled.memory_analysis().temp_size_in_bytes)
    except (AttributeError, TypeError):
        return None
