"""Device-resident episode evaluation: an entire MPC episode in ONE jit call.

When the "environment" is itself a model (an analytic true model or learned dynamics), there is
no reason to surface to the host between control steps: this workflow chains
solve -> act -> model-step inside a ``lax.scan``, so an H_ep-step episode costs one dispatch
and one readback instead of H_ep round-trips. This is the measurement core behind ``bench.py``
(docs/performance.md) exposed as a public API — useful for planning-quality studies, solver
comparisons, and hyperparameter sweeps at full device throughput (~100+ solves/s/chip vs
~25 host-loop steps/s on a tunneled frontend).

No reference analogue: the reference must surface to numpy every step
(``/root/reference/blackbox_mpc/policies/mpc_policy.py:149-166``).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from blackbox_mpc_tpu.core.types import Bounds, Solver

__all__ = ["evaluate_solver_on_model"]


def evaluate_solver_on_model(
    solver: Solver,
    dynamics_fn: Callable,  # (state [A,S], action [A,U]) -> next_state (the episode "env")
    reward_fn: Callable,  # (state, action, next_state) -> reward [A]
    initial_obs: jax.Array,  # [A, S]
    episode_steps: int,
    key: jax.Array,
    solver_state=None,
):
    """Runs ``episode_steps`` of closed-loop MPC fully on device.

    Returns ``(episode_rewards [T, A], final_obs [A, S], final_solver_state)``. Build the
    solver inside a jitted wrapper if its evaluate closes over traced params (see MPCPolicy);
    for analytic models calling this directly is fine.
    """
    if solver_state is None:
        key, init_key = jax.random.split(key)
        solver_state = solver.init(init_key)

    def step(carry, k):
        state, obs = carry
        action, state, _aux = solver.solve(state, obs, jnp.asarray(0), k)
        next_obs = dynamics_fn(obs, action)
        r = reward_fn(obs, action, next_obs)
        return (state, next_obs), r

    (solver_state, final_obs), rewards = jax.lax.scan(
        step, (solver_state, initial_obs), jax.random.split(key, episode_steps)
    )
    return rewards, final_obs, solver_state
