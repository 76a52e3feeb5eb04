"""Random-shooting trajectory solver.

Pure-functional rebuild of ``RandomSearchOptimizer``
(``/root/reference/blackbox_mpc/optimizers/random_search.py:38-48``): one uniform population,
one evaluation, per-agent argmax. Stateless. The reference default population is 1024
(``random_search.py:8``).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux, TrajectoryEvaluator
from blackbox_mpc_tpu.solvers import base

__all__ = ["RandomSearchConfig", "RandomSearchState", "make_random_search"]


@dataclasses.dataclass(frozen=True)
class RandomSearchConfig(base.SolverConfig):
    population: int = 1024
    max_iterations: int = 1  # single-shot by definition
    # Time-major candidate layout ([H, P, A, U]; pair with a time_major=True evaluator) —
    # see CEMConfig.time_major (solvers/cem.py) for the measured win and the caveats.
    time_major: bool = False


@struct.dataclass
class RandomSearchState:
    """Random search carries no solver state."""


def make_random_search(
    config: RandomSearchConfig, bounds: Bounds, evaluate: TrajectoryEvaluator
) -> Solver:
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population

    def init(key: jax.Array) -> RandomSearchState:
        del key
        return RandomSearchState()

    def solve(state: RandomSearchState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t
        shape = (
            (horizon, pop, agents, bounds.dim)
            if config.time_major
            else (pop, agents, horizon, bounds.dim)
        )
        samples = jax.random.uniform(
            key, shape, dtype=obs.dtype, minval=bounds.lower, maxval=bounds.upper
        )
        rewards = evaluate(obs, samples)  # [P, A]
        best_idx = jnp.argmax(rewards, axis=0)  # [A]
        if config.time_major:
            # [H, 1, A, U] winner gather, then a tiny transpose to the [A, H, U] plan.
            best = jnp.take_along_axis(
                samples, best_idx[None, None, :, None], axis=1
            )[:, 0]
            best_plan = jnp.transpose(best, (1, 0, 2))
        else:
            per_agent = jnp.swapaxes(samples, 0, 1)  # [A, P, H, U]
            best_plan = jnp.take_along_axis(
                per_agent, best_idx[:, None, None, None], axis=1
            )[:, 0]
        best_reward = jnp.take_along_axis(rewards, best_idx[None, :], axis=0)[0]
        action = best_plan[:, 0]
        return action, state, SolverAux(expected_reward=best_reward, plan=best_plan)

    def reset(state: RandomSearchState, key: jax.Array) -> RandomSearchState:
        del key
        return state

    return base.with_state_dtype(
        Solver(init=init, solve=solve, reset=reset, name="RandomSearch"), config.dtype
    )
