"""SPSA (simultaneous perturbation stochastic approximation) trajectory solver.

Pure-functional rebuild of ``SPSAOptimizer``
(``/root/reference/blackbox_mpc/optimizers/spsa.py:61-117``): per iteration, gain sequences
``a_k = a/(k+1+A)^alpha`` and ``c_k = c/(k+1)^gamma``, a population of Rademacher +/-1
perturbations, a single fused evaluation of the concatenated [plus; minus] batch (2*pop
trajectories, ``spsa.py:94-96``), the averaged gradient estimate, and a clipped ascent step.
Warm-starts by time-shifting the solution (``spsa.py:114-115``).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux, TrajectoryEvaluator
from blackbox_mpc_tpu.solvers import base

__all__ = ["SPSAConfig", "SPSAState", "make_spsa"]


@dataclasses.dataclass(frozen=True)
class SPSAConfig(base.SolverConfig):
    """Defaults match the reference (``spsa.py:9-12``)."""

    alpha: float = 0.602
    gamma: float = 0.101
    a_par: float = 0.01
    noise_parameter: float = 0.3
    # Sample/evaluate the 2P perturbation tensor time-major ([H, 2P, A, U]) with a
    # ``time_major=True`` evaluator — the horizon scan consumes it with NO relayout,
    # the same optimization every other sampled solver gained in r4 (see CEMConfig).
    # Same math and distribution (Rademacher is i.i.d. per element, so the layout only
    # changes which element of the stream lands where — a different but equally random
    # draw, like the other solvers' time-major sampling).
    time_major: bool = False


@struct.dataclass
class SPSAState:
    solution: jax.Array  # [A, H, U]


def make_spsa(config: SPSAConfig, bounds: Bounds, evaluate: TrajectoryEvaluator) -> Solver:
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    big_a = config.max_iterations / 10.0  # reference spsa.py:57
    tm = config.time_major

    def init(key: jax.Array) -> SPSAState:
        del key
        return SPSAState(solution=base.init_solution_mean(bounds, horizon, agents))

    def solve(state: SPSAState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t

        def iteration(k, carry):
            solution, key, _ = carry
            kf = k.astype(solution.dtype)
            ak = config.a_par / (kf + 1.0 + big_a) ** config.alpha
            ck = config.noise_parameter / (kf + 1.0) ** config.gamma
            key, delta_key = jax.random.split(key)
            if tm:
                # [H, P, A, U]: the evaluator's scan consumes [H, 2P·A, U] directly.
                delta = jax.random.rademacher(
                    delta_key, (horizon, pop, agents, bounds.dim), dtype=solution.dtype
                )
                solution_t = jnp.transpose(solution, (1, 0, 2))[:, None]  # [H, 1, A, U]
                plus, plus_penalty = base.bound_violation_penalty(
                    solution_t + ck * delta, bounds, time_major=True
                )
                minus, minus_penalty = base.bound_violation_penalty(
                    solution_t - ck * delta, bounds, time_major=True
                )
                both = jnp.concatenate([plus, minus], axis=1)  # one fused 2P evaluation
                rewards = evaluate(obs, both)  # [2P, A]
                r_plus = rewards[:pop] - plus_penalty
                r_minus = rewards[pop:] - minus_penalty
                ghat_t = jnp.mean(
                    (r_plus - r_minus)[None, :, :, None] / (2.0 * ck * delta), axis=1
                )  # [H, A, U]
                ghat = jnp.transpose(ghat_t, (1, 0, 2))
            else:
                delta = jax.random.rademacher(
                    delta_key, (pop, agents, horizon, bounds.dim), dtype=solution.dtype
                )
                plus, plus_penalty = base.bound_violation_penalty(
                    solution + ck * delta, bounds
                )
                minus, minus_penalty = base.bound_violation_penalty(
                    solution - ck * delta, bounds
                )
                both = jnp.concatenate([plus, minus], axis=0)  # one fused 2P evaluation
                rewards = evaluate(obs, both)  # [2P, A]
                r_plus = rewards[:pop] - plus_penalty
                r_minus = rewards[pop:] - minus_penalty
                ghat = jnp.mean(
                    (r_plus - r_minus)[:, :, None, None] / (2.0 * ck * delta), axis=0
                )
            new_solution = bounds.clip(solution + ak * ghat)
            return new_solution, key, jnp.max(jnp.maximum(r_plus, r_minus), axis=0)

        best0 = jnp.full((agents,), -jnp.inf, dtype=state.solution.dtype)
        solution, _, best_reward = jax.lax.fori_loop(
            0, config.max_iterations, iteration, (state.solution, key, best0)
        )
        action = solution[:, 0]
        next_state = SPSAState(solution=base.shift_time(solution))
        return action, next_state, SolverAux(expected_reward=best_reward, plan=solution)

    def reset(state: SPSAState, key: jax.Array) -> SPSAState:
        del state
        return init(key)

    return base.with_state_dtype(
        Solver(init=init, solve=solve, reset=reset, name="SPSA", plan_field="solution"), config.dtype
    )
