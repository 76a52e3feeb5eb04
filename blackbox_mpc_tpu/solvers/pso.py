"""Particle-swarm trajectory solver.

Pure-functional rebuild of ``PSOOptimizer``
(``/root/reference/blackbox_mpc/optimizers/pso.py:70-141``). The swarm (positions, velocities,
personal bests, global best) is persistent across solves, carried in an explicit state pytree
instead of six ``tf.Variable``s (``pso.py:50-59``). Per iteration: clip positions to bounds with
a squared-violation penalty, evaluate, update personal/global bests, then the velocity rule
``w*v + c1*r1*(pbest-x) + c2*r2*(gbest-x)``. After the loop the swarm is warm-started by
resampling positions around the time-shifted global best under bound-constrained variance
(``pso.py:116-138``).

Reference quirk preserved behind a flag: the reference draws *scalar* (not per-element) standard
normals for r1/r2 each iteration (``pso.py:107-109``); ``elementwise_random=False`` reproduces
that, ``True`` switches to the textbook per-element uniform coefficients.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux, TrajectoryEvaluator, truncated_normal
from blackbox_mpc_tpu.solvers import base

__all__ = ["PSOConfig", "PSOState", "make_pso"]


@dataclasses.dataclass(frozen=True)
class PSOConfig(base.SolverConfig):
    """Defaults match the reference (``pso.py:9-11``)."""

    c1: float = 0.3
    c2: float = 0.5
    w: float = 0.2
    initial_velocity_fraction: float = 0.01
    elementwise_random: bool = False
    # Time-major swarm layout ([H, P, A, U] for positions/velocities/best_positions; pair
    # with a time_major=True evaluator) — the horizon scan consumes the swarm with no
    # relayout. See CEMConfig.time_major (solvers/cem.py) for the measured win and the
    # caveats (same distributions, different RNG element association).
    time_major: bool = False


@struct.dataclass
class PSOState:
    positions: jax.Array  # [P, A, H, U] ([H, P, A, U] when config.time_major)
    velocities: jax.Array  # [P, A, H, U] ([H, P, A, U] when config.time_major)
    best_positions: jax.Array  # [P, A, H, U] ([H, P, A, U] when config.time_major)
    best_rewards: jax.Array  # [P, A]
    global_best_position: jax.Array  # [A, H, U]
    global_best_reward: jax.Array  # [A]


def make_pso(config: PSOConfig, bounds: Bounds, evaluate: TrajectoryEvaluator) -> Solver:
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    tm = config.time_major
    shape = (
        (horizon, pop, agents, bounds.dim) if tm else (pop, agents, horizon, bounds.dim)
    )
    # Broadcast helpers that differ between the layouts: lift a [P, A] mask / an
    # [A, H, U] plan to the swarm tensor's rank.
    lift_mask = (lambda m: m[None, :, :, None]) if tm else (lambda m: m[:, :, None, None])
    lift_plan = (
        (lambda p: jnp.transpose(p, (1, 0, 2))[:, None])  # [A,H,U] -> [H,1,A,U]
        if tm
        else (lambda p: p[None])
    )

    def _initial_velocities(key: jax.Array) -> jax.Array:
        init_vel = config.initial_velocity_fraction * bounds.range
        return jax.random.uniform(
            key, shape, dtype=jnp.float32, minval=-init_vel, maxval=init_vel
        )

    def init(key: jax.Array) -> PSOState:
        """Uniform swarm — the reference's ``reset()`` (pso.py:149-166)."""
        pos_key, vel_key = jax.random.split(key)
        positions = jax.random.uniform(
            pos_key, shape, dtype=jnp.float32, minval=bounds.lower, maxval=bounds.upper
        )
        return PSOState(
            positions=positions,
            velocities=_initial_velocities(vel_key),
            best_positions=positions,
            best_rewards=jnp.full((pop, agents), -jnp.inf, jnp.float32),
            global_best_position=jnp.zeros((agents, horizon, bounds.dim), jnp.float32),
            global_best_reward=jnp.full((agents,), -jnp.inf, jnp.float32),
        )

    def solve(state: PSOState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t

        def iteration(_, carry):
            state, key = carry
            positions, penalty = base.bound_violation_penalty(
                state.positions, bounds, time_major=tm
            )
            rewards = evaluate(obs, positions) - penalty  # [P, A]
            improved = state.best_rewards < rewards
            best_positions = jnp.where(
                lift_mask(improved), positions, state.best_positions
            )
            best_rewards = jnp.where(improved, rewards, state.best_rewards)
            gbest_idx = jnp.argmax(best_rewards, axis=0)  # [A]
            if tm:
                # [H, 1, A, U] winner gather on the population axis, then a tiny
                # transpose to the [A, H, U] state contract.
                gbest_pos = jnp.transpose(
                    jnp.take_along_axis(
                        best_positions, gbest_idx[None, None, :, None], axis=1
                    )[:, 0],
                    (1, 0, 2),
                )
            else:
                per_agent_best = jnp.swapaxes(best_positions, 0, 1)  # [A, P, H, U]
                gbest_pos = jnp.take_along_axis(
                    per_agent_best, gbest_idx[:, None, None, None], axis=1
                )[:, 0]
            gbest_rew = jnp.take_along_axis(best_rewards, gbest_idx[None, :], axis=0)[0]
            key, r1_key, r2_key = jax.random.split(key, 3)
            if config.elementwise_random:
                r1 = jax.random.uniform(r1_key, shape)
                r2 = jax.random.uniform(r2_key, shape)
            else:
                r1 = jax.random.normal(r1_key, ())
                r2 = jax.random.normal(r2_key, ())
            velocities = (
                state.velocities * config.w
                + (best_positions - positions) * config.c1 * r1
                + (lift_plan(gbest_pos) - positions) * config.c2 * r2
            )
            new_state = state.replace(
                positions=positions + velocities,
                velocities=velocities,
                best_positions=best_positions,
                best_rewards=best_rewards,
                global_best_position=gbest_pos,
                global_best_reward=gbest_rew,
            )
            return new_state, key

        state, key = jax.lax.fori_loop(0, config.max_iterations, iteration, (state, key))
        gbest = state.global_best_position
        action = gbest[:, 0, :]
        # Warm-start the swarm around the time-shifted global best (pso.py:116-138).
        constrained = base.constrain_variance(
            gbest, base.init_solution_variance(bounds, horizon, agents), bounds
        )
        key, pos_key, vel_key = jax.random.split(key, 3)
        if tm:
            new_positions = truncated_normal(
                pos_key,
                jnp.transpose(base.shift_time(gbest), (1, 0, 2))[:, None],
                jnp.transpose(jnp.sqrt(constrained), (1, 0, 2))[:, None],
                shape,
            )
        else:
            new_positions = truncated_normal(
                pos_key, base.shift_time(gbest), jnp.sqrt(constrained), shape
            )
        next_state = state.replace(
            positions=new_positions,
            velocities=_initial_velocities(vel_key),
            best_positions=new_positions,
            best_rewards=jnp.full((pop, agents), -jnp.inf),
            global_best_reward=jnp.full((agents,), -jnp.inf),
        )
        return action, next_state, SolverAux(
            expected_reward=state.global_best_reward, plan=gbest
        )

    def reset(state: PSOState, key: jax.Array) -> PSOState:
        del state
        return init(key)

    return base.with_state_dtype(
        # plan_field stays None: PSOState.global_best_position IS an [A, H, U] plan, but the
        # swarm is only resampled around it at warm-start time, so seeding it externally
        # would not steer the in-solve search the way seeding a sampling mean does.
        Solver(init=init, solve=solve, reset=reset, name="PSO"), config.dtype
    )
