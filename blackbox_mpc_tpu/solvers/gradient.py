"""First-order (Adam) trajectory solver: gradient ascent through the differentiable rollout.

No reference counterpart — every optimizer in ``/root/reference/blackbox_mpc/optimizers/`` is
derivative-free (README.md frames the library as "derivative-free optimizers"). In this build
the trajectory evaluator is a pure JAX ``lax.scan`` over differentiable dynamics (analytic
models and MLP ensembles alike), so ``jax.grad`` of the return with respect to the action
sequence is exact and nearly free: one fused forward+backward per iteration instead of
evaluating a large sampled population. This is the gradient-based MPC family (e.g. POPLIN /
GradCEM lineage) the reference cannot express without rewriting its TF graph code.

Shape contract matches the sampling solvers: ``population`` here is the number of *random
restarts* optimized in parallel per agent (gradient planning is local — restarts recover the
global-search robustness the sampled methods get from large populations). Restart 0 is the
(possibly warm-started) incumbent plan, so the solver never regresses from warm start.

State: the incumbent plan mean, time-shifted between solves (same warm-start rule as PI2/SPSA,
``pi2.py:92-93``). Bounds are enforced by projection (clip) after every Adam step.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax
from flax import struct

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux, TrajectoryEvaluator
from blackbox_mpc_tpu.solvers import base

__all__ = ["GradientConfig", "GradientState", "make_gradient"]


@dataclasses.dataclass(frozen=True)
class GradientConfig(base.SolverConfig):
    population: int = 16  # random restarts per agent (not samples)
    max_iterations: int = 20  # Adam steps
    learning_rate: float = 0.1
    # Restart spread as a fraction of the bound-derived default std (range/4); restart 0 is
    # always the incumbent plan itself.
    restart_scale: float = 1.0
    warm_start: bool = True


@struct.dataclass
class GradientState:
    mean: jax.Array  # [A, H, U] incumbent plan


def make_gradient(config: GradientConfig, bounds: Bounds, evaluate: TrajectoryEvaluator) -> Solver:
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    if pop < 1:
        raise ValueError(f"population (restarts) must be >= 1, got {pop}")
    opt = optax.adam(config.learning_rate)

    def init(key: jax.Array) -> GradientState:
        del key
        return GradientState(mean=base.init_solution_mean(bounds, horizon, agents))

    def solve(state: GradientState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t
        std = jnp.sqrt(
            base.init_solution_variance(bounds, horizon, agents)
        )  # [A, H, U], range/4
        noise = jax.random.normal(key, (pop, agents, horizon, bounds.dim), std.dtype)
        restarts = state.mean + config.restart_scale * std * noise
        restarts = restarts.at[0].set(state.mean)  # incumbent survives verbatim
        plans = bounds.clip(restarts)

        plans = base.adam_polish(
            lambda p: evaluate(obs, p), bounds, opt, plans, config.max_iterations
        )
        rewards = evaluate(obs, plans)  # [P, A]
        best_idx = jnp.argmax(rewards, axis=0)  # [A]
        per_agent = jnp.swapaxes(plans, 0, 1)  # [A, P, H, U]
        best = jnp.take_along_axis(per_agent, best_idx[:, None, None, None], axis=1)[:, 0]
        best_reward = jnp.max(rewards, axis=0)
        action = best[:, 0]
        next_mean = base.shift_time(best) if config.warm_start else state.mean
        return action, GradientState(mean=next_mean), SolverAux(
            expected_reward=best_reward, plan=best
        )

    def reset(state: GradientState, key: jax.Array) -> GradientState:
        del state
        return init(key)

    return base.with_state_dtype(
        Solver(init=init, solve=solve, reset=reset, name="Gradient", plan_field="mean"), config.dtype
    )
