"""CEM-GD hybrid trajectory solver: CEM global search + Adam polish of the top plans.

No reference counterpart — the reference's optimizers are all derivative-free
(``/root/reference/blackbox_mpc/optimizers/``). This solver composes the two halves this build
already has: the CEM update rule (``cem.py`` here, reference ``optimizers/cem.py:74-136``) finds
the basin, then first-order ascent through the differentiable rollout (``gradient.py`` here)
polishes the final elites to a local optimum the sampled distribution can only approach
statistically. This is the CEM-GD planner lineage (Huang et al., L4DC 2022): gradient descent
on the top-k CEM candidates dominates either method alone at equal budget because sampling
pays for exploration and the gradient pays for precision.

Budget accounting: ``max_iterations`` CEM iterations of ``population`` rollouts, then
``gd_iterations`` fused forward+backward evaluations of ``gd_candidates`` plans — e.g. the
flagship pop=1000 x 5 iters adds only 8 x 10 polished rollouts (~2% FLOPs) for the precision
gain. Requires a differentiable evaluator (the XLA scan path; not the Pallas backends).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax
from flax import struct

from blackbox_mpc_tpu.core.types import (
    Bounds,
    Solver,
    SolverAux,
    TrajectoryEvaluator,
    truncated_normal,
)
from blackbox_mpc_tpu.solvers import base

__all__ = ["CEMGDConfig", "CEMGDState", "make_cem_gd"]


@dataclasses.dataclass(frozen=True)
class CEMGDConfig(base.SolverConfig):
    """CEM phase defaults mirror ``CEMConfig``; GD phase defaults follow ``GradientConfig``."""

    num_elite: int = 50
    alpha: float = 0.25  # weight of the previous mean/var (reference cem.py:112-125)
    # Plans polished by Adam: slot 0 is the blended CEM mean, the rest are the final
    # iteration's top elites. Must be <= num_elite.
    gd_candidates: int = 8
    gd_iterations: int = 10
    gd_learning_rate: float = 0.02
    # Default matches CEM's reference-parity restart-every-solve behavior. Measured on
    # HalfCheetah MBRL (35 episodes, 5-member NLL ensemble): warm_start=False peaks at 675
    # episode reward vs 192 with warm_start=True — shift-carrying the polished plan collapses
    # exploration exactly as the reference observed for CEM warm-starting ("causing problems
    # with cheetah env", reference cem.py:133-134); plain CEM peaked at 449 on the same
    # pipeline (benchmarks/cheetah_cemgd_nows_run.jsonl, cheetah_cemgd_run.jsonl).
    warm_start: bool = False


@struct.dataclass
class CEMGDState:
    mean: jax.Array  # [A, H, U]
    variance: jax.Array  # [A, H, U]


def make_cem_gd(config: CEMGDConfig, bounds: Bounds, evaluate: TrajectoryEvaluator) -> Solver:
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    k, alpha, m = config.num_elite, config.alpha, config.gd_candidates
    if not 1 <= m <= k:
        raise ValueError(f"gd_candidates ({m}) must be in [1, num_elite={k}]")
    if k > pop:
        raise ValueError(f"num_elite ({k}) must be <= population ({pop})")
    opt = optax.adam(config.gd_learning_rate)

    def init(key: jax.Array) -> CEMGDState:
        del key
        return CEMGDState(
            mean=base.init_solution_mean(bounds, horizon, agents),
            variance=base.init_solution_variance(bounds, horizon, agents),
        )

    def solve(state: CEMGDState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t

        # --- Phase 1: CEM (same update rule as cem.py; scan so the last elites come out) ---
        def cem_iter(carry, _):
            mean, var, key = carry
            key, sample_key = jax.random.split(key)
            constrained = base.constrain_variance(mean, var, bounds)
            samples = truncated_normal(
                sample_key, mean, jnp.sqrt(constrained),
                (pop, agents, horizon, bounds.dim),
            )
            rewards = evaluate(obs, samples)  # [P, A]
            _, elite_idx = jax.lax.top_k(rewards.T, k)  # [A, k]
            per_agent = jnp.swapaxes(samples, 0, 1)  # [A, P, H, U]
            elites = jnp.take_along_axis(per_agent, elite_idx[:, :, None, None], axis=1)
            new_mean = jnp.mean(elites, axis=1)
            new_var = jnp.mean(jnp.square(elites - new_mean[:, None]), axis=1)
            mean = alpha * mean + (1.0 - alpha) * new_mean
            var = alpha * var + (1.0 - alpha) * new_var
            return (mean, var, key), elites[:, :m]

        (mean, var, _), elites_per_iter = jax.lax.scan(
            cem_iter, (state.mean, state.variance, key), None,
            length=config.max_iterations,
        )
        top_elites = elites_per_iter[-1]  # [A, m, H, U]

        # --- Phase 2: Adam polish of {blended mean} U {top elites} ---
        plans = jnp.swapaxes(top_elites, 0, 1)  # [m, A, H, U]
        incumbent = bounds.clip(mean)
        plans = bounds.clip(plans.at[0].set(incumbent))
        plans = base.adam_polish(
            lambda p: evaluate(obs, p), bounds, opt, plans, config.gd_iterations
        )
        # The UNPOLISHED blended mean re-enters the final argmax, so CEM-GD can never
        # return a worse plan than plain CEM at the same sampled budget — even when every
        # Adam trajectory overshoots on a ragged landscape.
        plans = jnp.concatenate([plans, incumbent[None]], axis=0)  # [m+1, A, H, U]

        rewards = evaluate(obs, plans)  # [m+1, A]
        best_idx = jnp.argmax(rewards, axis=0)  # [A]
        per_agent = jnp.swapaxes(plans, 0, 1)  # [A, m+1, H, U]
        best = jnp.take_along_axis(per_agent, best_idx[:, None, None, None], axis=1)[:, 0]
        best_reward = jnp.max(rewards, axis=0)
        action = best[:, 0]
        if config.warm_start:
            next_state = CEMGDState(mean=base.shift_time(best), variance=state.variance)
        else:
            next_state = state
        return action, next_state, SolverAux(expected_reward=best_reward, plan=best)

    def reset(state: CEMGDState, key: jax.Array) -> CEMGDState:
        del state
        return init(key)

    return base.with_state_dtype(
        Solver(init=init, solve=solve, reset=reset, name="CEM-GD"), config.dtype
    )
