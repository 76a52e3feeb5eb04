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
``gd_iterations`` fused forward+backward evaluations of ``gd_candidates + 1`` plans (the
blended mean plus the top elites) — e.g. the flagship pop=1000 x 5 iters adds only 9 x 10
polished rollouts (~2% FLOPs) for the precision gain. Requires a differentiable evaluator
(the XLA scan path; not the Pallas backends).

The CEM phase reuses ``cem.cem_iteration`` verbatim — the update rule, colored-noise
sampling, and iCEM elite persistence cannot drift from ``make_cem``'s.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax
from flax import struct

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux, TrajectoryEvaluator
from blackbox_mpc_tpu.solvers import base, cem

__all__ = ["CEMGDConfig", "CEMGDState", "make_cem_gd"]


@dataclasses.dataclass(frozen=True)
class CEMGDConfig(cem.CEMConfig):
    """CEM phase inherits ``CEMConfig`` (incl. ``colored_noise_beta``/``keep_elites``);
    GD phase defaults follow ``GradientConfig``."""

    # Top elites of the final CEM iteration polished by Adam alongside the blended CEM
    # mean (gd_candidates + 1 plans total, best elite always included). Must be <= num_elite.
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
    k, m = config.num_elite, config.gd_candidates
    if not 1 <= m <= k:
        raise ValueError(f"gd_candidates ({m}) must be in [1, num_elite={k}]")
    # time_major: phase 1 rides cem_iteration's time-major path unchanged; phase 2's
    # polish/argmax evaluates only m+2 plans per agent, so presenting them to the
    # time-major evaluator costs one negligible [m+2, A, H, U] -> [H, m+2, A, U]
    # transpose (gradients flow through it in adam_polish).
    ev_pm = (
        (lambda o, p: evaluate(o, jnp.transpose(p, (2, 0, 1, 3))))
        if config.time_major
        else evaluate
    )
    if k > pop:
        raise ValueError(f"num_elite ({k}) must be <= population ({pop})")
    # Same guard as make_cem: an out-of-range keep_elites would otherwise surface as an
    # opaque lax.scan carry-shape mismatch inside the shared cem_iteration.
    reserved = 1 + (1 if config.mean_as_candidate else 0)
    if not 0 <= config.keep_elites <= min(k, pop - reserved):
        raise ValueError(
            f"keep_elites ({config.keep_elites}) must be in "
            f"[0, min(num_elite, population - {reserved})]"
        )
    if not 0.0 < config.population_decay <= 1.0:
        raise ValueError(
            f"population_decay ({config.population_decay}) must be in (0, 1]"
        )
    if config.execute_best:
        raise ValueError(
            "CEM-GD does not take execute_best: its final argmax already selects over "
            "the polished elites AND the unpolished incumbent, which subsumes it"
        )
    cem_pops = cem.iteration_populations(config)
    opt = optax.adam(config.gd_learning_rate)

    def init(key: jax.Array) -> CEMGDState:
        del key
        return CEMGDState(
            mean=base.init_solution_mean(bounds, horizon, agents),
            variance=base.init_solution_variance(bounds, horizon, agents),
        )

    def solve(state: CEMGDState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t

        # --- Phase 1: CEM (shared iteration body, cem.py). The top-m elites of the LAST
        # iteration ride the loop carry — scanning them out would stack a
        # [T, A, m, H, U] buffer of which only the final slice is read.
        def cem_iter(i, carry):
            mean, var, key, carried, _ = carry
            mean, var, key, carried, elites, _ = cem.cem_iteration(
                config, bounds, evaluate, obs, mean, var, key, carried, n_extract=m
            )
            return (mean, var, key, carried, elites[:, :m])

        key, carried0 = cem.init_carried(config, bounds, state, key)
        elites0 = jnp.zeros(
            (agents, m, horizon, bounds.dim), state.mean.dtype
        )
        if cem_pops is None:
            mean, var, _, _, top_elites = jax.lax.fori_loop(
                0, config.max_iterations, cem_iter,
                (state.mean, state.variance, key, carried0, elites0),
            )  # top_elites: [A, m, H, U], best-first
        else:
            # iCEM population decay: distinct static shapes per iteration -> unrolled.
            mean, var, carried = state.mean, state.variance, carried0
            top_elites = elites0
            for pop_i in cem_pops:
                mean, var, key, carried, elites, _ = cem.cem_iteration(
                    config, bounds, evaluate, obs, mean, var, key, carried,
                    population=pop_i, n_extract=m,
                )
                top_elites = elites[:, :m]

        # --- Phase 2: Adam polish of {blended mean} U {top m elites} ---
        # The incumbent is a separate slot, NOT written over elite rank 0 — the best plan
        # CEM actually found is always polished too.
        incumbent = bounds.clip(mean)
        plans = jnp.concatenate(
            [incumbent[None], jnp.swapaxes(top_elites, 0, 1)], axis=0
        )  # [m+1, A, H, U]
        plans = base.adam_polish(
            lambda p: ev_pm(obs, p), bounds, opt, plans, config.gd_iterations
        )
        # The UNPOLISHED blended mean re-enters the final argmax, so CEM-GD can never
        # return a worse plan than plain CEM at the same sampled budget — even when every
        # Adam trajectory overshoots on a ragged landscape.
        plans = jnp.concatenate([plans, incumbent[None]], axis=0)  # [m+2, A, H, U]

        rewards = ev_pm(obs, plans)  # [m+2, A]
        best_idx = jnp.argmax(rewards, axis=0)  # [A]
        per_agent = jnp.swapaxes(plans, 0, 1)  # [A, m+2, H, U]
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
        Solver(init=init, solve=solve, reset=reset, name="CEM-GD", plan_field="mean"), config.dtype
    )
