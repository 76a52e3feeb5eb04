"""Cross-Entropy Method trajectory solver.

Pure-functional rebuild of ``CEMOptimizer``
(``/root/reference/blackbox_mpc/optimizers/cem.py:74-136``): per iteration, sample a truncated
normal population under bound-constrained variance, evaluate, keep per-agent top-k elites, and
blend elite moments into the running mean/variance with momentum ``alpha``. Differences from the
reference, by design:

* per-agent elite selection is a batched ``lax.top_k`` + ``take_along_axis`` instead of the
  per-agent Python ``tf.gather`` loop (``cem.py:102-111``) — one fused gather on TPU;
* warm-starting is an explicit config flag. The reference's shift-assign is commented out
  ("causing problems with cheetah env", ``cem.py:133-134``), so the default here is
  ``warm_start=False`` for behavioral parity;
* the iteration loop is a ``lax.fori_loop`` carrying ``(mean, var, key, best)`` — the reference's
  unused ``epsilon`` early-stop (``cem.py:53,76-78``) is dropped.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux, TrajectoryEvaluator, truncated_normal
from blackbox_mpc_tpu.solvers import base

__all__ = [
    "CEMConfig", "CEMState", "make_cem", "cem_iteration", "init_carried",
    "iteration_populations",
]


@dataclasses.dataclass(frozen=True)
class CEMConfig(base.SolverConfig):
    """Defaults match the reference (``cem.py:7-10``)."""

    num_elite: int = 50
    alpha: float = 0.25  # weight of the *previous* mean/var (cem.py:112-125)
    warm_start: bool = False  # reference behavior: restart from midpoint every solve
    # iCEM-style temporally colored noise exponent; 0.0 = white truncated normal (reference
    # behavior). beta in [1, 4] yields smooth candidate sequences — better for real systems.
    colored_noise_beta: float = 0.0
    # iCEM elite persistence: re-inject the top `keep_elites` candidates of the previous
    # iteration into the next iteration's population (guarantees the best-seen candidate
    # survives refinement). 0 = reference behavior (fresh population every iteration).
    keep_elites: int = 0
    # iCEM population decay (Pinneri et al. 2020 §4.2): iteration i samples
    # max(population * decay^i, 2*num_elite) candidates — later iterations refine a
    # narrowed distribution and need fewer samples, cutting the total rollout budget.
    # 1.0 = reference behavior (constant population; the iteration loop stays a fori_loop).
    population_decay: float = 1.0
    # iCEM: inject the current (clipped) mean as one candidate each iteration, so the
    # incumbent distribution center is always scored against the fresh samples.
    mean_as_candidate: bool = False
    # iCEM "execute best action": act with the first action of the best candidate seen
    # across all iterations instead of the blended mean (better on ragged landscapes;
    # the mean remains the carried plan / warm-start source).
    execute_best: bool = False
    # Sample the candidate tensor time-major ([H, P, A, U]) and pair with a
    # ``time_major=True`` evaluator: the horizon scan then consumes candidates with NO
    # relayout, eliminating the materialized [P·A, H, U] -> [H, P·A, U] transpose (13.6
    # ms/solve ≈ 10 % at the 256-agent x 1k bench shape — the r4 per-op profile,
    # docs/performance.md). Same math and sampling distribution; for truncated-normal
    # sampling the RNG element association differs (a different but equally-random draw,
    # not bit-comparable with the default layout), while colored noise draws the SAME
    # spectrum in both layouts (base.colored_noise_time_major synthesizes it through a
    # spectral-basis matmul that writes H-major directly). Incompatible with the
    # pallas/fused kernel backends (their candidate contract is [P, A, H, U]).
    time_major: bool = False


@struct.dataclass
class CEMState:
    mean: jax.Array  # [A, H, U]
    variance: jax.Array  # [A, H, U]


def cem_iteration(config, bounds, evaluate, obs, mean, var, key, carried, population=None,
                  n_extract=None):
    """One CEM update, shared by ``make_cem`` and ``make_cem_gd`` (cem_gd.py).

    Samples ``population - keep_elites`` fresh candidates around ``mean`` (colored noise when
    ``config.colored_noise_beta > 0``, else truncated normal), re-injects the ``carried``
    elites, evaluates, and blends per-agent top-k elite moments with momentum ``alpha``
    (reference cem.py:81-125). Returns ``(mean, var, key, carried, elites, elite_vals)``;
    ``elites`` is ``[A, n, H, U]`` ranked best-first (``lax.top_k`` orders descending).

    Elite MOMENTS are computed by a masked multiply+reduce over the candidate tensor (one
    fused pass per moment) rather than by gathering the ``[A, k, H, U]`` elite block: the
    r4 hardware profile of the 256-agent x 1k shape showed that gather costing 3.3 ms per
    iteration — 11 % of the whole solve — against ~0.4 ms for a reduction pass. Same math
    (sum of the selected k over k); only the f32 summation order differs (golden tests
    hold at rtol 1e-5).

    ``n_extract``: how many ranked elite VALUES the caller actually needs gathered
    (``keep_elites`` for the carry, 1 for execute-best tracking, ``m`` for CEM-GD's
    polish phase). Default ``None`` keeps the legacy full-``k`` gather.

    ``population`` overrides ``config.population`` for this iteration (iCEM decay; the
    value must be a static int so shapes stay compile-time constants).

    ``config.time_major``: the candidate tensor is sampled and evaluated as
    ``[H, P, A, U]`` (see :class:`CEMConfig`) — the solver state, the returned
    ``elites`` block and all the moment math keep their documented layouts; only the
    big per-iteration tensor (and the internal ``carried`` buffer, ``[H, keep, A, U]``)
    changes, so the horizon scan never pays a relayout.
    """
    horizon, agents = config.planning_horizon, config.num_agents
    pop = config.population if population is None else population
    k, alpha, keep = config.num_elite, config.alpha, config.keep_elites
    tm = config.time_major
    key, sample_key = jax.random.split(key)
    constrained = base.constrain_variance(mean, var, bounds)
    n_fresh = pop - keep - (1 if config.mean_as_candidate else 0)
    if tm:
        mean_t = jnp.transpose(mean, (1, 0, 2))[:, None]  # [H, 1, A, U] (tiny)
        std_t = jnp.sqrt(jnp.transpose(constrained, (1, 0, 2)))[:, None]
        if config.colored_noise_beta > 0.0:
            z = base.colored_noise_time_major(
                sample_key, config.colored_noise_beta,
                (horizon, n_fresh, agents, bounds.dim),
            )
            samples = bounds.clip(mean_t + std_t * z)
        else:
            samples = truncated_normal(
                sample_key, mean_t, std_t, (horizon, n_fresh, agents, bounds.dim)
            )
        if config.mean_as_candidate:
            samples = jnp.concatenate([samples, bounds.clip(mean_t)], axis=1)
        if keep:
            samples = jnp.concatenate([samples, carried], axis=1)
    elif config.colored_noise_beta > 0.0:
        z = base.colored_noise(
            sample_key, config.colored_noise_beta,
            (n_fresh, agents, horizon, bounds.dim),
        )
        samples = bounds.clip(mean + jnp.sqrt(constrained) * z)
    else:
        samples = truncated_normal(
            sample_key, mean, jnp.sqrt(constrained),
            (n_fresh, agents, horizon, bounds.dim),
        )
    if not tm and config.mean_as_candidate:
        # iCEM: the incumbent distribution center competes with the fresh samples.
        samples = jnp.concatenate([samples, bounds.clip(mean)[None]], axis=0)
    if not tm and keep:
        # iCEM elite persistence: previous iteration's top candidates rejoin the
        # population (skipped on the first iteration — `carried` is init-sampled
        # placeholder data then, which is harmless but uninformative).
        samples = jnp.concatenate([samples, jnp.swapaxes(carried, 0, 1)], axis=0)
    rewards = evaluate(obs, samples)  # [P, A]
    elite_vals, elite_idx = jax.lax.top_k(rewards.T, k)  # [A, k]
    # 0/1 elite mask [P, A]; multiply+reduce stays a reduction (kInput fusion) — do NOT
    # rewrite as einsum/dot_general, which pads an M=1 batched matmul on the MXU.
    mask = jnp.zeros((pop, agents), samples.dtype).at[
        elite_idx.T, jnp.arange(agents)[None, :]
    ].set(1.0)
    if tm:
        w = mask[None, :, :, None]  # [1, P, A, 1]
        new_mean_t = jnp.sum(w * samples, axis=1) / k  # [H, A, U]
        new_var_t = jnp.sum(
            w * jnp.square(samples - new_mean_t[:, None]), axis=1
        ) / k
        new_mean = jnp.transpose(new_mean_t, (1, 0, 2))
        new_var = jnp.transpose(new_var_t, (1, 0, 2))
    else:
        new_mean = jnp.sum(mask[:, :, None, None] * samples, axis=0) / k
        new_var = jnp.sum(
            mask[:, :, None, None] * jnp.square(samples - new_mean[None]), axis=0
        ) / k
    n = k if n_extract is None else max(n_extract, keep)
    elites_t = None
    if n and tm:
        # [H, n, A, U] gather (n is small), then a tiny transpose to the documented
        # [A, n, H, U] contract for callers.
        elites_t = jnp.take_along_axis(
            samples, elite_idx[:, :n].T[None, :, :, None], axis=1
        )
        elites = jnp.transpose(elites_t, (2, 1, 0, 3))
    elif n:
        per_agent = jnp.swapaxes(samples, 0, 1)  # [A, P, H, U]
        elites = jnp.take_along_axis(
            per_agent, elite_idx[:, :n, None, None], axis=1
        )
    else:
        elites = jnp.zeros((agents, 0, horizon, bounds.dim), samples.dtype)
    mean = alpha * mean + (1.0 - alpha) * new_mean
    var = alpha * var + (1.0 - alpha) * new_var
    if keep:
        carried = elites_t[:, :keep] if tm else elites[:, :keep]
    return mean, var, key, carried, elites, elite_vals


def iteration_populations(config):
    """Per-iteration population sizes under iCEM decay; ``None`` when constant.

    iCEM (Pinneri et al. 2020 §4.2): iteration ``i`` uses
    ``max(population * decay^i, 2 * num_elite)`` samples. The floor also covers
    ``keep_elites``/``mean_as_candidate`` slots (``2k >= k + keep + 1`` given the
    ``keep <= min(k, pop-1)`` invariant), so every iteration still draws fresh samples
    and ``top_k`` always has at least ``num_elite`` candidates to rank.
    """
    g = config.population_decay
    if g >= 1.0:
        return None
    floor = max(
        2 * config.num_elite,
        config.keep_elites + (2 if config.mean_as_candidate else 1),
    )
    return [
        max(int(config.population * g**i), floor) for i in range(config.max_iterations)
    ]


def init_carried(config, bounds, state, key):
    """Initial carried-elite buffer for ``cem_iteration``; returns ``(key, carried0)``.

    keep_elites==0 performs NO key split — the RNG stream must match the reference path
    exactly (golden tests replicate it).
    """
    keep = config.keep_elites
    if keep and config.time_major:
        key, seed_key = jax.random.split(key)
        mean_t = jnp.transpose(state.mean, (1, 0, 2))[:, None]
        std_t = jnp.sqrt(jnp.transpose(state.variance, (1, 0, 2)))[:, None]
        return key, truncated_normal(
            seed_key, mean_t, std_t,
            (config.planning_horizon, keep, config.num_agents, bounds.dim),
        )
    if keep:
        key, seed_key = jax.random.split(key)
        carried0 = truncated_normal(
            seed_key, state.mean, jnp.sqrt(state.variance),
            (keep, config.num_agents, config.planning_horizon, bounds.dim),
        )
        return key, jnp.swapaxes(carried0, 0, 1)
    if config.time_major:
        return key, jnp.zeros(
            (config.planning_horizon, 0, config.num_agents, bounds.dim), state.mean.dtype
        )
    return key, jnp.zeros(
        (config.num_agents, 0, config.planning_horizon, bounds.dim), state.mean.dtype
    )


def make_cem(config: CEMConfig, bounds: Bounds, evaluate: TrajectoryEvaluator) -> Solver:
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    k = config.num_elite
    # Factory-time (not first-trace-time) so a bad config fails at construction, before
    # the user pays policy build/compile setup (same placement as make_cem_gd).
    # The mean_as_candidate slot also comes out of the fresh-sample budget: at least one
    # fresh sample must remain or the solver silently never explores.
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
    pops = iteration_populations(config)

    def init(key: jax.Array) -> CEMState:
        del key
        return CEMState(
            mean=base.init_solution_mean(bounds, horizon, agents),
            variance=base.init_solution_variance(bounds, horizon, agents),
        )

    def solve(state: CEMState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t

        def track_best(elites, elite_vals, best_val, best_plan):
            # Running per-agent best candidate across iterations (iCEM execute_best).
            top_val = elite_vals[:, 0]
            improve = top_val > best_val
            best_val = jnp.where(improve, top_val, best_val)
            best_plan = jnp.where(improve[:, None, None], elites[:, 0], best_plan)
            return best_val, best_plan

        best0 = jnp.full((agents,), -jnp.inf, dtype=state.mean.dtype)
        key, carried0 = init_carried(config, bounds, state, key)
        # Only gather the elite VALUES that are actually consumed: the carried elites and
        # (with execute_best) the per-iteration top candidate. Without execute_best the
        # best_val/best_plan carry rides through untouched (loop-invariant, hoisted out).
        n_extract = max(config.keep_elites, 1 if config.execute_best else 0)
        if pops is None:
            # Constant population: one fori_loop body, compiled once.
            def iteration(i, carry):
                mean, var, key, _, best_val, best_plan, carried = carry
                mean, var, key, carried, elites, elite_vals = cem_iteration(
                    config, bounds, evaluate, obs, mean, var, key, carried,
                    n_extract=n_extract,
                )
                if config.execute_best:
                    best_val, best_plan = track_best(
                        elites, elite_vals, best_val, best_plan
                    )
                return (mean, var, key, jnp.mean(elite_vals, axis=1), best_val,
                        best_plan, carried)

            mean, var, _, elite_reward, best_val, best_plan, _ = jax.lax.fori_loop(
                0, config.max_iterations, iteration,
                (state.mean, state.variance, key, best0, best0, state.mean, carried0),
            )
        else:
            # iCEM population decay: per-iteration sample counts are distinct static
            # shapes, so the loop unrolls at trace time (max_iterations is small).
            mean, var = state.mean, state.variance
            carried, best_val, best_plan = carried0, best0, state.mean
            elite_reward = best0
            for pop_i in pops:
                mean, var, key, carried, elites, elite_vals = cem_iteration(
                    config, bounds, evaluate, obs, mean, var, key, carried,
                    population=pop_i, n_extract=n_extract,
                )
                if config.execute_best:
                    best_val, best_plan = track_best(
                        elites, elite_vals, best_val, best_plan
                    )
                elite_reward = jnp.mean(elite_vals, axis=1)
        if config.execute_best:
            action = best_plan[:, 0]
            aux = SolverAux(expected_reward=best_val, plan=best_plan)
        else:
            action = mean[:, 0]
            aux = SolverAux(expected_reward=elite_reward, plan=mean)
        if config.warm_start:
            next_state = CEMState(mean=base.shift_time(mean), variance=state.variance)
        else:
            # Reference semantics: the persistent mean/variance are never updated
            # (assign commented out, cem.py:133-134) — every solve restarts from init.
            next_state = state
        return action, next_state, aux

    def reset(state: CEMState, key: jax.Array) -> CEMState:
        del state
        return init(key)

    return base.with_state_dtype(
        Solver(init=init, solve=solve, reset=reset, name="CEM", plan_field="mean"), config.dtype
    )
