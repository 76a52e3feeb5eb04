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

__all__ = ["CEMConfig", "CEMState", "make_cem", "cem_iteration", "init_carried"]


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


@struct.dataclass
class CEMState:
    mean: jax.Array  # [A, H, U]
    variance: jax.Array  # [A, H, U]


def cem_iteration(config, bounds, evaluate, obs, mean, var, key, carried):
    """One CEM update, shared by ``make_cem`` and ``make_cem_gd`` (cem_gd.py).

    Samples ``population - keep_elites`` fresh candidates around ``mean`` (colored noise when
    ``config.colored_noise_beta > 0``, else truncated normal), re-injects the ``carried``
    elites, evaluates, and blends per-agent top-k elite moments with momentum ``alpha``
    (reference cem.py:81-125). Returns ``(mean, var, key, carried, elites, elite_vals)``;
    ``elites`` is ``[A, k, H, U]`` ranked best-first (``lax.top_k`` orders descending).
    """
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    k, alpha, keep = config.num_elite, config.alpha, config.keep_elites
    key, sample_key = jax.random.split(key)
    constrained = base.constrain_variance(mean, var, bounds)
    n_fresh = pop - keep
    if config.colored_noise_beta > 0.0:
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
    if keep:
        # iCEM elite persistence: previous iteration's top candidates rejoin the
        # population (skipped on the first iteration — `carried` is init-sampled
        # placeholder data then, which is harmless but uninformative).
        samples = jnp.concatenate([samples, jnp.swapaxes(carried, 0, 1)], axis=0)
    rewards = evaluate(obs, samples)  # [P, A]
    elite_vals, elite_idx = jax.lax.top_k(rewards.T, k)  # [A, k]
    per_agent = jnp.swapaxes(samples, 0, 1)  # [A, P, H, U]
    elites = jnp.take_along_axis(per_agent, elite_idx[:, :, None, None], axis=1)
    new_mean = jnp.mean(elites, axis=1)
    new_var = jnp.mean(jnp.square(elites - new_mean[:, None]), axis=1)
    mean = alpha * mean + (1.0 - alpha) * new_mean
    var = alpha * var + (1.0 - alpha) * new_var
    carried = elites[:, :keep] if keep else carried
    return mean, var, key, carried, elites, elite_vals


def init_carried(config, bounds, state, key):
    """Initial carried-elite buffer for ``cem_iteration``; returns ``(key, carried0)``.

    keep_elites==0 performs NO key split — the RNG stream must match the reference path
    exactly (golden tests replicate it).
    """
    keep = config.keep_elites
    if keep:
        key, seed_key = jax.random.split(key)
        carried0 = truncated_normal(
            seed_key, state.mean, jnp.sqrt(state.variance),
            (keep, config.num_agents, config.planning_horizon, bounds.dim),
        )
        return key, jnp.swapaxes(carried0, 0, 1)
    return key, jnp.zeros(
        (config.num_agents, 0, config.planning_horizon, bounds.dim), state.mean.dtype
    )


def make_cem(config: CEMConfig, bounds: Bounds, evaluate: TrajectoryEvaluator) -> Solver:
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    k = config.num_elite
    # Factory-time (not first-trace-time) so a bad config fails at construction, before
    # the user pays policy build/compile setup (same placement as make_cem_gd).
    if not 0 <= config.keep_elites <= min(k, pop - 1):
        raise ValueError(
            f"keep_elites ({config.keep_elites}) must be in [0, min(num_elite, pop-1)]"
        )

    def init(key: jax.Array) -> CEMState:
        del key
        return CEMState(
            mean=base.init_solution_mean(bounds, horizon, agents),
            variance=base.init_solution_variance(bounds, horizon, agents),
        )

    def solve(state: CEMState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t

        def iteration(i, carry):
            mean, var, key, _, carried = carry
            mean, var, key, carried, _, elite_vals = cem_iteration(
                config, bounds, evaluate, obs, mean, var, key, carried
            )
            return mean, var, key, jnp.mean(elite_vals, axis=1), carried

        best0 = jnp.full((agents,), -jnp.inf, dtype=state.mean.dtype)
        key, carried0 = init_carried(config, bounds, state, key)
        mean, var, _, elite_reward, _ = jax.lax.fori_loop(
            0, config.max_iterations, iteration,
            (state.mean, state.variance, key, best0, carried0),
        )
        action = mean[:, 0]
        if config.warm_start:
            next_state = CEMState(mean=base.shift_time(mean), variance=state.variance)
        else:
            # Reference semantics: the persistent mean/variance are never updated
            # (assign commented out, cem.py:133-134) — every solve restarts from init.
            next_state = state
        return action, next_state, SolverAux(expected_reward=elite_reward, plan=mean)

    def reset(state: CEMState, key: jax.Array) -> CEMState:
        del state
        return init(key)

    return base.with_state_dtype(
        Solver(init=init, solve=solve, reset=reset, name="CEM", plan_field="mean"), config.dtype
    )
