"""Learned-dynamics wrappers: from MLP params + normalizer stats to a rollout-ready
``dynamics_fn(state, action) -> next_state``.

Counterpart of the reference's predict path
(``/root/reference/blackbox_mpc/trajectory_evaluators/deterministic.py:79-103``:
``process_input -> dynamics_function -> process_output``) and of the handler's
normalization/delta composition (``dynamics_handlers/system_dynamics_handler.py:97-161``).
Here the whole chain is one pure function over an explicit :class:`DynamicsParams` pytree, so
the MPC policy can thread freshly-trained parameters into a jitted solve without recompiling.

Ensembles (absent in the reference — single model only, README TODO) are a stacked leading
params axis with three propagation modes:

* ``"mean"``   — average the member predictions each step (probabilistic smoothing);
* ``"ts1"``    — trajectory sampling over members: population rows are statically partitioned
  across members (row ``i`` uses member ``ts_member_ids(B, E)[i]`` — a balanced, seeded
  shuffle — for the whole horizon) at no extra FLOPs (batches not divisible by E are
  edge-padded by < E rows). Deterministic: uses the head means;
* ``"ts_inf"`` — PETS TS-∞: the same fixed per-particle member assignment, **plus** a Gaussian
  sample from the probabilistic head at every step (``s' ~ N(mean, exp(logvar))``), so planning
  sees the model's aleatoric + ensemble uncertainty instead of the mean. Requires
  ``probabilistic=True``; the dynamics function takes an extra PRNG ``key`` argument
  (``key=None`` falls back to the means — used for the one-step lookahead report);
* ``"mm"``     — PETS moment matching: every member predicts a Gaussian for every row, the E
  Gaussians are collapsed into one (mean of means; law-of-total-variance variance
  ``E[var] + Var[mean]``) and the next state is a single sample from it. Unlike ts1/ts_inf
  this is not member-partitioned (full E× FLOPs per row, no batch-divisibility constraint)
  and re-Gaussianizes the state distribution each step, which suppresses multi-modality but
  gives the lowest-variance uncertainty-aware estimate. Requires ``probabilistic=True``;
  ``key=None`` returns the moment-matched mean.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from blackbox_mpc_tpu.models import transforms
from blackbox_mpc_tpu.models.mlp import MLPConfig, ensemble_init, mlp_apply, mlp_init
from blackbox_mpc_tpu.models.normalizer import NormalizerStats, identity_stats

__all__ = [
    "DynamicsParams", "LearnedDynamicsConfig", "make_learned_dynamics",
    "make_penalized_dynamics", "true_model_dynamics", "ts_member_ids",
]


def ts_member_ids(n: int, ensemble: int) -> np.ndarray:
    """Balanced member assignment for TS propagation: row ``i`` runs member ``ids[i]``.

    A seeded static shuffle of ``[0..E)`` tiled to ``n`` rows (exactly ``n/E`` rows per
    member, ``n`` must be a multiple of ``E``) rather than ``i % E``: evaluators flatten
    the batch agent-minor (row = trajectory*num_agents + agent), so ANY modular scheme
    aliases with the agent stride — with ``num_agents % E == 0``, ``i % E`` collapses to
    the agent index and every candidate/particle of an agent runs the same single member,
    silently degenerating TS to per-agent single-model planning. A fixed random balanced
    assignment is also what PETS prescribes (bootstrap chosen uniformly per particle,
    Chua et al. 2018 §4.1). Static per (n, E): the same batch shape always gets the same
    assignment, keeping solves reproducible and the XLA/Pallas paths consistent.
    """
    if n % ensemble:
        raise ValueError(f"n ({n}) must be a multiple of ensemble ({ensemble})")
    ids = np.tile(np.arange(ensemble, dtype=np.int32), n // ensemble)
    np.random.default_rng(0x75B007).shuffle(ids)
    return ids


@struct.dataclass
class DynamicsParams:
    """Everything the dynamics function needs at call time (checkpointable pytree)."""

    params: Any  # MLP params, leading [E] axis when ensemble_size > 1
    stats: NormalizerStats


@dataclasses.dataclass(frozen=True)
class LearnedDynamicsConfig:
    dim_s: int
    dim_u: int
    hidden: tuple = (32, 32, 32)
    activation: str = "tanh"
    ensemble_size: int = 1
    propagation: str = "mean"  # "mean" | "ts1" | "ts_inf" | "mm"
    # Stochastic propagation (ts_inf/mm) only: PETS particle count — each candidate is rolled
    # out this many times with independent members/noise and the returns averaged (see
    # rollout/evaluator.py). K=1 measured much worse than mean propagation (elite selection
    # rewards lucky draws).
    num_particles: int = 1
    normalized: bool = True  # reference is_normalized (system_dynamics_handler.py:57)
    predict_delta: bool = True  # default_transform_targets: network predicts s' - s
    # Probabilistic (PETS-style) Gaussian output head: the network predicts (mean, logvar)
    # per state dim and trains with Gaussian NLL. The reference supports deterministic nets
    # only (its README lists probabilistic nets as future work). Planning uses the means.
    probabilistic: bool = False
    # PETS learnable logvar bounds (Chua et al. 2018, appendix A.1). With the FIXED soft
    # bounds, heads that drift to the +0.5 ceiling early (large residuals on fresh data)
    # get stuck there: the softplus gradient vanishes exponentially past the bound, and
    # the r5 calibration study measured exactly that on cheetah — ~40 % of (point, dim)
    # cells saturated at exp(0.5)=1.65 predicted variance against ~0.04-0.22 empirical
    # residuals (overall E[resid^2]/E[sigma^2] = 0.08, benchmarks/variance_calibration.py)
    # — which is why sampled propagation (ts_inf/mm) injected ~3.5x oversized noise and
    # lost to mean propagation. True makes the per-dim bounds TRAINABLE parameters
    # (shared across ensemble members), with PETS' 0.01*(sum(max)-sum(min)) regularizer
    # pulling the admissible band tight around the data: the ceiling itself descends
    # toward the observed residuals, and its gradient never vanishes. The params pytree
    # becomes {"net": <layers>, "lv_min": [S], "lv_max": [S]}.
    learn_logvar_bounds: bool = False
    # Pessimistic (uncertainty-penalized) planning, MOPO-style: each rollout step subtracts
    # lambda * mean_S(std_E(member mean-heads)) — the ensemble's epistemic disagreement in
    # normalized-target space — from the step reward, steering every solver away from
    # regions the model doesn't know. Planning-time only (training loss unchanged); needs
    # ensemble_size > 1 and propagation "mean" or "mm" (ts1/ts_inf run one member per row,
    # so no per-row disagreement exists without an extra E-fold forward). XLA backend only.
    plan_uncertainty_penalty: float = 0.0
    compute_dtype: Any = jnp.float32

    @property
    def mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.dim_s + self.dim_u,
            out_dim=self.dim_s * (2 if self.probabilistic else 1),
            hidden=tuple(self.hidden),
            activation=self.activation,
            compute_dtype=self.compute_dtype,
        )


# Soft logvar bounds for the probabilistic head (PETS: keeps the NLL well-conditioned).
_MAX_LOGVAR = 0.5
_MIN_LOGVAR = -10.0


def bound_logvar(logvar: jax.Array, lv_min=None, lv_max=None) -> jax.Array:
    """Soft-bounds the raw logvar head into [lv_min, lv_max] (defaults: the fixed PETS
    constants). Pass the learnable per-dim bounds ([S], broadcast over batch) when
    ``learn_logvar_bounds=True`` — same softplus form, but the bounds themselves carry
    gradient (see LearnedDynamicsConfig.learn_logvar_bounds)."""
    lo = _MIN_LOGVAR if lv_min is None else lv_min
    hi = _MAX_LOGVAR if lv_max is None else lv_max
    logvar = hi - jax.nn.softplus(hi - logvar)
    return lo + jax.nn.softplus(logvar - lo)


def make_learned_dynamics(
    config: LearnedDynamicsConfig,
    return_penalized: bool = False,
) -> Tuple[Callable[[jax.Array], DynamicsParams], Callable]:
    """Returns ``(init, dynamics_fn)``.

    ``init(key) -> DynamicsParams`` allocates fresh params + identity stats.
    ``dynamics_fn(dp, state [B,S], action [B,U]) -> next_state [B,S]`` runs the full
    normalize -> MLP -> denormalize -> inverse-transform chain.

    ``return_penalized=True`` appends a third element — the uncertainty-penalized variant
    ``fn(dp, state, action, key=None) -> (next_state, penalty [B])`` used by pessimistic
    planning (``plan_uncertainty_penalty``; prefer :func:`make_penalized_dynamics`).
    """
    mlp_cfg = config.mlp
    ensemble = config.ensemble_size
    if config.propagation not in ("mean", "ts1", "ts_inf", "mm"):
        raise ValueError(f"unknown propagation {config.propagation!r}")
    if config.propagation in ("ts_inf", "mm") and not config.probabilistic:
        raise ValueError(
            f"propagation={config.propagation!r} samples the Gaussian head: set probabilistic=True"
        )
    if config.plan_uncertainty_penalty < 0:
        raise ValueError(
            f"plan_uncertainty_penalty must be >= 0, got {config.plan_uncertainty_penalty}"
        )
    if config.plan_uncertainty_penalty > 0:
        if ensemble <= 1:
            raise ValueError(
                "plan_uncertainty_penalty needs an ensemble (ensemble_size > 1): the "
                "penalty is the members' disagreement"
            )
        if config.propagation not in ("mean", "mm"):
            raise ValueError(
                "plan_uncertainty_penalty requires propagation 'mean' or 'mm' (ts1/ts_inf "
                "run a single member per row — no per-row disagreement is available); got "
                f"{config.propagation!r}"
            )
    if config.predict_delta:
        inverse = transforms.delta_inverse_transform
    else:
        inverse = transforms.identity_inverse_transform

    learn_lv = config.probabilistic and config.learn_logvar_bounds

    def _net(params):
        """The MLP layer stack inside the params pytree (see learn_logvar_bounds)."""
        return params["net"] if learn_lv else params

    def _lv(params):
        """(lv_min, lv_max) trainable bound pair, or (None, None) for the fixed bounds."""
        if learn_lv:
            return params["lv_min"], params["lv_max"]
        return None, None

    def init(key: jax.Array) -> DynamicsParams:
        if ensemble > 1:
            net = ensemble_init(key, mlp_cfg, ensemble)
        else:
            net = mlp_init(key, mlp_cfg)
        if learn_lv:
            # Shared across members (PETS uses per-network bounds; a shared pair reaches
            # the same calibration fixed point — the bounds see every member's gradient —
            # and keeps the member axis off the bound leaves, so ts1/ts_inf's member-
            # partitioned rows need no per-row bound gather).
            params = {
                "net": net,
                "lv_min": jnp.full((config.dim_s,), _MIN_LOGVAR, jnp.float32),
                "lv_max": jnp.full((config.dim_s,), _MAX_LOGVAR, jnp.float32),
            }
        else:
            params = net
        return DynamicsParams(params=params, stats=identity_stats(config.dim_s, config.dim_u))

    def _net_input(dp: DynamicsParams, state, action):
        if config.normalized:
            return jnp.concatenate(
                [dp.stats.normalize_states(state), dp.stats.normalize_actions(action)], axis=-1
            )
        return jnp.concatenate([state, action], axis=-1)

    def _target_to_state(dp: DynamicsParams, state, raw_target):
        target = dp.stats.denormalize_targets(raw_target) if config.normalized else raw_target
        return inverse(state, target)

    def _head(raw: jax.Array, key: jax.Array | None, lv=(None, None)) -> jax.Array:
        """Probabilistic head -> prediction in normalized-target space.

        ``key=None`` (mean/ts1 modes, or the one-step lookahead) returns the means;
        with a key (ts_inf) each row gets an independent Gaussian sample
        ``mean + exp(0.5*logvar) * eps`` — the PETS aleatoric-noise propagation.
        """
        if not config.probabilistic:
            return raw
        mean = raw[..., : config.dim_s]
        if key is None:
            return mean
        logvar = bound_logvar(raw[..., config.dim_s :], *lv)
        eps = jax.random.normal(key, mean.shape, mean.dtype)
        return mean + jnp.exp(0.5 * logvar) * eps

    def _mm_head(raw_all: jax.Array, key: jax.Array | None, lv=(None, None)) -> jax.Array:
        """Moment-match E per-member Gaussians ``[E, B, 2S]`` into one and sample it.

        PETS "MM" propagation (Chua et al. 2018 §4.1): mu = mean_e(mu_e),
        var = mean_e(var_e + mu_e^2) - mu^2 (law of total variance over the uniform
        member mixture). ``key=None`` returns the mixture mean (lookahead report).
        """
        mu_e = raw_all[..., : config.dim_s]
        mu = jnp.mean(mu_e, axis=0)
        if key is None:
            return mu
        var_e = jnp.exp(bound_logvar(raw_all[..., config.dim_s :], *lv))
        var = jnp.maximum(jnp.mean(var_e + jnp.square(mu_e), axis=0) - jnp.square(mu), 0.0)
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        return mu + jnp.sqrt(var) * eps

    def _member_partitioned(params, x: jax.Array) -> jax.Array:
        """Row i of x through member ts_member_ids(B, E)[i], fixed over the whole horizon.

        Batches not divisible by E are edge-padded to the next multiple (static shapes, so
        the pad is a compile-time constant of < E duplicated rows) and the padding is sliced
        off the output — any population/restart count works with ts1/ts_inf. The member
        assignment is a static balanced shuffle (see :func:`ts_member_ids` for why ``i % E``
        is wrong), so the grouping permutation is a compile-time constant gather.
        """
        batch = x.shape[0]
        pad = (-batch) % ensemble
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)), mode="edge")
        n = batch + pad
        # Stable argsort of the member ids groups rows member-major in equal blocks.
        perm = np.argsort(ts_member_ids(n, ensemble), kind="stable")
        inv = np.argsort(perm)
        x_groups = x[perm].reshape(ensemble, n // ensemble, -1)
        raw_groups = jax.vmap(lambda p, xe: mlp_apply(p, xe, config=mlp_cfg))(params, x_groups)
        return raw_groups.reshape(n, -1)[inv][:batch]

    def dynamics_fn(
        dp: DynamicsParams, state: jax.Array, action: jax.Array, key: jax.Array | None = None
    ) -> jax.Array:
        x = _net_input(dp, state, action)
        net, lv = _net(dp.params), _lv(dp.params)
        if config.propagation == "mm":
            if ensemble <= 1:
                raw_all = mlp_apply(net, x, config=mlp_cfg)[None]
            else:
                raw_all = jax.vmap(lambda p: mlp_apply(p, x, config=mlp_cfg))(net)
            return _target_to_state(dp, state, _mm_head(raw_all, key, lv))
        if ensemble <= 1:
            raw = mlp_apply(net, x, config=mlp_cfg)
        elif config.propagation == "mean":
            raw = jnp.mean(
                jax.vmap(lambda p: mlp_apply(p, x, config=mlp_cfg))(net), axis=0
            )
        else:  # "ts1" | "ts_inf": fixed per-row member assignment
            raw = _member_partitioned(net, x)
        sample_key = key if config.propagation == "ts_inf" else None
        return _target_to_state(dp, state, _head(raw, sample_key, lv))

    def penalized_dynamics_fn(
        dp: DynamicsParams, state: jax.Array, action: jax.Array, key: jax.Array | None = None
    ):
        """``(next_state, penalty [B])``: the plain step plus the scaled epistemic
        disagreement ``lambda * mean_S(std_E(member mean-heads))``, measured in
        normalized-target space so the penalty is scale-free across state dimensions.
        Same next-state numerics as ``dynamics_fn`` (mean: average of member means;
        mm: moment-matched sample under the same key)."""
        x = _net_input(dp, state, action)
        net, lv = _net(dp.params), _lv(dp.params)
        raw_all = jax.vmap(lambda p: mlp_apply(p, x, config=mlp_cfg))(net)  # [E,B,·]
        mu_e = raw_all[..., : config.dim_s] if config.probabilistic else raw_all
        disagreement = jnp.mean(jnp.std(mu_e.astype(jnp.float32), axis=0), axis=-1)
        penalty = jnp.asarray(config.plan_uncertainty_penalty, jnp.float32) * disagreement
        if config.propagation == "mm":
            next_state = _target_to_state(dp, state, _mm_head(raw_all, key, lv))
        else:  # "mean"
            next_state = _target_to_state(dp, state, _head(jnp.mean(raw_all, axis=0), None))
        return next_state, penalty

    if return_penalized:
        return init, dynamics_fn, penalized_dynamics_fn
    return init, dynamics_fn


def make_penalized_dynamics(config: LearnedDynamicsConfig) -> Callable:
    """The uncertainty-penalized planning dynamics for ``plan_uncertainty_penalty > 0``:
    ``fn(dp, state, action, key=None) -> (next_state, penalty [B])``. Thread into the
    evaluator with ``dynamics_returns_penalty=True`` (rollout/evaluator.py); MPCPolicy
    wires this automatically when the handler's config sets the penalty."""
    if config.plan_uncertainty_penalty <= 0:
        raise ValueError("make_penalized_dynamics needs plan_uncertainty_penalty > 0")
    return make_learned_dynamics(config, return_penalized=True)[2]


def true_model_dynamics(analytic_fn: Callable) -> Callable:
    """Wraps an analytic ``(state, action) -> next_state`` into the DynamicsParams calling
    convention so true models and learned models are interchangeable in the policy layer
    (reference ``true_model`` flag, system_dynamics_handler.py:61,117)."""

    def dynamics_fn(dp, state, action, key=None):
        del dp, key
        return analytic_fn(state, action)

    return dynamics_fn
