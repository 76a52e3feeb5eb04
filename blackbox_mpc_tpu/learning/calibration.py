"""Variance-calibration diagnostics for probabilistic dynamics heads.

The round-5 PETS study (docs/performance.md "PETS uncertainty propagation",
``benchmarks/variance_calibration_r5.jsonl``) showed that head calibration — the ratio
``E[residual^2] / E[sigma^2]`` on held-out data — is THE control knob for sampled
uncertainty propagation: fixed logvar bounds drift to 0.047 (21x oversized noise,
planning collapses); learnable bounds that descend too far drift to ~3 (overconfident,
planning exploits model error). This module makes that diagnostic first-class: the
number is computed per ``DynamicsHandler.train()`` call (``val_calibration_ratio`` in
the returned metrics, ``system_model/val_calibration_ratio`` in the writer) so long runs
can gate on it instead of discovering mis-calibration post-mortem.

All statistics are in the space the NLL was trained in (normalized targets when
``config.normalized``) — the same convention as ``learning/trainer.py``. The reference
trains deterministic MLPs only (``/root/reference/blackbox_mpc/dynamics_functions/
deterministic_mlp.py:27-51``), so this has no reference counterpart.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["head_moments", "calibration_summary"]


def head_moments(handler) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Per-member Gaussian heads vs targets on the validation split.

    Returns ``(mean [E, B, S], var [E, B, S], target [B, S])`` as float64 numpy arrays
    in training-target space, or ``None`` when the handler is deterministic, is a
    true-model handler, or has no validation data.
    """
    from blackbox_mpc_tpu.models import transforms
    from blackbox_mpc_tpu.models.dynamics import bound_logvar
    from blackbox_mpc_tpu.models.mlp import mlp_apply

    cfg = handler.config
    if cfg is None or not cfg.probabilistic or handler.replay is None:
        return None
    s, a, ns = handler.replay.arrays(validation=True)
    if len(s) == 0:
        return None
    dp = handler.dynamics_params
    stats = dp.stats
    transform = (
        transforms.delta_transform if cfg.predict_delta else transforms.identity_transform
    )
    s_j, a_j, ns_j = jnp.asarray(s), jnp.asarray(a), jnp.asarray(ns)
    target = transform(s_j, ns_j)
    if cfg.normalized:
        x = jnp.concatenate(
            [stats.normalize_states(s_j), stats.normalize_actions(a_j)], axis=-1
        )
        target = stats.normalize_targets(target)
    else:
        x = jnp.concatenate([s_j, a_j], axis=-1)

    # learn_logvar_bounds stores {"net": member stacks, "lv_min": [S], "lv_max": [S]}.
    params = dp.params
    if isinstance(params, dict) and "net" in params:
        net, lv = params["net"], (params["lv_min"], params["lv_max"])
    else:
        net, lv = params, (None, None)
    if cfg.ensemble_size == 1:
        net = jax.tree.map(lambda t: t[None], net)

    raw = jax.vmap(lambda pm: mlp_apply(pm, x, config=cfg.mlp))(net)  # [E, B, 2S]
    mean = raw[..., : cfg.dim_s]
    var = jnp.exp(bound_logvar(raw[..., cfg.dim_s:], *lv))
    return (
        np.asarray(mean, np.float64),
        np.asarray(var, np.float64),
        np.asarray(target, np.float64),
    )


def calibration_summary(handler) -> Optional[dict]:
    """``E[residual^2]/E[sigma^2]`` + z-score coverage on the validation split.

    1.0 = calibrated. ``ratio < 1``: underconfident heads (predicted sigma too large —
    sampled propagation injects oversized noise, the fixed-bound collapse mode).
    ``ratio > 1``: overconfident (sigma too small — planning over-trusts the model).
    Coverage is the fraction of |z| <= 1 / <= 2 vs the Gaussian 68.3 % / 95.4 %.
    ``None`` when not applicable (see :func:`head_moments`).
    """
    moments = head_moments(handler)
    if moments is None:
        return None
    mean, var, target = moments
    resid_sq = np.square(target[None] - mean)
    z = (target[None] - mean) / np.sqrt(var)
    return {
        "variance_ratio": float(resid_sq.mean() / var.mean()),
        "per_dim_variance_ratio": (resid_sq.mean(axis=(0, 1)) / var.mean(axis=(0, 1))),
        "coverage_1sigma": float((np.abs(z) <= 1.0).mean()),
        "coverage_2sigma": float((np.abs(z) <= 2.0).mean()),
        "val_points": int(target.shape[0]),
    }
