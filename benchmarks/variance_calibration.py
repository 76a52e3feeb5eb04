"""Variance-calibration diagnostic for the probabilistic dynamics heads (VERDICT r4 #1).

Mis-calibrated Gaussian heads are the standard reason sampled uncertainty propagation
(PETS TS-inf / MM) loses to plain mean propagation: if the predicted `exp(logvar)` does
not match the empirical squared residuals, every sampled rollout injects noise of the
wrong scale and elite selection rewards lucky draws over good plans. This script measures
that directly on a trained handler checkpoint's own validation split:

* per-dim variance ratio  E[(target - mu)^2] / E[sigma^2]  (1.0 = calibrated,
  <1 over-dispersed/underconfident heads, >1 overconfident);
* z-score coverage: fraction of |z| <= 1 and <= 2 vs the Gaussian 68.3 / 95.4 %;
* a decile calibration curve: bin validation points by predicted variance and compare
  the bin's mean predicted variance with its mean squared residual (both in
  normalized-target space — the space the NLL was trained in, learning/trainer.py:53-68).

Usage:
  python benchmarks/variance_calibration.py --ckpt benchmarks/ckpt_tsinf_p20 \
      --out benchmarks/variance_calibration_r5.jsonl

Reference baseline being diagnosed: the reference trains a deterministic MLP only
(/root/reference/blackbox_mpc/dynamics_functions/deterministic_mlp.py:27-51); probabilistic
heads are this build's extension, so this calibration check has no reference counterpart.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="DynamicsHandler.save dir, or an MBRL-loop dir containing handler/")
    p.add_argument("--out", default="benchmarks/variance_calibration_r5.jsonl")
    p.add_argument("--bins", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from blackbox_mpc_tpu.learning.calibration import calibration_summary, head_moments
    from blackbox_mpc_tpu.learning.handler import DynamicsHandler

    ckpt = args.ckpt
    if not os.path.exists(os.path.join(ckpt, "config.json")) and os.path.exists(
        os.path.join(ckpt, "handler", "config.json")
    ):
        ckpt = os.path.join(ckpt, "handler")
    handler = DynamicsHandler.load(ckpt)
    cfg = handler.config
    if not cfg.probabilistic:
        raise SystemExit("checkpoint's dynamics are deterministic — nothing to calibrate")

    # Shared package diagnostic (learning/calibration.py — the same computation
    # handler.train() reports as val_calibration_ratio); the decile curve is local.
    summary = calibration_summary(handler)
    if summary is None:
        raise SystemExit("checkpoint has no validation split")
    mean, var, target = head_moments(handler)
    resid_sq = np.square(target[None] - mean)  # [E, B, S]

    per_dim_ratio = summary["per_dim_variance_ratio"]
    overall_ratio = summary["variance_ratio"]
    cov1 = summary["coverage_1sigma"]
    cov2 = summary["coverage_2sigma"]

    # Decile calibration curve over pooled (member, point, dim) cells.
    v_flat, r_flat = var.reshape(-1), resid_sq.reshape(-1)
    order = np.argsort(v_flat)
    curve = []
    for chunk in np.array_split(order, args.bins):
        curve.append({
            "predicted_var": float(v_flat[chunk].mean()),
            "empirical_var": float(r_flat[chunk].mean()),
            "n": int(len(chunk)),
        })

    rows = [{
        "ckpt": args.ckpt,
        "val_points": summary["val_points"],
        "ensemble": int(cfg.ensemble_size),
        "space": "normalized-target" if cfg.normalized else "raw-target",
        "overall_variance_ratio": round(overall_ratio, 4),
        "coverage_1sigma": round(cov1, 4),
        "coverage_2sigma": round(cov2, 4),
        "gaussian_expected": {"1sigma": 0.6827, "2sigma": 0.9545},
        "per_dim_variance_ratio": [round(float(r), 4) for r in per_dim_ratio],
        "calibration_curve": curve,
    }]
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    verdict = (
        "overconfident (sampled noise too small)" if overall_ratio > 1.5 else
        "underconfident (sampled noise too large)" if overall_ratio < 0.67 else
        "approximately calibrated"
    )
    print(json.dumps({
        "metric": "dynamics-head variance calibration",
        "value": round(overall_ratio, 3),
        "unit": "E[residual^2]/E[sigma^2] (1.0 = calibrated)",
        "coverage_1sigma": round(cov1, 3),
        "coverage_2sigma": round(cov2, 3),
        "verdict": verdict,
    }))


if __name__ == "__main__":
    main()
