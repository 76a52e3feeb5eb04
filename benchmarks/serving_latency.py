"""Steady-state serving latency: ServingPolicy.act vs the live MPCPolicy.act.

Both run the SAME compiled program (the artifact is the policy's own step function), so
their per-act latency should be statistically identical; this script verifies that claim
with p50/p95 over an episode of acts on the same device. On tunneled TPU frontends the
absolute numbers are dominated by the ~30 ms host<->device round-trip `act()` pays per
step (see docs/performance.md methodology), paid equally by both paths.

  python benchmarks/serving_latency.py [--tpu] [--steps 50] [--out ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def _percentiles(samples_ms):
    return {
        "p50_ms": round(float(np.percentile(samples_ms, 50)), 2),
        "p95_ms": round(float(np.percentile(samples_ms, 95)), 2),
        "mean_ms": round(float(np.mean(samples_ms)), 2),
        "n": len(samples_ms),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--population", type=int, default=512)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from blackbox_mpc_tpu import DynamicsHandler, MPCPolicy, export_policy_artifact
    from blackbox_mpc_tpu.core.spaces import BoxSpace
    from blackbox_mpc_tpu.deploy.serving import ServingPolicy
    from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward

    policy = MPCPolicy(
        BoxSpace.of([-2.0], [2.0]), pendulum_reward,
        DynamicsHandler(true_model=pendulum_dynamics),
        solver_name="CEM", planning_horizon=25, population=args.population,
        num_elite=50, max_iterations=5, seed=0,
    )
    artifact = os.path.join(tempfile.mkdtemp(prefix="bbmpc_lat_"), "c.bbmpc")
    export_policy_artifact(policy, artifact, dim_s=3)
    srv = ServingPolicy.load(artifact)

    obs = np.array([0.5, 0.1, 0.0], np.float32)
    rows = []
    for name, pol in (("live_mpc_policy", policy), ("serving_policy", srv)):
        pol.act(obs, t=0)  # compile + warm
        lat = []
        for t in range(args.steps):
            t0 = time.perf_counter()
            action, _, _ = pol.act(obs, t=t)
            lat.append((time.perf_counter() - t0) * 1e3)
        row = {"path": name, "device": str(jax.devices()[0]),
               "population": args.population, **_percentiles(lat)}
        rows.append(row)
        print(json.dumps(row))
    if args.out:
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
