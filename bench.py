"""Headline benchmark: MPC solves/s/chip on the flagship workload.

Workload (BASELINE.json config #3): CEM, H=50, population=1000, 5 iterations, over a 5-member
MLP(3x500, tanh) dynamics ensemble with HalfCheetah dims (S=17, U=6) — 250k trajectory-steps
(1.25M ensemble-member MLP forwards) per solve.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...details}.

``vs_baseline`` compares against the reference architecture's solves/s measured by
``benchmarks/reference_baseline_tf.py`` (a faithful TF2 graph-mode re-implementation of the
reference CEM path — the reference itself publishes no numbers; see BASELINE.md) stored in
``benchmarks/baseline.json``.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import __graft_entry__

    solve_step, (solver_state, dp, obs, key) = __graft_entry__.entry()
    jfn = jax.jit(solve_step)

    # Warmup: first call compiles; a couple more absorb post-compile dispatch overheads
    # (remote-tunnel buffer setup skews the first timed solves otherwise).
    for wk in jax.random.split(jax.random.PRNGKey(99), 3):
        out = jfn(solver_state, dp, obs, wk)
        jax.block_until_ready(out)

    # Steady-state timing: each solve with a fresh key (new samples), same obs/state shapes.
    n_solves = int(os.environ.get("BENCH_SOLVES", "20"))
    keys = jax.random.split(key, n_solves)
    latencies = []
    t0 = time.perf_counter()
    for i in range(n_solves):
        t1 = time.perf_counter()
        action, _, _ = jfn(solver_state, dp, obs, keys[i])
        action.block_until_ready()
        latencies.append(time.perf_counter() - t1)
    total = time.perf_counter() - t0
    solves_per_s = n_solves / total
    p50_ms = float(np.percentile(latencies, 50) * 1e3)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks", "baseline.json")
    vs_baseline = None
    baseline_solves_per_s = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        baseline_solves_per_s = baseline.get("solves_per_s")
        if baseline_solves_per_s:
            vs_baseline = solves_per_s / baseline_solves_per_s

    print(
        json.dumps(
            {
                "metric": "CEM-MPC solves/s/chip (H=50, pop=1000, 5-member ensemble MLP 3x500, S=17 U=6)",
                "value": round(solves_per_s, 3),
                "unit": "solves/s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "p50_solve_latency_ms": round(p50_ms, 2),
                "device": str(jax.devices()[0]),
                "baseline_solves_per_s": baseline_solves_per_s,
                "n_solves": n_solves,
            }
        )
    )


if __name__ == "__main__":
    main()
