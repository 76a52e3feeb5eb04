"""CMA-ES factor-refresh cost on the flagship workload, one real TPU chip.

The full-covariance solver's per-iteration eigh + Cholesky of C (n = H*U = 300) is its
dominant cost over CEM (measured 25.9 vs 8.9 ms/solve round 1, docs/performance.md).
``eigen_update_every`` (solvers/cma_es.py) lazily refreshes those factors — this measures
the exact-refresh default, the Hansen auto-gap, and sep-CMA (diagonal) on the same
5-member MLP(3x500) ensemble rollout workload, differential chained timing (see bench.py).

Run: python benchmarks/cma_lazy_bench.py            (real TPU via axon)
Output: one JSONL row per config appended to benchmarks/results_r2.jsonl.
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import jax

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _flagship_chain import measure  # noqa: E402  (shared chained-timing harness)


def main():
    device = jax.devices()[0].device_kind
    out = os.path.join(_HERE, "results_r2.jsonl")
    base = dict(planning_horizon=50, population=1000, num_agents=1, num_elite=50,
                max_iterations=5)
    configs = [
        (dict(base), "eigen_update_every=1 (exact, default)"),
        (dict(base, eigen_update_every=0), "eigen_update_every=0 (Hansen auto-gap)"),
        (dict(base, eigen_update_every=5), "eigen_update_every=5 (one refresh/solve)"),
        (dict(base, diagonal=True), "sep-CMA (diagonal)"),
    ]
    with open(out, "a") as f:
        for kw, label in configs:
            per_solve = measure("CMA-ES", kw)
            row = {
                "bench": "cma_lazy_eigen_flagship",
                "workload": f"CMA-ES pop=1000 H=50 iters=5, {label}",
                "per_solve_ms": round(per_solve * 1e3, 3),
                "solves_per_s": round(1.0 / per_solve, 1),
                "device": device,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            f.write(json.dumps(row) + "\n")
            print(json.dumps(row))


if __name__ == "__main__":
    main()
