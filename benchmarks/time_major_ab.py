"""A/B the time-major candidate layout against the standard [P, A, H, U] layout.

Round-4 measurement behind the `time_major=True` defaults in bench.py: sampling the
candidate tensor `[H, P, A, U]` lets the horizon scan consume it with no relayout,
eliminating the materialized pre-scan transpose (13.6 ms/solve at the 256-agent shape —
the per-op profile in docs/performance.md, "The 256-agent shape").

Measured 2026-08-20 on one TPU v5e (results in `time_major_ab_r4.jsonl`; the committed
rows were measured per-workload with this same machinery as each layout landed, then
consolidated into this one script — re-running it end-to-end reproduces them):

  flagship CEM (pop=1k, 5x500^3 ensemble):   9.18 -> 8.75 ms/solve  (-4.7 %)
  256-agent x 1k CEM (MLP 200^2, rbg keys): 130.2 -> 107.0 ms/solve (-17.8 %, 29.1 % MFU)
  256-agent x 1k PSO:                       148.1 -> 128.4 ms/solve (-13.3 %)

Uses bench.py's differential chained-timing machinery; run ONE TPU process at a time.
"""
import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--chain", type=int, default=5, help="multi-agent chain length")
    args = p.parse_args()
    os.environ.setdefault("BENCH_MA_PRNG", "rbg")
    rows = []

    # Flagship: CEM pop=1000 over the 5-member 500^3 ensemble (bench.py chain=11).
    for tm in (False, True):
        kw = dict(planning_horizon=50, population=1000, num_agents=1, num_elite=50,
                  max_iterations=5, **({"time_major": True} if tm else {}))
        out = bench.measure("xla", 11, args.repeats, "CEM", kw)
        rows.append({
            "workload": "flagship_cem", "layout": "time_major" if tm else "standard",
            "per_solve_ms": round(out["per_solve"] * 1e3, 3),
            "per_solve_ms_mean": round(out["per_solve_mean"] * 1e3, 3),
            "per_solve_ms_std": round(out["per_solve_std"] * 1e3, 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    # 256-agent x 1k, CEM + PSO over the agent-sharded evaluator.
    for solver in ("CEM", "PSO"):
        for tm in (False, True):
            os.environ["BENCH_MA_TIME_MAJOR"] = "1" if tm else ""
            out = bench.measure_multi_agent(args.chain, args.repeats, solver)
            rows.append({
                "workload": f"multi_agent_{solver.lower()}", "layout": out["layout"],
                "prng": out["prng"],
                "per_solve_ms": round(out["per_solve"] * 1e3, 3),
                "per_solve_ms_mean": round(out["per_solve_mean"] * 1e3, 3),
                "per_solve_ms_std": round(out["per_solve_std"] * 1e3, 3),
            })
            print(json.dumps(rows[-1]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
