"""SPSA flagship cost A/B: time-major layout x rollout budget (VERDICT r4 #4).

The r1 solver-comparison table put SPSA at 17.0 ms/solve vs CEM's 8.9 on the flagship
workload and the r4 verdict flagged two open questions: (a) is the 2x cost an
inefficiency of the 2P concatenated eval, or simply double the rollout budget
(``population`` counts perturbation PAIRS, so pop=1000 evaluates 2000 trajectories/iter
vs CEM's 1000 — reference semantics, /root/reference/blackbox_mpc/optimizers/spsa.py:94-96);
(b) what does the r5 ``SPSAConfig(time_major=True)`` layout recover?

This script answers both with the bench.py differential chained-timing methodology on
one chip: pop in {500 (matched 1000-rollout budget), 1000 (r1 configuration)} x
time_major in {False, True}.

  python benchmarks/spsa_cost.py [--chain 6] [--repeats 5] \
      [--out benchmarks/spsa_cost_r5.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: build_chain + timing helpers)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--out", default="benchmarks/spsa_cost_r5.jsonl")
    args = p.parse_args()

    import jax

    device_kind = jax.devices()[0].device_kind
    rows = []
    for pop in (500, 1000):
        for tm in (False, True):
            kw = dict(planning_horizon=50, population=pop, num_agents=1,
                      max_iterations=5, time_major=tm)
            jfn1, a1 = bench.build_chain(1, "xla", solver="SPSA", solver_kw=kw)
            jfnN, aN = bench.build_chain(args.chain, "xla", solver="SPSA", solver_kw=kw)
            lat1 = bench._timed_repeats(jfn1, a1, args.repeats)
            latN = bench._timed_repeats(jfnN, aN, args.repeats)
            d = bench._differential(lat1, latN, args.chain)
            row = {
                "solver": "SPSA", "population_pairs": pop,
                "rollouts_per_iter": 2 * pop, "time_major": tm,
                "per_solve_ms": round(d["per_solve"] * 1e3, 3),
                "per_solve_ms_mean": round(d["per_solve_mean"] * 1e3, 3),
                "per_solve_ms_std": round(d["per_solve_std"] * 1e3, 3),
                "workload": "H=50 ensemble=5 mlp 3x500 iters=5 (flagship)",
                "device_kind": device_kind,
            }
            print(json.dumps(row), flush=True)
            rows.append(row)
    if args.out:
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
