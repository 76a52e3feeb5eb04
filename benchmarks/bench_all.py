"""Runs the full benchmark suite and writes one consolidated JSON report.

  python benchmarks/bench_all.py [--out report.json] [--quick]

Covers: flagship solves/s (bench.py methodology), multi-agent vectorized MPC, big-population
solve, control-loop rollouts/s, env-transport comparison. Each section is independently
fault-isolated — a failing section records its error instead of killing the run.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_json(cmd, timeout=1800, env=None):
    """Runs a command, returns its JSON stdout rows: a dict for single-row benches, a
    list for multi-row comparison benches (gradient_vs_cem, device_episode print one
    row per config — keeping only the last would drop the comparison)."""
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, cwd=ROOT, env=full_env
    )
    rows = []
    for line in proc.stdout.strip().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    if not rows:
        raise RuntimeError(
            f"no JSON output from {cmd}: {proc.stdout[-500:]} {proc.stderr[-500:]}"
        )
    return rows[0] if len(rows) == 1 else rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--quick", action="store_true", help="smaller workloads / fewer repeats")
    p.add_argument("--repeats", type=int, default=5,
                   help="timing repeats per section (ignored by --quick, which uses 2); "
                        "the committed report must carry >=5 (VERDICT r4 #8)")
    args = p.parse_args()
    py = sys.executable
    rep = "2" if args.quick else str(args.repeats)
    report = {"timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
              "repeats": 2 if args.quick else args.repeats, "sections": {}}

    sections = {
        "flagship": ([py, "bench.py"],
                     {"BENCH_REPEATS": "2" if args.quick else str(args.repeats)}),
        "multi_agent": (
            [py, "benchmarks/scaling.py", "--config", "multi_agent",
             "--agents", "64" if args.quick else "256", "--population", "1000",
             "--chain", "4", "--repeats", rep],
            None,
        ),
        "big_population": (
            [py, "benchmarks/scaling.py", "--config", "multi_agent", "--agents", "1",
             "--population", "20000" if args.quick else "100000",
             "--chain", "4", "--repeats", rep, "--hidden", "200", "200"],
            None,
        ),
        "rollouts_cpu": (
            [py, "benchmarks/rollouts_bench.py", "--cpu", "--envs", "8",
             "--backend", "native", "--steps", "50" if args.quick else "100"],
            None,
        ),
        "rollouts_accel": (
            [py, "benchmarks/rollouts_bench.py", "--envs", "8", "--backend", "native",
             "--steps", "50" if args.quick else "100"],
            None,
        ),
        "rollouts_overlap_cpu": (
            [py, "benchmarks/rollouts_bench.py", "--cpu", "--envs", "4",
             "--backend", "subprocess", "--steps", "40" if args.quick else "60",
             "--overlap", "--spec-tol", "0.01"],
            None,
        ),
        "gradient_vs_cem": (
            [py, "benchmarks/gradient_solver_bench.py"],
            None,
        ),
        "device_episode": (
            [py, "benchmarks/device_episode_bench.py"],
            None,
        ),
        "icem_quality": (
            [py, "benchmarks/icem_quality.py", "--steps", "120" if args.quick else "250",
             "--seeds", "1" if args.quick else "3"],
            None,
        ),
        "serving_latency": (
            [py, "benchmarks/serving_latency.py",
             "--steps", "20" if args.quick else "50"],
            None,
        ),
        "sep_cma_flagship": (
            [py, "benchmarks/scaling.py", "--config", "multi_agent", "--agents", "1",
             "--population", "1000", "--hidden", "500", "500", "500", "--ensemble", "5",
             "--solver", "CMA-ES", "--diagonal", "--chain", "4", "--repeats", rep],
            None,
        ),
    }
    for name, (cmd, env) in sections.items():
        t0 = time.time()
        try:
            result = run_json(cmd, env=env)
        except Exception as e:  # noqa: BLE001
            result = {"error": str(e)[:400]}
        if isinstance(result, list):
            result = {"rows": result}
        report["sections"][name] = result
        report["sections"][name]["wall_s"] = round(time.time() - t0, 1)
        print(f"[{name}] {json.dumps(report['sections'][name])[:200]}", flush=True)

    out = args.out or os.path.join(ROOT, "benchmarks", "bench_all_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"report": out, "sections": list(report["sections"])}))


if __name__ == "__main__":
    main()
