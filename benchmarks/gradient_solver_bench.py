"""Gradient (first-order) vs CEM solver cost on the flagship workload, one real TPU chip.

Differential chained timing (see bench.py): N data-chained solves inside one jit, scalar
readback, minus the N=1 time. Both solvers plan over the same 5-member MLP(3x500) ensemble,
H=50, S=17/U=6. The gradient solver's work is restarts x Adam-iters x (forward+backward)
rollouts; CEM's is population x iters forward rollouts — this measures whether exact
gradients buy a cheaper solve than a 1000-candidate sampled search at flagship scale.

Run: python benchmarks/gradient_solver_bench.py            (real TPU via axon)
Output: one JSONL row per config appended to benchmarks/results_current.jsonl (historical round files results_r{2,3}.jsonl are frozen).
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import jax

from _flagship_chain import measure, temp_memory_bytes  # noqa: E402  (shared harness)


def main():
    device = jax.devices()[0].device_kind
    out = os.path.join(_HERE, "results_current.jsonl")
    rows = []
    configs = [
        ("CEM", dict(planning_horizon=50, population=1000, num_agents=1, num_elite=50,
                     max_iterations=5), "pop=1000 iters=5", None),
        ("Gradient", dict(planning_horizon=50, population=16, num_agents=1,
                          max_iterations=20, learning_rate=0.1), "restarts=16 adam=20", None),
        ("Gradient", dict(planning_horizon=50, population=64, num_agents=1,
                          max_iterations=20, learning_rate=0.1), "restarts=64 adam=20", None),
        ("Gradient", dict(planning_horizon=50, population=16, num_agents=1,
                          max_iterations=5, learning_rate=0.2), "restarts=16 adam=5", None),
        ("CEM-GD", dict(planning_horizon=50, population=1000, num_agents=1, num_elite=50,
                        max_iterations=5), "pop=1000 iters=5 + polish 9x10", None),
        # iCEM decay: same pop=1000 start, iteration i samples max(int(1000*0.6^i), 100)
        # = 1000+600+360+215+129 = 2304 total rollouts vs CEM's 5000 at the same
        # iteration count.
        ("CEM", dict(planning_horizon=50, population=1000, num_agents=1, num_elite=50,
                     max_iterations=5, population_decay=0.6, execute_best=True),
         "pop=1000 iters=5 decay=0.6 (iCEM)", None),
        # Remat pair: a big restart cloud differentiated through the H=50 rollout. Without
        # remat the backward stores every MLP activation (H x restarts x 3x500 floats);
        # with remat only per-step carries persist. temp_bytes quantifies the HBM headroom
        # the checkpoint buys; per_solve_ms quantifies the extra-forward cost.
        ("Gradient", dict(planning_horizon=50, population=1024, num_agents=1,
                          max_iterations=10, learning_rate=0.1),
         "restarts=1024 adam=10", dict(remat=False)),
        ("Gradient", dict(planning_horizon=50, population=1024, num_agents=1,
                          max_iterations=10, learning_rate=0.1),
         "restarts=1024 adam=10 remat", dict(remat=True)),
    ]
    with open(out, "a") as f:
        for name, kw, label, ekw in configs:
            per_solve = measure(name, kw, evaluator_kw=ekw)
            row = {
                "bench": "gradient_vs_cem_flagship",
                "solver": name,
                "workload": label,
                "per_solve_ms": round(per_solve * 1e3, 3),
                "solves_per_s": round(1.0 / per_solve, 1),
                "device": device,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            if ekw is not None:
                temp = temp_memory_bytes(name, kw, ekw)
                if temp is not None:
                    row["temp_bytes"] = temp
            rows.append(row)
            f.write(json.dumps(row) + "\n")
            print(json.dumps(row))


if __name__ == "__main__":
    main()
