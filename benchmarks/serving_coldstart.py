"""Serving cold-start: time-to-first-action for the three deployment paths.

Each phase runs in a FRESH python subprocess (imports, tracing, compilation all cold;
the persistent jax compilation cache is pointed at a throwaway directory so nothing
leaks between phases unless a phase is explicitly about reusing it):

1. ``live``            — import the framework, build the MPCPolicy, first ``act()``
                         (Python tracing of solver+rollout code + XLA compile).
2. ``artifact``        — ``ServingPolicy.load(.bbmpc)`` + first ``act()``
                         (no framework tracing; XLA compiles the embedded StableHLO).
3. ``artifact+xla``    — same artifact, ``compiled_cache=`` a ``save_compiled`` file
                         (no tracing, no compilation: deserialize_and_load the XLA
                         executable — device-pinned).

Measured per phase: wall time of the phase script (process start -> first action
printed) and the in-process breakdown (import / build-or-load / first act).

  python benchmarks/serving_coldstart.py [--tpu] [--out benchmarks/serving_coldstart_rN.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

_COMMON = """
import os, time
t_start = time.perf_counter()
if not {tpu}:
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COMPILATION_CACHE_DIR"] = {cache_dir!r}
import jax
if not {tpu}:
    jax.config.update("jax_platforms", "cpu")
import numpy as np
OBS = np.array([0.5, 0.1, 0.0], np.float32)
"""

_LIVE = _COMMON + """
from blackbox_mpc_tpu import MPCPolicy, DynamicsHandler
from blackbox_mpc_tpu.core.spaces import BoxSpace
from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward
t_import = time.perf_counter()
policy = MPCPolicy(
    BoxSpace.of([-2.0], [2.0]), pendulum_reward,
    DynamicsHandler(true_model=pendulum_dynamics),
    solver_name="CEM", planning_horizon={horizon}, population={population},
    num_elite=50, max_iterations=5, seed=0,
)
t_build = time.perf_counter()
action, _, _ = policy.act(OBS)
t_act = time.perf_counter()
import json as _j
print(_j.dumps({{"import_s": t_import - t_start, "build_s": t_build - t_import,
                 "first_act_s": t_act - t_build, "total_s": t_act - t_start,
                 "action": np.asarray(action).tolist()}}))
"""

_ARTIFACT = _COMMON + """
from blackbox_mpc_tpu.deploy.serving import ServingPolicy
t_import = time.perf_counter()
srv = ServingPolicy.load({artifact!r}, compiled_cache={cache!r})
t_build = time.perf_counter()
action, _, _ = srv.act(OBS)
t_act = time.perf_counter()
import json as _j
print(_j.dumps({{"import_s": t_import - t_start, "build_s": t_build - t_import,
                 "first_act_s": t_act - t_build, "total_s": t_act - t_start,
                 "used_compiled_cache": srv.used_compiled_cache,
                 "action": np.asarray(action).tolist()}}))
"""


def _run_phase(script: str, tpu: bool) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
    if not tpu:
        env["JAX_PLATFORMS"] = "cpu"
    t0 = time.perf_counter()
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, env=env, timeout=1200)
    wall = time.perf_counter() - t0
    if out.returncode != 0:  # not assert: must survive python -O
        raise RuntimeError(f"phase subprocess failed:\n{out.stderr[-3000:]}")
    row = json.loads(out.stdout.strip().splitlines()[-1])
    row["process_wall_s"] = wall
    return row


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true", help="run on the TPU (default CPU)")
    ap.add_argument("--population", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=25)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    work = tempfile.mkdtemp(prefix="bbmpc_coldstart_")
    artifact = os.path.join(work, "controller.bbmpc")
    xla_cache = os.path.join(work, "controller.xla")

    # Export once (not part of any timed phase — packaging is offline).
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
        solver_name="CEM", planning_horizon=args.horizon, population=args.population,
        num_elite=50, max_iterations=5, seed=0,
    )
    export_policy_artifact(policy, artifact, dim_s=3)
    ServingPolicy.load(artifact).save_compiled(xla_cache)
    device = str(jax.devices()[0])

    fmt = dict(tpu=args.tpu, horizon=args.horizon, population=args.population)
    rows = []
    for phase, script in (
        ("live", _LIVE.format(cache_dir=os.path.join(work, "jc_live"), artifact="",
                              cache="", **fmt)),
        ("artifact", _ARTIFACT.format(cache_dir=os.path.join(work, "jc_art"),
                                      artifact=artifact, cache=None, **fmt)),
        ("artifact+xla_cache", _ARTIFACT.format(cache_dir=os.path.join(work, "jc_axc"),
                                                artifact=artifact, cache=xla_cache, **fmt)),
    ):
        row = {"phase": phase, "device": device, "population": args.population,
               "horizon": args.horizon, **_run_phase(script, args.tpu)}
        rows.append(row)
        print(json.dumps(row))

    # all three paths must produce the SAME first action (identical seed/state/stream)
    import numpy as np

    actions = [np.asarray(r["action"], np.float32) for r in rows]
    if not all(np.array_equal(actions[0], a) for a in actions[1:]):
        raise RuntimeError(f"phases disagree on the first action: {actions}")
    if args.out:
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
