"""Scaling benchmarks beyond the headline bench.py metric.

Covers the remaining BASELINE.json configs measurable on available hardware:
  #4  multi-agent vectorized MPC (e.g. 256 agents x 1k samples, CEM on learned model)
  #5  population-sharded solve over a device mesh (one chip: sharding overhead at n=1;
      a pod: scaling efficiency; a virtual CPU mesh: correctness/plumbing)

Uses the same differential chained-timing methodology as bench.py (see docs/performance.md):
marginal per-solve cost inside a data-dependent lax.scan MPC loop, so tunnel round-trips
cancel.

Usage:
  python benchmarks/scaling.py --config multi_agent --agents 256 --population 1000
  python benchmarks/scaling.py --config sharded --devices 8

Multi-host weak scaling (BASELINE config #5) — run the SAME command on every host of a pod
slice (all jax.distributed args auto-detect under standard TPU orchestration), or launch N
local processes with explicit flags to validate on CPU:

  python benchmarks/scaling.py --config multihost --population-per-device 12500
  python benchmarks/scaling.py --config multihost --coordinator localhost:9999 \
      --num-processes 2 --process-id $i          # + JAX_PLATFORMS=cpu for a CPU rehearsal

Population scales with the global device count (weak scaling): constant per-solve latency
== 100% scaling efficiency; process 0 prints the JSON line with the measured efficiency
denominator (per-solve time at this world size; compare runs at different sizes).
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--config", choices=["multi_agent", "sharded", "multihost"], default="multi_agent"
    )
    p.add_argument("--coordinator", default=None, help="host:port (multihost; auto on pods)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument(
        "--population-per-device", type=int, default=None,
        help="multihost weak scaling: population = this * global device count",
    )
    p.add_argument("--agents", type=int, default=256)
    p.add_argument("--population", type=int, default=1000)
    p.add_argument("--horizon", type=int, default=50)
    p.add_argument("--iterations", type=int, default=5)
    p.add_argument("--devices", type=int, default=0, help="mesh size (0 = all)")
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--hidden", type=int, nargs="+", default=[200, 200])
    p.add_argument("--ensemble", type=int, default=1)
    p.add_argument("--solver", default="CEM")
    p.add_argument("--diagonal", action="store_true", help="CMA-ES: sep-CMA (diagonal C)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # CPU rehearsal of the pod harness (sitecustomize force-registers the TPU plugin).
        jax.config.update("jax_platforms", "cpu")
    if args.config == "multihost":
        from blackbox_mpc_tpu.parallel.multihost import initialize_multihost

        initialize_multihost(args.coordinator, args.num_processes, args.process_id)

    os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

    from blackbox_mpc_tpu.core.types import Bounds
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
    from blackbox_mpc_tpu.rollout.evaluator import make_trajectory_evaluator
    from blackbox_mpc_tpu.solvers import make_solver

    dim_s, dim_u = 17, 6
    agents = args.agents if args.config == "multi_agent" else 1
    if args.config == "multihost" and args.population_per_device:
        args.population = args.population_per_device * jax.device_count()
    cfg = LearnedDynamicsConfig(dim_s=dim_s, dim_u=dim_u, hidden=tuple(args.hidden),
                            ensemble_size=args.ensemble)
    init_model, dynamics_fn = make_learned_dynamics(cfg)
    # NOTE: the model params are created INSIDE the traced chain (make_chain) so the
    # zero-array-input design holds; no eager init here (it would be dead device work,
    # once per process on multihost runs).
    bounds = Bounds.of(-1.0, 1.0, dim=dim_u)

    def reward_fn(s, a, ns):
        return ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)

    solver_kwargs = dict(
        planning_horizon=args.horizon,
        population=args.population,
        num_agents=agents,
        max_iterations=args.iterations,
    )
    if args.solver in ("CEM", "CEM-GD", "CMA-ES"):
        solver_kwargs["num_elite"] = max(10, args.population // 20)
    if args.solver == "CMA-ES" and args.diagonal:
        solver_kwargs["diagonal"] = True

    mesh = None
    if args.config == "sharded":
        from blackbox_mpc_tpu.parallel import make_pop_mesh

        mesh = make_pop_mesh(args.devices or None)
    elif args.config == "multihost":
        from blackbox_mpc_tpu.parallel import make_pop_mesh

        mesh = make_pop_mesh()  # all GLOBAL devices across processes

    def make_chain(N):
        # Zero array inputs except the key: solver state / model params / obs are created
        # inside the traced program, so the identical XLA program runs under any process
        # topology (multi-process jit cannot take process-local host arrays). The constant
        # init work cancels in the differential (chain(N) - chain(1)) timing.
        def chained(key):
            dp = init_model(jax.random.PRNGKey(0))
            if mesh is not None:
                from blackbox_mpc_tpu.parallel import make_sharded_evaluator

                evaluate = make_sharded_evaluator(partial(dynamics_fn, dp), reward_fn, mesh)
            else:
                evaluate = make_trajectory_evaluator(partial(dynamics_fn, dp), reward_fn)
            s = make_solver(args.solver, bounds, evaluate, **solver_kwargs)

            def body(carry, k):
                st, ob = carry
                action, st, aux = s.solve(st, ob, jnp.asarray(0), k)
                ob = dynamics_fn(dp, ob, action)
                return (st, ob), aux.expected_reward[0]

            state = s.init(jax.random.PRNGKey(1))
            obs = jnp.zeros((agents, dim_s))
            (_, _), rs = jax.lax.scan(body, (state, obs), jax.random.split(key, N))
            return rs[-1]

        return jax.jit(chained)

    multiproc = args.config == "multihost" and jax.process_count() > 1
    if multiproc:
        from blackbox_mpc_tpu.parallel.multihost import fetch_replicated, replicate_to_global

        def run(jfn, seed):
            key = replicate_to_global(np.asarray(jax.random.PRNGKey(seed)), mesh)
            return float(fetch_replicated(jfn(key)))
    else:

        def run(jfn, seed):
            return float(jfn(jax.random.PRNGKey(seed)))

    if args.chain < 2:
        raise SystemExit("--chain must be >= 2 (differential timing)")
    totals = {}
    for N in (1, args.chain):
        jfn = make_chain(N)
        run(jfn, 9)  # compile
        lat = []
        for r in range(args.repeats):
            t0 = time.perf_counter()
            run(jfn, 100 + r)
            lat.append(time.perf_counter() - t0)
        totals[N] = float(np.min(lat))
    per_solve = (totals[args.chain] - totals[1]) / (args.chain - 1)
    traj_steps = args.population * agents * args.horizon * args.iterations
    if not multiproc or jax.process_index() == 0:
        print(
            json.dumps(
                {
                    "config": args.config,
                    "solver": args.solver + (" (sep/diagonal)" if args.diagonal else ""),
                    "agents": agents,
                    "population": args.population,
                    "devices": len(mesh.devices.flat) if mesh is not None else 1,
                    "processes": jax.process_count(),
                    "per_solve_ms": round(per_solve * 1e3, 3),
                    "solves_per_s": round(1.0 / per_solve, 2),
                    "trajectory_steps_per_s": round(traj_steps / per_solve, 0),
                    "device_kind": str(jax.devices()[0]),
                }
            )
        )


if __name__ == "__main__":
    main()
