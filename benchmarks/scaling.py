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
    p.add_argument("--config", choices=["multi_agent", "sharded"], default="multi_agent")
    p.add_argument("--agents", type=int, default=256)
    p.add_argument("--population", type=int, default=1000)
    p.add_argument("--horizon", type=int, default=50)
    p.add_argument("--iterations", type=int, default=5)
    p.add_argument("--devices", type=int, default=0, help="mesh size (0 = all)")
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--hidden", type=int, nargs="+", default=[200, 200])
    p.add_argument("--solver", default="CEM")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

    from blackbox_mpc_tpu.core.types import Bounds
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
    from blackbox_mpc_tpu.rollout.evaluator import make_trajectory_evaluator
    from blackbox_mpc_tpu.solvers import make_solver

    dim_s, dim_u = 17, 6
    agents = args.agents if args.config == "multi_agent" else 1
    cfg = LearnedDynamicsConfig(dim_s=dim_s, dim_u=dim_u, hidden=tuple(args.hidden))
    init_model, dynamics_fn = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    bounds = Bounds.of(-1.0, 1.0, dim=dim_u)

    def reward_fn(s, a, ns):
        return ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)

    solver_kwargs = dict(
        planning_horizon=args.horizon,
        population=args.population,
        num_agents=agents,
        max_iterations=args.iterations,
    )
    if args.solver in ("CEM", "CMA-ES"):
        solver_kwargs["num_elite"] = max(10, args.population // 20)

    mesh = None
    if args.config == "sharded":
        from blackbox_mpc_tpu.parallel import make_pop_mesh

        mesh = make_pop_mesh(args.devices or None)

    def make_chain(N):
        def chained(state, dp, obs, key):
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

            (_, _), rs = jax.lax.scan(body, (state, obs), jax.random.split(key, N))
            return rs[-1]

        return jax.jit(chained)

    s0 = make_solver(args.solver, bounds, lambda a, b: jnp.zeros(()), **solver_kwargs)
    state = jax.jit(s0.init)(jax.random.PRNGKey(1))
    obs = jnp.zeros((agents, dim_s))
    totals = {}
    for N in (1, args.chain):
        jfn = make_chain(N)
        float(jfn(state, dp, obs, jax.random.PRNGKey(9)))
        lat = []
        for k in jax.random.split(jax.random.PRNGKey(5), args.repeats):
            t0 = time.perf_counter()
            float(jfn(state, dp, obs, k))
            lat.append(time.perf_counter() - t0)
        totals[N] = float(np.min(lat))
    per_solve = (totals[args.chain] - totals[1]) / (args.chain - 1)
    traj_steps = args.population * agents * args.horizon * args.iterations
    print(
        json.dumps(
            {
                "config": args.config,
                "solver": args.solver,
                "agents": agents,
                "population": args.population,
                "devices": len(mesh.devices.flat) if mesh is not None else 1,
                "per_solve_ms": round(per_solve * 1e3, 3),
                "solves_per_s": round(1.0 / per_solve, 2),
                "trajectory_steps_per_s": round(traj_steps / per_solve, 0),
                "device_kind": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
