"""Backend regime map: XLA scan vs Pallas fused rollout across (population, model, agents).

Measures per-solve latency of the SAME flagship-style CEM solve under both rollout backends
over a grid of population sizes, MLP widths, and agent counts, using the differential
chained-timing method (see bench.py). Emits one JSON line per (config, backend) and a final
summary line with the per-config winner — the measured decision table behind
``MPCPolicy(rollout_backend="auto")`` (:mod:`blackbox_mpc_tpu.ops.backend_select`).

  python benchmarks/backend_regimes.py [--out benchmarks/backend_regimes_r2.jsonl] [--quick]

Each new shape compiles once (~90-400 s over the tunnel, then cached); the sweep is sized to
stay under ~20 configs.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_chain(N, backend, population, hidden, agents, ensemble, horizon=50, iterations=5):
    from blackbox_mpc_tpu.core.types import Bounds
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
    from blackbox_mpc_tpu.rollout.evaluator import make_trajectory_evaluator
    from blackbox_mpc_tpu.solvers import make_solver

    reward_fn = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    bounds = Bounds.of(-1.0, 1.0, dim=6)
    solver_kw = dict(
        planning_horizon=horizon, population=population, num_agents=agents,
        num_elite=max(4, population // 20), max_iterations=iterations,
    )
    cfg = LearnedDynamicsConfig(
        dim_s=17, dim_u=6, hidden=tuple(hidden), ensemble_size=ensemble,
        propagation="mean",
    )
    init_model, dyn = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    make_fused = None
    if backend == "pallas":
        from blackbox_mpc_tpu.ops.pallas_rollout import make_pallas_rollout_evaluator

        # tile=None auto-sizes: the streamed kernel has no [H, T, U] action block (which
        # lane-padded U to 128 and capped block-kernel tiles at 256 — measured r2 sweep),
        # so it picks 512-1024 rows from the VMEM budget.
        pal = make_pallas_rollout_evaluator(cfg, reward_fn)
        make_ev = lambda dp: partial(pal, dp)  # noqa: E731
    elif backend in ("fused_cem", "fused_cem_streamed", "fused_cem_block",
                     "fused_cem_decay"):
        # Generate-in-kernel CEM. Since r3 the BLOCK kernel is the library default
        # ("fused_cem" here now means block; pre-r3 jsonl rows used "fused_cem" for the
        # streamed variant and "fused_cem_block" for block — kept accepted for re-runs).
        # "fused_cem_decay": the r4 fused population_decay path — iCEM's Pinneri 0.7
        # schedule instantiates one kernel grid per decayed per-iteration population
        # (4M, 2.8M, 1.96M, 1.37M, 0.96M at the beyond-HBM point: a 45 % rollout-budget
        # cut that previously forced decayed users back onto the (OOM) XLA path).
        from blackbox_mpc_tpu.ops.pallas_cem import make_fused_cem
        from blackbox_mpc_tpu.solvers.cem import CEMConfig

        cem_cfg = CEMConfig(**solver_kw,
                            population_decay=0.7 if backend == "fused_cem_decay" else 1.0)
        make_fused = lambda dp: make_fused_cem(  # noqa: E731
            cem_cfg, bounds, cfg, dp, reward_fn,
            streamed=(backend == "fused_cem_streamed"),
        )
        make_ev = None
    elif backend == "fused_pi2":
        from blackbox_mpc_tpu.ops.pallas_cem import make_fused_pi2
        from blackbox_mpc_tpu.solvers.pi2 import PI2Config

        pi2_kw = {k: v for k, v in solver_kw.items() if k != "num_elite"}
        make_fused = lambda dp: make_fused_pi2(  # noqa: E731
            PI2Config(**pi2_kw), bounds, cfg, dp, reward_fn
        )
        make_ev = None
    elif backend == "fused_random_search":
        from blackbox_mpc_tpu.ops.pallas_cem import make_fused_random_search
        from blackbox_mpc_tpu.solvers.random_search import RandomSearchConfig

        rs_kw = {k: v for k, v in solver_kw.items()
                 if k not in ("num_elite", "max_iterations")}
        make_fused = lambda dp: make_fused_random_search(  # noqa: E731
            RandomSearchConfig(**rs_kw), bounds, cfg, dp, reward_fn
        )
        make_ev = None
    elif backend == "fused_sep_cma":
        from blackbox_mpc_tpu.ops.pallas_cem import make_fused_sep_cma
        from blackbox_mpc_tpu.solvers.cma_es import CMAESConfig

        make_fused = lambda dp: make_fused_sep_cma(  # noqa: E731
            CMAESConfig(**solver_kw, diagonal=True), bounds, cfg, dp, reward_fn
        )
        make_ev = None
    else:
        make_ev = lambda dp: make_trajectory_evaluator(partial(dyn, dp), reward_fn)  # noqa: E731

    def chained(state, dp, obs, key):
        s = make_fused(dp) if make_fused is not None else make_solver(
            "CEM", bounds, make_ev(dp), **solver_kw
        )

        def body(carry, k):
            st, ob = carry
            action, st, aux = s.solve(st, ob, jnp.asarray(0), k)
            ob = dyn(dp, ob, action)
            return (st, ob), aux.expected_reward[0]

        (_, _), rs = jax.lax.scan(body, (state, obs), jax.random.split(key, N))
        return rs[-1]

    if make_fused is not None:
        # Every fused solver carries its OWN state type (CEMState / PI2State /
        # RandomSearchState / CMAESState) — always init through the solver itself.
        state = jax.jit(make_fused(dp).init)(jax.random.PRNGKey(1))
    else:
        s0 = make_solver("CEM", bounds, lambda a, b: jnp.zeros(()), **solver_kw)
        state = jax.jit(s0.init)(jax.random.PRNGKey(1))
    obs = jnp.zeros((agents, 17))
    return jax.jit(chained), (state, dp, obs)


def measure(backend, population, hidden, agents, ensemble, n_chain, repeats):
    totals, value = {}, None
    for N in (1, n_chain):
        jfn, (state, dp, obs) = build_chain(N, backend, population, hidden, agents, ensemble)
        v = float(jfn(state, dp, obs, jax.random.PRNGKey(9)))  # compile + warm
        if N == 1:
            value = v
        lat = []
        for k in jax.random.split(jax.random.PRNGKey(5), repeats):
            t0 = time.perf_counter()
            float(jfn(state, dp, obs, k))
            lat.append(time.perf_counter() - t0)
        totals[N] = float(np.min(lat))
    per_solve = (totals[n_chain] - totals[1]) / (n_chain - 1)
    return per_solve, value


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--only", default=None,
                   help="comma list of backends: restrict the sweep (e.g. re-measure one "
                        "new backend without paying the full grid's compile time)")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    # The sweep: small-model regimes where the fused kernel's VMEM residency can win, up to
    # the flagship shape where XLA's big-matmul pipeline is near roofline. Chain length
    # scales inversely with expected solve time so the differential (chain(N) - chain(1))
    # stays far above the tunnel-RTT jitter floor (~1 ms) even for ~100 us solves.
    grid = [
        # (population, hidden, agents, ensemble, chain, backends)
        (128, (64, 64), 1, 1, 64, ("xla", "pallas")),
        (4096, (64, 64), 1, 1, 32, ("xla", "pallas", "fused_cem")),  # fused = block kernel
        (1000, (200, 200), 1, 1, 16, ("xla", "pallas")),
        (1000, (200, 200), 16, 1, 8, ("xla", "pallas")),
        # flagship (chain 11 matches bench.py's cache) + the fused-CEM A/B: block
        # (default) vs the streamed per-step-generation variant.
        (1000, (500, 500, 500), 1, 5, 11,
         ("xla", "pallas", "fused_cem", "fused_cem_streamed")),
        # beyond-HBM: the [P, A, H, U] candidate tensor alone is 4.8 GB (x2 with the XLA
        # path's workspace copies on a 16 GB v5e) — only the generate-in-kernel fused
        # family can run this shape; measured so the capacity claims carry current numbers.
        (4_000_000, (64, 64), 1, 1, 3,
         ("fused_cem", "fused_cem_streamed", "fused_pi2", "fused_random_search",
          "fused_sep_cma", "fused_cem_decay")),
    ]
    if args.quick:
        grid = grid[:1]

    sweep = [
        (population, hidden, agents, ensemble, chain, backend)
        for population, hidden, agents, ensemble, chain, backends in grid
        for backend in backends
        if only is None or backend in only
    ]
    rows = []
    for population, hidden, agents, ensemble, chain, backend in sweep:
        try:
            per_solve, value = measure(
                backend, population, hidden, agents, ensemble, chain, args.repeats
            )
            row = {
                "backend": backend, "population": population, "hidden": list(hidden),
                "agents": agents, "ensemble": ensemble,
                "per_solve_ms": round(per_solve * 1e3, 3),
                "solves_per_s": round(1.0 / per_solve, 1),
                "chain_result": value,
                "device": str(jax.devices()[0]),
            }
        except Exception as e:  # noqa: BLE001 — record per-config failures, keep sweeping
            row = {
                "backend": backend, "population": population, "hidden": list(hidden),
                "agents": agents, "ensemble": ensemble, "error": f"{type(e).__name__}: {e}",
            }
        print(json.dumps(row), flush=True)
        rows.append(row)

    # Per-config winner summary (across every backend measured for that shape)
    winners = []
    for population, hidden, agents, ensemble, _chain, _backends in grid:
        pair = {
            r["backend"]: r for r in rows
            if (r["population"], tuple(r["hidden"]), r["agents"], r["ensemble"])
            == (population, hidden, agents, ensemble) and "per_solve_ms" in r
        }
        if len(pair) >= 2:
            times = {b: r["per_solve_ms"] for b, r in pair.items()}
            best = min(times, key=times.get)
            winners.append({
                "population": population, "hidden": list(hidden), "agents": agents,
                "ensemble": ensemble, **{f"{b}_ms": t for b, t in times.items()},
                "winner": best,
                "speedup_vs_next": round(
                    sorted(times.values())[1] / times[best], 3
                ) if len(times) > 1 else 1.0,
            })
    summary = {"summary": "backend_regimes", "winners": winners}
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
