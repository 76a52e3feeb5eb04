"""Decompose the 256-agent x 1k-candidate CEM solve (BASELINE config #4, BENCH multi_agent).

Round-3 verdict weak-spot #1: this shape ran at 147.97 ms/solve ~= 21 % MFU while being
called "compute-bound" with no profile. This script measures WHERE the time goes and which
lever recovers it, on real hardware, via the differential chained-timing method (bench.py):

Variants (same solve: CEM, A=256, P=1000, H=50, 5 iters, MLP 200^2 on S=17/U=6):
  xla-f32-sharded   the r3 bench path — make_sharded_evaluator(shard_axis="agents") on a
                    1-device mesh (shard_map constraints active)
  xla-f32           plain make_trajectory_evaluator, no mesh — isolates constraint overhead
  xla-bf16          compute_dtype=bfloat16 — halves HBM traffic of the [256k, 200]
                    activations (205 MB each in f32, 2 per step) AND runs the MXU at its
                    native bf16 rate
  pallas-f32 /      streamed rollout kernel — activations never leave VMEM; only actions
  pallas-bf16       [P*A, H, U] + rewards cross HBM
  fused-f32         generate-in-kernel CEM (ops/pallas_cem.py) — not even the candidate
                    tensor is materialized; the only HBM tensor is the [P, A] reward vector

Also times an evaluator-only ablation (5 evaluations of a FIXED candidate tensor per
"solve") for the XLA paths: solve minus evaluator = sampler + top_k + moment update.

Roofline context printed per variant: analytic MXU FLOPs (6.144 TFLOP/solve), a naive
per-layer HBM traffic estimate for the XLA path, and MFU against the device bf16 peak.

Run ON TPU (one process at a time — the axon tunnel serializes):
  python benchmarks/multiagent_profile.py --variants xla-f32-sharded,xla-f32,xla-bf16
  python benchmarks/multiagent_profile.py --variants pallas-bf16,fused-f32
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

AGENTS, POP, HORIZON, ITERS = 256, 1000, 50, 5
HIDDEN = (200, 200)
DIM_S, DIM_U = 17, 6


def _flops_per_solve() -> int:
    return (
        2 * ((DIM_S + DIM_U) * HIDDEN[0] + HIDDEN[0] * HIDDEN[1] + HIDDEN[1] * DIM_S)
        * POP * AGENTS * HORIZON * ITERS
    )


FLOPS_PER_SOLVE = _flops_per_solve()
_PEAK_TFLOPS = {"v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0, "v4": 275.0, "v6": 918.0}


def _build(variant: str, n_chain: int, evaluator_only: bool = False):
    from blackbox_mpc_tpu.core.types import Bounds
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
    from blackbox_mpc_tpu.rollout.evaluator import make_trajectory_evaluator
    from blackbox_mpc_tpu.solvers import make_solver

    reward_fn = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    bounds = Bounds.of(-1.0, 1.0, dim=DIM_U)
    dtype = jnp.bfloat16 if "bf16" in variant else jnp.float32
    cfg = LearnedDynamicsConfig(
        dim_s=DIM_S, dim_u=DIM_U, hidden=HIDDEN, ensemble_size=1, compute_dtype=dtype
    )
    init_model, dyn = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    solver_kw = dict(planning_horizon=HORIZON, population=POP, num_agents=AGENTS,
                     num_elite=50, max_iterations=ITERS)

    if variant.startswith("fused"):
        from blackbox_mpc_tpu.ops.pallas_cem import make_fused_cem
        from blackbox_mpc_tpu.solvers.cem import CEMConfig

        # variant may carry a tile override: "fused-f32-t1024"
        tile = 256
        if "-t" in variant:
            tile = int(variant.rsplit("-t", 1)[1])
        ccfg = CEMConfig(**solver_kw)
        solver = make_fused_cem(ccfg, bounds, cfg, dp, reward_fn, tile=tile,
                                interpret=jax.default_backend() != "tpu")

        def chained(state, dp_, obs, key):
            def body(carry, k):
                st, ob = carry
                action, st, aux = solver.solve(st, ob, jnp.asarray(0), k)
                ob = dyn(dp_, ob, action)
                return (st, ob), aux.expected_reward[0]

            (_, _), rs = jax.lax.scan(body, (state, obs), jax.random.split(key, n_chain))
            return rs[-1]

        state = jax.jit(solver.init)(jax.random.PRNGKey(1))
        obs = jnp.zeros((AGENTS, DIM_S))
        return jax.jit(chained), (state, dp, obs)

    if variant.startswith("pallas"):
        from blackbox_mpc_tpu.ops.pallas_rollout import make_pallas_rollout_evaluator

        pal = make_pallas_rollout_evaluator(
            cfg, reward_fn, interpret=jax.default_backend() != "tpu"
        )
        make_ev = lambda dp_: partial(pal, dp_)  # noqa: E731
    elif variant.endswith("sharded"):
        from blackbox_mpc_tpu.parallel import make_pop_mesh, make_sharded_evaluator

        mesh = make_pop_mesh(len(jax.devices()))
        make_ev = lambda dp_: make_sharded_evaluator(  # noqa: E731
            partial(dyn, dp_), reward_fn, mesh, shard_axis="agents"
        )
    else:
        make_ev = lambda dp_: make_trajectory_evaluator(partial(dyn, dp_), reward_fn)  # noqa: E731

    if evaluator_only:
        # ITERS evaluations of a fixed candidate tensor, chained by a data dependency
        # through the initial state — the rollout cost with zero solver overhead. The
        # candidate tensor rides in the "state" argument slot: closing over a 307 MB
        # jnp constant embeds it in the compile payload (HTTP 413 on the axon tunnel)
        # AND degrades every later dispatch (see .claude/skills/verify gotchas).
        acts = jax.random.uniform(
            jax.random.PRNGKey(7), (POP, AGENTS, HORIZON, DIM_U), minval=-1, maxval=1
        )

        def chained_ev(acts_, dp_, obs, key):
            ev = make_ev(dp_)

            def body(ob, _):
                # data dependency BETWEEN the ITERS evals (ob update feeds the next one),
                # or XLA CSE collapses identical calls into a single evaluation.
                for _ in range(ITERS):
                    r = ev(ob, acts_)
                    ob = ob + 1e-6 * jnp.mean(r, axis=0, keepdims=True).T[:, :1]
                return ob, jnp.max(r)

            ob, rs = jax.lax.scan(body, obs, jnp.arange(n_chain))
            return rs[-1]

        obs = jnp.zeros((AGENTS, DIM_S))
        return jax.jit(chained_ev), (acts, dp, obs)

    def chained(state, dp_, obs, key):
        s = make_solver("CEM", bounds, make_ev(dp_), **solver_kw)

        def body(carry, k):
            st, ob = carry
            action, st, aux = s.solve(st, ob, jnp.asarray(0), k)
            ob = dyn(dp_, ob, action)
            return (st, ob), aux.expected_reward[0]

        (_, _), rs = jax.lax.scan(body, (state, obs), jax.random.split(key, n_chain))
        return rs[-1]

    s0 = make_solver("CEM", bounds, lambda a, b: jnp.zeros(()), **solver_kw)
    state = jax.jit(s0.init)(jax.random.PRNGKey(1))
    obs = jnp.zeros((AGENTS, DIM_S))
    return jax.jit(chained), (state, dp, obs)


def _measure(variant: str, n_chain: int, repeats: int, evaluator_only=False) -> dict:
    totals = {}
    for N in (1, n_chain):
        jfn, (state, dp, obs) = _build(variant, N, evaluator_only)
        t0 = time.perf_counter()
        float(jfn(state, dp, obs, jax.random.PRNGKey(9)))
        compile_s = time.perf_counter() - t0
        lat = []
        for k in jax.random.split(jax.random.PRNGKey(5), repeats):
            t0 = time.perf_counter()
            float(jfn(state, dp, obs, k))
            lat.append(time.perf_counter() - t0)
        totals[N] = (float(np.min(lat)), lat, compile_s)
    base = totals[1][0]
    samples = [(t - base) / (n_chain - 1) for t in totals[n_chain][1]]
    per_solve = (totals[n_chain][0] - base) / (n_chain - 1)
    return dict(per_solve_ms=round(per_solve * 1e3, 3),
                per_solve_ms_mean=round(float(np.mean(samples)) * 1e3, 3),
                per_solve_ms_std=round(float(np.std(samples, ddof=1)) * 1e3, 3)
                if len(samples) > 1 else 0.0,
                compile_s=round(totals[n_chain][2], 1))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variants",
                   default="xla-f32-sharded,xla-f32,xla-bf16,pallas-f32,pallas-bf16,fused-f32")
    p.add_argument("--chain", type=int, default=4)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--evaluator-ablation", action="store_true",
                   help="also time evaluator-only chains for the xla variants")
    p.add_argument("--hidden", type=int, nargs=2, default=None, metavar=("W1", "W2"),
                   help="override the MLP widths (r5 aligned-geometry study: the "
                        "23->200->200->17 reference geometry pads every matmul to "
                        "128-lane tiles; 128/256 are MXU-aligned)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    if args.hidden is not None:
        global HIDDEN, FLOPS_PER_SOLVE
        HIDDEN = tuple(args.hidden)
        FLOPS_PER_SOLVE = _flops_per_solve()

    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in _PEAK_TFLOPS.items() if k in kind), None)
    # Naive HBM roofline for the XLA f32 path: per scan step the two [P*A, 200] hidden
    # activations each cross HBM twice (write + next matmul's read) and the state/output
    # once — activations are ~60x too large for VMEM residency.
    rows = POP * AGENTS
    f32_bytes_per_step = 4 * rows * (2 * 2 * HIDDEN[0] + (DIM_S + DIM_U) + 2 * DIM_S)
    rows_out = []
    for variant in [v.strip() for v in args.variants.split(",") if v.strip()]:
        r = _measure(variant, args.chain, args.repeats)
        ms = r["per_solve_ms"]
        tflops = FLOPS_PER_SOLVE / (ms / 1e3) / 1e12
        row = {
            "variant": variant, "hidden": list(HIDDEN), **r,
            "achieved_tflops_per_s": round(tflops, 1),
            "mfu_pct_of_peak": round(100 * tflops / peak, 1) if peak else None,
            "tflop_per_solve": round(FLOPS_PER_SOLVE / 1e12, 3),
        }
        if variant.startswith("xla"):
            bytes_mult = 0.5 if "bf16" in variant else 1.0
            bw_bound_ms = (f32_bytes_per_step * bytes_mult * HORIZON * ITERS) / 819e9 * 1e3
            row["naive_hbm_roofline_ms"] = round(bw_bound_ms, 1)
        if args.evaluator_ablation and variant.startswith("xla"):
            ev = _measure(variant, args.chain, args.repeats, evaluator_only=True)
            row["evaluator_only_ms"] = ev["per_solve_ms"]
            row["solver_overhead_ms"] = round(ms - ev["per_solve_ms"], 3)
        print(json.dumps(row), flush=True)
        rows_out.append(row)
    if args.out:
        with open(args.out, "a") as f:
            for row in rows_out:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
