"""Measured rollout-backend auto-selection (``MPCPolicy(rollout_backend="auto")``).

Decision rule distilled from the regime sweep in ``benchmarks/backend_regimes.py``, round-3
hardware run (``benchmarks/backend_regimes_r3.jsonl``, one v5e chip, the STREAMED kernel
rewrites included): **the XLA scan path wins every shape that fits in HBM, definitively** —
1.8x at pop=128/MLP-64^2 (0.298 vs 0.539 ms), 2.6-5.5x at mid-size shapes, 1.07x at the
flagship pop=1000/5-member-500^3 (8.81 vs 9.46 ms best-kernel). The round-2 streamed
rewrites narrowed the gap substantially (e.g. pop=1000/200^2: 2.75 -> 1.62 ms) but flip no
regime: the kernels are **capacity-only**, by measurement across two rounds. Both backends
produce bit-identical chained-solve results on hardware (``chain_result`` fields).

What the fused kernels uniquely provide is capacity: the generate-in-kernel fused CEM
(:mod:`~blackbox_mpc_tpu.ops.pallas_cem`) never materializes the candidate tensor, so
populations whose [P, A, H, U] tensor exceeds HBM route there automatically (measured r3:
4M candidates — a 4.8 GB x2 tensor on a 16 GB v5e — solve in 3.46 s, 289M traj-steps/s).
Within the fused CEM the BLOCK kernel beats the streamed one everywhere measured (3.46 vs
5.74 s at 4M; 9.46 vs 10.17 ms at the flagship): per-step candidate generation pads U=6
lanes to 128 on the VPU (~95% waste in the RNG), while the block kernel synthesizes fully
packed [T, H*U] noise — so ``make_fused_cem`` defaults to the block kernel.
"""
from __future__ import annotations

from typing import Optional

__all__ = ["choose_backend", "PALLAS_MAX_WIDTH", "PALLAS_MAX_ROWS", "FUSED_CEM_MIN_BYTES"]

# Measured r2 sweep (benchmarks/backend_regimes_r2.jsonl): the plain pallas rollout kernel
# won NO mainstream shape, so auto never picks it (both 0 => the width/rows gate is never
# satisfied). Kept as tunables so a future-hardware re-measurement can re-enable the regime
# without code changes; `rollout_backend="pallas"` remains available explicitly.
PALLAS_MAX_WIDTH = 0
PALLAS_MAX_ROWS = 0

# Candidate tensors beyond this are at risk of exhausting HBM (v5e: 16 GB; the XLA path
# materializes [P, A, H, U] plus transposed/workspace copies): route CEM to the fused
# generate-in-kernel solver (ops/pallas_cem.py), which never materializes candidates and has
# solved 8M-candidate populations on one chip (docs/performance.md "Beyond-HBM populations").
FUSED_CEM_MIN_BYTES = 4 * 1024**3


def choose_backend(
    config,  # LearnedDynamicsConfig | None (None == analytic true model)
    population: int,
    num_agents: int,
    mesh: Optional[object] = None,
    platform: Optional[str] = None,
    horizon: int = 0,
    dim_u: int = 0,
    solver_name: str = "",
    solver_config: Optional[object] = None,
) -> str:
    """Returns "pallas", "fused_cem", or "xla" for the given solve configuration.

    Mirrors the eligibility gates of :func:`~blackbox_mpc_tpu.ops._kernel_common.
    check_kernel_support` plus the measured performance regimes; never raises.
    ``platform`` defaults to the active JAX backend — the Mosaic kernels only compile on
    TPU, so anything else selects "xla".
    """
    if platform is None:
        import jax

        platform = jax.default_backend()
    if platform != "tpu" or config is None:
        return "xla"
    if getattr(config, "probabilistic", False):
        return "xla"
    if config.ensemble_size > 1 and config.propagation not in ("mean", "ts1"):
        return "xla"
    if config.activation not in ("tanh", "relu", "gelu"):
        return "xla"
    time_major = bool(getattr(solver_config, "time_major", False))
    rows = population * num_agents
    if (
        mesh is None
        and not time_major  # the kernel candidate contracts are population-major
        and PALLAS_MAX_WIDTH
        and max(config.hidden) <= PALLAS_MAX_WIDTH
        and rows <= PALLAS_MAX_ROWS
        # the rollout kernel's ts1 member-major permutation needs rows % E == 0
        and not (config.propagation == "ts1" and config.ensemble_size > 1
                 and rows % config.ensemble_size)
    ):
        return "pallas"
    # Beyond-HBM populations: only the generate-in-kernel fused family can run them at
    # all. iCEM colored noise, keep_elites, mean-as-candidate, execute-best, and ts1 are
    # in-kernel features since round 3 (ops/pallas_cem.py); the counter budget for colored
    # noise is (H+2)*U per row (the spectral G block) instead of H*U. With a mesh the
    # capacity threshold is PER DEVICE (ops/fused_sharded.py: each chip runs the kernels
    # on its population shard), so "beyond-HBM" means beyond D x HBM.
    n_devices = 1
    if mesh is not None:
        from blackbox_mpc_tpu.parallel.mesh import POP_AXIS

        try:
            n_devices = int(mesh.shape[POP_AXIS])
        except Exception:  # noqa: BLE001 — meshes without a pop axis cannot back the
            return "xla"   # sharded fused path (fused_sharded._mesh_size would raise)
        if population % n_devices:
            return "xla"
    local_rows = rows // n_devices
    candidate_bytes = local_rows * horizon * dim_u * 4
    rng_cols = (
        ((horizon // 2 + 1) * 2) * dim_u
        if getattr(solver_config, "colored_noise_beta", 0.0) > 0.0
        else horizon * dim_u
    )
    fused_family = ("CEM", "PI2", "MPPI", "RandomSearch")
    # sep-CMA (diagonal) fuses; full-covariance CMA-ES needs the [n, n] rank-mu reduction.
    if solver_name == "CMA-ES" and getattr(solver_config, "diagonal", False):
        fused_family = fused_family + ("CMA-ES",)
    if mesh is not None and (
        getattr(solver_config, "keep_elites", 0)
        or getattr(solver_config, "mean_as_candidate", False)
        or getattr(solver_config, "execute_best", False)
    ):
        # the SHARDED fused path does not support the injected-candidate features yet
        # (ops/fused_sharded.py _reject_injection) — never auto-route what the factory
        # would reject. (sep-CMA and population_decay DO shard since r5.)
        return "xla"
    if (
        solver_name in fused_family
        and candidate_bytes >= FUSED_CEM_MIN_BYTES
        and config.propagation in ("mean", "ts1")
        and local_rows * rng_cols < 2**32  # in-kernel RNG counter range (per device)
    ):
        if time_major:
            # The time-major layout is an XLA-evaluator feature, but THIS population is
            # beyond (per-device) HBM — only the fused generate-in-kernel backend can run
            # it, and that backend's contract is population-major. Honor the explicit
            # layout choice (route XLA) but warn loudly: the XLA path must materialize
            # the very candidate tensor whose size selected fused, and will likely OOM.
            import warnings

            warnings.warn(
                f"time_major=True forces the XLA evaluator, but the candidate tensor "
                f"({candidate_bytes / 2**30:.1f} GiB per device) is beyond the fused "
                f"backend's HBM threshold — the XLA solve will likely OOM. Drop "
                f"time_major (the fused generate-in-kernel backend never materializes "
                f"candidates) or shrink the population.",
                RuntimeWarning,
                stacklevel=2,
            )
            return "xla"
        return "fused_cem"
    return "xla"
