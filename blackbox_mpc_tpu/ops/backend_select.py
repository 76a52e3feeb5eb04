"""Measured rollout-backend auto-selection (``MPCPolicy(rollout_backend="auto")``).

Decision rule distilled from the regime sweep in ``benchmarks/backend_regimes.py``
(results: ``benchmarks/backend_regimes_r2.jsonl``, one v5e chip): the Pallas fused rollout
kernel (:mod:`~blackbox_mpc_tpu.ops.pallas_rollout`) keeps the population tile + MLP weights
VMEM-resident across the whole horizon, which wins when the model is small enough that
XLA's per-step HBM traffic (state round-trips between scan steps, weight re-reads) dominates;
XLA's scan wins once the matmuls are big enough to pipeline near roofline (flagship
MLP 3x500: XLA ~75% of bf16 peak — see docs/performance.md).

The rule is deliberately conservative: "pallas" only in regimes where the sweep measured it
faster; anything unmeasured or ineligible (true model, probabilistic head, ts_inf, mesh
sharding) falls back to "xla".
"""
from __future__ import annotations

from typing import Optional

__all__ = ["choose_backend", "PALLAS_MAX_WIDTH", "PALLAS_MAX_ROWS"]

# Filled from benchmarks/backend_regimes_r2.jsonl (see module docstring). A config is
# pallas-eligible when its widest hidden layer and total rollout rows (population * agents)
# are within these measured-win bounds.
PALLAS_MAX_WIDTH = 64
PALLAS_MAX_ROWS = 4096

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
    if platform != "tpu" or config is None or mesh is not None:
        return "xla"
    if getattr(config, "probabilistic", False):
        return "xla"
    if config.ensemble_size > 1 and config.propagation not in ("mean", "ts1"):
        return "xla"
    if config.activation not in ("tanh", "relu", "gelu"):
        return "xla"
    rows = population * num_agents
    if config.propagation == "ts1" and config.ensemble_size > 1 and rows % config.ensemble_size:
        return "xla"
    # Beyond-HBM populations: only the generate-in-kernel fused CEM can run them at all.
    candidate_bytes = rows * horizon * dim_u * 4
    if (
        solver_name == "CEM"
        and candidate_bytes >= FUSED_CEM_MIN_BYTES
        and config.propagation == "mean"
        and rows * horizon * dim_u < 2**32  # in-kernel RNG counter range
    ):
        return "fused_cem"
    if max(config.hidden) <= PALLAS_MAX_WIDTH and rows <= PALLAS_MAX_ROWS:
        return "pallas"
    return "xla"
