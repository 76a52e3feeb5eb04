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


def choose_backend(
    config,  # LearnedDynamicsConfig | None (None == analytic true model)
    population: int,
    num_agents: int,
    mesh: Optional[object] = None,
    platform: Optional[str] = None,
) -> str:
    """Returns "pallas" or "xla" for the given solve configuration.

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
    if max(config.hidden) <= PALLAS_MAX_WIDTH and rows <= PALLAS_MAX_ROWS:
        return "pallas"
    return "xla"
