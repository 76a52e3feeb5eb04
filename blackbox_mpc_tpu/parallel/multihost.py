"""Multi-host (pod-slice) initialization helpers.

The reference is strictly single-process (SURVEY §2.2). For pod-scale runs
(BASELINE config #5: 100k-trajectory solves sharded across >=2 hosts) the same SPMD program
runs on every host: call :func:`initialize_multihost` first, build the pop mesh over
``jax.devices()`` (global), and feed each host its local agents' observations. The population
collectives ride ICI within a slice and DCN across slices — XLA routes them from the mesh.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)

__all__ = ["initialize_multihost", "is_multihost", "local_agent_slice"]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initializes jax.distributed (no-op when single-process / already initialized).

    On TPU pods with standard orchestration (GKE/xmanager) all arguments auto-detect.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except (RuntimeError, ValueError) as e:
        logger.info("jax.distributed not initialized (%s); continuing single-process", e)


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_agent_slice(num_agents: int) -> slice:
    """Which agents this host owns when env stepping is distributed per host
    (agents are split evenly; the MPC solve itself is global SPMD)."""
    per_host = num_agents // jax.process_count()
    start = jax.process_index() * per_host
    end = start + per_host if jax.process_index() < jax.process_count() - 1 else num_agents
    return slice(start, end)
