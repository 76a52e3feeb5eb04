"""Multi-host (pod-slice / multi-process) initialization and data-exchange helpers.

The reference is strictly single-process (SURVEY §2.2). For pod-scale runs
(BASELINE config #5: 100k-trajectory solves sharded across >=2 hosts) the same SPMD program
runs on every host: call :func:`initialize_multihost` first, build the pop mesh over
``jax.devices()`` (global), and feed each host its local agents' observations. The population
collectives ride ICI within a slice and DCN across slices — XLA routes them from the mesh.

Proven without a pod by ``tests/test_multiprocess.py``: two OS processes with 4 virtual CPU
devices each form one 8-device global mesh, run a population-sharded CEM solve + a
data-parallel ensemble train step, and agree bit-for-bit with the single-process 8-device
result. ``benchmarks/scaling.py --config multihost`` is the runnable pod harness.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "initialize_multihost",
    "is_multihost",
    "local_agent_slice",
    "fetch_replicated",
    "replicate_to_global",
]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initializes ``jax.distributed`` so every process sees the global device set.

    With explicit arguments (``coordinator_address`` etc.) failures PROPAGATE — the caller
    asked for a distributed run, so silently continuing single-process would be wrong. With
    no arguments (TPU pods under standard orchestration auto-detect everything) an
    environment without distributed support degrades gracefully to single-process.
    """
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        if explicit:
            raise
        logger.info("jax.distributed not initialized (%s); continuing single-process", e)
        return
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_agent_slice(num_agents: int) -> slice:
    """Which agents this host owns when env stepping is distributed per host
    (agents are split evenly; the MPC solve itself is global SPMD)."""
    per_host = num_agents // jax.process_count()
    start = jax.process_index() * per_host
    end = start + per_host if jax.process_index() < jax.process_count() - 1 else num_agents
    return slice(start, end)


def fetch_replicated(x: jax.Array) -> np.ndarray:
    """Host value of a replicated global array.

    In a multi-process run a jit output over a global mesh is not *fully* addressable
    (each process only addresses its local shards), so ``np.asarray(x)`` raises; but a
    replicated output has the complete value in every shard — read shard 0.
    """
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    return np.asarray(x.addressable_data(0))


def replicate_to_global(x, mesh) -> jax.Array:
    """Host-local numpy value (same on every process) -> replicated global array on ``mesh``.

    The standard way to feed per-step host data (observations) into a global-mesh jit:
    every process supplies its identical copy; no cross-host transfer happens.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    x = np.asarray(x)
    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.make_array_from_process_local_data(sharding, x, x.shape)
