"""Device-mesh construction for population-sharded MPC.

The reference has no distributed layer at all (SURVEY §2.2/§5.8 — its only parallelism is one
batched tensor on one device). Here the *population* axis — embarrassingly parallel candidates —
is the sharding axis: a 1-D mesh over all chips, with XLA inserting the ICI collectives
(top-k merges, softmax/psum reductions) that the solvers' math implies.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

POP_AXIS = "pop"

__all__ = ["POP_AXIS", "make_pop_mesh", "pop_sharding", "replicated_sharding"]


def make_pop_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over ``num_devices`` (default: all local devices), axis name ``"pop"``."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    # Auto axis type: the solvers use with_sharding_constraint annotations and let the SPMD
    # partitioner propagate, rather than explicit-mode sharding-in-types.
    return jax.make_mesh(
        (len(devices),),
        (POP_AXIS,),
        devices=devices,
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def pop_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """NamedSharding placing array dim ``axis`` on the pop mesh axis, rest replicated."""
    spec = [None] * ndim
    spec[axis] = POP_AXIS
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
