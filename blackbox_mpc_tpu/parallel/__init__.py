from blackbox_mpc_tpu.parallel.mesh import (
    POP_AXIS,
    make_pop_mesh,
    pop_sharding,
    replicated_sharding,
)
from blackbox_mpc_tpu.parallel.multihost import (
    initialize_multihost,
    is_multihost,
    local_agent_slice,
)
from blackbox_mpc_tpu.parallel.sharding import make_sharded_evaluator, shard_population

__all__ = [
    "POP_AXIS",
    "make_pop_mesh",
    "pop_sharding",
    "replicated_sharding",
    "make_sharded_evaluator",
    "shard_population",
    "initialize_multihost",
    "is_multihost",
    "local_agent_slice",
]
