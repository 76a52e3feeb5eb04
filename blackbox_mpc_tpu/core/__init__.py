from blackbox_mpc_tpu.core.spaces import BoxSpace, as_box_space
from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux, truncated_normal

__all__ = ["BoxSpace", "as_box_space", "Bounds", "Solver", "SolverAux", "truncated_normal"]
