from blackbox_mpc_tpu.ops.pallas_cem import make_fused_cem, make_fused_cem_kernels
from blackbox_mpc_tpu.ops.pallas_rollout import make_pallas_rollout_evaluator

__all__ = ["make_pallas_rollout_evaluator", "make_fused_cem", "make_fused_cem_kernels"]
