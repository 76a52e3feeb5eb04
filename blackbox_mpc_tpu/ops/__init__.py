from blackbox_mpc_tpu.ops.pallas_rollout import make_pallas_rollout_evaluator

__all__ = ["make_pallas_rollout_evaluator"]
