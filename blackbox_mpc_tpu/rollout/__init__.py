from blackbox_mpc_tpu.rollout.evaluator import (
    NAN_REWARD,
    make_trajectory_evaluator,
    rollout_trajectories,
)

__all__ = ["NAN_REWARD", "make_trajectory_evaluator", "rollout_trajectories"]
