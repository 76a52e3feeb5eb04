from blackbox_mpc_tpu.workflows.device_episode import evaluate_solver_on_model
from blackbox_mpc_tpu.workflows.dynamics_learning import learn_dynamics_from_policy
from blackbox_mpc_tpu.workflows.iterative_mpc import learn_dynamics_iteratively_w_mpc
from blackbox_mpc_tpu.workflows.recording import record_rollout
from blackbox_mpc_tpu.workflows.rollouts import RolloutResult, perform_rollouts

__all__ = [
    "perform_rollouts",
    "RolloutResult",
    "learn_dynamics_from_policy",
    "learn_dynamics_iteratively_w_mpc",
    "record_rollout",
    "evaluate_solver_on_model",
]
