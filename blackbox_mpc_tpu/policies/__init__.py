from blackbox_mpc_tpu.policies.base import ModelBasedPolicy, ModelFreePolicy, Policy
from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy
from blackbox_mpc_tpu.policies.random_policy import RandomPolicy

__all__ = ["Policy", "ModelBasedPolicy", "ModelFreePolicy", "MPCPolicy", "RandomPolicy"]
