from blackbox_mpc_tpu.learning.handler import DynamicsHandler
from blackbox_mpc_tpu.learning.proposer import PolicyProposer, ProposerConfig
from blackbox_mpc_tpu.learning.replay import ReplayBuffer
from blackbox_mpc_tpu.learning.trainer import TrainState, make_trainer

__all__ = [
    "DynamicsHandler",
    "PolicyProposer",
    "ProposerConfig",
    "ReplayBuffer",
    "TrainState",
    "make_trainer",
]
