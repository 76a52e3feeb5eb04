"""blackbox_mpc_tpu: a TPU-native sampling-based MPC framework for model-based RL.

Brand-new JAX/XLA/Pallas rebuild with the capabilities of ``ossamaAhmed/blackbox_mpc``:
six derivative-free trajectory solvers (CEM, CMA-ES, PI2, PSO, RandomSearch, SPSA) driving an
MPC policy over analytic true models or learned NN dynamics ensembles, with the rollout engine,
dynamics learning, iterative MBRL workflows, vectorized environments, checkpointing, and
multi-chip sharding built in.
"""
from blackbox_mpc_tpu.core import Bounds, BoxSpace, Solver, SolverAux, as_box_space
from blackbox_mpc_tpu.deploy import ServingPolicy, export_dynamics, export_policy_artifact
from blackbox_mpc_tpu.learning.handler import DynamicsHandler
from blackbox_mpc_tpu.models.dynamics import DynamicsParams, LearnedDynamicsConfig
from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy
from blackbox_mpc_tpu.policies.random_policy import RandomPolicy
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import SOLVER_REGISTRY, make_solver
from blackbox_mpc_tpu.utils.metrics import MetricsWriter
from blackbox_mpc_tpu.workflows.dynamics_learning import learn_dynamics_from_policy
from blackbox_mpc_tpu.workflows.iterative_mpc import learn_dynamics_iteratively_w_mpc
from blackbox_mpc_tpu.workflows.recording import record_rollout
from blackbox_mpc_tpu.workflows.rollouts import perform_rollouts

__version__ = "0.4.0"

__all__ = [
    "Bounds",
    "BoxSpace",
    "as_box_space",
    "Solver",
    "SolverAux",
    "SOLVER_REGISTRY",
    "make_solver",
    "make_trajectory_evaluator",
    "DynamicsHandler",
    "DynamicsParams",
    "LearnedDynamicsConfig",
    "MPCPolicy",
    "RandomPolicy",
    "ServingPolicy",
    "export_policy_artifact",
    "export_dynamics",
    "MetricsWriter",
    "perform_rollouts",
    "learn_dynamics_from_policy",
    "learn_dynamics_iteratively_w_mpc",
    "record_rollout",
    "__version__",
]
