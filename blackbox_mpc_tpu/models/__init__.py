from blackbox_mpc_tpu.models.analytic import (
    ANALYTIC_MODELS,
    cartpole_dynamics,
    cartpole_reward,
    pendulum_dynamics,
    pendulum_reward,
)
from blackbox_mpc_tpu.models.dynamics import (
    DynamicsParams,
    LearnedDynamicsConfig,
    make_learned_dynamics,
    true_model_dynamics,
)
from blackbox_mpc_tpu.models.mlp import MLPConfig, ensemble_apply, ensemble_init, mlp_apply, mlp_init
from blackbox_mpc_tpu.models.normalizer import NormalizerStats, fit_normalizer, identity_stats

__all__ = [
    "ANALYTIC_MODELS",
    "pendulum_dynamics",
    "pendulum_reward",
    "cartpole_dynamics",
    "cartpole_reward",
    "DynamicsParams",
    "LearnedDynamicsConfig",
    "make_learned_dynamics",
    "true_model_dynamics",
    "MLPConfig",
    "mlp_init",
    "mlp_apply",
    "ensemble_init",
    "ensemble_apply",
    "NormalizerStats",
    "fit_normalizer",
    "identity_stats",
]
