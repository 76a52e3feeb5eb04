"""Solver registry: one factory per derivative-free trajectory optimizer.

Replaces the reference's duplicated if/elif optimizer dispatch
(``/root/reference/blackbox_mpc/policies/mpc_policy.py:81-116`` and ``:195-244``) with a single
name-keyed registry. Each entry maps a public name to ``(ConfigClass, factory)`` where
``factory(config, bounds, evaluate) -> Solver``.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple, Type

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux, TrajectoryEvaluator
from blackbox_mpc_tpu.solvers.base import SolverConfig
from blackbox_mpc_tpu.solvers.cem import CEMConfig, CEMState, make_cem
from blackbox_mpc_tpu.solvers.cem_gd import CEMGDConfig, CEMGDState, make_cem_gd
from blackbox_mpc_tpu.solvers.cma_es import CMAESConfig, CMAESState, make_cma_es
from blackbox_mpc_tpu.solvers.gradient import GradientConfig, GradientState, make_gradient
from blackbox_mpc_tpu.solvers.pi2 import MPPIConfig, PI2Config, PI2State, make_pi2
from blackbox_mpc_tpu.solvers.pso import PSOConfig, PSOState, make_pso
from blackbox_mpc_tpu.solvers.random_search import (
    RandomSearchConfig,
    RandomSearchState,
    make_random_search,
)
from blackbox_mpc_tpu.solvers.spsa import SPSAConfig, SPSAState, make_spsa

SOLVER_REGISTRY: Dict[str, Tuple[Type[SolverConfig], Callable]] = {
    "CEM": (CEMConfig, make_cem),
    "CEM-GD": (CEMGDConfig, make_cem_gd),
    "CMA-ES": (CMAESConfig, make_cma_es),
    "Gradient": (GradientConfig, make_gradient),
    "MPPI": (MPPIConfig, make_pi2),
    "PI2": (PI2Config, make_pi2),
    "PSO": (PSOConfig, make_pso),
    "RandomSearch": (RandomSearchConfig, make_random_search),
    "SPSA": (SPSAConfig, make_spsa),
}


def make_solver(
    name: str,
    bounds: Bounds,
    evaluate: TrajectoryEvaluator,
    **config_kwargs,
) -> Solver:
    """Builds a solver by registry name, forwarding kwargs into its config dataclass."""
    try:
        config_cls, factory = SOLVER_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown solver {name!r}; available: {sorted(SOLVER_REGISTRY)}"
        ) from None
    return factory(config_cls(**config_kwargs), bounds, evaluate)


__all__ = [
    "SOLVER_REGISTRY",
    "make_solver",
    "Solver",
    "SolverAux",
    "SolverConfig",
    "CEMConfig",
    "CEMState",
    "make_cem",
    "CEMGDConfig",
    "CEMGDState",
    "make_cem_gd",
    "CMAESConfig",
    "CMAESState",
    "make_cma_es",
    "GradientConfig",
    "GradientState",
    "make_gradient",
    "MPPIConfig",
    "PI2Config",
    "PI2State",
    "make_pi2",
    "PSOConfig",
    "PSOState",
    "make_pso",
    "RandomSearchConfig",
    "RandomSearchState",
    "make_random_search",
    "SPSAConfig",
    "SPSAState",
    "make_spsa",
]
