"""Iterative model-based RL: alternate collecting with MPC and retraining the dynamics model.

Counterpart of ``learn_dynamics_iteratively_w_mpc``
(``/root/reference/blackbox_mpc/utils/iterative_mpc.py:11-174``): bootstrap with random-policy
rollouts + initial training, build an MPC policy on the learned model, then N refinement
iterations of collect-with-MPC + retrain. Returns ``(handler, policy)`` like the reference
(``iterative_mpc.py:174``).
"""
from __future__ import annotations

import logging
from typing import Callable, Optional

from blackbox_mpc_tpu.learning.handler import DynamicsHandler
from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy
from blackbox_mpc_tpu.policies.random_policy import RandomPolicy
from blackbox_mpc_tpu.workflows.dynamics_learning import learn_dynamics_from_policy

logger = logging.getLogger(__name__)

__all__ = ["learn_dynamics_iteratively_w_mpc"]


def learn_dynamics_iteratively_w_mpc(
    env,
    reward_function: Callable,
    solver_name: str = "CEM",
    planning_horizon: int = 50,
    number_of_initial_rollouts: int = 5,
    number_of_rollouts_per_refinement: int = 1,
    number_of_refinement_steps: int = 5,
    rollout_horizon: int = 200,
    dynamics_config: Optional[LearnedDynamicsConfig] = None,
    handler: Optional[DynamicsHandler] = None,
    epochs: int = 30,
    batch_size: int = 128,
    exploration_noise: bool = False,
    metrics_writer=None,
    seed: int = 0,
    **solver_kwargs,
):
    """Full MBRL loop. ``solver_kwargs`` forward into the solver config (population, ...)."""
    num_agents = env.num_envs
    if number_of_initial_rollouts > 0:
        random_policy = RandomPolicy(env.action_space, num_agents=num_agents, seed=seed)
        logger.info("collecting %d bootstrap rollouts with a random policy", number_of_initial_rollouts)
        handler, _, _ = learn_dynamics_from_policy(
            env,
            random_policy,
            handler=handler,
            dynamics_config=dynamics_config,
            number_of_rollouts=number_of_initial_rollouts,
            rollout_horizon=rollout_horizon,
            epochs=epochs,
            batch_size=batch_size,
            metrics_writer=metrics_writer,
        )
    elif handler is None:
        raise ValueError("need number_of_initial_rollouts > 0 or a pre-trained handler")

    policy = MPCPolicy(
        action_space=env.action_space,
        reward_function=reward_function,
        dynamics_handler=handler,
        solver_name=solver_name,
        num_agents=num_agents,
        planning_horizon=planning_horizon,
        seed=seed,
        metrics_writer=metrics_writer,
        **solver_kwargs,
    )
    for i in range(number_of_refinement_steps):
        logger.info("refinement step %d/%d", i + 1, number_of_refinement_steps)
        handler, result, metrics = learn_dynamics_from_policy(
            env,
            policy,
            handler=handler,
            number_of_rollouts=number_of_rollouts_per_refinement,
            rollout_horizon=rollout_horizon,
            epochs=epochs,
            batch_size=batch_size,
            exploration_noise=exploration_noise,
            metrics_writer=metrics_writer,
        )
        logger.info(
            "refinement %d: episode reward %.2f, val loss %.5f",
            i + 1, result["reward_sum"][-1], metrics["val_loss"],
        )
    return handler, policy
