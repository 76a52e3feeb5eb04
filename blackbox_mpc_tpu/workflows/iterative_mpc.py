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

import numpy as np

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
    patience: Optional[int] = None,
    learning_rate: float = 1e-3,
    exploration_noise: bool = False,
    metrics_writer=None,
    seed: int = 0,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    overlap: bool = False,
    behavior_cloning: bool = False,
    bc_epochs: int = 20,
    bc_hidden: tuple = (64, 64),
    solver_learning_rate: Optional[float] = None,
    **solver_kwargs,
):
    """Full MBRL loop. ``solver_kwargs`` forward into the solver config (population, ...).

    ``checkpoint_dir``: if set, the handler (model + optimizer state + normalizer + replay) and
    the loop counter are checkpointed after every refinement; ``resume=True`` restores them and
    continues from the next refinement — full loop resume, which the reference cannot do (it
    only saves the dynamics model, SURVEY §5.4).

    ``behavior_cloning=True`` (POPLIN-style, no reference analogue): a
    :class:`~blackbox_mpc_tpu.learning.proposer.PolicyProposer` policy net is behavior-cloned
    on the replay's (state, action) pairs after every refinement and seeds the solver's plan
    mean each solve (see ``MPCPolicy(proposer=...)``). The trained proposer is returned via
    ``policy.proposer``.
    ``solver_learning_rate``: forwarded as the solver config's Adam step size —
    ``learning_rate`` for Gradient, ``gd_learning_rate`` for CEM-GD's polish phase —
    namespaced because the workflow's own ``learning_rate`` kwarg is the model-training
    LR and shadows the passthrough.
    """
    import json
    import os

    if solver_learning_rate is not None:
        lr_field = "gd_learning_rate" if solver_name == "CEM-GD" else "learning_rate"
        solver_kwargs[lr_field] = solver_learning_rate
    num_agents = env.num_envs
    start_refinement = 0
    if resume:
        if checkpoint_dir is None:
            raise ValueError("resume=True requires checkpoint_dir")
        state_path = os.path.join(checkpoint_dir, "loop_state.json")
        if os.path.exists(state_path):
            with open(state_path) as f:
                loop_state = json.load(f)
            handler = DynamicsHandler.load(
                os.path.join(checkpoint_dir, "handler"),
                learning_rate=learning_rate,
                metrics_writer=metrics_writer,
            )
            start_refinement = int(loop_state["completed_refinements"])
            number_of_initial_rollouts = 0
            logger.info("resumed MBRL loop at refinement %d", start_refinement)

    def _checkpoint(completed: int):
        if checkpoint_dir is None:
            return
        os.makedirs(checkpoint_dir, exist_ok=True)
        handler.save(os.path.join(checkpoint_dir, "handler"))
        if proposer is not None:
            # Orbax pytree snapshot, same convention as the handler checkpoint (the
            # pre-r5 pickled-object-array proposer.npy format is still readable below).
            import orbax.checkpoint as ocp

            ocp.PyTreeCheckpointer().save(
                os.path.join(checkpoint_dir, "proposer"),
                proposer.state_dict(), force=True,
            )
        with open(os.path.join(checkpoint_dir, "loop_state.json"), "w") as f:
            json.dump({"completed_refinements": completed}, f)

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
            patience=patience,
            learning_rate=learning_rate,
            metrics_writer=metrics_writer,
        )
    elif handler is None:
        raise ValueError("need number_of_initial_rollouts > 0 or a pre-trained handler")

    proposer = None
    if behavior_cloning:
        from blackbox_mpc_tpu.core.types import Bounds
        from blackbox_mpc_tpu.learning.proposer import PolicyProposer, ProposerConfig

        if handler.replay is None:
            raise ValueError(
                "behavior_cloning=True requires a learned-dynamics handler (a replay "
                "buffer to clone from); true-model handlers have none"
            )
        dim_s = handler.config.dim_s
        dim_u = int(np.asarray(env.action_space.low).shape[-1])
        proposer = PolicyProposer(
            ProposerConfig(dim_s=dim_s, dim_u=dim_u, hidden=tuple(bc_hidden)),
            Bounds.from_space(env.action_space), seed=seed,
        )
        proposer_dir = (
            os.path.join(checkpoint_dir, "proposer") if checkpoint_dir else None
        )
        legacy_npy = (
            os.path.join(checkpoint_dir, "proposer.npy") if checkpoint_dir else None
        )
        if resume and proposer_dir and os.path.isdir(proposer_dir):
            import jax
            import orbax.checkpoint as ocp

            template = proposer.state_dict()
            # numpy-typed restore: device-portable (see DynamicsHandler.load)
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template
            )
            proposer.load_state_dict(
                ocp.PyTreeCheckpointer().restore(
                    proposer_dir, item=template, restore_args=restore_args
                )
            )
            logger.info("resumed proposer from %s", proposer_dir)
        elif resume and legacy_npy and os.path.exists(legacy_npy):
            # Pre-r5 checkpoints saved a pickled numpy object array; read-only compat.
            proposer.load_state_dict(np.load(legacy_npy, allow_pickle=True)[0])
            logger.info("resumed proposer from legacy %s", legacy_npy)
        else:
            bc = proposer.train(handler.replay, epochs=bc_epochs)
            logger.info("behavior cloning: %s", bc)

    policy = MPCPolicy(
        action_space=env.action_space,
        reward_function=reward_function,
        dynamics_handler=handler,
        solver_name=solver_name,
        num_agents=num_agents,
        planning_horizon=planning_horizon,
        seed=seed,
        metrics_writer=metrics_writer,
        proposer=proposer,
        **solver_kwargs,
    )
    if start_refinement == 0:
        _checkpoint(0)
    for i in range(start_refinement, number_of_refinement_steps):
        logger.info("refinement step %d/%d", i + 1, number_of_refinement_steps)
        handler, result, metrics = learn_dynamics_from_policy(
            env,
            policy,
            handler=handler,
            number_of_rollouts=number_of_rollouts_per_refinement,
            rollout_horizon=rollout_horizon,
            epochs=epochs,
            batch_size=batch_size,
            patience=patience,
            exploration_noise=exploration_noise,
            metrics_writer=metrics_writer,
            overlap=overlap,
        )
        logger.info(
            "refinement %d: episode reward %.2f, val loss %.5f",
            i + 1, result["reward_sum"][-1], metrics["val_loss"],
        )
        if proposer is not None:
            bc = proposer.train(handler.replay, epochs=bc_epochs)
            if metrics_writer is not None:
                metrics_writer.scalar("proposer/bc_loss", bc["bc_loss"], i + 1)
        _checkpoint(i + 1)
    return handler, policy
