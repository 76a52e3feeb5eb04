"""POPLIN-style plan proposer: behavior cloning, solver seeding, and MBRL-loop wiring.

No reference counterpart (the reference always plans from the action-space midpoint,
``/root/reference/blackbox_mpc/optimizers/cem.py:55-63``); test strategy follows SURVEY §4.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.learning.handler import DynamicsHandler
from blackbox_mpc_tpu.learning.proposer import (
    PolicyProposer,
    ProposerConfig,
    make_plan_proposal_fn,
)
from blackbox_mpc_tpu.learning.replay import ReplayBuffer
from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy


def _expert(obs):
    # A fixed smooth "expert": u = -1.2*thdot - 0.8*sin-component, clipped to [-2, 2].
    return np.clip(-1.2 * obs[:, 2:3] - 0.8 * obs[:, 1:2], -2.0, 2.0)


def _filled_replay(n=512, seed=0):
    rng = np.random.default_rng(seed)
    obs = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    act = _expert(obs).astype(np.float32)
    replay = ReplayBuffer(dim_s=3, dim_u=1, validation_fraction=0.1, seed=seed)
    replay.add_transitions(obs, act, obs)  # next_state unused by BC
    return replay, obs, act


def test_behavior_cloning_fits_expert_and_respects_bounds():
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    proposer = PolicyProposer(ProposerConfig(dim_s=3, dim_u=1, hidden=(32, 32)), bounds)
    replay, obs, act = _filled_replay()
    before = float(np.mean(np.square(proposer.act(obs) - act)))
    stats = proposer.train(replay, epochs=60, batch_size=128)
    after = float(np.mean(np.square(proposer.act(obs) - act)))
    assert stats["num_pairs"] > 0
    assert after < 0.05 and after < before / 10, (before, after)
    out = proposer.act(np.random.default_rng(1).uniform(-5, 5, size=(64, 3)))
    assert np.all(out >= -2.0) and np.all(out <= 2.0)


def test_plan_proposal_unrolls_through_dynamics():
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    cfg = ProposerConfig(dim_s=3, dim_u=1, hidden=(16,))
    proposer = PolicyProposer(cfg, bounds, seed=3)
    mean_dyn = lambda dp, s, a: pendulum_dynamics(s, a)  # noqa: E731
    propose = make_plan_proposal_fn(cfg, bounds, mean_dyn, horizon=7)
    obs = jnp.asarray([[-1.0, 0.0, 0.0], [0.3, 0.2, 0.1]])
    plan = jax.jit(propose)(proposer.params, 0.0, obs)
    assert plan.shape == (2, 7, 1)
    # step 0 of the plan must equal the policy net's direct output on obs
    np.testing.assert_allclose(
        np.asarray(plan[:, 0]), proposer.act(np.asarray(obs)), rtol=1e-6
    )
    # and the plan must be open-loop consistent: replaying actions through the dynamics
    # visits states whose policy outputs are exactly the plan's next actions
    s = obs
    for h in range(6):
        s = pendulum_dynamics(s, plan[:, h])
        np.testing.assert_allclose(
            np.asarray(plan[:, h + 1]), proposer.act(np.asarray(s)), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize("solver_name", ["CEM", "Gradient"])
def test_proposer_seeded_policy_acts_and_beats_midpoint_seed(solver_name):
    """Known-optimal construction: reward depends only on the action (distance to 0.7), and
    the proposer is cloned onto the constant expert u=0.7 — so its unrolled plan IS the
    optimum, and a seeded solver on a starved refinement budget must beat the midpoint seed."""
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv

    bounds = Bounds.of(-2.0, 2.0, dim=1)
    proposer = PolicyProposer(ProposerConfig(dim_s=3, dim_u=1, hidden=(32, 32)), bounds)
    rng = np.random.default_rng(0)
    obs_data = rng.uniform(-1.0, 1.0, size=(512, 3)).astype(np.float32)
    replay = ReplayBuffer(dim_s=3, dim_u=1, validation_fraction=0.1, seed=0)
    replay.add_transitions(obs_data, np.full((512, 1), 0.7, np.float32), obs_data)
    proposer.train(replay, epochs=60, batch_size=128)

    def action_reward(s, a, ns):
        return -jnp.sum(jnp.square(a - 0.7), axis=-1)

    handler = DynamicsHandler(true_model=pendulum_dynamics)
    kw = dict(population=64, max_iterations=1, num_elite=8) if solver_name == "CEM" else \
        dict(population=2, max_iterations=1, learning_rate=0.01)
    space = NativePendulumVecEnv().action_space
    obs = np.asarray([[-1.0, 0.0, 0.5]], dtype=np.float32)

    def expected_reward(prop):
        policy = MPCPolicy(
            action_space=space, reward_function=action_reward, dynamics_handler=handler,
            solver_name=solver_name, num_agents=1, planning_horizon=12, proposer=prop, **kw,
        )
        a, _, _ = policy.act(obs, 0)
        assert a.shape == (1, 1) and np.isfinite(a).all()
        _, reward = policy.plan(obs, 0)
        return float(reward[0])

    assert expected_reward(proposer) > expected_reward(None) + 0.01


@pytest.mark.parametrize("solver_name", ["RandomSearch", "PSO"])
def test_proposer_rejects_planless_solver(solver_name):
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv

    env = NativePendulumVecEnv()
    proposer = PolicyProposer(
        ProposerConfig(dim_s=3, dim_u=1), Bounds.from_space(env.action_space)
    )
    with pytest.raises(ValueError, match="plan-carrying"):
        MPCPolicy(
            action_space=env.action_space,
            reward_function=pendulum_reward,
            dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
            solver_name=solver_name,
            num_agents=1,
            planning_horizon=8,
            population=32,
            proposer=proposer,
        )


@pytest.mark.parametrize("solver_name", ["SPSA", "CMA-ES"])
def test_proposer_seeds_spsa_and_cma_es(solver_name):
    """SPSA carries its plan as `solution`; CMA-ES as a flattened [A, H*U] mean — both must
    accept a proposer (review fix: the old hasattr-mean guard rejected SPSA and crashed
    CMA-ES at solve time)."""
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv

    env = NativePendulumVecEnv()
    proposer = PolicyProposer(
        ProposerConfig(dim_s=3, dim_u=1, hidden=(16,)), Bounds.from_space(env.action_space)
    )
    kw = dict(population=32, max_iterations=2)
    if solver_name == "CMA-ES":
        kw["num_elite"] = 8
    policy = MPCPolicy(
        action_space=env.action_space,
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name=solver_name,
        num_agents=2,
        planning_horizon=8,
        proposer=proposer,
        **kw,
    )
    a, _, _ = policy.act(np.asarray([[-1.0, 0.0, 0.0], [0.5, 0.5, 0.5]], np.float32), 0)
    assert a.shape == (2, 1) and np.isfinite(a).all()


def test_proposer_state_roundtrip():
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    p1 = PolicyProposer(ProposerConfig(dim_s=3, dim_u=1, hidden=(16,)), bounds, seed=0)
    replay, obs, _ = _filled_replay(128)
    p1.train(replay, epochs=3, batch_size=64)
    p2 = PolicyProposer(ProposerConfig(dim_s=3, dim_u=1, hidden=(16,)), bounds, seed=9)
    p2.load_state_dict(p1.state_dict())
    np.testing.assert_array_equal(p1.act(obs), p2.act(obs))


def test_mbrl_loop_with_behavior_cloning(tmp_path):
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.workflows.iterative_mpc import learn_dynamics_iteratively_w_mpc

    env = NativePendulumVecEnv(num_envs=2, seed=0, max_episode_steps=25)
    handler, policy = learn_dynamics_iteratively_w_mpc(
        env,
        pendulum_reward,
        solver_name="CEM",
        planning_horizon=8,
        number_of_initial_rollouts=2,
        number_of_rollouts_per_refinement=1,
        number_of_refinement_steps=2,
        rollout_horizon=25,
        dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)),
        epochs=2,
        batch_size=64,
        behavior_cloning=True,
        bc_epochs=2,
        population=32,
        num_elite=8,
        max_iterations=2,
        seed=0,
    )
    assert policy.proposer is not None
    out = policy.proposer.act(np.zeros((3, 3), np.float32))
    assert out.shape == (3, 1) and np.isfinite(out).all()


def test_mbrl_loop_resume_restores_proposer(tmp_path):
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.workflows.iterative_mpc import learn_dynamics_iteratively_w_mpc

    ckpt = str(tmp_path / "loop")
    kw = dict(
        reward_function=pendulum_reward, solver_name="CEM", planning_horizon=8,
        number_of_initial_rollouts=2, number_of_rollouts_per_refinement=1,
        rollout_horizon=20, epochs=2, batch_size=64, behavior_cloning=True, bc_epochs=2,
        population=32, num_elite=8, max_iterations=2, seed=0, checkpoint_dir=ckpt,
    )
    env = NativePendulumVecEnv(num_envs=2, seed=0, max_episode_steps=20)
    _, policy1 = learn_dynamics_iteratively_w_mpc(
        env, number_of_refinement_steps=1,
        dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)), **kw,
    )
    probe = np.asarray([[0.1, -0.2, 0.3]], np.float32)
    before = policy1.proposer.act(probe)
    env2 = NativePendulumVecEnv(num_envs=2, seed=0, max_episode_steps=20)
    _, policy2 = learn_dynamics_iteratively_w_mpc(
        env2, number_of_refinement_steps=1, resume=True,
        dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)), **kw,
    )
    # refinement 1 already completed -> resumed run does no new work; the restored
    # proposer must reproduce the checkpointed network exactly
    np.testing.assert_array_equal(policy2.proposer.act(probe), before)


def test_mbrl_loop_resume_reads_legacy_pickled_proposer(tmp_path):
    """Pre-r5 loop checkpoints stored the proposer as a pickled numpy object array
    (proposer.npy); the r5 writer is orbax, but resume still reads the legacy file."""
    import shutil

    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.workflows.iterative_mpc import learn_dynamics_iteratively_w_mpc

    ckpt = str(tmp_path / "loop")
    kw = dict(
        reward_function=pendulum_reward, solver_name="CEM", planning_horizon=8,
        number_of_initial_rollouts=2, number_of_rollouts_per_refinement=1,
        rollout_horizon=20, epochs=2, batch_size=64, behavior_cloning=True, bc_epochs=2,
        population=32, num_elite=8, max_iterations=2, seed=0, checkpoint_dir=ckpt,
    )
    env = NativePendulumVecEnv(num_envs=2, seed=0, max_episode_steps=20)
    _, policy1 = learn_dynamics_iteratively_w_mpc(
        env, number_of_refinement_steps=1,
        dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)), **kw,
    )
    probe = np.asarray([[0.1, -0.2, 0.3]], np.float32)
    before = policy1.proposer.act(probe)
    # Rewrite the checkpoint into the pre-r5 on-disk layout: pickled object array,
    # no orbax proposer/ directory.
    shutil.rmtree(os.path.join(ckpt, "proposer"))
    np.save(os.path.join(ckpt, "proposer.npy"),
            np.asarray([policy1.proposer.state_dict()], dtype=object),
            allow_pickle=True)
    env2 = NativePendulumVecEnv(num_envs=2, seed=0, max_episode_steps=20)
    _, policy2 = learn_dynamics_iteratively_w_mpc(
        env2, number_of_refinement_steps=1, resume=True,
        dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)), **kw,
    )
    np.testing.assert_array_equal(policy2.proposer.act(probe), before)


def test_switch_solver_rederives_proposer_plan_field():
    """switch_solver must re-derive Solver.plan_field for the new solver (CEM 'mean' ->
    SPSA 'solution') and reject a switch to a plan-less solver (PSO) instead of silently
    corrupting its state."""
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv

    env = NativePendulumVecEnv()
    proposer = PolicyProposer(
        ProposerConfig(dim_s=3, dim_u=1, hidden=(16,)), Bounds.from_space(env.action_space)
    )
    policy = MPCPolicy(
        action_space=env.action_space,
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name="CEM",
        planning_horizon=8,
        population=32,
        num_elite=8,
        max_iterations=2,
        proposer=proposer,
    )
    assert policy._proposer_field == "mean"
    policy.switch_solver("SPSA")
    assert policy._proposer_field == "solution"
    a, _, _ = policy.act(np.asarray([-1.0, 0.0, 0.0], np.float32), 0)
    assert np.isfinite(a).all()
    with pytest.raises(ValueError, match="plan-carrying"):
        policy.switch_solver("PSO")
