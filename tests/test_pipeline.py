"""Speculative depth-1 MPC pipelining (policies/pipeline.py, perform_rollouts(overlap=True))."""
import numpy as np
import pytest

from blackbox_mpc_tpu.envs import NativePendulumVecEnv
from blackbox_mpc_tpu.learning import DynamicsHandler
from blackbox_mpc_tpu.models import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.policies import MPCPolicy
from blackbox_mpc_tpu.policies.pipeline import SpeculativePipeline
from blackbox_mpc_tpu.workflows import perform_rollouts


def _policy(num_agents=2, seed=0, **kw):
    return MPCPolicy(
        action_space=NativePendulumVecEnv().action_space,
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name="CEM",
        num_agents=num_agents,
        planning_horizon=25,
        population=256,
        num_elite=25,
        max_iterations=5,
        seed=seed,
        **kw,
    )


def test_speculation_hits_with_perfect_model():
    """True-model speculation: the predicted obs equals the env's next obs (same physics),
    so every step after the first adopts the speculative action and still swings up."""
    env = NativePendulumVecEnv(num_envs=2, seed=3)
    pipe = SpeculativePipeline(_policy(), spec_tol=1e-3)
    obs = env.reset_down()
    pipe.reset()
    for t in range(80):
        action, pred_next, _r, hit = pipe.act(obs, t)
        env.step_async(action)
        obs, reward, done, _ = env.step_wait()
        if t > 0:
            np.testing.assert_allclose(pred_next, obs, atol=1e-3)
    assert pipe.hits >= 75, (pipe.hits, pipe.misses)  # t=0 has nothing to speculate from
    assert np.all(obs[:, 0] > 0.85), obs


def test_spec_miss_equals_exact_solve():
    """A pipeline that never accepts (spec_tol=None) and one that always hits (perfect
    model) choose near-identical actions — speculation does not change the policy beyond
    the obs-prediction error."""
    env_a = NativePendulumVecEnv(num_envs=2, seed=3)
    env_b = NativePendulumVecEnv(num_envs=2, seed=3)
    pipe_a = SpeculativePipeline(_policy(seed=7), spec_tol=None)  # prefetch only
    pipe_b = SpeculativePipeline(_policy(seed=7), spec_tol=1e-3)
    obs_a, obs_b = env_a.reset_down(), env_b.reset_down()
    pipe_a.reset()
    pipe_b.reset()
    for t in range(40):
        act_a, _, _, hit_a = pipe_a.act(obs_a, t)
        act_b, _, _, hit_b = pipe_b.act(obs_b, t)
        assert not hit_a
        obs_a = env_a.step(act_a)[0]
        obs_b = env_b.step(act_b)[0]
        np.testing.assert_allclose(act_a, act_b, atol=2e-2)
    assert pipe_a.hits == 0 and pipe_b.hits >= 35


def test_perform_rollouts_overlap():
    env = NativePendulumVecEnv(num_envs=2, seed=0, max_episode_steps=30)
    result = perform_rollouts(
        env, _policy(), number_of_rollouts=2, rollout_horizon=30, overlap=True,
        spec_tol=1e-3,
    )
    assert result["observations"][0].shape == (31, 2, 3)
    assert result["actions"][0].shape == (30, 2, 1)
    assert result["spec_hit_rate"] > 0.9
    assert np.isfinite(result["reward_sum"]).all()


def test_overlap_requires_model_based():
    from blackbox_mpc_tpu.policies import RandomPolicy

    env = NativePendulumVecEnv(num_envs=2, seed=0)
    policy = RandomPolicy(env.action_space, num_agents=2, seed=0)
    with pytest.raises(ValueError, match="model-based"):
        perform_rollouts(env, policy, rollout_horizon=5, overlap=True)


def test_iterative_mbrl_with_overlap():
    """The MBRL loop's MPC-collection phase runs under the speculative pipeline."""
    from blackbox_mpc_tpu import LearnedDynamicsConfig, learn_dynamics_iteratively_w_mpc

    env = NativePendulumVecEnv(num_envs=2, seed=0, max_episode_steps=25)
    handler, policy = learn_dynamics_iteratively_w_mpc(
        env,
        pendulum_reward,
        solver_name="CEM",
        planning_horizon=10,
        number_of_initial_rollouts=2,
        number_of_rollouts_per_refinement=1,
        number_of_refinement_steps=2,
        rollout_horizon=25,
        dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(32, 32)),
        epochs=5,
        batch_size=64,
        population=64,
        num_elite=8,
        max_iterations=2,
        overlap=True,
        seed=0,
    )
    assert handler is not None and policy is not None
