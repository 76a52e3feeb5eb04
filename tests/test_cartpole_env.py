"""NativeCartpoleVecEnv: analytic-model parity + MPC control."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.envs import NativeCartpoleVecEnv
from blackbox_mpc_tpu.learning import DynamicsHandler
from blackbox_mpc_tpu.models import cartpole_dynamics, cartpole_reward
from blackbox_mpc_tpu.policies import MPCPolicy


def test_env_matches_analytic_model():
    """One env.step equals one cartpole_dynamics step, and the reward matches
    cartpole_reward — the true-model MPC plans with exact dynamics."""
    env = NativeCartpoleVecEnv(num_envs=3, seed=0)
    obs = env.reset(seed=5)
    rng = np.random.default_rng(1)
    for _ in range(20):
        a = rng.uniform(-1, 1, (3, 1)).astype(np.float32)
        expect_next = np.asarray(cartpole_dynamics(jnp.asarray(obs), jnp.asarray(a)))
        expect_rew = np.asarray(
            cartpole_reward(jnp.asarray(obs), jnp.asarray(a), jnp.asarray(expect_next))
        )
        obs2, rew, done, _ = env.step(a)
        np.testing.assert_allclose(obs2, expect_next, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(rew, expect_rew, rtol=1e-5, atol=1e-6)
        obs = obs2


def test_async_api_guards():
    env = NativeCartpoleVecEnv(num_envs=2)
    with pytest.raises(RuntimeError, match="step_async"):
        env.step_wait()
    env.reset()
    env.step_async(np.zeros((2, 1), np.float32))
    obs, rew, done, infos = env.step_wait()
    assert obs.shape == (2, 4) and rew.shape == (2,)
    with pytest.raises(RuntimeError, match="step_async"):
        env.step_wait()


def test_true_model_mpc_balances():
    """CEM over the exact model keeps the pole upright from a perturbed start."""
    env = NativeCartpoleVecEnv(num_envs=2, seed=0)
    policy = MPCPolicy(
        action_space=env.action_space,
        reward_function=cartpole_reward,
        dynamics_handler=DynamicsHandler(true_model=cartpole_dynamics),
        solver_name="CEM",
        planning_horizon=20,
        num_agents=2,
        population=128,
        num_elite=16,
        max_iterations=3,
        seed=0,
    )
    obs = env.reset(seed=3)
    for t in range(80):
        action, _, _ = policy.act(obs, t)
        obs, rew, done, _ = env.step(action)
    th = obs[:, 2]
    assert (np.abs(np.cos(th) - 1.0) < 0.05).all(), obs
    assert (np.abs(obs[:, 0]) < 1.0).all(), obs  # cart stays near the origin


def test_render_frame():
    env = NativeCartpoleVecEnv(num_envs=1)
    env.reset_down()
    frame = env.render()
    assert frame.shape == (200, 300, 3) and frame.dtype == np.uint8
