"""Action-smoothness (actuation-rate) cost: golden math, policy behavior, backend gates."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core.spaces import BoxSpace
from blackbox_mpc_tpu.learning.handler import DynamicsHandler
from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy
from blackbox_mpc_tpu.rollout import action_smoothness_penalty, make_trajectory_evaluator


def test_penalty_matches_numpy(rng):
    acts = rng.uniform(-2, 2, size=(5, 3, 8, 2)).astype(np.float32)
    w, disc = 0.7, 0.9
    got = np.asarray(action_smoothness_penalty(jnp.asarray(acts), w, disc))
    want = np.zeros((5, 3))
    for t in range(1, 8):
        want += disc**t * np.sum((acts[:, :, t] - acts[:, :, t - 1]) ** 2, axis=-1)
    np.testing.assert_allclose(got, w * want, rtol=1e-5, atol=1e-6)


def test_penalty_horizon_one_is_zero():
    np.testing.assert_array_equal(
        np.asarray(action_smoothness_penalty(jnp.ones((4, 2, 1, 3)), 1.0)), 0.0
    )


def test_evaluator_applies_penalty(rng):
    s0 = jnp.asarray(rng.uniform(-1, 1, size=(2, 3)).astype(np.float32))
    acts = jnp.asarray(rng.uniform(-2, 2, size=(6, 2, 10, 1)).astype(np.float32))
    plain = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward, discount=0.95)
    smooth = make_trajectory_evaluator(
        pendulum_dynamics, pendulum_reward, discount=0.95, action_smoothness_weight=0.4
    )
    want = np.asarray(plain(s0, acts)) - np.asarray(
        action_smoothness_penalty(acts, 0.4, 0.95)
    )
    np.testing.assert_allclose(np.asarray(smooth(s0, acts)), want, rtol=1e-5, atol=1e-5)


def _pendulum_policy(**kw):
    space = BoxSpace(low=np.full((1,), -2.0), high=np.full((1,), 2.0))
    handler = DynamicsHandler(true_model=pendulum_dynamics)
    return MPCPolicy(
        space, pendulum_reward, handler, solver_name="CEM", num_agents=1,
        planning_horizon=25, exploration_noise_scale=0.0, seed=0,
        population=256, num_elite=25, max_iterations=5, **kw,
    )


def test_policy_smoothness_reduces_actuation_rate():
    """With the rate cost on, the executed pendulum actuation has smaller |da| and the task
    still solves (w trades a little reward for less jerk). Measured on CPU (seeded,
    deterministic): w=0 rate 0.234, w=0.3 rate 0.191 — assert a >=10% margin."""

    def episode(policy):
        obs = jnp.asarray([[-1.0, 0.0, 0.0]])
        actions = []
        for t in range(100):
            a = np.asarray(policy.act(np.asarray(obs), t=t)[0])
            actions.append(a[0])
            obs = pendulum_dynamics(obs, jnp.asarray(a))
        return np.asarray(actions), float(obs[0, 0])

    acts_plain, cos_plain = episode(_pendulum_policy())
    acts_smooth, cos_smooth = episode(_pendulum_policy(action_smoothness_weight=0.3))
    rate = lambda a: float(np.mean(np.abs(np.diff(a, axis=0))))  # noqa: E731
    assert rate(acts_smooth) < 0.9 * rate(acts_plain)
    assert cos_smooth > 0.9 and cos_plain > 0.9


def test_fused_cem_rejects_smoothness():
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig

    space = BoxSpace(low=np.full((1,), -2.0), high=np.full((1,), 2.0))
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,), ensemble_size=1)
    handler = DynamicsHandler(config=cfg, seed=0)
    with pytest.raises(ValueError, match="smoothness"):
        MPCPolicy(
            space, pendulum_reward, handler, solver_name="CEM",
            planning_horizon=5, rollout_backend="fused_cem",
            action_smoothness_weight=0.1, population=64, num_elite=8,
        )


def test_negative_weight_rejected():
    with pytest.raises(ValueError, match="action_smoothness_weight"):
        _pendulum_policy(action_smoothness_weight=-1.0)
    with pytest.raises(ValueError, match="action_smoothness_weight"):
        make_trajectory_evaluator(
            pendulum_dynamics, pendulum_reward, action_smoothness_weight=-0.1
        )


def test_pallas_backend_applies_penalty_outside_kernel(rng):
    """backend='pallas' + smoothness: the XLA-side wrapper must equal xla-backend actions."""
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig

    space = BoxSpace(low=np.full((1,), -1.0), high=np.full((1,), 1.0))
    cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=1, hidden=(16, 16), ensemble_size=1, compute_dtype=jnp.float32
    )
    obs = rng.uniform(-0.5, 0.5, size=(1, 3)).astype(np.float32)

    def act_with(backend):
        handler = DynamicsHandler(config=cfg, seed=0)
        policy = MPCPolicy(
            space, pendulum_reward, handler, solver_name="CEM", num_agents=1,
            planning_horizon=6, exploration_noise_scale=0.0, seed=1,
            population=32, num_elite=4, max_iterations=2,
            rollout_backend=backend, action_smoothness_weight=0.3,
        )
        return np.asarray(policy.act(obs, t=0)[0])

    np.testing.assert_allclose(act_with("pallas"), act_with("xla"), rtol=2e-4, atol=2e-4)
