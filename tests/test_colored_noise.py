"""Colored-noise sampling (iCEM-style) unit + integration tests."""
import jax
import jax.numpy as jnp
import numpy as np

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import make_solver
from blackbox_mpc_tpu.solvers.base import colored_noise


def test_colored_noise_shape_and_variance():
    z = colored_noise(jax.random.PRNGKey(0), beta=2.0, shape=(64, 2, 50, 3))
    assert z.shape == (64, 2, 50, 3)
    std = np.std(np.asarray(z), axis=(-2, -1))
    np.testing.assert_allclose(std, 1.0, atol=0.05)


def test_colored_noise_is_smoother_than_white():
    white = colored_noise(jax.random.PRNGKey(1), beta=0.0, shape=(128, 1, 50, 1))
    pink = colored_noise(jax.random.PRNGKey(1), beta=3.0, shape=(128, 1, 50, 1))

    def mean_abs_diff(x):
        return float(np.mean(np.abs(np.diff(np.asarray(x), axis=2))))

    assert mean_abs_diff(pink) < 0.5 * mean_abs_diff(white)


def test_cem_colored_noise_swings_up():
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
    s = make_solver(
        "CEM", bounds, evaluate,
        planning_horizon=25, num_agents=1, population=256, num_elite=25,
        max_iterations=5, colored_noise_beta=2.0,
    )
    key = jax.random.PRNGKey(0)
    state = s.init(key)
    solve = jax.jit(s.solve)
    obs = jnp.asarray([[-1.0, 0.0, 0.0]])
    for t in range(100):
        key, sub = jax.random.split(key)
        action, state, _ = solve(state, obs, jnp.asarray(t), sub)
        obs = pendulum_dynamics(obs, action)
    assert float(obs[0, 0]) > 0.9


def test_cem_elite_persistence_monotone_best():
    """keep_elites: the best candidate survives across iterations, so the per-iteration
    elite reward is (weakly) improving on a deterministic objective."""
    import jax

    from blackbox_mpc_tpu.solvers import make_solver

    bounds = Bounds.of(-1.0, 1.0, dim=1)

    def evaluate(obs, actions):
        return -jnp.sum(jnp.square(actions - 0.4), axis=(2, 3))

    s = make_solver("CEM", bounds, evaluate, planning_horizon=6, num_agents=1,
                    population=64, num_elite=8, max_iterations=6, keep_elites=4)
    state = s.init(jax.random.PRNGKey(0))
    action, _, aux = jax.jit(s.solve)(state, jnp.zeros((1, 3)), jnp.asarray(0),
                                      jax.random.PRNGKey(1))
    assert abs(float(action[0, 0]) - 0.4) < 0.1
    # invalid keep_elites rejected at construction (factory-time, not first-trace-time)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_elites"):
        make_solver("CEM", bounds, evaluate, planning_horizon=6, num_agents=1,
                    population=8, num_elite=8, max_iterations=2, keep_elites=20)
