"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Asserts the population-sharded solve produces the same results as the single-device solve with
identical PRNG keys (the sharding is a layout annotation, not a math change) — a capability the
reference has no analogue of (SURVEY §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.learning import DynamicsHandler
from blackbox_mpc_tpu.models import LearnedDynamicsConfig, pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.parallel import make_pop_mesh, make_sharded_evaluator
from blackbox_mpc_tpu.policies import MPCPolicy
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import make_solver


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual CPU devices"
    return make_pop_mesh(8)


def test_sharded_evaluator_matches_single_device(mesh, rng):
    pop, agents, horizon = 64, 2, 10
    s0 = jnp.asarray(rng.uniform(-1, 1, (agents, 3)).astype(np.float32))
    acts = jnp.asarray(rng.uniform(-2, 2, (pop, agents, horizon, 1)).astype(np.float32))
    single = jax.jit(make_trajectory_evaluator(pendulum_dynamics, pendulum_reward))
    sharded = jax.jit(make_sharded_evaluator(pendulum_dynamics, pendulum_reward, mesh))
    np.testing.assert_allclose(
        np.asarray(single(s0, acts)), np.asarray(sharded(s0, acts)), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("name", ["CEM", "PI2", "RandomSearch", "SPSA", "PSO", "CMA-ES",
                                  "Gradient", "CEM-GD"])
def test_sharded_solve_matches_single_device(mesh, name):
    kwargs = dict(planning_horizon=10, num_agents=2, population=64, max_iterations=2)
    if name in ("CEM", "CEM-GD", "CMA-ES"):
        kwargs["num_elite"] = 8
    if name == "CEM-GD":
        kwargs.update(gd_candidates=4, gd_iterations=3)
    if name == "RandomSearch":
        kwargs = dict(planning_horizon=10, num_agents=2, population=64)
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    obs = jnp.asarray([[-1.0, 0.0, 0.0], [0.5, 0.5, 1.0]])
    key = jax.random.PRNGKey(3)

    def run(evaluate):
        s = make_solver(name, bounds, evaluate, **kwargs)
        state = s.init(jax.random.PRNGKey(0))
        action, _, aux = jax.jit(s.solve)(state, obs, jnp.asarray(0), key)
        return np.asarray(action), np.asarray(aux.expected_reward)

    a1, r1 = run(make_trajectory_evaluator(pendulum_dynamics, pendulum_reward))
    a2, r2 = run(make_sharded_evaluator(pendulum_dynamics, pendulum_reward, mesh))
    if name == "CMA-ES":
        # Cholesky sampling + basis-invariant C^(-1/2) (see solvers/cma_es.py docstring)
        # make sharded vs single-device differ only by fp reduction order — tight tolerance.
        np.testing.assert_allclose(a1, a2, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(r1, r2, rtol=1e-3, atol=1e-3)
    else:
        np.testing.assert_allclose(a1, a2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(r1, r2, rtol=1e-4, atol=1e-5)


def test_sharded_policy_controls_pendulum(mesh):
    from blackbox_mpc_tpu.envs import NativePendulumVecEnv

    policy = MPCPolicy(
        action_space=NativePendulumVecEnv().action_space,
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name="CEM",
        num_agents=1,
        planning_horizon=25,
        population=256,
        num_elite=25,
        max_iterations=5,
        mesh=mesh,
    )
    obs = np.array([-1.0, 0.0, 0.0], np.float32)
    for t in range(80):
        action, _, _ = policy.act(obs, t)
        obs = np.asarray(pendulum_dynamics(jnp.asarray(obs[None]), jnp.asarray(action[None])))[0]
    assert obs[0] > 0.85, obs


def test_data_parallel_training_matches_single_device(mesh, rng):
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,), ensemble_size=2)
    s = rng.uniform(-1, 1, (2, 64, 3)).astype(np.float32)
    a = rng.uniform(-2, 2, (2, 64, 1)).astype(np.float32)
    ns = s + 0.1 * a.repeat(3, axis=-1)

    from blackbox_mpc_tpu.learning.trainer import make_trainer
    from blackbox_mpc_tpu.models.dynamics import make_learned_dynamics

    init_model, _ = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))

    def train_n(mesh_arg):
        trainer_init, train_step, _ = make_trainer(cfg, mesh=mesh_arg)
        ts = trainer_init(dp.params)
        for _ in range(3):
            ts, losses = train_step(ts, dp.stats, s, a, ns)
        return jax.tree_util.tree_leaves(ts.params), np.asarray(losses)

    p1, l1 = train_n(None)
    p2, l2 = train_n(mesh)
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-6)
    for x, y in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6)


def test_agent_sharded_solve_matches_single_device(mesh):
    """Agent-axis sharding: each chip owns whole agents; zero-collective solves."""
    kwargs = dict(planning_horizon=8, num_agents=8, population=32, max_iterations=2,
                  num_elite=4)
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    obs = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (8, 1))
    key = jax.random.PRNGKey(11)

    def run(evaluate):
        s = make_solver("CEM", bounds, evaluate, **kwargs)
        state = s.init(jax.random.PRNGKey(0))
        action, _, aux = jax.jit(s.solve)(state, obs, jnp.asarray(0), key)
        return np.asarray(action), np.asarray(aux.expected_reward)

    a1, r1 = run(make_trajectory_evaluator(pendulum_dynamics, pendulum_reward))
    a2, r2 = run(make_sharded_evaluator(pendulum_dynamics, pendulum_reward, mesh,
                                        shard_axis="agents"))
    np.testing.assert_allclose(a1, a2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(r1, r2, rtol=1e-4, atol=1e-5)
