"""Golden tests for the rollout engine against hand-rolled numpy pendulum math."""
import jax
import jax.numpy as jnp
import numpy as np

from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.rollout import NAN_REWARD, make_trajectory_evaluator


def numpy_pendulum_step(state, u):
    g, m, l, dt = 10.0, 1.0, 1.0, 0.05
    th = np.arctan2(state[1], state[0])
    thdot = state[2]
    newthdot = thdot + (-3 * g / (2 * l) * np.sin(th + np.pi) + 3.0 / (m * l**2) * u) * dt
    newthdot = np.clip(newthdot, -8.0, 8.0)  # gymnasium clips before integrating theta
    newth = th + newthdot * dt
    return np.array([np.cos(newth), np.sin(newth), newthdot])


def numpy_pendulum_reward(state, u):
    th = ((np.arctan2(state[1], state[0]) + np.pi) % (2 * np.pi)) - np.pi
    return -(th**2 + 0.1 * state[2] ** 2) - 0.001 * u**2


def test_pendulum_dynamics_matches_numpy(rng):
    states = rng.uniform(-1, 1, size=(16, 3)).astype(np.float32)
    actions = rng.uniform(-2, 2, size=(16, 1)).astype(np.float32)
    got = np.asarray(pendulum_dynamics(jnp.asarray(states), jnp.asarray(actions)))
    want = np.stack([numpy_pendulum_step(s, a[0]) for s, a in zip(states, actions)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_evaluator_matches_sequential_numpy(rng):
    pop, agents, horizon = 7, 3, 10
    evaluate = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
    s0 = rng.uniform(-1, 1, size=(agents, 3)).astype(np.float32)
    acts = rng.uniform(-2, 2, size=(pop, agents, horizon, 1)).astype(np.float32)
    got = np.asarray(evaluate(jnp.asarray(s0), jnp.asarray(acts)))
    want = np.zeros((pop, agents))
    for p in range(pop):
        for a in range(agents):
            s = s0[a].copy()
            for h in range(horizon):
                u = acts[p, a, h, 0]
                want[p, a] += numpy_pendulum_reward(s, u)
                s = numpy_pendulum_step(s, u)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nan_guard():
    def bad_dynamics(s, a):
        return s + jnp.nan

    def reward(s, a, sn):
        return jnp.sum(sn, axis=-1)

    evaluate = make_trajectory_evaluator(bad_dynamics, reward)
    r = evaluate(jnp.zeros((1, 3)), jnp.zeros((4, 1, 5, 1)))
    assert np.all(np.asarray(r) == NAN_REWARD)


def test_remat_matches_plain_forward_and_grad(rng):
    """jax.checkpoint is a pure memory/FLOPs trade: values AND grads must be identical."""
    pop, agents, horizon = 5, 2, 8
    plain = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
    ckpt = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward, remat=True)
    s0 = jnp.asarray(rng.uniform(-1, 1, size=(agents, 3)).astype(np.float32))
    acts = jnp.asarray(rng.uniform(-2, 2, size=(pop, agents, horizon, 1)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(plain(s0, acts)), np.asarray(ckpt(s0, acts)))
    g_plain = jax.grad(lambda a: plain(s0, a).sum())(acts)
    g_ckpt = jax.grad(lambda a: ckpt(s0, a).sum())(acts)
    assert np.all(np.isfinite(np.asarray(g_plain)))
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_ckpt), rtol=1e-6, atol=1e-7)


def test_policy_remat_rollout_action_parity():
    """MPCPolicy(remat_rollout=True) produces the exact same Gradient-solver actions."""
    from blackbox_mpc_tpu.core.spaces import BoxSpace
    from blackbox_mpc_tpu.learning.handler import DynamicsHandler

    space = BoxSpace(low=np.full((1,), -2.0), high=np.full((1,), 2.0))
    handler = DynamicsHandler(true_model=pendulum_dynamics)

    def mk(remat):
        from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy

        return MPCPolicy(
            space, pendulum_reward, handler, solver_name="Gradient", num_agents=2,
            planning_horizon=6, exploration_noise_scale=0.0, seed=3,
            remat_rollout=remat, population=4, max_iterations=3,
        )

    obs = np.tile(np.array([[1.0, 0.0, 0.5], [0.0, 1.0, -0.3]], np.float32), (1, 1))
    a0 = mk(False).act(obs, t=0)[0]
    a1 = mk(True).act(obs, t=0)[0]
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_evaluator_jits_and_is_deterministic(rng):
    evaluate = jax.jit(make_trajectory_evaluator(pendulum_dynamics, pendulum_reward))
    s0 = jnp.asarray(rng.uniform(-1, 1, size=(2, 3)).astype(np.float32))
    acts = jnp.asarray(rng.uniform(-2, 2, size=(8, 2, 12, 1)).astype(np.float32))
    r1, r2 = evaluate(s0, acts), evaluate(s0, acts)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
