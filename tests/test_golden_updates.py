"""Golden update-rule tests: replicate one solver iteration in numpy, bit-for-bit sampling.

The solvers split their PRNG key deterministically (``key, sample_key = split(key)``), so a
test can regenerate the exact population a solve iteration drew and recompute the update with
plain numpy — a stronger check than convergence alone (SURVEY §4 "parity/golden").
"""
import jax
import jax.numpy as jnp
import numpy as np

from blackbox_mpc_tpu.core.types import Bounds, truncated_normal
from blackbox_mpc_tpu.solvers import make_solver
from blackbox_mpc_tpu.solvers.base import (
    constrain_variance,
    init_solution_mean,
    init_solution_variance,
)


def quad_eval(actions):  # [P, A, H, U] -> [P, A]
    return -jnp.sum(jnp.square(actions - 0.3), axis=(2, 3))


def test_cem_single_iteration_matches_numpy():
    pop, agents, horizon, k = 128, 2, 6, 16
    bounds = Bounds.of(-1.0, 1.0, dim=1)
    s = make_solver(
        "CEM", bounds, lambda s0, a: quad_eval(a),
        planning_horizon=horizon, num_agents=agents, population=pop,
        num_elite=k, max_iterations=1, alpha=0.25,
    )
    state = s.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    action, _, aux = s.solve(state, jnp.zeros((agents, 3)), jnp.asarray(0), key)

    # Replicate the solve's internal RNG: fori_loop body does key, sample_key = split(key).
    _, sample_key = jax.random.split(key)
    mean0 = init_solution_mean(bounds, horizon, agents)
    var0 = init_solution_variance(bounds, horizon, agents)
    cvar = constrain_variance(mean0, var0, bounds)
    samples = np.asarray(
        truncated_normal(sample_key, mean0, jnp.sqrt(cvar), (pop, agents, horizon, 1))
    )
    rewards = np.asarray(quad_eval(jnp.asarray(samples)))  # [P, A]
    expected_mean = np.zeros((agents, horizon, 1), np.float32)
    for a in range(agents):
        elite_idx = np.argsort(-rewards[:, a])[:k]
        elites = samples[elite_idx, a]
        expected_mean[a] = 0.25 * np.asarray(mean0)[a] + 0.75 * elites.mean(axis=0)
    np.testing.assert_allclose(np.asarray(aux.plan), expected_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(action), expected_mean[:, 0], rtol=1e-5, atol=1e-6)


def test_pi2_single_iteration_matches_numpy():
    pop, agents, horizon = 64, 1, 4
    lamda = 0.7
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    s = make_solver(
        "PI2", bounds, lambda s0, a: quad_eval(a),
        planning_horizon=horizon, num_agents=agents, population=pop,
        max_iterations=1, lamda=lamda,
    )
    state = s.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    action, next_state, aux = s.solve(state, jnp.zeros((agents, 3)), jnp.asarray(0), key)

    _, sample_key = jax.random.split(key)
    mean0 = init_solution_mean(bounds, horizon, agents)
    var0 = init_solution_variance(bounds, horizon, agents)
    raw = np.asarray(
        truncated_normal(sample_key, mean0, jnp.sqrt(var0), (pop, agents, horizon, 2))
    )
    feasible = np.clip(raw, -1.0, 1.0)
    penalty = np.sum((raw - feasible).reshape(pop, agents, -1) ** 2, axis=-1)
    rewards = np.asarray(quad_eval(jnp.asarray(feasible))) - penalty
    costs = -rewards  # [P, A]
    beta = costs.min(axis=0, keepdims=True)
    prob = np.exp(-(costs - beta) / lamda)
    omega = prob / prob.sum(axis=0, keepdims=True)
    expected_mean = np.einsum("pa,pahu->ahu", omega, feasible)
    np.testing.assert_allclose(np.asarray(aux.plan), expected_mean, rtol=1e-5, atol=1e-6)
    # warm start: state mean is the time-shifted plan
    shifted = np.concatenate([expected_mean[:, 1:], expected_mean[:, -1:]], axis=1)
    np.testing.assert_allclose(np.asarray(next_state.mean), shifted, rtol=1e-5, atol=1e-6)


def test_mppi_single_iteration_matches_numpy():
    """MPPI = PI2 + Williams' control-affine cost lambda * sum u^T Sigma^-1 eps.

    Asymmetric bounds make the nominal mean nonzero so the control cost actually bites
    (with a zero nominal it vanishes identically and MPPI == PI2)."""
    pop, agents, horizon = 64, 2, 4
    lamda = 0.7
    bounds = Bounds.of(-0.5, 1.0, dim=2)
    s = make_solver(
        "MPPI", bounds, lambda s0, a: quad_eval(a),
        planning_horizon=horizon, num_agents=agents, population=pop,
        max_iterations=1, lamda=lamda,
    )
    state = s.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    action, next_state, aux = s.solve(state, jnp.zeros((agents, 3)), jnp.asarray(0), key)

    _, sample_key = jax.random.split(key)
    mean0 = np.asarray(init_solution_mean(bounds, horizon, agents))
    var0 = np.asarray(init_solution_variance(bounds, horizon, agents))
    raw = np.asarray(
        truncated_normal(sample_key, jnp.asarray(mean0), jnp.sqrt(jnp.asarray(var0)),
                         (pop, agents, horizon, 2))
    )
    feasible = np.clip(raw, -0.5, 1.0)
    penalty = np.sum((raw - feasible).reshape(pop, agents, -1) ** 2, axis=-1)
    rewards = np.asarray(quad_eval(jnp.asarray(feasible))) - penalty
    eps = feasible - mean0[None]
    ctrl = lamda * np.einsum("ahu,pahu->pa", mean0 / var0, eps)
    costs = -rewards + ctrl
    assert not np.allclose(ctrl, 0.0)  # the term must actually participate
    beta = costs.min(axis=0, keepdims=True)
    prob = np.exp(-(costs - beta) / lamda)
    omega = prob / prob.sum(axis=0, keepdims=True)
    expected_mean = np.einsum("pa,pahu->ahu", omega, feasible)
    np.testing.assert_allclose(np.asarray(aux.plan), expected_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(action), expected_mean[:, 0], rtol=1e-5, atol=1e-6)


def test_mppi_control_cost_off_equals_pi2():
    bounds = Bounds.of(-0.5, 1.0, dim=1)
    kw = dict(planning_horizon=5, num_agents=1, population=32, max_iterations=3, lamda=0.5)
    s_pi2 = make_solver("PI2", bounds, lambda s0, a: quad_eval(a), **kw)
    s_mppi = make_solver("MPPI", bounds, lambda s0, a: quad_eval(a), control_cost=False, **kw)
    st = s_pi2.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(3)
    a1, _, _ = s_pi2.solve(st, jnp.zeros((1, 3)), jnp.asarray(0), k)
    a2, _, _ = s_mppi.solve(s_mppi.init(jax.random.PRNGKey(0)), jnp.zeros((1, 3)),
                            jnp.asarray(0), k)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_spsa_single_iteration_matches_numpy():
    pop, agents, horizon = 32, 1, 3
    bounds = Bounds.of(-1.0, 1.0, dim=1)
    cfg = dict(planning_horizon=horizon, num_agents=agents, population=pop, max_iterations=1)
    s = make_solver("SPSA", bounds, lambda s0, a: quad_eval(a), **cfg)
    state = s.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    action, next_state, _ = s.solve(state, jnp.zeros((agents, 3)), jnp.asarray(0), key)

    _, delta_key = jax.random.split(key)
    sol0 = np.asarray(init_solution_mean(bounds, horizon, agents))
    ak = 0.01 / (0.0 + 1.0 + 1 / 10.0) ** 0.602
    ck = 0.3 / (0.0 + 1.0) ** 0.101
    delta = np.asarray(
        jax.random.rademacher(delta_key, (pop, agents, horizon, 1), dtype=jnp.float32)
    )
    plus_raw, minus_raw = sol0 + ck * delta, sol0 - ck * delta
    plus, minus = np.clip(plus_raw, -1, 1), np.clip(minus_raw, -1, 1)
    p_pen = np.sum((plus_raw - plus).reshape(pop, agents, -1) ** 2, axis=-1)
    m_pen = np.sum((minus_raw - minus).reshape(pop, agents, -1) ** 2, axis=-1)
    r_plus = np.asarray(quad_eval(jnp.asarray(plus))) - p_pen
    r_minus = np.asarray(quad_eval(jnp.asarray(minus))) - m_pen
    ghat = np.mean((r_plus - r_minus)[:, :, None, None] / (2.0 * ck * delta), axis=0)
    expected = np.clip(sol0 + ak * ghat, -1, 1)
    np.testing.assert_allclose(np.asarray(action), expected[:, 0], rtol=1e-5, atol=1e-6)
