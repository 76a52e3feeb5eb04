"""Pessimistic (uncertainty-penalized) planning: disagreement math, rollout accumulation,
policy integration, and the validation/backend gates."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core.spaces import BoxSpace
from blackbox_mpc_tpu.learning.handler import DynamicsHandler
from blackbox_mpc_tpu.models.analytic import pendulum_reward
from blackbox_mpc_tpu.models.dynamics import (
    LearnedDynamicsConfig,
    make_learned_dynamics,
    make_penalized_dynamics,
)
from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator, rollout_trajectories


def _cfg(**kw):
    base = dict(dim_s=3, dim_u=1, hidden=(16, 16), ensemble_size=2,
                plan_uncertainty_penalty=0.5)
    base.update(kw)
    return LearnedDynamicsConfig(**base)


def _perturbed_params(cfg, scale=0.5):
    """Params whose two members genuinely disagree (independent random inits + noise)."""
    init, _ = make_learned_dynamics(cfg)
    dp = init(jax.random.PRNGKey(0))
    noisy = jax.tree.map(
        lambda p: p + scale * jax.random.normal(jax.random.PRNGKey(7), p.shape, p.dtype),
        dp.params,
    )
    # Mix: member 0 keeps the original weights, member 1 the perturbed ones.
    mixed = jax.tree.map(lambda a, b: jnp.stack([a[0], b[1]]), dp.params, noisy)
    return dp.replace(params=mixed)


def test_penalized_fn_matches_manual_disagreement(rng):
    cfg = _cfg()
    dp = _perturbed_params(cfg)
    _, plain = make_learned_dynamics(cfg)
    pen_fn = make_penalized_dynamics(cfg)
    s = jnp.asarray(rng.uniform(-1, 1, size=(6, 3)).astype(np.float32))
    a = jnp.asarray(rng.uniform(-1, 1, size=(6, 1)).astype(np.float32))
    ns, penalty = pen_fn(dp, s, a)
    # Same next state as the plain mean-propagation dynamics.
    np.testing.assert_allclose(np.asarray(ns), np.asarray(plain(dp, s, a)), rtol=1e-6)
    # Penalty = lambda * mean_S(std_E(member predictions)) — recompute member-by-member.
    member = lambda i: plain(dp.replace(  # noqa: E731
        params=jax.tree.map(lambda p: jnp.stack([p[i], p[i]]), dp.params)), s, a)
    m0, m1 = np.asarray(member(0)), np.asarray(member(1))
    # Members predict states; the penalty is measured on the raw (normalized-target) heads,
    # which with identity stats + delta transform differ from states by the +s shift only,
    # so std over members is identical in both spaces.
    want = 0.5 * np.mean(np.abs(m0 - m1) / 2.0, axis=-1)  # std of 2 points = |diff|/2
    np.testing.assert_allclose(np.asarray(penalty), want, rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(penalty) > 0)


def test_identical_members_zero_penalty(rng):
    cfg = _cfg()
    init, _ = make_learned_dynamics(cfg)
    dp = init(jax.random.PRNGKey(0))
    clone = dp.replace(
        params=jax.tree.map(lambda p: jnp.stack([p[0], p[0]]), dp.params)
    )
    pen_fn = make_penalized_dynamics(cfg)
    s = jnp.asarray(rng.uniform(-1, 1, size=(4, 3)).astype(np.float32))
    a = jnp.asarray(rng.uniform(-1, 1, size=(4, 1)).astype(np.float32))
    _, penalty = pen_fn(clone, s, a)
    np.testing.assert_allclose(np.asarray(penalty), 0.0, atol=1e-6)


def test_rollout_accumulates_discounted_penalty(rng):
    cfg = _cfg()
    dp = _perturbed_params(cfg)
    pen_fn = make_penalized_dynamics(cfg)
    reward = lambda s, a, ns: jnp.sum(ns, axis=-1)  # noqa: E731
    s0 = jnp.asarray(rng.uniform(-1, 1, size=(3, 3)).astype(np.float32))
    acts = jnp.asarray(rng.uniform(-1, 1, size=(3, 5, 1)).astype(np.float32))
    disc = 0.9
    got = rollout_trajectories(
        lambda s, a: pen_fn(dp, s, a), reward, s0, acts,
        discount=disc, dynamics_returns_penalty=True,
    )
    # Manual loop with the same fn.
    s, want, d = s0, np.zeros(3), 1.0
    for t in range(5):
        ns, p = pen_fn(dp, s, acts[:, t])
        want = want + d * (np.asarray(reward(s, acts[:, t], ns)) - np.asarray(p))
        s, d = ns, d * disc
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_policy_pessimism_changes_actions_and_reports_env_reward(rng):
    space = BoxSpace(low=np.full((1,), -1.0), high=np.full((1,), 1.0))
    obs = rng.uniform(-0.5, 0.5, size=(1, 3)).astype(np.float32)

    def act_with(lam):
        cfg = _cfg(plan_uncertainty_penalty=lam) if lam else _cfg(plan_uncertainty_penalty=0.0)
        handler = DynamicsHandler(config=cfg, seed=0)
        handler._params = _perturbed_params(cfg)  # inject disagreeing members
        policy = MPCPolicy(
            space, pendulum_reward, handler, solver_name="CEM", num_agents=1,
            planning_horizon=6, exploration_noise_scale=0.0, seed=1,
            population=64, num_elite=8, max_iterations=2,
        )
        return policy.act(obs, t=0)

    a_plain, _, aux_plain = act_with(0.0)
    a_pess, _, aux_pess = act_with(5.0)
    assert not np.allclose(np.asarray(a_plain), np.asarray(a_pess))


def test_validation_gates():
    with pytest.raises(ValueError, match="ensemble"):
        make_learned_dynamics(_cfg(ensemble_size=1))
    with pytest.raises(ValueError, match="propagation"):
        make_learned_dynamics(_cfg(propagation="ts1"))
    with pytest.raises(ValueError, match=">= 0"):
        make_learned_dynamics(_cfg(plan_uncertainty_penalty=-0.1))
    with pytest.raises(ValueError, match="plan_uncertainty_penalty > 0"):
        make_penalized_dynamics(_cfg(plan_uncertainty_penalty=0.0))


def test_kernel_backend_rejected():
    space = BoxSpace(low=np.full((1,), -1.0), high=np.full((1,), 1.0))
    handler = DynamicsHandler(config=_cfg(), seed=0)
    for backend in ("pallas", "fused_cem"):
        with pytest.raises(ValueError, match="plan_uncertainty_penalty"):
            MPCPolicy(
                space, pendulum_reward, handler, solver_name="CEM",
                planning_horizon=5, rollout_backend=backend,
                population=64, num_elite=8,
            )


def test_mm_propagation_penalty(rng):
    """mm + penalty: same sampled next state as plain mm under the same key, plus an
    epistemic penalty that ignores the aleatoric head."""
    cfg = _cfg(probabilistic=True, propagation="mm")
    dp = _perturbed_params(cfg)
    _, plain = make_learned_dynamics(cfg)
    pen_fn = make_penalized_dynamics(cfg)
    s = jnp.asarray(rng.uniform(-1, 1, size=(4, 3)).astype(np.float32))
    a = jnp.asarray(rng.uniform(-1, 1, size=(4, 1)).astype(np.float32))
    k = jax.random.PRNGKey(3)
    ns_pen, penalty = pen_fn(dp, s, a, k)
    np.testing.assert_allclose(
        np.asarray(ns_pen), np.asarray(plain(dp, s, a, k)), rtol=1e-6, atol=1e-6
    )
    assert np.all(np.asarray(penalty) > 0)


def test_evaluator_penalty_lowers_rewards(rng):
    cfg = _cfg()
    dp = _perturbed_params(cfg)
    _, plain = make_learned_dynamics(cfg)
    pen_fn = make_penalized_dynamics(cfg)
    reward = lambda s, a, ns: jnp.sum(ns, axis=-1)  # noqa: E731
    s0 = jnp.asarray(rng.uniform(-1, 1, size=(2, 3)).astype(np.float32))
    acts = jnp.asarray(rng.uniform(-1, 1, size=(5, 2, 4, 1)).astype(np.float32))
    ev_plain = make_trajectory_evaluator(lambda s, a: plain(dp, s, a), reward)
    ev_pess = make_trajectory_evaluator(
        lambda s, a: pen_fn(dp, s, a), reward, dynamics_returns_penalty=True
    )
    assert np.all(np.asarray(ev_pess(s0, acts)) < np.asarray(ev_plain(s0, acts)))
