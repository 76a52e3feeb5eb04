"""Fused CEM kernels: stream consistency + solver behavior (interpreter mode)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
from blackbox_mpc_tpu.ops.pallas_cem import make_fused_cem, make_fused_cem_kernels
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers.cem import CEMConfig


def reward_fn(s, a, ns):
    return -jnp.sum(jnp.square(ns), axis=-1) - 0.01 * jnp.sum(jnp.square(a), axis=-1)


@pytest.fixture(scope="module")
def setup():
    dyn_cfg = LearnedDynamicsConfig(dim_s=3, dim_u=2, hidden=(16,), ensemble_size=2)
    init_model, dyn = make_learned_dynamics(dyn_cfg)
    dp = init_model(jax.random.PRNGKey(0))
    horizon, agents, pop, tile = 5, 2, 16, 8
    kernels = make_fused_cem_kernels(
        dyn_cfg, reward_fn, horizon=horizon, agents=agents, population=pop,
        tile=tile, interpret=True,
    )
    return dyn_cfg, dyn, dp, kernels, (horizon, agents, pop)


def test_kernel_streams_match_and_rollout_correct(setup):
    dyn_cfg, dyn, dp, (rollout_rewards, elite_moments), (H, A, P) = setup
    mean = jnp.full((A, H, 2), 0.3)  # nonzero: exercises the centered-moment contract
    std = jnp.full((A, H, 2), 0.5)
    s0 = jnp.asarray([[0.3, -0.2, 0.1], [0.0, 0.5, -0.5]])
    seed = 1234
    rewards = rollout_rewards(dp, s0, mean, std, seed)  # [P, A]
    assert rewards.shape == (P, A)

    # Extract every sample via kernel B with single-row masks, then re-evaluate with the
    # standard XLA evaluator — rewards must match, proving A and B share one stream and the
    # fused rollout math is right.
    evaluate = make_trajectory_evaluator(partial(dyn, dp), reward_fn)
    extracted = np.zeros((P, A, H, 2), np.float32)
    for p in range(P):
        for a in range(A):
            mask = jnp.zeros((P, A)).at[p, a].set(1.0)
            csum, csumsq = elite_moments(mean, std, seed, mask)  # CENTERED moments
            extracted[p, a] = np.asarray(mean[a]).reshape(H, 2) + np.asarray(csum[a]).reshape(H, 2)
            # centered sum-of-squares consistency for the single row
            np.testing.assert_allclose(
                np.asarray(csumsq[a]), np.asarray(csum[a]) ** 2, rtol=1e-4, atol=1e-5
            )
    ref_rewards = evaluate(s0, jnp.asarray(extracted))
    np.testing.assert_allclose(np.asarray(rewards), np.asarray(ref_rewards), rtol=1e-3, atol=1e-3)
    # samples follow the requested distribution roughly
    z = (extracted - np.asarray(mean)[None]) / np.asarray(std)[None]
    assert np.abs(z).max() <= 2.0 + 1e-5
    assert 0.5 < z.std() < 1.1


def test_fused_cem_solves_quadratic(setup):
    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    cfg = CEMConfig(planning_horizon=H, num_agents=A, population=64, num_elite=8,
                    max_iterations=6)
    # dynamics: contracting toward 0; reward favors small states and actions -> mean -> ~0
    solver = make_fused_cem(cfg, bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
    state = solver.init(jax.random.PRNGKey(0))
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    action, state2, aux = solver.solve(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
    assert action.shape == (A, 2)
    assert np.all(np.isfinite(np.asarray(action)))
    assert np.all(np.isfinite(np.asarray(aux.expected_reward)))


def test_mpc_policy_fused_cem_backend():
    """rollout_backend='fused_cem' drives the generate-in-kernel CEM through the policy
    facade (interpreter mode off-TPU)."""
    import numpy as np

    from blackbox_mpc_tpu.core.spaces import BoxSpace
    from blackbox_mpc_tpu.learning import DynamicsHandler
    from blackbox_mpc_tpu.models import pendulum_reward
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.policies import MPCPolicy

    handler = DynamicsHandler(config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)))
    policy = MPCPolicy(
        action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
        reward_function=pendulum_reward,
        dynamics_handler=handler,
        solver_name="CEM",
        planning_horizon=5,
        population=32,
        num_elite=4,
        max_iterations=2,
        rollout_backend="fused_cem",
    )
    action, next_obs, pred_reward = policy.act(np.asarray([1.0, 0.0, 0.0], np.float32))
    assert action.shape == (1,) and np.isfinite(action).all()
    assert np.isfinite(pred_reward)

    import pytest

    with pytest.raises(ValueError, match="fused_cem"):
        MPCPolicy(
            action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
            reward_function=pendulum_reward,
            dynamics_handler=handler,
            solver_name="PI2",
            planning_horizon=5,
            population=32,
            rollout_backend="fused_cem",
        )


def test_backend_auto_selects_fused_cem_beyond_hbm():
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.ops.backend_select import choose_backend

    cfg = LearnedDynamicsConfig(dim_s=17, dim_u=6, hidden=(200, 200))
    # 8M candidates x H=50 x U=6 x 4B = 9.6 GB candidate tensor: beyond HBM -> fused CEM.
    assert choose_backend(cfg, 8_000_000, 1, platform="tpu", horizon=50, dim_u=6,
                          solver_name="CEM") == "fused_cem"
    # Same scale but a non-CEM solver has no fused path: XLA (will OOM, but honestly).
    assert choose_backend(cfg, 8_000_000, 1, platform="tpu", horizon=50, dim_u=6,
                          solver_name="PI2") == "xla"
    # Ordinary populations stay on the measured xla/pallas rule.
    assert choose_backend(cfg, 1000, 1, platform="tpu", horizon=50, dim_u=6,
                          solver_name="CEM") == "xla"


def test_streamed_kernel_bitmatches_block_kernel(rng):
    """The streamed (per-step generation, (tiles, H) grid) rollout kernel must reproduce
    the block kernel exactly: same global (row, col) RNG counters, same step math — only
    the schedule differs. Odd sizes exercise the padding paths of both."""
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=2, hidden=(16, 16), ensemble_size=2)
    init_model, _ = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    H, A, P = 7, 3, 90  # rows = 270: not a multiple of either kernel's tile
    kw = dict(horizon=H, agents=A, population=P, interpret=True)
    rr_block, _ = make_fused_cem_kernels(cfg, reward_fn, streamed=False, **kw)
    rr_stream, _ = make_fused_cem_kernels(cfg, reward_fn, streamed=True, **kw)
    s0 = jnp.asarray(rng.uniform(-1, 1, (A, 3)).astype(np.float32))
    mean = jnp.asarray(rng.uniform(-0.5, 0.5, (A, H, 2)).astype(np.float32))
    std = jnp.asarray(rng.uniform(0.1, 0.5, (A, H, 2)).astype(np.float32))
    a = np.asarray(rr_block(dp, s0, mean, std, 1234))
    b = np.asarray(rr_stream(dp, s0, mean, std, 1234))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
