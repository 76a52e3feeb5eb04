"""Pallas fused-rollout kernel parity tests (interpreter mode on CPU)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
from blackbox_mpc_tpu.ops import make_pallas_rollout_evaluator
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator


def reward_fn(s, a, ns):
    return -jnp.sum(jnp.square(ns), axis=-1) - 0.01 * jnp.sum(jnp.square(a), axis=-1)


@pytest.mark.parametrize("ensemble", [1, 2])
@pytest.mark.parametrize("normalized", [True, False])
def test_pallas_rollout_matches_xla(ensemble, normalized, rng):
    cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=2, hidden=(16, 16), ensemble_size=ensemble,
        propagation="mean", normalized=normalized,
    )
    init_model, dyn = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    if normalized:
        # non-trivial stats to exercise the in-kernel normalizer chain
        from blackbox_mpc_tpu.models.normalizer import NormalizerStats

        dp = dp.replace(
            stats=NormalizerStats(
                mean_states=jnp.asarray([0.1, -0.2, 0.3]),
                std_states=jnp.asarray([1.1, 0.9, 2.0]),
                mean_actions=jnp.asarray([0.05, -0.05]),
                std_actions=jnp.asarray([1.5, 0.7]),
                mean_targets=jnp.asarray([0.0, 0.01, -0.01]),
                std_targets=jnp.asarray([0.5, 0.5, 1.2]),
            )
        )
    s0 = jnp.asarray(rng.uniform(-1, 1, (2, 3)).astype(np.float32))
    acts = jnp.asarray(rng.uniform(-2, 2, (10, 2, 6, 2)).astype(np.float32))
    ref = make_trajectory_evaluator(partial(dyn, dp), reward_fn)(s0, acts)
    pal = make_pallas_rollout_evaluator(cfg, reward_fn, tile=8, interpret=True)(dp, s0, acts)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), rtol=1e-4, atol=1e-4)


def test_pallas_rollout_pads_ragged_rows(rng):
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(8,), ensemble_size=1)
    init_model, dyn = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    s0 = jnp.asarray(rng.uniform(-1, 1, (3, 3)).astype(np.float32))
    acts = jnp.asarray(rng.uniform(-2, 2, (7, 3, 4, 1)).astype(np.float32))  # 21 rows, tile 8
    ref = make_trajectory_evaluator(partial(dyn, dp), reward_fn)(s0, acts)
    pal = make_pallas_rollout_evaluator(cfg, reward_fn, tile=8, interpret=True)(dp, s0, acts)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), rtol=1e-4, atol=1e-4)


def test_fused_cem_ts1_needs_enough_tiles():
    # Round 3: the fused CEM supports ts1 (one member per tile) — but a population too
    # small for every member to get a tile must fail loudly, not silently drop members.
    from blackbox_mpc_tpu.ops.pallas_cem import make_fused_cem_kernels

    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, ensemble_size=2, propagation="ts1")
    with pytest.raises(ValueError, match="tiles"):
        make_fused_cem_kernels(cfg, reward_fn, horizon=4, agents=1, population=8)
    # enough tiles: builds fine
    make_fused_cem_kernels(cfg, reward_fn, horizon=4, agents=1, population=16, tile=8)


def test_pallas_rollout_ts1_matches_xla(rng):
    cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=2, hidden=(16,), ensemble_size=2, propagation="ts1"
    )
    init_model, dyn = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    s0 = jnp.asarray(rng.uniform(-1, 1, (2, 3)).astype(np.float32))
    acts = jnp.asarray(rng.uniform(-2, 2, (9, 2, 6, 2)).astype(np.float32))  # 18 rows, tile 8
    ref = make_trajectory_evaluator(partial(dyn, dp), reward_fn)(s0, acts)
    pal = make_pallas_rollout_evaluator(cfg, reward_fn, tile=8, interpret=True)(dp, s0, acts)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), rtol=1e-4, atol=1e-4)


def test_pallas_rollout_ts1_rejects_indivisible(rng):
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(8,), ensemble_size=3,
                                propagation="ts1")
    init_model, dyn = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    ev = make_pallas_rollout_evaluator(cfg, reward_fn, tile=8, interpret=True)
    with pytest.raises(ValueError, match="divisible"):
        ev(dp, jnp.zeros((1, 3)), jnp.zeros((7, 1, 4, 1)))


def test_backend_auto_selection():
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.ops.backend_select import choose_backend

    import blackbox_mpc_tpu.ops.backend_select as bs

    small = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(32, 32))
    big = LearnedDynamicsConfig(dim_s=17, dim_u=6, hidden=(500, 500, 500), ensemble_size=5)
    prob = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(32, 32), probabilistic=True)
    # Measured r2 sweep: XLA wins every in-HBM shape, so auto never picks the plain
    # pallas rollout kernel (benchmarks/backend_regimes_r2.jsonl).
    assert choose_backend(small, 256, 1, platform="tpu") == "xla"
    assert choose_backend(big, 1000, 1, platform="tpu") == "xla"       # flagship: XLA wins
    assert choose_backend(None, 256, 1, platform="tpu") == "xla"       # true model
    assert choose_backend(prob, 256, 1, platform="tpu") == "xla"       # deterministic only
    assert choose_backend(small, 256, 1, platform="tpu", mesh=object()) == "xla"
    # The width/rows gate is a re-measurement hook: enabling it restores the regime rule.
    orig = (bs.PALLAS_MAX_WIDTH, bs.PALLAS_MAX_ROWS)
    try:
        bs.PALLAS_MAX_WIDTH, bs.PALLAS_MAX_ROWS = 64, 4096
        assert choose_backend(small, 256, 1, platform="tpu") == "pallas"
        assert choose_backend(small, 100000, 1, platform="tpu") == "xla"  # beyond rows gate
        assert choose_backend(small, 256, 1, platform="cpu") == "xla"     # Mosaic needs TPU
    finally:
        bs.PALLAS_MAX_WIDTH, bs.PALLAS_MAX_ROWS = orig


def test_mpc_policy_auto_backend_resolves_on_cpu():
    import numpy as np

    from blackbox_mpc_tpu.core.spaces import BoxSpace
    from blackbox_mpc_tpu.learning import DynamicsHandler
    from blackbox_mpc_tpu.models import pendulum_reward
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.policies import MPCPolicy

    handler = DynamicsHandler(config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(32, 32)))
    policy = MPCPolicy(
        action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
        reward_function=pendulum_reward,
        dynamics_handler=handler,
        solver_name="CEM",
        planning_horizon=5,
        population=64,
        num_elite=8,
        rollout_backend="auto",
    )
    # On the CPU test platform auto must fall back to the XLA scan (Mosaic is TPU-only)
    # and the policy must actually act.
    assert policy._rollout_backend == "xla"
    action, _, _ = policy.act(np.asarray([1.0, 0.0, 0.0], np.float32))
    assert np.isfinite(action).all()


@pytest.mark.parametrize("propagation,ensemble", [("mean", 2), ("ts1", 2), ("mean", 1)])
def test_streamed_rollout_bitmatches_block(propagation, ensemble, rng):
    """The streamed ((tiles, H) grid, per-step action blocks) kernel must reproduce the
    block kernel exactly — same step math, same repeated-multiply discounting, only the
    schedule differs. Covers mean/ts1 and a non-unit discount."""
    cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=2, hidden=(16, 16), ensemble_size=ensemble, propagation=propagation,
    )
    init_model, _ = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    P, A, H = 44, 2, 6  # rows = 88: exercises both kernels' padding
    acts = jnp.asarray(rng.uniform(-1, 1, size=(P, A, H, 2)).astype(np.float32))
    s0 = jnp.asarray(rng.uniform(-1, 1, size=(A, 3)).astype(np.float32))
    kw = dict(discount=0.95, interpret=True)
    block = make_pallas_rollout_evaluator(cfg, reward_fn, streamed=False, **kw)
    stream = make_pallas_rollout_evaluator(cfg, reward_fn, streamed=True, **kw)
    a = np.asarray(block(dp, s0, acts))
    b = np.asarray(stream(dp, s0, acts))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
