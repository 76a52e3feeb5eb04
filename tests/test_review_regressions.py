"""Regression tests for the round-1 code-review findings (each was a live bug)."""
import copy

import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu import DynamicsHandler, MPCPolicy, RandomPolicy, perform_rollouts
from blackbox_mpc_tpu.envs import NativePendulumVecEnv
from blackbox_mpc_tpu.models import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.workflows.dynamics_learning import rollouts_to_episodes


def _policy(solver="CEM", **kw):
    defaults = dict(planning_horizon=10, population=64, max_iterations=2)
    if solver in ("CEM", "CMA-ES"):
        defaults["num_elite"] = 8
    defaults.update(kw)
    return MPCPolicy(
        action_space=NativePendulumVecEnv().action_space,
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name=solver,
        num_agents=1,
        **defaults,
    )


def test_switch_solver_across_config_families():
    """CEM's num_elite must not leak into PI2's config (was a TypeError)."""
    policy = _policy("CEM")
    policy.act(np.array([-1.0, 0.0, 0.0]), 0)
    policy.switch_solver("PI2")
    action, _, _ = policy.act(np.array([-1.0, 0.0, 0.0]), 1)
    assert action.shape == (1,)
    policy.switch_solver("SPSA")
    policy.act(np.array([-1.0, 0.0, 0.0]), 2)


def test_plan_does_not_mutate_solver_state():
    """plan() is a read-only query (was warm-start-shifting PI2/SPSA state)."""
    policy = _policy("PI2")
    policy.act(np.array([-1.0, 0.0, 0.0]), 0)
    before = np.asarray(policy._solver_state.mean).copy()
    policy.plan(np.array([-1.0, 0.0, 0.0]), 1)
    np.testing.assert_array_equal(before, np.asarray(policy._solver_state.mean))


def test_native_pendulum_matches_gymnasium_at_saturation():
    """Velocity must clip BEFORE theta integration (gymnasium order; old-gym drifts)."""
    gymnasium = pytest.importorskip("gymnasium")
    env_g = gymnasium.make("Pendulum-v1")
    env_g.reset(seed=0)
    env_g.unwrapped.state = np.array([np.pi, 7.9])  # near the +-8 thdot clip
    obs_g = env_g.step(np.array([2.0]))[0]
    nat = NativePendulumVecEnv(1)
    nat._th[:] = np.pi
    nat._thdot[:] = 7.9
    obs_n = nat.step(np.array([[2.0]]))[0][0]
    np.testing.assert_allclose(obs_g, obs_n, atol=1e-5)
    # the analytic model agrees with both
    model_next = np.asarray(
        pendulum_dynamics(jnp.asarray(obs_n - obs_n + [np.cos(np.pi), np.sin(np.pi), 7.9])[None],
                          jnp.asarray([[2.0]]))
    )[0]
    np.testing.assert_allclose(model_next, obs_g, atol=1e-5)


def test_rollouts_to_episodes_truncates_at_done():
    """Post-terminal transitions of early-finishing envs must not reach training."""
    result = {
        "observations": [np.arange(6 * 2 * 1).reshape(6, 2, 1).astype(np.float32)],
        "actions": [np.zeros((5, 2, 1), np.float32)],
        "dones": [np.array([
            [False, False], [True, False], [False, False], [False, False], [False, True],
        ])],
    }
    obs_eps, act_eps = rollouts_to_episodes(result)
    assert [o.shape[0] for o in obs_eps] == [3, 6]  # env0 stops at done t=1 (2 actions + s')
    assert [a.shape[0] for a in act_eps] == [2, 5]


def test_rollout_result_attribute_protocols():
    env = NativePendulumVecEnv(1, max_episode_steps=5)
    r = perform_rollouts(env, RandomPolicy(env.action_space, 1), 1, 5)
    assert not hasattr(r, "bogus_attribute")
    assert copy.deepcopy(r)["reward_sum"] == r["reward_sum"]
    assert r.dones[0].shape == (5, 1)


def test_construction_rejects_unknown_kwargs():
    """Typo'd kwargs at construction must raise (silent dropping hid wrong configs)."""
    with pytest.raises(TypeError, match="population_size"):
        _policy("CEM", population_size=5000)


def test_fused_cem_validates_config():
    import jax

    from blackbox_mpc_tpu.core.types import Bounds
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
    from blackbox_mpc_tpu.ops.pallas_cem import make_fused_cem, make_fused_cem_kernels
    from blackbox_mpc_tpu.solvers.cem import CEMConfig

    dyn_cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(8,))
    init_model, _ = make_learned_dynamics(dyn_cfg)
    dp = init_model(jax.random.PRNGKey(0))
    bounds = Bounds.of(-1.0, 1.0, dim=1)
    with pytest.raises(ValueError, match="num_elite"):
        make_fused_cem(CEMConfig(population=8, num_elite=64), bounds, dyn_cfg, dp,
                       lambda s, a, ns: ns[:, 0])
    # colored_noise_beta is SUPPORTED since round 3; population_decay since round 4
    # (per-iteration kernel grids, unrolled) — only an INVALID decay value rejects.
    with pytest.raises(ValueError, match="population_decay"):
        make_fused_cem(CEMConfig(population=64, num_elite=8, population_decay=1.5),
                       bounds, dyn_cfg, dp, lambda s, a, ns: ns[:, 0])
    with pytest.raises(ValueError, match="2\\^32"):
        make_fused_cem_kernels(dyn_cfg, lambda s, a, ns: ns[:, 0], horizon=50,
                               agents=1, population=300_000_000)


def test_shm_rejects_negative_seed():
    from blackbox_mpc_tpu.envs.shm_vec_env import make_shm_vec_env

    env = make_shm_vec_env("Pendulum-v1", num_envs=1, base_seed=0)
    try:
        with pytest.raises(ValueError, match="non-negative"):
            env.reset(seed=-1)
        env.reset(seed=3)  # env still alive after the rejected call
    finally:
        env.close()


def test_replay_rng_state_roundtrip():
    """Resumed replay buffers continue the same RNG stream (ADVICE r1: handler.py:272)."""
    import numpy as np

    from blackbox_mpc_tpu.learning.replay import ReplayBuffer

    def fresh(seed=7):
        rb = ReplayBuffer(dim_s=2, dim_u=1, seed=seed)
        rb.add_transitions(np.zeros((40, 2)), np.zeros((40, 1)), np.zeros((40, 2)))
        return rb

    a, b = fresh(), fresh()
    # advance a's stream, snapshot, restore into b
    list(a.minibatches(8, ensemble_size=3))
    b.load_state_dict(a.state_dict())
    next_a = [x[0].copy() for x in a.minibatches(8, ensemble_size=3)]
    next_b = [x[0].copy() for x in b.minibatches(8, ensemble_size=3)]
    for x, y in zip(next_a, next_b):
        np.testing.assert_array_equal(x, y)
    # and the val-split of future additions matches too
    a.add_transitions(np.ones((40, 2)), np.ones((40, 1)), np.ones((40, 2)))
    b.add_transitions(np.ones((40, 2)), np.ones((40, 1)), np.ones((40, 2)))
    np.testing.assert_array_equal(a.state_dict()["is_val"], b.state_dict()["is_val"])


def test_shm_reset_guards_pending_step():
    """reset() during a pending step_async must raise, not consume stale output."""
    from blackbox_mpc_tpu.envs.shm_vec_env import make_shm_vec_env

    env = make_shm_vec_env("Pendulum-v1", num_envs=1, base_seed=0)
    try:
        env.reset()
        env.step_async(np.zeros((1, 1), np.float32))
        with pytest.raises(RuntimeError, match="pending"):
            env.reset()
        env.step_wait()  # drain; env still usable
        env.reset(seed=5)
    finally:
        env.close()


def test_shm_large_seed_exact():
    """Seeds above 2^24 must transport exactly (int32 slot, not float32)."""
    from blackbox_mpc_tpu.envs.shm_vec_env import make_shm_vec_env

    big = 2**24 + 3  # not representable in float32
    env = make_shm_vec_env("Pendulum-v1", num_envs=1, base_seed=0)
    env2 = make_shm_vec_env("Pendulum-v1", num_envs=1, base_seed=0)
    try:
        obs1 = env.reset(seed=big)
        obs2 = env2.reset(seed=big)
        np.testing.assert_array_equal(obs1, obs2)
        obs3 = env2.reset(seed=big + 1)
        assert not np.array_equal(obs1, obs3)
    finally:
        env.close()
        env2.close()
