"""Regression tests for the second round-2 code-review pass (each was a live bug)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core import Bounds
from blackbox_mpc_tpu.core.spaces import BoxSpace
from blackbox_mpc_tpu.learning import DynamicsHandler
from blackbox_mpc_tpu.models import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
from blackbox_mpc_tpu.policies import MPCPolicy
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import make_solver


def test_mbrl_loop_solver_lr_maps_to_cem_gd_field():
    """--solver-lr with CEM-GD must map to gd_learning_rate, not crash the strict-kwargs
    policy build with an unknown 'learning_rate' after the expensive bootstrap."""
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv
    from blackbox_mpc_tpu.workflows.iterative_mpc import learn_dynamics_iteratively_w_mpc

    env = NativePendulumVecEnv(num_envs=1, seed=0, max_episode_steps=5)
    handler, policy = learn_dynamics_iteratively_w_mpc(
        env,
        pendulum_reward,
        solver_name="CEM-GD",
        planning_horizon=4,
        number_of_initial_rollouts=1,
        number_of_rollouts_per_refinement=1,
        number_of_refinement_steps=0,
        rollout_horizon=5,
        dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)),
        epochs=1,
        batch_size=4,
        solver_learning_rate=0.05,
        population=16,
        num_elite=4,
        gd_candidates=2,
        max_iterations=1,
        gd_iterations=1,
    )
    assert policy.solver_name == "CEM-GD"
    # and the value actually landed in the CEM-GD Adam field
    assert policy._config.gd_learning_rate == 0.05


def test_shm_close_with_pending_step_exits_workers_cleanly():
    """close() during an in-flight step must not post the close sentinel while a worker
    is mid-step (its late DONE clobbers the sentinel; the worker then hangs to the join
    timeout and is hard-terminated)."""
    from blackbox_mpc_tpu.envs.shm_vec_env import make_shm_vec_env

    env = make_shm_vec_env("Pendulum-v1", num_envs=2, base_seed=0)
    try:
        env.reset()
        env.step_async(np.zeros((2, 1), np.float32))
    finally:
        procs = list(env._procs)
        env.close()
    for p in procs:
        assert not p.is_alive()
        assert p.exitcode == 0, f"worker hard-terminated (exitcode {p.exitcode})"


def test_backend_auto_rejects_fused_cem_incompatible_cem_features():
    """auto must not route configs that make_fused_cem rejects (keep_elites /
    colored noise) to the fused kernel — they would crash at the first act()."""
    from blackbox_mpc_tpu.ops.backend_select import choose_backend
    from blackbox_mpc_tpu.solvers.cem import CEMConfig

    dyn = LearnedDynamicsConfig(dim_s=17, dim_u=6, hidden=(200, 200))
    base = dict(planning_horizon=50, population=8_000_000, num_elite=50)
    common = dict(
        population=8_000_000, num_agents=1, platform="tpu",
        horizon=50, dim_u=6, solver_name="CEM",
    )
    plain = choose_backend(dyn, solver_config=CEMConfig(**base), **common)
    assert plain == "fused_cem"
    kept = choose_backend(
        dyn, solver_config=CEMConfig(**base, keep_elites=5), **common
    )
    assert kept == "xla"
    colored = choose_backend(
        dyn, solver_config=CEMConfig(**base, colored_noise_beta=2.0), **common
    )
    assert colored == "xla"


def test_fused_cem_honors_state_dtype_contract():
    """rollout_backend='fused_cem' with dtype=bfloat16: state stored bf16, update math
    upcast to f32 by the with_state_dtype wrapper (same contract as the XLA path)."""
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
        dtype=jnp.bfloat16,
    )
    action, _, pred_reward = policy.act(np.asarray([1.0, 0.0, 0.0], np.float32))
    assert np.isfinite(action).all() and np.isfinite(pred_reward)
    float_dtypes = {
        x.dtype for x in jax.tree.leaves(policy._solver_state)
        if jnp.issubdtype(x.dtype, jnp.floating)
    }
    assert float_dtypes == {jnp.dtype(jnp.bfloat16)}, float_dtypes


def _seeded_policy():
    return MPCPolicy(
        action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name="CEM",
        planning_horizon=8,
        num_agents=1,
        population=32,
        num_elite=8,
        max_iterations=2,
        seed=0,
    )


def test_plan_is_prng_transparent():
    """plan() is documented as a read-only query: interleaving it must not change the
    action sequence of a seeded run (it must not consume the policy PRNG stream)."""
    obs = np.asarray([-1.0, 0.0, 0.0], np.float32)
    pa = _seeded_policy()
    a1, _, _ = pa.act(obs, 0)
    a2, _, _ = pa.act(obs, 1)

    pb = _seeded_policy()
    b1, _, _ = pb.act(obs, 0)
    plan, expected = pb.plan(obs, 1)  # read-only query between the acts
    b2, _, _ = pb.act(obs, 1)

    np.testing.assert_array_equal(a1, b1)
    np.testing.assert_array_equal(a2, b2)
    assert plan.shape == (1, 8, 1) and np.isfinite(expected).all()


def test_cem_gd_validates_keep_elites():
    """CEM-GD shares cem_iteration; an out-of-range keep_elites must raise the same
    clear ValueError as CEM instead of an opaque scan carry-shape mismatch."""
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
    with pytest.raises(ValueError, match="keep_elites"):
        make_solver(
            "CEM-GD", bounds, evaluate,
            planning_horizon=4, population=32, num_elite=8, keep_elites=20,
        )


def test_native_pendulum_step_wait_misuse_raises():
    """step_wait without step_async raises the same clean RuntimeError as the other vec
    envs (was: AttributeError on the never-initialized _pending)."""
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv

    env = NativePendulumVecEnv(num_envs=2)
    with pytest.raises(RuntimeError, match="step_async"):
        env.step_wait()
    env.reset()
    env.step_async(np.zeros((2, 1), np.float32))
    obs, rew, done, infos = env.step_wait()
    assert obs.shape == (2, 3)
    with pytest.raises(RuntimeError, match="step_async"):
        env.step_wait()  # buffer already drained
