"""Regression tests for the round-2 code-review findings (each was a live bug)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core import Bounds
from blackbox_mpc_tpu.models import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import SOLVER_REGISTRY, make_solver


def test_load_pre_rng_checkpoint(tmp_path):
    """Checkpoints saved before replay carried an RNG state must still restore.

    The orbax restore template is built from a fresh state_dict (which now includes
    "rng"); without trimming it to the saved structure, restore raises on the mismatch
    and the load_state_dict backward-compat guard is unreachable.
    """
    import orbax.checkpoint as ocp

    from blackbox_mpc_tpu.learning import DynamicsHandler
    from blackbox_mpc_tpu.models import LearnedDynamicsConfig

    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,))
    handler = DynamicsHandler(config=cfg, seed=0)
    s = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)
    a = np.zeros((64, 1), np.float32)
    handler.replay.add_transitions(s, a, s)
    handler.train(epochs=1, batch_size=32)
    d = str(tmp_path / "ckpt")
    handler.save(d)
    # Rewrite the checkpoint without replay["rng"], simulating the pre-round-2 format —
    # which also predates the r5 config.json stamp/manifest, so strip those too (a
    # stamped checkpoint whose manifest disagrees with its payload is corruption, not
    # a compat case).
    import json

    ck = ocp.PyTreeCheckpointer()
    payload = ck.restore(os.path.join(d, "checkpoint"))
    payload["replay"].pop("rng")
    ck.save(os.path.join(d, "checkpoint"), payload, force=True)
    with open(os.path.join(d, "config.json")) as f:
        meta = json.load(f)
    meta.pop("format_version", None)
    meta.pop("replay_keys", None)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(meta, f)

    restored = DynamicsHandler.load(d)
    assert len(restored.replay) == len(handler.replay)
    pred = restored.predict(s[:4], a[:4])
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(handler.predict(s[:4], a[:4])), rtol=1e-5
    )


def test_shm_fork_default_supports_parent_registered_env():
    """Default start method must inherit parent state: envs registered in this process
    (id only exists here) must construct in the workers."""
    import gymnasium

    from blackbox_mpc_tpu.envs.shm_vec_env import make_shm_vec_env

    env_id = "RegressionPendulum-v0"
    if env_id not in gymnasium.registry:
        gymnasium.register(
            id=env_id,
            entry_point="gymnasium.envs.classic_control:PendulumEnv",
            max_episode_steps=200,
        )
    env = make_shm_vec_env(env_id, num_envs=2, base_seed=0)
    try:
        obs = env.reset(seed=1)
        assert obs.shape == (2, 3)
        obs2, rew, done, _ = env.step(np.zeros((2, 1), np.float32))
        assert obs2.shape == (2, 3) and np.isfinite(rew).all()
    finally:
        env.close()


def test_shm_nonfork_requires_picklable():
    """Non-fork start methods fail fast with a clear message on unpicklable env_fns."""
    from blackbox_mpc_tpu.envs.shm_vec_env import ShmVecEnv

    closure_env = lambda: None  # noqa: E731 — lambdas don't pickle
    with pytest.raises(ValueError, match="picklable"):
        ShmVecEnv([closure_env], dim_s=3, dim_u=1, start_method="spawn")


def test_shm_seed_int32_boundary():
    """The largest valid per-rank seed is exactly INT32_MAX — must not be rejected."""
    from blackbox_mpc_tpu.envs.shm_vec_env import make_shm_vec_env

    env = make_shm_vec_env("Pendulum-v1", num_envs=1, base_seed=0)
    try:
        obs = env.reset(seed=2**31 - 1)
        assert obs.shape == (1, 3)
        with pytest.raises(ValueError, match="int32"):
            env.reset(seed=2**31)  # rank 0's seed would overflow
    finally:
        env.close()


@pytest.mark.parametrize("name", sorted(SOLVER_REGISTRY))
def test_solver_state_dtype_bf16(name):
    """SolverConfig.dtype must actually work: bf16-stored state solves without trace
    errors, state leaves round-trip in bf16, and actions stay f32."""
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
    kw = dict(
        planning_horizon=8, num_agents=1, population=32, max_iterations=2,
        dtype=jnp.bfloat16,
    )
    if name in ("CEM", "CEM-GD", "CMA-ES"):
        kw["num_elite"] = 8
    solver = make_solver(name, bounds, evaluate, **kw)
    state = solver.init(jax.random.PRNGKey(0))
    obs = jnp.asarray([[-1.0, 0.0, 0.0]])
    action, new_state, aux = jax.jit(solver.solve)(
        state, obs, jnp.asarray(0), jax.random.PRNGKey(1)
    )
    assert action.dtype == jnp.float32
    assert np.isfinite(np.asarray(action)).all()
    float_dtypes = {
        x.dtype for x in jax.tree.leaves(new_state)
        if jnp.issubdtype(x.dtype, jnp.floating)
    }
    assert float_dtypes <= {jnp.dtype(jnp.bfloat16)}, float_dtypes
    # reset also lands back in the storage dtype
    reset_state = solver.reset(new_state, jax.random.PRNGKey(2))
    float_dtypes = {
        x.dtype for x in jax.tree.leaves(reset_state)
        if jnp.issubdtype(x.dtype, jnp.floating)
    }
    assert float_dtypes <= {jnp.dtype(jnp.bfloat16)}, float_dtypes


def _true_model_policy(num_agents=1, writer=None):
    from blackbox_mpc_tpu.core.spaces import BoxSpace
    from blackbox_mpc_tpu.learning import DynamicsHandler
    from blackbox_mpc_tpu.policies import MPCPolicy

    return MPCPolicy(
        action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name="CEM",
        planning_horizon=8,
        num_agents=num_agents,
        population=32,
        num_elite=8,
        max_iterations=2,
        metrics_writer=writer,
        seed=0,
    )


def test_pipeline_emits_predicted_reward_scalar():
    """overlap mode must keep the reference-parity per-step scalar flowing."""
    from blackbox_mpc_tpu.policies.pipeline import SpeculativePipeline
    from blackbox_mpc_tpu.utils.metrics import MetricsWriter

    writer = MetricsWriter()
    pipe = SpeculativePipeline(_true_model_policy(writer=writer))
    pipe.reset()
    obs = np.asarray([-1.0, 0.0, 0.0], np.float32)
    for t in range(3):
        action, obs, _, _ = pipe.act(obs, t)
    assert len(writer.history["rewards/predicted_reward"]) == 3


def test_pipeline_batch_mismatch_raises():
    """Size mismatches fail with the same clear error as MPCPolicy.act, not a jit error."""
    from blackbox_mpc_tpu.policies.pipeline import SpeculativePipeline

    pipe = SpeculativePipeline(_true_model_policy(num_agents=1))
    pipe.reset()
    with pytest.raises(ValueError, match="num_agents"):
        pipe.act(np.zeros((3, 3), np.float32), 0)


@pytest.mark.parametrize("name", ["CMA-ES", "SPSA", "PSO"])
def test_every_stateful_solver_works_through_mpc_policy(name):
    """Regression: CMA-ES's factory called np.asarray on the jnp-backed
    bounds.default_variance, which is a tracer when MPCPolicy builds the solver inside its
    jitted step — making CMA-ES unusable through the policy facade (solver-level tests
    built it outside jit and never caught it)."""
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv
    from blackbox_mpc_tpu.learning.handler import DynamicsHandler
    from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy

    env = NativePendulumVecEnv()
    kw = {"num_elite": 8} if name == "CMA-ES" else {}
    policy = MPCPolicy(
        action_space=env.action_space, reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name=name, num_agents=1, planning_horizon=8,
        population=32, max_iterations=2, **kw,
    )
    a, _, _ = policy.act(np.asarray([[-1.0, 0.0, 0.0]], np.float32), 0)
    assert a.shape == (1, 1) and np.isfinite(a).all()
