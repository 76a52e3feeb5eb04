"""Aux subsystem tests: worker crash recovery, MBRL loop resume, profiling hook."""
import json
import os

import numpy as np
import pytest

from blackbox_mpc_tpu import LearnedDynamicsConfig, learn_dynamics_iteratively_w_mpc
from blackbox_mpc_tpu.envs import NativePendulumVecEnv, make_custom_vec_env
from blackbox_mpc_tpu.models import pendulum_reward


class CrashingEnv:
    """Minimal gymnasium-like env that kills its process on a magic action."""

    def __init__(self):
        from blackbox_mpc_tpu.core.spaces import BoxSpace

        self.action_space = BoxSpace.of(-1.0, 1.0, dim=1)
        self.observation_space = BoxSpace.of(-10.0, 10.0, dim=2)
        self._t = 0

    def reset(self, seed=None):
        self._t = 0
        return np.zeros(2, np.float32), {}

    def step(self, action):
        if float(np.asarray(action).ravel()[0]) > 0.9:
            os._exit(1)  # simulate a hard crash
        self._t += 1
        return np.zeros(2, np.float32), 0.0, False, False, {}

    def close(self):
        pass


def test_subprocess_worker_crash_raises_without_restart():
    env = make_custom_vec_env(CrashingEnv, num_envs=2, mode="subprocess")
    env.reset()
    with pytest.raises(RuntimeError, match="died|failed"):
        env.step(np.array([[1.0], [0.0]]))
    env.close()


def test_subprocess_worker_crash_restarts():
    env = make_custom_vec_env(CrashingEnv, num_envs=2, mode="subprocess", restart_on_crash=True)
    env.reset()
    obs, rew, done, infos = env.step(np.array([[1.0], [0.0]]))
    assert done[0] and not done[1]
    assert infos[0].get("worker_restarted")
    # restarted worker keeps serving
    obs, rew, done, infos = env.step(np.array([[0.0], [0.0]]))
    assert not done[0]
    env.close()


def test_mbrl_loop_checkpoint_resume(tmp_path):
    ckpt = str(tmp_path / "loop")
    common = dict(
        reward_function=pendulum_reward,
        solver_name="RandomSearch",
        planning_horizon=8,
        number_of_rollouts_per_refinement=1,
        rollout_horizon=20,
        dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)),
        epochs=2,
        batch_size=64,
        population=64,
        checkpoint_dir=ckpt,
        seed=0,
    )
    env = NativePendulumVecEnv(num_envs=1, seed=0, max_episode_steps=20)
    learn_dynamics_iteratively_w_mpc(
        env, number_of_initial_rollouts=2, number_of_refinement_steps=1, **common
    )
    with open(os.path.join(ckpt, "loop_state.json")) as f:
        assert json.load(f)["completed_refinements"] == 1
    # resume continues from refinement 1 to 3 without re-bootstrapping
    handler, policy = learn_dynamics_iteratively_w_mpc(
        env, number_of_initial_rollouts=2, number_of_refinement_steps=3, resume=True, **common
    )
    with open(os.path.join(ckpt, "loop_state.json")) as f:
        assert json.load(f)["completed_refinements"] == 3
    assert len(handler.replay) > 0


def test_profiler_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp

    from blackbox_mpc_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))).block_until_ready()
    # jax writes plugins/profile/<ts>/*.trace.json.gz (or xplane.pb)
    found = []
    for root, _dirs, files in os.walk(str(tmp_path)):
        found += files
    assert found, "profiler trace produced no files"


def test_mbrl_loop_seed_determinism():
    """Two identical-seed MBRL loops produce bit-identical episode rewards end to end
    (replay split, minibatch order, solver RNG, env seeding all key off the one seed) —
    the property that let episodes 1-35 of the full HalfCheetah BC run bit-replicate the
    truncated run (docs/api.md)."""
    from blackbox_mpc_tpu.utils.metrics import MetricsWriter

    def run():
        env = NativePendulumVecEnv(num_envs=2, seed=0, max_episode_steps=15)
        writer = MetricsWriter(tensorboard=False)
        learn_dynamics_iteratively_w_mpc(
            env,
            pendulum_reward,
            solver_name="CEM",
            planning_horizon=6,
            number_of_initial_rollouts=2,
            number_of_rollouts_per_refinement=1,
            number_of_refinement_steps=2,
            rollout_horizon=15,
            dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)),
            epochs=2,
            batch_size=64,
            population=64,
            num_elite=8,
            max_iterations=2,
            metrics_writer=writer,
            seed=123,
        )
        return [v for _, v in writer.history["rewards/actual_episode_reward"]]

    first, second = run(), run()
    assert len(first) >= 4
    np.testing.assert_array_equal(np.asarray(first), np.asarray(second))
