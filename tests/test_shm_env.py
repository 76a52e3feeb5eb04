"""Shared-memory vec env: parity with the pipe backend + workflow integration."""
import os
import numpy as np
import pytest

from blackbox_mpc_tpu.envs import make_gym_vec_env
from blackbox_mpc_tpu.envs.shm_vec_env import ShmVecEnv, make_shm_vec_env


@pytest.fixture(scope="module")
def envs():
    shm = make_shm_vec_env("Pendulum-v1", num_envs=3, base_seed=7)
    sub = make_gym_vec_env("Pendulum-v1", num_envs=3, mode="subprocess", base_seed=7)
    yield shm, sub
    shm.close()
    sub.close()


def test_shm_matches_pipe_backend(envs):
    shm, sub = envs
    o1, o2 = shm.reset(), sub.reset()
    np.testing.assert_allclose(o1, o2, atol=1e-6)
    rng = np.random.default_rng(0)
    for _ in range(10):
        a = rng.uniform(-2, 2, (3, 1)).astype(np.float32)
        obs1, rew1, done1, _ = shm.step(a)
        obs2, rew2, done2, _ = sub.step(a)
        np.testing.assert_allclose(obs1, obs2, atol=1e-5)
        np.testing.assert_allclose(rew1, rew2, atol=1e-5)
        np.testing.assert_array_equal(done1, done2)


def test_shm_async_guards(envs):
    shm, _ = envs
    shm.reset()
    with pytest.raises(RuntimeError, match="without step_async"):
        shm.step_wait()
    shm.step_async(np.zeros((3, 1), np.float32))
    with pytest.raises(RuntimeError, match="already pending"):
        shm.step_async(np.zeros((3, 1), np.float32))
    shm.step_wait()


def test_shm_worker_error_raises():
    class Broken:
        def __init__(self):
            from blackbox_mpc_tpu.core.spaces import BoxSpace

            self.action_space = BoxSpace.of(-1, 1, dim=1)
            self.observation_space = BoxSpace.of(-1, 1, dim=2)

        def reset(self, seed=None):
            return np.zeros(2, np.float32), {}

        def step(self, a):
            raise RuntimeError("boom")

        def close(self):
            pass

    env = ShmVecEnv([Broken] * 2, dim_s=2, dim_u=1, step_timeout_s=10)
    env.reset()
    env.step_async(np.zeros((2, 1), np.float32))
    with pytest.raises(RuntimeError, match="worker .* error"):
        env.step_wait()
    env.close()


def test_shm_works_with_perform_rollouts():
    from blackbox_mpc_tpu import RandomPolicy, perform_rollouts

    env = make_shm_vec_env("Pendulum-v1", num_envs=2, base_seed=0)
    try:
        result = perform_rollouts(
            env, RandomPolicy(env.action_space, num_agents=2, seed=0),
            number_of_rollouts=1, rollout_horizon=15,
        )
        assert result["observations"][0].shape == (16, 2, 3)
    finally:
        env.close()


def test_native_protocol_tsan_clean():
    """Race-detection artifact (SURVEY §5.2): the lock-free shm status protocol passes
    ThreadSanitizer — 4 worker threads x 20k handshakes with payload verification."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    native = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
    result = subprocess.run(
        ["make", "-C", native, "tsan"], capture_output=True, text=True, timeout=300
    )
    assert result.returncode == 0, f"tsan harness failed:\n{result.stdout}\n{result.stderr}"
    assert "tsan_test OK" in result.stdout
