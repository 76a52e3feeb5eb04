"""Tutorial: export an MPC policy to a standalone serving artifact and control with it.

The reference's deployment story stops at SavedModel export of the dynamics function
(``/root/reference/blackbox_mpc/dynamics_handlers/system_dynamics_handler.py:213-241``);
the controller itself was never deployable. Here the whole policy step becomes one
``.bbmpc`` file (serialized StableHLO via ``jax.export``), and ``ServingPolicy`` — a
self-contained loader — drives the control loop with no framework code and no re-tracing,
bit-identically to the live policy. See ``docs/deployment.md``.
"""
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from _common import setup

args = setup("Deploy: export + serve", steps=60)

import numpy as np

from blackbox_mpc_tpu import (
    DynamicsHandler,
    MPCPolicy,
    ServingPolicy,
    export_policy_artifact,
    perform_rollouts,
)
from blackbox_mpc_tpu.envs import NativePendulumVecEnv
from blackbox_mpc_tpu.models import pendulum_dynamics, pendulum_reward

env = NativePendulumVecEnv(num_envs=1, seed=args.seed)
policy = MPCPolicy(
    action_space=env.action_space, reward_function=pendulum_reward,
    dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
    solver_name="CEM", planning_horizon=20, population=256, num_elite=25,
    max_iterations=5, seed=args.seed,
)

artifact = str(pathlib.Path(tempfile.mkdtemp(prefix="bbmpc_deploy_")) / "controller.bbmpc")
meta = export_policy_artifact(policy, artifact, dim_s=3)
size_kb = pathlib.Path(artifact).stat().st_size // 1024
print(f"exported {meta['solver_name']} controller -> {artifact} ({size_kb} KB, "
      f"platforms={meta['platforms']})")

# Serve it: the artifact alone drives the env (in production, copy deploy/serving.py +
# the .bbmpc file into the container — nothing else is needed).
serving = ServingPolicy.load(artifact)
result = perform_rollouts(env, serving, number_of_rollouts=1, rollout_horizon=args.steps)
print(f"served-artifact episode reward: {result['reward_sum'][0]:.1f}")

# The served controller is bit-identical to the live one from the export point.
live_action, _, _ = policy.act(np.array([1.0, 0.0, 0.0], np.float32))
srv2 = ServingPolicy.load(artifact)
served_action, _, _ = srv2.act(np.array([1.0, 0.0, 0.0], np.float32))
assert np.array_equal(live_action, served_action), "serving must bit-match the live policy"
print(f"bitwise match vs live policy: action={served_action}")
env.close()
