"""Tutorial: record a video of an MPC rollout.

Counterpart of the reference's ``tutorials/record_videos/tutorial_one.py``.
"""
import sys, pathlib, tempfile, os

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from _common import setup

args = setup("Record an MPC rollout video", steps=80)

from blackbox_mpc_tpu import DynamicsHandler, MPCPolicy, record_rollout
from blackbox_mpc_tpu.envs import NativePendulumVecEnv
from blackbox_mpc_tpu.models import pendulum_dynamics, pendulum_reward

env = NativePendulumVecEnv(num_envs=1, seed=args.seed)
policy = MPCPolicy(
    action_space=env.action_space, reward_function=pendulum_reward,
    dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
    solver_name="CEM", num_agents=1, planning_horizon=25,
    population=256, num_elite=25, max_iterations=5,
)
path = os.path.join(tempfile.mkdtemp(prefix="bbmpc_video_"), "pendulum.gif")
reward = record_rollout(env, policy, horizon=args.steps, path=path)
print(f"wrote {path} (episode reward {reward:.1f})")
