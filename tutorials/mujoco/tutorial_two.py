"""Tutorial: iterative MBRL on MuJoCo HalfCheetah (collect-with-MPC + retrain).

Counterpart of the reference's ``tutorials/mujoco/tutorial_two.py`` (its flagship demo:
10 outer iterations on HalfCheetah). Scaled-down defaults so it runs in minutes on CPU; raise
--refinements/--steps for the full experience.
"""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from _common import setup

args = setup("Iterative MBRL on HalfCheetah", refinements=2, steps=100, num_envs=2)

import jax.numpy as jnp
import numpy as np

from blackbox_mpc_tpu import LearnedDynamicsConfig, learn_dynamics_iteratively_w_mpc
from blackbox_mpc_tpu.envs import make_gym_vec_env


def cheetah_reward(state, action, next_state):
    return (next_state[:, 0] - state[:, 0]) / 0.05 - 0.1 * jnp.sum(
        jnp.square(action), axis=-1
    )


env = make_gym_vec_env(
    "HalfCheetah-v5", num_envs=args.num_envs, mode="subprocess", base_seed=args.seed,
    exclude_current_positions_from_observation=False,
)
handler, policy = learn_dynamics_iteratively_w_mpc(
    env,
    cheetah_reward,
    solver_name="CEM",
    planning_horizon=15,
    number_of_initial_rollouts=3,
    number_of_rollouts_per_refinement=1,
    number_of_refinement_steps=args.refinements,
    rollout_horizon=args.steps,
    dynamics_config=LearnedDynamicsConfig(
        dim_s=env.observation_space.dim, dim_u=env.action_space.dim, hidden=(500, 500, 500)
    ),
    epochs=15,
    batch_size=256,
    population=512,
    num_elite=50,
    max_iterations=5,
    seed=args.seed,
)
env.close()
print("done; handler replay size:", len(handler.replay))
