"""Tutorial: iterative MBRL with TensorBoard metrics and full checkpoint/resume.

Counterpart of the reference's ``tutorials/model_based_RL/tutorial_two.py``
(``/root/reference/tutorials/model_based_RL/tutorial_two.py``: the iterative loop with a
``tf_writer`` recording everything to TensorBoard). Here the :class:`MetricsWriter` records
the same scalar families (actual/predicted rewards, model error, train/val loss) plus
perf counters to TensorBoard + JSONL, and ``checkpoint_dir`` + ``resume=True`` continue an
interrupted loop — model, optimizer state, normalizer, replay, and loop counter included
(the reference can only reload the model weights).

Run once, interrupt, run again with ``--resume``: the loop picks up at the next refinement.
"""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from _common import setup

args = setup("Iterative MBRL with metrics + resume", refinements=3, steps=80,
             logdir="/tmp/bbmpc_mbrl_tb", ckpt="/tmp/bbmpc_mbrl_ckpt")
_resume = "--resume" in sys.argv  # setup() uses parse_known_args, so this passes through

import numpy as np

from blackbox_mpc_tpu import (LearnedDynamicsConfig, RandomPolicy,
                              learn_dynamics_iteratively_w_mpc, perform_rollouts)
from blackbox_mpc_tpu.envs import NativePendulumVecEnv
from blackbox_mpc_tpu.models import pendulum_reward
from blackbox_mpc_tpu.utils.metrics import MetricsWriter

writer = MetricsWriter(args.logdir)
env = NativePendulumVecEnv(num_envs=2, seed=args.seed, max_episode_steps=args.steps)
handler, policy = learn_dynamics_iteratively_w_mpc(
    env,
    pendulum_reward,
    solver_name="CEM",
    planning_horizon=20,
    number_of_initial_rollouts=5,
    number_of_rollouts_per_refinement=1,
    number_of_refinement_steps=args.refinements,
    rollout_horizon=args.steps,
    dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(64, 64)),
    epochs=25,
    batch_size=128,
    population=256,
    num_elite=25,
    max_iterations=5,
    metrics_writer=writer,
    checkpoint_dir=args.ckpt,
    resume=_resume,
    seed=args.seed,
)
final = perform_rollouts(env, policy, number_of_rollouts=2, rollout_horizon=args.steps,
                         metrics_writer=writer)
print(f"final MPC mean episode reward: {np.mean(final['reward_sum']):.1f}")
print(f"TensorBoard scalars in {args.logdir}; checkpoints in {args.ckpt}")
print(f"recorded tags: {sorted(writer.history)}")
