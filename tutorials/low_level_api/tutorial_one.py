"""Tutorial: composing the low-level pure-function API directly.

Counterpart of the reference's ``tutorials/low_level_api/tutorial_one.py``, showing what the
``MPCPolicy`` facade assembles: bounds -> evaluator -> solver triple -> jitted solve loop.
"""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from _common import setup

args = setup("Low-level solver API", steps=80)

import jax
import jax.numpy as jnp

from blackbox_mpc_tpu.core import Bounds
from blackbox_mpc_tpu.models import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import make_solver

bounds = Bounds.of(-2.0, 2.0, dim=1)
evaluate = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
solver = make_solver(
    "CEM", bounds, evaluate,
    planning_horizon=25, num_agents=1, population=256, num_elite=25, max_iterations=5,
)
key = jax.random.PRNGKey(args.seed)
state = solver.init(key)
solve = jax.jit(solver.solve)

obs = jnp.asarray([[-1.0, 0.0, 0.0]])  # hanging down
total = 0.0
for t in range(args.steps):
    key, sub = jax.random.split(key)
    action, state, aux = solve(state, obs, jnp.asarray(t), sub)
    nxt = pendulum_dynamics(obs, action)
    total += float(pendulum_reward(obs, action, nxt)[0])
    obs = nxt
print(f"episode reward {total:.1f}, final cos(theta) {float(obs[0,0]):+.2f}, "
      f"expected plan reward {float(aux.expected_reward[0]):.1f}")
