"""Tutorial: population-sharded MPC over a device mesh (new capability vs. the reference).

Runs the same CEM solve single-device and sharded over all available devices (use
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` for a virtual CPU mesh) and checks the
results agree — the sharding is a layout annotation, not a math change.
"""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from _common import setup

args = setup("Sharded MPC over a device mesh")

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_mpc_tpu.core import Bounds
from blackbox_mpc_tpu.models import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.parallel import make_pop_mesh, make_sharded_evaluator
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import make_solver

n = len(jax.devices())
print(f"{n} devices: {jax.devices()}")
mesh = make_pop_mesh(n)
bounds = Bounds.of(-2.0, 2.0, dim=1)
kwargs = dict(planning_horizon=25, num_agents=1, population=512, num_elite=50, max_iterations=5)
obs = jnp.asarray([[-1.0, 0.0, 0.0]])
key = jax.random.PRNGKey(args.seed)


def solve_with(evaluate):
    s = make_solver("CEM", bounds, evaluate, **kwargs)
    state = s.init(jax.random.PRNGKey(0))
    action, _, aux = jax.jit(s.solve)(state, obs, jnp.asarray(0), key)
    return np.asarray(action), float(aux.expected_reward[0])


a1, r1 = solve_with(make_trajectory_evaluator(pendulum_dynamics, pendulum_reward))
a2, r2 = solve_with(make_sharded_evaluator(pendulum_dynamics, pendulum_reward, mesh))
print(f"single-device action {a1.ravel()}, sharded action {a2.ravel()}")
print(f"expected rewards: {r1:.2f} vs {r2:.2f}")
assert np.allclose(a1, a2, atol=1e-4), "sharded solve diverged from single-device"
print("OK: sharded == single-device")
