"""Tutorial: beyond-HBM planning with the fused solver family.

The standard MPC pipeline materializes the candidate tensor ``[population, agents, H, U]``
in HBM; at very large populations that tensor alone exceeds chip memory. The fused solvers
(``rollout_backend="fused"``) generate candidates INSIDE the TPU kernel from a counter-based
RNG and reduce elite/softmax moments by regenerating the same stream under a masked matmul —
the candidate tensor never exists, so a single v5e plans over millions of candidates
(measured: 4M candidates at 264-353M trajectory-steps/s — docs/performance.md), and with a
device mesh each chip handles its own shard (D x the capacity).

This tutorial runs SMALL shapes so it works anywhere (on CPU the kernels run in the
TPU-semantics interpreter): the same four solvers — CEM (with iCEM features), PI2/MPPI,
RandomSearch, sep-CMA-ES — each plan a pendulum swing-up step on a learned-dynamics-shaped
model through the one policy facade, then the CEM solve repeats sharded over all devices.
Scale ``--population`` up on a real chip to go beyond HBM for real.
"""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from _common import setup

args = setup("Beyond-HBM fused planning", population=512)

import jax
import numpy as np

from blackbox_mpc_tpu.core.spaces import BoxSpace
from blackbox_mpc_tpu.learning import DynamicsHandler
from blackbox_mpc_tpu.models import pendulum_reward
from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
from blackbox_mpc_tpu.parallel import make_pop_mesh
from blackbox_mpc_tpu.policies import MPCPolicy

handler = DynamicsHandler(config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(32, 32)))
space = BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0]))
obs = np.asarray([-1.0, 0.0, 0.0], np.float32)

configs = [
    ("CEM + iCEM features", "CEM",
     dict(num_elite=32, keep_elites=4, mean_as_candidate=True, execute_best=True)),
    ("PI2", "PI2", {}),
    ("MPPI (control cost)", "MPPI", {}),
    ("RandomSearch", "RandomSearch", dict(max_iterations=1)),
    ("sep-CMA-ES", "CMA-ES", dict(num_elite=32, diagonal=True)),
]
for label, solver_name, kw in configs:
    policy = MPCPolicy(
        action_space=space, reward_function=pendulum_reward, dynamics_handler=handler,
        solver_name=solver_name, planning_horizon=10, population=args.population,
        seed=args.seed, rollout_backend="fused", **{"max_iterations": 3, **kw},
    )
    action, _, predicted = policy.act(obs, 0)
    print(f"{label:22s} action={float(action[0]):+.3f} predicted_reward={float(predicted):.3f}")

# The same fused CEM sharded over every available device: each chip generates and rolls
# out only its population shard (run with XLA_FLAGS=--xla_force_host_platform_device_count=8
# for a virtual mesh; on a real slice this is D x the beyond-HBM capacity).
mesh = make_pop_mesh()
sharded = MPCPolicy(
    action_space=space, reward_function=pendulum_reward, dynamics_handler=handler,
    solver_name="CEM", planning_horizon=10,
    # round DOWN to a multiple of the device count, but never below num_elite (32)
    population=max(args.population // len(jax.devices()),
                   32 // len(jax.devices()) + 1) * len(jax.devices()),
    num_elite=32, max_iterations=3, seed=args.seed, rollout_backend="fused", mesh=mesh,
)
action, _, predicted = sharded.act(obs, 0)
print(f"{'CEM sharded x' + str(len(jax.devices())):22s} action={float(action[0]):+.3f} "
      f"predicted_reward={float(predicted):.3f}")

# r5: the sharded fused matrix also covers iCEM population decay (one sharded kernel
# grid per decayed per-iteration population) and sep-CMA (same diagonal-CMA update math
# as the single-chip fused factory, moments psum-reduced across the mesh).
pop_sharded = max(args.population // len(jax.devices()),
                  32 // len(jax.devices()) + 1) * len(jax.devices())
for label, solver_name, kw in [
    ("CEM decay sharded", "CEM",
     dict(num_elite=8, max_iterations=3, population_decay=0.6)),
    ("sep-CMA sharded", "CMA-ES", dict(num_elite=32, max_iterations=3, diagonal=True)),
]:
    p = MPCPolicy(
        action_space=space, reward_function=pendulum_reward, dynamics_handler=handler,
        solver_name=solver_name, planning_horizon=10, population=pop_sharded,
        seed=args.seed, rollout_backend="fused", mesh=mesh, **kw,
    )
    action, _, predicted = p.act(obs, 0)
    print(f"{label:22s} action={float(action[0]):+.3f} "
          f"predicted_reward={float(predicted):.3f}")
print("OK")
