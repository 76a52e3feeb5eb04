"""Worker for the 2-process ``jax.distributed`` test (tests/test_multiprocess.py).

Launched once per process with ``python -m tests._multiproc_worker <pid> <nprocs> <port>
<local_devices> <out.json>``. Each process contributes ``local_devices`` virtual CPU devices
to one global mesh, then runs the SAME zero-argument SPMD program: a population-sharded CEM
solve on the analytic pendulum plus one data-parallel probabilistic-ensemble train step. The
parent test imports :func:`run_global_program` directly for the single-process 8-device
reference — bit-identical SPMD semantics, different process topology.
"""
from __future__ import annotations

import json
import sys


def run_global_program():
    """Sharded CEM solve + DP ensemble train step over the global device set.

    Zero-argument jit: every input is created inside the traced program, so no host->global
    array transfer logic is needed and the identical XLA program runs under any process
    topology covering the same global mesh.
    """
    import jax
    import jax.numpy as jnp

    from blackbox_mpc_tpu.core.types import Bounds
    from blackbox_mpc_tpu.learning.trainer import make_trainer
    from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
    from blackbox_mpc_tpu.parallel import make_pop_mesh, make_sharded_evaluator
    from blackbox_mpc_tpu.parallel.multihost import fetch_replicated
    from blackbox_mpc_tpu.solvers import make_solver

    mesh = make_pop_mesh()  # all GLOBAL devices (jax.devices() spans processes)
    population, horizon, num_agents = 64, 10, 2
    bounds = Bounds.of(-2.0, 2.0, dim=1)

    cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=1, hidden=(16, 16), ensemble_size=2, probabilistic=True
    )
    init_model, _ = make_learned_dynamics(cfg)

    evaluate = make_sharded_evaluator(pendulum_dynamics, pendulum_reward, mesh)
    solver = make_solver(
        "CEM",
        bounds,
        evaluate,
        planning_horizon=horizon,
        population=population,
        num_agents=num_agents,
        num_elite=8,
        max_iterations=2,
    )
    trainer_init, train_step, _ = make_trainer(cfg, mesh=mesh)

    def program():
        # --- population-sharded CEM solve (cross-process top-k merge collectives) ---
        state = solver.init(jax.random.PRNGKey(0))
        obs = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.5]], jnp.float32)
        action, _state, aux = solver.solve(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))

        # --- data-parallel ensemble train step (cross-process gradient psum) ---
        dp = init_model(jax.random.PRNGKey(2))
        ts = trainer_init(dp.params)
        bkey = jax.random.PRNGKey(3)
        s = jax.random.normal(bkey, (cfg.ensemble_size, 16, 3))
        a = jax.random.uniform(jax.random.fold_in(bkey, 1), (cfg.ensemble_size, 16, 1))
        ns = s + 0.05
        ts2, losses = train_step(ts, dp.stats, s, a, ns)
        digest = sum(jnp.sum(jnp.abs(leaf)) for leaf in jax.tree.leaves(ts2.params))
        return action, aux.expected_reward, losses, digest

    action, expected_reward, losses, digest = jax.jit(program)()
    return {
        "devices": jax.device_count(),
        "processes": jax.process_count(),
        "action": fetch_replicated(action).tolist(),
        "expected_reward": fetch_replicated(expected_reward).tolist(),
        "losses": fetch_replicated(losses).tolist(),
        "param_digest": float(fetch_replicated(digest)),
    }


def main() -> None:
    process_id, num_processes = int(sys.argv[1]), int(sys.argv[2])
    port, local_devices, out_path = sys.argv[3], int(sys.argv[4]), sys.argv[5]

    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from blackbox_mpc_tpu.parallel.multihost import initialize_multihost

    initialize_multihost(f"localhost:{port}", num_processes, process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    result = run_global_program()
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
