"""Control-loop throughput: rollouts/s and env-steps/s with MPC in the loop.

Measures the full perceive -> solve -> act -> env.step cycle (the reference's only built-in
metric was mean act() latency, rollouts.py:133). Note: over a tunneled TPU frontend every act()
pays a host<->device round-trip (~30 ms here) because the action must reach the host-side env;
on co-located hardware that term is microseconds. Run with --cpu for tunnel-free loop numbers.

  python benchmarks/rollouts_bench.py --cpu --envs 8 --backend shm
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--envs", type=int, default=4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--backend", choices=["native", "shm", "subprocess", "sync"], default="native")
    p.add_argument("--population", type=int, default=256)
    p.add_argument("--horizon", type=int, default=25)
    p.add_argument("--overlap", action="store_true",
                   help="speculative depth-1 pipelining (policies/pipeline.py)")
    p.add_argument("--spec-tol", type=float, default=0.05)
    args = p.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from blackbox_mpc_tpu import DynamicsHandler, MPCPolicy, perform_rollouts
    from blackbox_mpc_tpu.models import pendulum_dynamics, pendulum_reward

    if args.backend == "native":
        from blackbox_mpc_tpu.envs import NativePendulumVecEnv

        env = NativePendulumVecEnv(num_envs=args.envs, seed=0, max_episode_steps=args.steps)
    elif args.backend == "shm":
        from blackbox_mpc_tpu.envs import make_shm_vec_env

        env = make_shm_vec_env("Pendulum-v1", num_envs=args.envs, base_seed=0)
    else:
        from blackbox_mpc_tpu.envs import make_gym_vec_env

        env = make_gym_vec_env("Pendulum-v1", num_envs=args.envs, mode=args.backend, base_seed=0)

    policy = MPCPolicy(
        action_space=env.action_space,
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name="CEM",
        num_agents=args.envs,
        planning_horizon=args.horizon,
        population=args.population,
        num_elite=max(8, args.population // 10),
        max_iterations=5,
    )
    run_kw = dict(overlap=args.overlap, spec_tol=args.spec_tol) if args.overlap else {}
    # warm (compile)
    perform_rollouts(env, policy, number_of_rollouts=1, rollout_horizon=5, **run_kw)
    t0 = time.perf_counter()
    result = perform_rollouts(
        env, policy, number_of_rollouts=1, rollout_horizon=args.steps, **run_kw
    )
    dt = time.perf_counter() - t0
    if hasattr(env, "close"):
        env.close()
    steps_done = result["latency"]["count"]
    print(
        json.dumps(
            {
                "backend": args.backend,
                "envs": args.envs,
                "control_steps_per_s": round(steps_done / dt, 2),
                "env_steps_per_s": round(steps_done * args.envs / dt, 1),
                "act_p50_ms": round(result["latency"]["p50_s"] * 1e3, 2),
                "mean_episode_reward": round(float(np.mean(result["reward_sum"])), 2),
                "overlap": args.overlap,
                "spec_hit_rate": result.get("spec_hit_rate"),
                "device": "cpu" if args.cpu else "accelerator",
            }
        )
    )


if __name__ == "__main__":
    main()
