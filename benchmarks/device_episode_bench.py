"""On-chip control rate: whole closed-loop MPC episodes in one jit, CEM vs Gradient.

Round-1 headline was 0.56 ms/control-step (CEM pop=1024, pendulum, 100 steps). The Gradient
solver replaces the 1024-candidate sampled search with a handful of Adam-polished restarts
(exact first-order steps through the rollout), so the same closed-loop episode should run
several times faster — while still swinging up (success asserted, not assumed: each row
records the final cos(theta)).

Timing: differential chained episodes — time(K episodes data-chained in one jit + readback)
minus time(1 episode + readback), divided by K-1 (see bench.py methodology notes).

Run: python benchmarks/device_episode_bench.py          (real TPU via axon)
Output: JSONL rows appended to benchmarks/results_current.jsonl (historical round files results_r{2,3}.jsonl are frozen).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--cpu", action="store_true")
_ap.add_argument("--out", default=None)
_args = _ap.parse_args()
if _args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if _args.cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import make_solver
from blackbox_mpc_tpu.workflows import evaluate_solver_on_model

EPISODE_STEPS = 100
K_CHAIN = 6
REPEATS = 5


def build(solver_name, solver_kw, n_episodes):
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
    solver = make_solver(solver_name, bounds, evaluate, planning_horizon=25, num_agents=1,
                         **solver_kw)

    def run(key):
        obs = jnp.asarray([[-1.0, 0.0, 0.0]])

        def one(carry, k):
            obs, _ = carry
            rewards, final_obs, _ = evaluate_solver_on_model(
                solver, pendulum_dynamics, pendulum_reward, obs, EPISODE_STEPS, k
            )
            # chain episodes through the final obs (keeps a data dependency; each episode
            # still starts "hard"). Rotate the final angle by pi — negate BOTH cos and sin
            # so the chained state stays exactly on the cos^2+sin^2=1 manifold whatever
            # angle the episode ended at — and damp the velocity.
            chained = jnp.concatenate([-final_obs[:, :1], -final_obs[:, 1:2],
                                       final_obs[:, 2:] * 0.01], axis=1)
            return (chained, final_obs), jnp.sum(rewards)

        (_, final_obs), totals = jax.lax.scan(
            one, (obs, obs), jax.random.split(key, n_episodes)
        )
        return totals[-1], final_obs

    return jax.jit(run)


def measure(solver_name, solver_kw):
    totals, final_cos = {}, None
    for n in (1, K_CHAIN):
        jfn = build(solver_name, solver_kw, n)
        _, fo = jfn(jax.random.PRNGKey(9))
        final_cos = float(fo[0, 0])  # success evidence from the warmup run
        lat = []
        for k in jax.random.split(jax.random.PRNGKey(5), REPEATS):
            t0 = time.perf_counter()
            float(jfn(k)[0])
            lat.append(time.perf_counter() - t0)
        totals[n] = float(np.min(lat))
    per_episode = (totals[K_CHAIN] - totals[1]) / (K_CHAIN - 1)
    return per_episode, final_cos


def main():
    device = jax.devices()[0].device_kind
    out = _args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_current.jsonl")
    configs = [
        ("CEM", dict(population=1024, max_iterations=5, num_elite=64),
         "CEM pop=1024 H=25 iters=5"),
        ("Gradient", dict(population=16, max_iterations=10, learning_rate=0.2),
         "Gradient restarts=16 adam=10"),
        ("Gradient", dict(population=8, max_iterations=5, learning_rate=0.3),
         "Gradient restarts=8 adam=5"),
    ]
    with open(out, "a") as f:
        for name, kw, label in configs:
            per_episode, final_cos = measure(name, kw)
            row = {
                "bench": "device_resident_episode",
                "workload": f"pendulum, {label}, {EPISODE_STEPS} control steps",
                "total_ms": round(per_episode * 1e3, 2),
                "ms_per_control_step": round(per_episode * 1e3 / EPISODE_STEPS, 4),
                "control_steps_per_s": round(EPISODE_STEPS / per_episode),
                "final_cos_theta": round(final_cos, 3),
                "swung_up": final_cos > 0.9,
                "device": device,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            f.write(json.dumps(row) + "\n")
            print(json.dumps(row))


if __name__ == "__main__":
    main()
