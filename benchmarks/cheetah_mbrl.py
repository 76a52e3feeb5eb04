"""HalfCheetah MBRL end-to-end: probabilistic-ensemble PETS-style learning + MPC control.

The task-success benchmark (reference flagship demo: ``tutorials/mujoco/tutorial_two.py``,
10 outer iterations — it publishes GIFs, no numbers). Round-1 run (mean propagation) peaked
at 409.6 episode reward over 30 refinements; this script parameterizes the propagation mode
so TS-inf (sampling) planning can be compared on the same training pipeline.

  python benchmarks/cheetah_mbrl.py --propagation ts_inf --refinements 30 \
      --out benchmarks/cheetah_tsinf_run.jsonl

Appends one JSON line per scalar to --out (same format as cheetah_probabilistic_run.jsonl).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--propagation", choices=["mean", "ts1", "ts_inf", "mm"], default="ts_inf")
    p.add_argument("--solver", choices=["CEM", "Gradient", "CEM-GD", "PI2"], default="CEM")
    p.add_argument("--members", type=int, default=5)
    p.add_argument("--refinements", type=int, default=30)
    p.add_argument("--initial-rollouts", type=int, default=5)
    p.add_argument("--steps", type=int, default=200, help="env rollout horizon")
    p.add_argument("--planning-horizon", type=int, default=15)
    p.add_argument("--population", type=int, default=None,
                   help="CEM/CEM-GD samples (default 510); Gradient restarts (default 32)")
    p.add_argument("--solver-lr", type=float, default=None,
                   help="solver learning_rate (Gradient/CEM-GD Adam step; default 0.1/0.02)")
    p.add_argument("--hidden", type=int, nargs="+", default=[256, 256, 256])
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--patience", type=int, default=None,
                   help="PETS-style per-member early stopping on validation loss "
                        "(epochs becomes a cap; planning params = per-member bests)")
    p.add_argument("--particles", type=int, default=1,
                   help="ts_inf: PETS particles per candidate (returns averaged)")
    p.add_argument("--learn-logvar-bounds", action="store_true",
                   help="PETS learnable per-dim logvar bounds + 0.01 band regularizer "
                        "(the r5 calibration fix: fixed bounds left ~40%% of head cells "
                        "stuck at the variance ceiling, benchmarks/variance_calibration.py)")
    p.add_argument("--icem", action="store_true",
                   help="iCEM preset for the CEM-family solver: colored_noise_beta=2, "
                        "keep_elites=5, mean_as_candidate, population_decay=0.7, and "
                        "(plain CEM only) execute_best")
    p.add_argument("--population-decay", type=float, default=None,
                   help="override the iCEM per-iteration sample decay (1.0 = constant)")
    p.add_argument("--warm-start", type=int, default=None, choices=[0, 1],
                   help="override solver warm_start (Gradient/CEM-GD only)")
    p.add_argument("--behavior-cloning", action="store_true",
                   help="POPLIN-style proposer seeding (bc_epochs=20)")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir: loop state + handler saved every refinement; "
                        "rerunning with the same --ckpt auto-resumes (tunnel-crash-proof)")
    p.add_argument("--uncertainty-penalty", type=float, default=0.0,
                   help="plan_uncertainty_penalty: pessimistic planning, lambda * ensemble "
                        "disagreement subtracted per rollout step (mean/mm propagation)")
    p.add_argument("--smoothness", type=float, default=0.0,
                   help="action_smoothness_weight: w * sum ||a_t - a_{t-1}||^2 subtracted "
                        "from candidate returns")
    p.add_argument("--num-envs", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="benchmarks/cheetah_mbrl_run.jsonl")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.expanduser("~/.jax_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from blackbox_mpc_tpu import LearnedDynamicsConfig, learn_dynamics_iteratively_w_mpc
    from blackbox_mpc_tpu.envs import make_gym_vec_env

    from blackbox_mpc_tpu.utils.metrics import MetricsWriter

    def cheetah_reward(state, action, next_state):
        return (next_state[:, 0] - state[:, 0]) / 0.05 - 0.1 * jnp.sum(
            jnp.square(action), axis=-1
        )

    env = make_gym_vec_env(
        "HalfCheetah-v5", num_envs=args.num_envs, mode="subprocess", base_seed=args.seed,
        exclude_current_positions_from_observation=False,
    )
    cfg = LearnedDynamicsConfig(
        dim_s=18, dim_u=6, hidden=tuple(args.hidden), ensemble_size=args.members,
        probabilistic=True, propagation=args.propagation, num_particles=args.particles,
        plan_uncertainty_penalty=args.uncertainty_penalty,
        learn_logvar_bounds=args.learn_logvar_bounds,
    )
    if args.solver == "Gradient":
        # population = random restarts; Adam steps replace sampled iterations. The solver's
        # Adam step size is forwarded via solver_learning_rate= (the workflow's learning_rate
        # kwarg is the model-training LR).
        solver_kwargs = dict(population=args.population or 32, max_iterations=20)
    elif args.solver == "PI2":
        # BASELINE config #3's second half: PI2 over the NN ensemble — same sampled budget
        # as CEM, softmax path-integral weighting instead of elite moments (reference
        # semantics: /root/reference/blackbox_mpc/optimizers/pi2.py:58-96, lamda=1.0).
        solver_kwargs = dict(population=args.population or 510, max_iterations=5)
    else:
        # CEM and CEM-GD share the sampled budget; CEM-GD adds the default 9x10 Adam polish
        solver_kwargs = dict(population=args.population or 510, num_elite=50,
                             max_iterations=5)
    if args.solver_lr is not None:
        solver_kwargs["solver_learning_rate"] = args.solver_lr
    if args.warm_start is not None and args.solver in ("Gradient", "CEM-GD"):
        solver_kwargs["warm_start"] = bool(args.warm_start)
    if args.icem:
        if args.solver not in ("CEM", "CEM-GD"):
            raise SystemExit("--icem applies to the CEM-family solvers (CEM, CEM-GD)")
        solver_kwargs.update(colored_noise_beta=2.0, keep_elites=5,
                             mean_as_candidate=True, population_decay=0.7)
        if args.solver == "CEM":  # CEM-GD's final argmax subsumes execute_best
            solver_kwargs["execute_best"] = True
    if args.population_decay is not None:
        solver_kwargs["population_decay"] = args.population_decay
    if args.smoothness > 0:
        # Binds to MPCPolicy's named param through the workflow's **solver_kwargs.
        solver_kwargs["action_smoothness_weight"] = args.smoothness
    # On --ckpt auto-resume into an existing JSONL: seed the peak from the rows already
    # on disk (MetricsWriter.history is per-process, so post-crash reruns would otherwise
    # report a peak over post-resume episodes only) and append a resume marker instead of
    # a second full header mid-stream.
    prior_ep, prior_best = 0, None
    # Authoritative resume signal: the loop checkpoint's state file (the same one
    # learn_dynamics_iteratively_w_mpc keys on) — a pre-existing --out alone may be a
    # foreign/aborted run whose rows must not seed this run's peak.
    resuming = (
        bool(args.ckpt)
        and os.path.exists(os.path.join(args.ckpt, "loop_state.json"))
        and os.path.exists(args.out) and os.path.getsize(args.out)
    )
    if resuming:
        with open(args.out) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if row.get("tag") == "rewards/actual_episode_reward":
                    prior_ep += 1
                    v = float(row["value"])
                    prior_best = v if prior_best is None else max(prior_best, v)
    header = {"resumed": time.strftime("%Y-%m-%dT%H:%M:%S")} if resuming else {
        "run": f"{args.solver}{' +BC' if args.behavior_cloning else ''} {args.propagation} "
               f"{args.members}-member ensemble HalfCheetah MBRL",
        "config": f"solver_kwargs={solver_kwargs} H={args.planning_horizon} "
                  f"hidden={'x'.join(map(str, args.hidden))} NLL lr=3e-3 "
                  f"propagation={args.propagation} particles={args.particles}"
                  + (" learn_logvar_bounds" if args.learn_logvar_bounds else "")
                  + (f" pessimism={args.uncertainty_penalty}"
                     if args.uncertainty_penalty else ""),
        "start": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(args.out, "a") as f:  # run-header row precedes the scalar stream
        f.write(json.dumps(header) + "\n")
    writer = MetricsWriter(jsonl_path=args.out, tensorboard=False)

    handler, policy = learn_dynamics_iteratively_w_mpc(
        env,
        cheetah_reward,
        solver_name=args.solver,
        planning_horizon=args.planning_horizon,
        number_of_initial_rollouts=args.initial_rollouts,
        number_of_rollouts_per_refinement=1,
        number_of_refinement_steps=args.refinements,
        rollout_horizon=args.steps,
        dynamics_config=cfg,
        epochs=args.epochs,
        patience=args.patience,
        batch_size=256,
        learning_rate=3e-3,
        metrics_writer=writer,
        behavior_cloning=args.behavior_cloning,
        checkpoint_dir=args.ckpt,
        resume=bool(args.ckpt),  # missing state file -> fresh start, so always safe
        **solver_kwargs,
        seed=args.seed,
    )
    env.close()
    ep = writer.history.get("rewards/actual_episode_reward", [])
    candidates = [v for _, v in ep] + ([prior_best] if prior_best is not None else [])
    best = max(candidates) if candidates else None  # None -> JSON null, never NaN
    print(json.dumps({
        "metric": f"HalfCheetah MBRL peak episode reward "
                  f"({args.solver}{' +BC' if args.behavior_cloning else ''}, {args.propagation})",
        "value": round(best, 1) if best is not None else None,
        "unit": "episode_reward",
        "episodes": len(ep) + prior_ep,
        "propagation": args.propagation,
    }))


if __name__ == "__main__":
    main()
