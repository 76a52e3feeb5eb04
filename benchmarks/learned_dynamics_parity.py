"""Learned-dynamics (L2) head-to-head vs the ACTUAL reference training stack.

Round-3 verdict gap #1: the 6/6 optimizer parity table covers planning with an exact model
only — the reference's TRAINING stack (``SystemDynamicsHandler.train``,
``/root/reference/blackbox_mpc/dynamics_handlers/system_dynamics_handler.py:163-298``, +
``DeterministicMLP`` MSE loss, ``dynamics_functions/deterministic_mlp.py:53-95``) had never
been run against ``blackbox_mpc_tpu/learning/trainer.py`` on identical data. This harness
closes that: one run produces

1. **Matched-data training comparison** — random-policy pendulum rollouts are collected once
   per seed, the reference handler ingests them (its own 80/20 ``np.random.choice`` split,
   ``system_dynamics_handler.py:300-332``), and our trainer is then fed the reference
   handler's EXACT post-split train/validation arrays (pulled from
   ``_model_training_in/_out``) with the same normalization formula (mean/std + 1e-7,
   ``_normalize_data``/``fit_normalizer``), MLP (3x32 tanh, linear head — the reference
   tutorial config, ``tutorials/learn_dynamics/tutorial_one.py:18-25``), batch size (128,
   drop_remainder), epochs, and Adam(1e-3). Per-epoch validation-loss curves are recorded on
   both sides (reference: by wrapping the instance's ``get_validation_loss``; the arrays in
   ``_training_algorithm`` are local and unreachable otherwise).
2. **User-path training row** — our ``DynamicsHandler.train`` on the raw episodes (its own
   replay split), the API a user actually calls, reported alongside.
3. **Downstream control comparison** — each learned model is planted in its own framework's
   MPCPolicy (CEM, matched reference defaults) and scored by the true gym pendulum cost on
   the same fixed initial states, exactly like ``benchmarks/reference_parity.py``.

TF-2.21 compatibility shim (documented, minimal): under Keras 3 the reference's
``DeterministicMLP.__call__`` iterates ``self.layers.layers`` — a ``ListWrapper`` property
that now returns ``[]`` (Keras-3 layers are no longer TF-trackable children), silently
degenerating the network to an identity map. ``_RefMLP`` overrides ``__call__`` to iterate
``self.layers`` itself — the exact semantics the original has on its target TF 2.0/2.1.
Weight INITIALIZATION is framework-native on both sides (keras glorot_uniform vs our
truncated-normal fan-in); parity is judged on converged behavior, not on matched init.

Pass criteria:
* training: final matched-data validation loss within a two-sided 1.5x band of the
  reference's (either side may be better — this is an equivalence check, not a race);
* downstream: mean episode reward ``ours >= ref - max(50, 0.2 |ref|)`` (PARITY.md gate).

Usage:
  python benchmarks/learned_dynamics_parity.py [--seeds 3] [--episodes 5] [--steps 200]
      [--epochs 30] [--control-episodes 3] [--out benchmarks/learned_dynamics_parity_r4.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_parity import (  # noqa: E402
    MATCHED_CONFIGS,
    PASS_ABS_TOL,
    PASS_REL_TOL,
    PendulumSim,
    _BoxShim,
    _install_reference,
    _reference_called_reward,
)

VAL_EQUIVALENCE_BAND = 1.5  # two-sided: ours/ref and ref/ours both must be <= this
MLP_HIDDEN = (32, 32, 32)
DIM_S, DIM_U = 3, 1


# --------------------------------------------------------------------- data collection

def collect_rollouts(n_episodes: int, steps: int, seed: int):
    """Uniform-random-action pendulum episodes; shapes match the reference train() inputs
    (observations [T+1, agents=1, S], actions [T, 1, U], rewards [T, 1])."""
    rng = np.random.default_rng(1000 + seed)
    env = PendulumSim()
    obs_trajs, act_trajs, rew_trajs = [], [], []
    for ep in range(n_episodes):
        obs = env.reset(seed * 100 + ep)
        o, a, r = [obs], [], []
        for _ in range(steps):
            u = rng.uniform(-2.0, 2.0)
            obs, reward = env.step(u)
            o.append(obs)
            a.append([u])
            r.append(reward)
        obs_trajs.append(np.asarray(o, np.float32)[:, None, :])
        act_trajs.append(np.asarray(a, np.float32)[:, None, :])
        rew_trajs.append(np.asarray(r, np.float32)[:, None])
    return obs_trajs, act_trajs, rew_trajs


# --------------------------------------------------------------------- reference side

def _make_ref_mlp():
    import tensorflow as tf
    from blackbox_mpc.dynamics_functions.deterministic_mlp import DeterministicMLP

    class _RefMLP(DeterministicMLP):
        """TF-2.21/Keras-3 shim: iterate the layer list itself (see module docstring)."""

        @tf.function
        def __call__(self, x, train):
            for layer in self.layers:
                x = layer(x)
            return x

    return _RefMLP(
        layers=[DIM_S + DIM_U, *MLP_HIDDEN, DIM_S],
        activation_functions=[tf.math.tanh, tf.math.tanh, tf.math.tanh, None],
    )


def train_reference(data, epochs: int, batch_size: int, lr: float, seed: int):
    """Runs the REAL SystemDynamicsHandler.train; returns handler + loss curves."""
    import tensorflow as tf

    _install_reference()
    from blackbox_mpc.dynamics_handlers.system_dynamics_handler import SystemDynamicsHandler

    # Full TF/Keras RNG reset, not just the global seed: Keras-3 layer inits draw from
    # per-op seeds derived from an op-creation counter that keeps incrementing across the
    # process, so without clear_session() the SAME seed gives different weights depending
    # on what TF code ran earlier in the process (the source of a flaky loss floor in
    # tests/test_learned_dynamics_parity.py under a full-suite run). With this reset the
    # reference training is bit-deterministic for a given seed (verified run-to-run).
    tf.keras.backend.clear_session()
    tf.keras.utils.set_random_seed(seed)
    np.random.seed(seed)  # drives the handler's np.random.choice train/val split
    mlp = _make_ref_mlp()
    handler = SystemDynamicsHandler(
        env_action_space=_BoxShim([-2.0], [2.0]),
        env_observation_space=_BoxShim([-1.0, -1.0, -8.0], [1.0, 1.0, 8.0]),
        dynamics_function=mlp,
    )
    # _training_algorithm's loss arrays are locals; record per-batch validation losses by
    # wrapping the instance method it calls (instance attribute shadows the class method).
    val_batches: list[float] = []
    orig = mlp.get_validation_loss

    def recording_val_loss(expected_output, predictions):
        loss = orig(expected_output=expected_output, predictions=predictions)
        val_batches.append(float(loss))
        return loss

    mlp.get_validation_loss = recording_val_loss
    obs_trajs, act_trajs, rew_trajs = data
    t0 = time.perf_counter()
    handler.train(
        obs_trajs, act_trajs, rew_trajs,
        validation_split=0.2, batch_size=batch_size, learning_rate=lr, epochs=epochs,
    )
    wall = time.perf_counter() - t0
    mlp.get_validation_loss = orig
    per_epoch = len(val_batches) // epochs if epochs else 0
    curve = [
        float(np.mean(val_batches[i * per_epoch:(i + 1) * per_epoch]))
        for i in range(epochs)
    ] if per_epoch else []
    return handler, {
        "framework": "reference", "seed": seed, "epochs": epochs,
        "n_train": int(handler._model_training_in.shape[0]),
        "n_val": int(handler._model_validation_in.shape[0]),
        "val_loss_curve": [round(v, 6) for v in curve],
        "final_val_loss": round(curve[-1], 6) if curve else None,
        "train_wall_s": round(wall, 2),
    }


# --------------------------------------------------------------------------- our side

def _our_config():
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig

    return LearnedDynamicsConfig(
        dim_s=DIM_S, dim_u=DIM_U, hidden=MLP_HIDDEN, activation="tanh", ensemble_size=1
    )


def train_ours_matched(ref_handler, epochs: int, batch_size: int, lr: float, seed: int):
    """Drives learning/trainer.py on the reference handler's EXACT train/val arrays."""
    import jax
    import jax.numpy as jnp

    from blackbox_mpc_tpu.learning.trainer import make_trainer
    from blackbox_mpc_tpu.models.dynamics import DynamicsParams, make_learned_dynamics
    from blackbox_mpc_tpu.models.normalizer import fit_normalizer

    train_in = np.asarray(ref_handler._model_training_in, np.float32)
    train_out = np.asarray(ref_handler._model_training_out, np.float32)  # delta targets
    val_in = np.asarray(ref_handler._model_validation_in, np.float32)
    val_out = np.asarray(ref_handler._model_validation_out, np.float32)

    cfg = _our_config()
    init_model, _ = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(seed))
    # Same stats formula as the reference (_recompute_normalization: training arrays,
    # population std, +1e-7 at use); fit on the SAME training split.
    stats = fit_normalizer(
        jnp.asarray(train_in[:, :DIM_S]), jnp.asarray(train_in[:, DIM_S:]),
        jnp.asarray(train_out),
    )
    tinit, train_step, eval_step = make_trainer(cfg, learning_rate=lr)
    ts = tinit(dp.params)

    def batches(data_in, data_out, order):
        n = (len(order) // batch_size) * batch_size  # drop_remainder=True, like the ref
        for i in range(0, n, batch_size):
            idx = order[i:i + batch_size]
            s = jnp.asarray(data_in[idx, :DIM_S])[None]
            a = jnp.asarray(data_in[idx, DIM_S:])[None]
            ns = s + jnp.asarray(data_out[idx])[None]  # trainer re-derives delta targets
            yield s, a, ns

    rng = np.random.default_rng(seed)
    val_order = np.arange(len(val_in))
    curve = []
    t0 = time.perf_counter()
    for _ in range(epochs):
        for s, a, ns in batches(train_in, train_out, rng.permutation(len(train_in))):
            ts, _ = train_step(ts, stats, s, a, ns)
        vl = [float(np.mean(np.asarray(eval_step(ts.params, stats, s, a, ns))))
              for s, a, ns in batches(val_in, val_out, val_order)]
        curve.append(float(np.mean(vl)))
    wall = time.perf_counter() - t0
    params = DynamicsParams(params=ts.params, stats=stats)
    return cfg, params, {
        "framework": "blackbox_mpc_tpu(matched-split)", "seed": seed, "epochs": epochs,
        "n_train": int(train_in.shape[0]), "n_val": int(val_in.shape[0]),
        "val_loss_curve": [round(v, 6) for v in curve],
        "final_val_loss": round(curve[-1], 6) if curve else None,
        "train_wall_s": round(wall, 2),
    }


def train_ours_userpath(data, epochs: int, batch_size: int, lr: float, seed: int):
    """The API a user calls: DynamicsHandler.train on raw episodes (own replay split)."""
    from blackbox_mpc_tpu.learning.handler import DynamicsHandler

    obs_trajs, act_trajs, _ = data
    handler = DynamicsHandler(config=_our_config(), learning_rate=lr, seed=seed)
    t0 = time.perf_counter()
    metrics = handler.train(
        observations=[o[:, 0, :] for o in obs_trajs],
        actions=[a[:, 0, :] for a in act_trajs],
        epochs=epochs, batch_size=batch_size,
    )
    wall = time.perf_counter() - t0
    return handler, {
        "framework": "blackbox_mpc_tpu(user-path)", "seed": seed, "epochs": epochs,
        "final_val_loss": round(metrics["val_loss"], 6),
        "final_train_loss": round(metrics["train_loss"], 6),
        "replay_size": metrics["replay_size"], "train_wall_s": round(wall, 2),
    }


# ------------------------------------------------------------------- downstream control

def control_reference(ref_handler, seed: int, steps: int) -> dict:
    import tensorflow as tf

    RefMPCPolicy, _, pendulum_reward_function = _install_reference()
    # Same full RNG reset as train_reference (clear_session resets Keras-3's op-seed
    # counter, making the run independent of earlier TF activity in the process).
    tf.keras.backend.clear_session()
    tf.keras.utils.set_random_seed(seed)
    np.random.seed(seed)
    kwargs = {("population_size" if k == "population" else k): v
              for k, v in MATCHED_CONFIGS["CEM"].items()}
    policy = RefMPCPolicy(
        reward_function=pendulum_reward_function,
        env_action_space=_BoxShim([-2.0], [2.0]),
        env_observation_space=_BoxShim([-1.0, -1.0, -8.0], [1.0, 1.0, 8.0]),
        dynamics_handler=ref_handler,
        optimizer_name="CEM",
        num_agents=1,
        **kwargs,
    )
    env = PendulumSim()
    obs = env.reset(seed)
    policy.reset()
    total = 0.0
    t0 = time.perf_counter()
    for t in range(steps):
        action, _, _ = policy.act(obs, t)
        obs, reward = env.step(action[0])
        total += reward
    return dict(framework="reference", seed=seed, steps=steps,
                episode_reward=float(total),
                wall_s=round(time.perf_counter() - t0, 2))


def control_ours(cfg, params, seed: int, steps: int) -> dict:
    from blackbox_mpc_tpu.core.spaces import BoxSpace
    from blackbox_mpc_tpu.learning.handler import DynamicsHandler
    from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy

    handler = DynamicsHandler(config=cfg, seed=seed)
    handler._params = params  # plant the trained model (stats included)
    handler._stats_fitted = True
    policy = MPCPolicy(
        action_space=BoxSpace(low=[-2.0], high=[2.0]),
        reward_function=_reference_called_reward(),
        dynamics_handler=handler,
        solver_name="CEM",
        num_agents=1,
        planning_horizon=50,
        seed=seed,
        **MATCHED_CONFIGS["CEM"],
    )
    env = PendulumSim()
    obs = env.reset(seed)
    policy.reset()
    total = 0.0
    t0 = time.perf_counter()
    for t in range(steps):
        action, _, _ = policy.act(obs, t)
        obs, reward = env.step(action[0])
        total += reward
    return dict(framework="blackbox_mpc_tpu", seed=seed, steps=steps,
                episode_reward=float(total),
                wall_s=round(time.perf_counter() - t0, 2))


# ----------------------------------------------------------------------------- judging

def judge(train_rows, control_rows):
    ref_val = [r["final_val_loss"] for r in train_rows if r["framework"] == "reference"]
    our_val = [r["final_val_loss"] for r in train_rows
               if r["framework"] == "blackbox_mpc_tpu(matched-split)"]
    ratio = float(np.mean(our_val) / np.mean(ref_val)) if ref_val and our_val else None
    train_pass = (ratio is not None
                  and ratio <= VAL_EQUIVALENCE_BAND and 1.0 / ratio <= VAL_EQUIVALENCE_BAND)

    ref_r = [r["episode_reward"] for r in control_rows if r["framework"] == "reference"]
    our_r = [r["episode_reward"] for r in control_rows
             if r["framework"] == "blackbox_mpc_tpu"]
    ctrl = None
    if ref_r and our_r:
        ref_m, our_m = float(np.mean(ref_r)), float(np.mean(our_r))
        tol = max(PASS_ABS_TOL, PASS_REL_TOL * abs(ref_m))
        ctrl = dict(ref_reward=round(ref_m, 1), ours_reward=round(our_m, 1),
                    tol=round(tol, 1), passed=bool(our_m >= ref_m - tol))
    return {
        "val_loss_ref_mean": round(float(np.mean(ref_val)), 6) if ref_val else None,
        "val_loss_ours_mean": round(float(np.mean(our_val)), 6) if our_val else None,
        "val_loss_ratio_ours_over_ref": round(ratio, 3) if ratio else None,
        "val_equivalence_band": VAL_EQUIVALENCE_BAND,
        "train_passed": train_pass,
        "control": ctrl,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--episodes", type=int, default=5, help="rollout episodes per seed")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--control-episodes", type=int, default=3)
    p.add_argument("--out", default="benchmarks/learned_dynamics_parity_r4.jsonl")
    args = p.parse_args(argv)

    train_rows, control_rows = [], []
    our_models = []
    for seed in range(args.seeds):
        data = collect_rollouts(args.episodes, args.steps, seed)
        ref_handler, row = train_reference(data, args.epochs, args.batch_size, args.lr, seed)
        print(json.dumps(row), flush=True)
        train_rows.append(row)
        cfg, params, row = train_ours_matched(
            ref_handler, args.epochs, args.batch_size, args.lr, seed)
        print(json.dumps(row), flush=True)
        train_rows.append(row)
        _, row = train_ours_userpath(data, args.epochs, args.batch_size, args.lr, seed)
        print(json.dumps(row), flush=True)
        train_rows.append(row)
        our_models.append((cfg, params))
        if seed < args.control_episodes:
            row = control_reference(ref_handler, seed, args.steps)
            print(json.dumps(row), flush=True)
            control_rows.append(row)
            row = control_ours(cfg, params, seed, args.steps)
            print(json.dumps(row), flush=True)
            control_rows.append(row)

    summary = judge(train_rows, control_rows)
    with open(args.out, "w") as f:
        for r in train_rows + control_rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps({"summary": summary}) + "\n")
    print("\n== learned-dynamics parity summary ==")
    print(json.dumps(summary, indent=2))
    ok = summary["train_passed"] and (summary["control"] or {}).get("passed")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
