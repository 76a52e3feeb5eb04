"""Reference-equivalent TF2 baseline for the flagship benchmark workload.

The reference (ossamaAhmed/blackbox_mpc) publishes no numbers (BASELINE.md), so the baseline is
produced by running a faithful TF2 graph-mode re-implementation of its CEM hot path — the same
math, defaults, and graph structure as ``/root/reference/blackbox_mpc/optimizers/cem.py:74-136``
+ ``trajectory_evaluators/deterministic.py:26-77`` (tf.function, tf.while_loop over iterations
and horizon, truncated-normal sampling, per-agent top-k) — written independently against this
host's TF install. Run: ``python benchmarks/reference_baseline_tf.py [--population 1000]``.

This measures the reference architecture's solves/s on the available hardware (CPU here; the
reference recommends GPU). The number + provenance are recorded in BASELINE.md and used as
``vs_baseline`` in bench.py.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np
import tensorflow as tf


def build_mlp(dim_in, dim_out, hidden, seed=0):
    init = tf.keras.initializers.GlorotUniform(seed=seed)
    layers = []
    prev = dim_in
    for h in [*hidden, dim_out]:
        layers.append(
            (
                tf.Variable(init((prev, h)), dtype=tf.float32),
                tf.Variable(tf.zeros((h,), dtype=tf.float32)),
            )
        )
        prev = h
    return layers


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--population", type=int, default=1000)
    p.add_argument("--horizon", type=int, default=50)
    p.add_argument("--iterations", type=int, default=5)
    p.add_argument("--elite", type=int, default=50)
    p.add_argument("--ensemble", type=int, default=5)
    p.add_argument("--hidden", type=int, nargs="+", default=[500, 500, 500])
    p.add_argument("--dim-s", type=int, default=17)
    p.add_argument("--dim-u", type=int, default=6)
    p.add_argument("--solves", type=int, default=5)
    args = p.parse_args()

    dim_s, dim_u = args.dim_s, args.dim_u
    pop, horizon, iters, k = args.population, args.horizon, args.iterations, args.elite
    nets = [build_mlp(dim_s + dim_u, dim_s, args.hidden, seed=i) for i in range(args.ensemble)]

    def mlp(x):
        outs = []
        for net in nets:
            h = x
            for i, (w, b) in enumerate(net):
                h = tf.matmul(h, w) + b
                if i < len(net) - 1:
                    h = tf.tanh(h)
            outs.append(h)
        return tf.add_n(outs) / len(outs)

    lower = tf.constant(-np.ones(dim_u), dtype=tf.float32)
    upper = tf.constant(np.ones(dim_u), dtype=tf.float32)

    def reward_fn(state, actions, next_state):
        return next_state[:, 0] - 0.1 * tf.reduce_sum(tf.square(actions), axis=1)

    @tf.function
    def evaluate(current_state, action_sequences):
        # [P, 1, H, U] -> [H, P, U], tile state, tf.while_loop over horizon
        nopt = tf.shape(action_sequences)[0]
        seqs = tf.transpose(tf.reshape(action_sequences, [-1, horizon, dim_u]), [1, 0, 2])
        states = tf.tile(current_state, [nopt, 1])
        rewards = tf.zeros([nopt], dtype=tf.float32)

        def cond(t, r, s):
            return tf.less(t, horizon)

        def body(t, r, s):
            acts = seqs[t]
            nxt = s + mlp(tf.concat([s, acts], axis=-1))
            return t + 1, r + reward_fn(s, acts, nxt), nxt

        _, rewards, _ = tf.while_loop(cond, body, [tf.constant(0), rewards, states])
        return rewards

    @tf.function
    def cem_solve(current_state, mean0, var0):
        def cond(t, mean, var):
            return tf.less(t, iters)

        def body(t, mean, var):
            lb_dist = mean - lower
            ub_dist = upper - mean
            cvar = tf.minimum(tf.minimum(tf.square(lb_dist / 2.0), tf.square(ub_dist / 2.0)), var)
            samples = tf.random.truncated_normal([pop, horizon, dim_u], mean, tf.sqrt(cvar))
            rewards = evaluate(current_state, samples[:, None])
            _, idx = tf.nn.top_k(rewards, k=k)
            elites = tf.gather(samples, idx)
            new_mean = tf.reduce_mean(elites, axis=0)
            new_var = tf.reduce_mean(tf.square(elites - new_mean[None]), axis=0)
            return t + 1, 0.25 * mean + 0.75 * new_mean, 0.25 * var + 0.75 * new_var

        _, mean, _ = tf.while_loop(cond, body, [tf.constant(0), mean0, var0])
        return mean[0]

    state = tf.zeros([1, dim_s])
    mean0 = tf.zeros([horizon, dim_u])
    var0 = tf.fill([horizon, dim_u], 0.25)
    # warmup / trace
    cem_solve(state, mean0, var0).numpy()
    t0 = time.perf_counter()
    for _ in range(args.solves):
        cem_solve(state, mean0, var0).numpy()
    dt = time.perf_counter() - t0
    result = {
        "workload": f"CEM pop={pop} H={horizon} iters={iters} ensemble={args.ensemble} "
        f"mlp={args.hidden} dims=({dim_s},{dim_u})",
        "device": tf.config.list_physical_devices()[-1].device_type,
        "tf_version": tf.__version__,
        "solves": args.solves,
        "seconds": dt,
        "solves_per_s": args.solves / dt,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
