"""Pallas TPU kernel: fused ensemble-MLP trajectory rollout.

The rollout hot loop (SURVEY §3.1: ``max_iterations x H`` sequential dynamics evaluations of a
``population``-row batch) is HBM-bandwidth-bound under plain XLA: every horizon step re-reads
the full ensemble weights from HBM (H=50 steps x ~5-10 MB of weights per solve iteration).

This kernel inverts the loop structure: the grid runs over *population tiles*, and each grid
step keeps the ENTIRE ensemble resident in VMEM while scanning all H horizon steps for its
tile — weights are read from HBM once per tile instead of once per step, an ~H/num_tiles x
reduction in weight traffic. Per step, per member: 4 MXU matmuls (tanh MLP) accumulated in
fp32; the state update, normalizer chain, and reward accumulate on the VPU, fully fused.

Supports the ``"mean"`` ensemble propagation of
:class:`~blackbox_mpc_tpu.models.dynamics.LearnedDynamicsConfig` (single-member = E=1), the
normalize -> MLP -> denormalize -> delta chain of ``make_learned_dynamics``, and an arbitrary
jnp-expressible ``reward_fn(s, a, ns) -> r``.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackbox_mpc_tpu.models.dynamics import DynamicsParams, LearnedDynamicsConfig
from blackbox_mpc_tpu.models.normalizer import NormalizerStats

__all__ = ["make_pallas_rollout_evaluator"]

_EPS = 1e-7  # must match models/normalizer.py


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_pallas_rollout_evaluator(
    config: LearnedDynamicsConfig,
    reward_fn: Callable,
    *,
    tile: int = 256,
    discount: float = 1.0,
    nan_guard: bool = True,
    interpret: bool = False,
):
    """Builds ``evaluate(dp, initial_states [A,S], actions [P,A,H,U]) -> rewards [P,A]``.

    Requirements: ``config.propagation == "mean"`` (or E == 1), tanh/relu/gelu activations.
    ``interpret=True`` runs the kernel in interpreter mode (CPU tests).
    """
    if config.ensemble_size > 1 and config.propagation != "mean":
        raise ValueError("pallas rollout supports propagation='mean' (or ensemble_size=1)")
    if getattr(config, "probabilistic", False):
        raise ValueError("pallas rollout supports deterministic heads only (probabilistic=False)")
    dim_s, dim_u = config.dim_s, config.dim_u
    hidden = tuple(config.hidden)
    n_layers = len(hidden) + 1
    ensemble = config.ensemble_size
    act_name = config.activation
    act = {"tanh": jnp.tanh, "relu": jax.nn.relu, "gelu": jax.nn.gelu}.get(act_name)
    if act is None:
        raise ValueError(f"unsupported activation for pallas rollout: {act_name}")
    compute_dtype = jnp.dtype(config.compute_dtype)

    def kernel(horizon: int, n_rows: int, actions_ref, s0_ref, stats_ref, *wb_refs):
        # wb_refs: w_0, b_0, ..., w_{L-1}, b_{L-1}, out_ref
        out_ref = wb_refs[-1]
        weight_refs = wb_refs[:-1]
        stats = stats_ref[:]  # [6, max(S,U)] fp32: rows = mean_s, std_s, mean_a, std_a, mean_t, std_t
        mean_s, std_s = stats[0, :dim_s], stats[1, :dim_s]
        mean_a, std_a = stats[2, :dim_u], stats[3, :dim_u]
        mean_t, std_t = stats[4, :dim_s], stats[5, :dim_s]

        def net(x):
            # x: [T, S+U] compute_dtype -> mean ensemble output [T, S] fp32
            acc = jnp.zeros((x.shape[0], dim_s), jnp.float32)
            for e in range(ensemble):
                h = x
                for layer in range(n_layers):
                    w = weight_refs[2 * layer][e]
                    b = weight_refs[2 * layer + 1][e]
                    h = (
                        jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
                        + b
                    )
                    if layer < n_layers - 1:
                        h = act(h).astype(compute_dtype)
                acc = acc + h
            return acc / ensemble

        def step(t, carry):
            s, total, disc = carry  # s: [T, S] fp32, total: [T] fp32
            a = actions_ref[t]  # [T, U]
            if config.normalized:
                xs = (s - mean_s) / (std_s + _EPS)
                xa = (a - mean_a) / (std_a + _EPS)
            else:
                xs, xa = s, a
            x = jnp.concatenate([xs, xa], axis=-1).astype(compute_dtype)
            raw = net(x)
            if config.normalized:
                raw = raw * (std_t + _EPS) + mean_t
            ns = s + raw if config.predict_delta else raw
            r = reward_fn(s, a, ns)
            return ns, total + disc * r, disc * discount

        s0 = s0_ref[:]
        tile_rows = s0.shape[0]
        total0 = jnp.zeros((tile_rows,), jnp.float32)
        _, total, _ = jax.lax.fori_loop(
            0, horizon, step, (s0, total0, jnp.float32(1.0))
        )
        # Output block is [tile, 1] (2-D keeps Mosaic layouts happy for the blocked store).
        out_ref[:, 0] = total

    def evaluate(dp: DynamicsParams, initial_states: jax.Array, action_sequences: jax.Array):
        pop, agents, horizon, du = action_sequences.shape
        assert du == dim_u, (du, dim_u)
        rows = pop * agents
        padded_rows = _round_up(rows, tile)
        n_tiles = padded_rows // tile

        # [P, A, H, U] -> time-major per tile: [rows, H, U] -> [H, rows, U]
        flat = action_sequences.reshape(rows, horizon, dim_u)
        flat = jnp.swapaxes(flat, 0, 1)  # [H, rows, U]
        if padded_rows != rows:
            flat = jnp.pad(flat, ((0, 0), (0, padded_rows - rows), (0, 0)))
        s0 = jnp.tile(initial_states, (pop, 1)).astype(jnp.float32)  # [rows, S]
        if padded_rows != rows:
            s0 = jnp.pad(s0, ((0, padded_rows - rows), (0, 0)))

        stats: NormalizerStats = dp.stats
        width = max(dim_s, dim_u)

        def row(v):
            return jnp.pad(v.astype(jnp.float32), (0, width - v.shape[0]))

        stats_mat = jnp.stack(
            [
                row(stats.mean_states),
                row(stats.std_states),
                row(stats.mean_actions),
                row(stats.std_actions),
                row(stats.mean_targets),
                row(stats.std_targets),
            ]
        )  # [6, width]

        # Stacked per-layer weights with a leading ensemble axis, cast to compute dtype.
        params = dp.params
        if ensemble == 1:
            params = jax.tree_util.tree_map(lambda x: x[None], params)
        weight_args = []
        for layer in params:
            weight_args.append(layer["w"].astype(compute_dtype))
            weight_args.append(layer["b"].astype(jnp.float32))

        grid_spec = pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                # actions: time-major [H, padded_rows, U], tile over rows
                pl.BlockSpec(
                    (horizon, tile, dim_u), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((tile, dim_s), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # stats (full, revolving)
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_args],
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )
        total = pl.pallas_call(
            partial(kernel, horizon, padded_rows),
            out_shape=jax.ShapeDtypeStruct((padded_rows, 1), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(flat, s0, stats_mat, *weight_args)
        rewards = total[:rows, 0].reshape(pop, agents)
        if nan_guard:
            rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
        return rewards

    return evaluate
