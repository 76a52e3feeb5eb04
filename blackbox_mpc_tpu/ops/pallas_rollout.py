"""Pallas TPU kernel: fused ensemble-MLP trajectory rollout.

The rollout hot loop (SURVEY §3.1: ``max_iterations x H`` sequential dynamics evaluations of a
``population``-row batch) re-reads the full ensemble weights from HBM every horizon step under
plain XLA. This kernel inverts the loop structure: the grid runs over *population tiles*, and
each grid step keeps the ENTIRE ensemble resident in VMEM while scanning all H horizon steps
for its tile — weights are read from HBM once per tile instead of once per step. Per step, per
member: MXU matmuls (tanh MLP) accumulated in fp32; the state update, normalizer chain, and
reward accumulate on the VPU, fully fused (shared chain: :mod:`ops._kernel_common`).

Supports both ensemble propagations of
:class:`~blackbox_mpc_tpu.models.dynamics.LearnedDynamicsConfig`: ``"mean"`` (all members per
row, averaged) and ``"ts1"`` (rows permuted member-major so each tile runs exactly one member's
weights — E-fold less compute than mean), plus the normalize -> MLP -> denormalize -> delta
chain of ``make_learned_dynamics`` and an arbitrary jnp-expressible ``reward_fn``.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackbox_mpc_tpu.models.dynamics import (
    DynamicsParams,
    LearnedDynamicsConfig,
    ts_member_ids,
)
from blackbox_mpc_tpu.ops import _kernel_common as kc

__all__ = ["make_pallas_rollout_evaluator"]


_round_up = kc.round_up


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

    Requirements: tanh/relu/gelu activations; for ``propagation="ts1"``, pop*agents must be
    divisible by the ensemble size. ``interpret=True`` runs in interpreter mode (CPU tests).
    """
    kc.check_kernel_support(config, "pallas rollout", allow_ts1=True)
    dim_s, dim_u = config.dim_s, config.dim_u
    ensemble = config.ensemble_size
    ts1 = ensemble > 1 and config.propagation == "ts1"
    compute_dtype = jnp.dtype(config.compute_dtype)

    def kernel(horizon: int, *refs):
        # TS-1 prepends a scalar-prefetch member-per-tile vector.
        if ts1:
            member_ref, actions_ref, s0_ref, stats_ref, *wb_refs = refs
            member = member_ref[pl.program_id(0)]
        else:
            actions_ref, s0_ref, stats_ref, *wb_refs = refs
            member = None
        out_ref = wb_refs[-1]
        weight_refs = wb_refs[:-1]
        step_fn = kc.build_step_fn(config, reward_fn, stats_ref[:], weight_refs, member=member)

        def step(t, carry):
            s, total, disc = carry  # s: [T, S] fp32, total: [T] fp32
            ns, r = step_fn(s, actions_ref[t])
            return ns, total + disc * r, disc * discount

        s0 = s0_ref[:]
        total0 = jnp.zeros((s0.shape[0],), jnp.float32)
        _, total, _ = jax.lax.fori_loop(0, horizon, step, (s0, total0, jnp.float32(1.0)))
        # Output block is [tile, 1] (2-D keeps Mosaic layouts happy for the blocked store).
        out_ref[:, 0] = total

    def evaluate(dp: DynamicsParams, initial_states: jax.Array, action_sequences: jax.Array):
        pop, agents, horizon, du = action_sequences.shape
        assert du == dim_u, (du, dim_u)
        rows = pop * agents
        flat = action_sequences.reshape(rows, horizon, dim_u)
        s0 = jnp.tile(initial_states, (pop, 1)).astype(jnp.float32)  # [rows, S]

        if ts1:
            # TS-1: row i uses member ts_member_ids(rows, E)[i] (the same balanced static
            # shuffle as make_learned_dynamics — see ts_member_ids for why i % E aliases
            # with the agent stride). Rows are permuted member-major so every tile is
            # single-member, each member block padded to a tile multiple; a scalar-prefetch
            # vector tells the kernel each tile's member, and rewards are scattered back to
            # the original order.
            if rows % ensemble != 0:
                raise ValueError(
                    f"ts1 needs pop*agents ({rows}) divisible by ensemble ({ensemble})"
                )
            per_member = rows // ensemble
            perm = jnp.asarray(np.argsort(ts_member_ids(rows, ensemble), kind="stable"))
            block = _round_up(per_member, tile)
            padded_rows = block * ensemble
            n_tiles = padded_rows // tile
            tiles_per_member = block // tile
            member_ids = np.repeat(np.arange(ensemble, dtype=np.int32), tiles_per_member)

            def pad_blocks(x):
                # [rows, ...] member-major -> pad each member block to `block` rows
                grouped = x.reshape(ensemble, per_member, *x.shape[1:])
                return jnp.pad(
                    grouped, ((0, 0), (0, block - per_member)) + ((0, 0),) * (x.ndim - 1)
                ).reshape(ensemble * block, *x.shape[1:])

            flat = pad_blocks(flat[perm])
            s0 = pad_blocks(s0[perm])
        else:
            padded_rows = _round_up(rows, tile)
            n_tiles = padded_rows // tile
            if padded_rows != rows:
                flat = jnp.pad(flat, ((0, padded_rows - rows), (0, 0), (0, 0)))
                s0 = jnp.pad(s0, ((0, padded_rows - rows), (0, 0)))

        flat = jnp.swapaxes(flat, 0, 1)  # time-major [H, padded_rows, U]
        weight_args = kc.weight_operands(dp, ensemble, compute_dtype)
        in_specs = [
            # actions: time-major [H, padded_rows, U], tile over rows
            pl.BlockSpec((horizon, tile, dim_u), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dim_s), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stats (full, revolving)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_args]
        out_spec = pl.BlockSpec((tile, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        if ts1:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_tiles,), in_specs=in_specs, out_specs=out_spec
            )
            operands = (jnp.asarray(member_ids), flat, s0,
                        kc.stats_matrix(dp, dim_s, dim_u), *weight_args)
        else:
            grid_spec = pl.GridSpec(grid=(n_tiles,), in_specs=in_specs, out_specs=out_spec)
            operands = (flat, s0, kc.stats_matrix(dp, dim_s, dim_u), *weight_args)
        total = pl.pallas_call(
            partial(kernel, horizon),
            out_shape=jax.ShapeDtypeStruct((padded_rows, 1), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(*operands)
        if ts1:
            grouped = total[:, 0].reshape(ensemble, block)[:, :per_member].reshape(-1)
            rewards = jnp.zeros((rows,), jnp.float32).at[perm].set(grouped).reshape(pop, agents)
        else:
            rewards = total[:rows, 0].reshape(pop, agents)
        if nan_guard:
            rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
        return rewards

    return evaluate
