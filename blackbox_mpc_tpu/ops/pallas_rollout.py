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
    tile: int | None = None,
    discount: float = 1.0,
    nan_guard: bool = True,
    streamed: bool = True,
    interpret: bool = False,
):
    """Builds ``evaluate(dp, initial_states [A,S], actions [P,A,H,U]) -> rewards [P,A]``.

    Requirements: tanh/relu/gelu activations; for ``propagation="ts1"``, pop*agents must be
    divisible by the ensemble size. ``interpret=True`` runs in interpreter mode (CPU tests).

    ``streamed=True`` (default): run on a ``(tiles, horizon)`` grid with per-step action
    blocks ``(1, T, U)`` pipelined by Mosaic and state/return carried in VMEM scratch. The
    block kernel's per-tile ``[H, T, U]`` action buffer lane-pads U up to 128 — a ~21x VMEM
    waste for U=6 that capped tiles at 256 rows; streaming holds only ~2 step blocks, so
    tiles grow to 512-1024 (``kc.streamed_tile``) and the per-step matmuls approach XLA's
    full-batch shapes while weights stay VMEM-resident across the whole grid.
    ``streamed=False`` keeps the round-1 single-grid-dim kernel. ``tile=None`` auto-sizes
    (streamed: VMEM-budgeted; block: 256).
    """
    kc.check_kernel_support(config, "pallas rollout", allow_ts1=True)
    dim_s, dim_u = config.dim_s, config.dim_u
    ensemble = config.ensemble_size
    ts1 = ensemble > 1 and config.propagation == "ts1"
    compute_dtype = jnp.dtype(config.compute_dtype)
    if tile is None:
        tile = kc.streamed_tile(config, extra_row_bytes=2 * 128 * 4) if streamed else 256

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

    def kernel_streamed(horizon: int, *refs):
        # refs = ([member prefetch,] actions, s0, stats, *weights, out, state, total, disc)
        if ts1:
            member_ref, actions_ref, s0_ref, stats_ref, *rest = refs
            member = member_ref[pl.program_id(0)]
        else:
            actions_ref, s0_ref, stats_ref, *rest = refs
            member = None
        weight_refs = rest[:-4]
        out_ref, state_ref, total_ref, disc_ref = rest[-4], rest[-3], rest[-2], rest[-1]
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            state_ref[:] = s0_ref[:]
            total_ref[:] = jnp.zeros_like(total_ref)
            disc_ref[0] = 1.0

        step_fn = kc.build_step_fn(config, reward_fn, stats_ref[:], weight_refs, member=member)
        ns, r = step_fn(state_ref[:], actions_ref[0])
        # Same repeated-multiply discounting as the block kernel's fori carry (bit parity).
        total_ref[:, 0] += disc_ref[0] * r
        state_ref[:] = ns
        if discount != 1.0:
            disc_ref[0] *= jnp.float32(discount)

        @pl.when(h == horizon - 1)
        def _():
            out_ref[:] = total_ref[:]

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
        if streamed:
            grid = (n_tiles, horizon)
            act_spec = pl.BlockSpec(
                (1, tile, dim_u), lambda i, h, *_: (h, i, 0), memory_space=pltpu.VMEM
            )
            s0_spec = pl.BlockSpec((tile, dim_s), lambda i, h, *_: (i, 0),
                                   memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((tile, 1), lambda i, h, *_: (i, 0),
                                    memory_space=pltpu.VMEM)
            scratch = [
                pltpu.VMEM((tile, dim_s), jnp.float32),  # carried state
                pltpu.VMEM((tile, 1), jnp.float32),      # carried return
                pltpu.SMEM((1,), jnp.float32),           # carried discount
            ]
            body = partial(kernel_streamed, horizon)
        else:
            grid = (n_tiles,)
            act_spec = pl.BlockSpec((horizon, tile, dim_u), lambda i, *_: (0, i, 0),
                                    memory_space=pltpu.VMEM)
            s0_spec = pl.BlockSpec((tile, dim_s), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((tile, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
            scratch = []
            body = partial(kernel, horizon)
        in_specs = [act_spec, s0_spec, pl.BlockSpec(memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_args
        ]
        if ts1:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs, out_specs=out_spec,
                scratch_shapes=scratch,
            )
            operands = (jnp.asarray(member_ids), flat, s0,
                        kc.stats_matrix(dp, dim_s, dim_u), *weight_args)
            total = pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct((padded_rows, 1), jnp.float32),
                grid_spec=grid_spec,
                interpret=interpret,
            )(*operands)
        else:
            operands = (flat, s0, kc.stats_matrix(dp, dim_s, dim_u), *weight_args)
            total = pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct((padded_rows, 1), jnp.float32),
                grid=grid, in_specs=in_specs, out_specs=out_spec,
                scratch_shapes=scratch,
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
