"""Pallas TPU kernel: fused ensemble-MLP trajectory rollout.

The rollout hot loop (SURVEY §3.1: ``max_iterations x H`` sequential dynamics evaluations of a
``population``-row batch) re-reads the full ensemble weights from HBM every horizon step under
plain XLA. This kernel inverts the loop structure: the grid runs over *population tiles*, and
each grid step keeps the ENTIRE ensemble resident in VMEM while scanning all H horizon steps
for its tile — weights are read from HBM once per tile instead of once per step. Per step, per
member: MXU matmuls (tanh MLP) accumulated in fp32; the state update, normalizer chain, and
reward accumulate on the VPU, fully fused (shared chain: :mod:`ops._kernel_common`).

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackbox_mpc_tpu.models.dynamics import DynamicsParams, LearnedDynamicsConfig
from blackbox_mpc_tpu.ops import _kernel_common as kc

__all__ = ["make_pallas_rollout_evaluator"]


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
    kc.check_kernel_support(config, "pallas rollout")
    dim_s, dim_u = config.dim_s, config.dim_u
    ensemble = config.ensemble_size
    compute_dtype = jnp.dtype(config.compute_dtype)

    def kernel(horizon: int, actions_ref, s0_ref, stats_ref, *wb_refs):
        out_ref = wb_refs[-1]
        weight_refs = wb_refs[:-1]
        step_fn = kc.build_step_fn(config, reward_fn, stats_ref[:], weight_refs)

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

        weight_args = kc.weight_operands(dp, ensemble, compute_dtype)
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
            partial(kernel, horizon),
            out_shape=jax.ShapeDtypeStruct((padded_rows, 1), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(flat, s0, kc.stats_matrix(dp, dim_s, dim_u), *weight_args)
        rewards = total[:rows, 0].reshape(pop, agents)
        if nan_guard:
            rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
        return rewards

    return evaluate
