"""Fully fused CEM iteration: in-kernel candidate generation + rollout + elite moments.

The standard CEM pipeline materializes the candidate tensor ``[P, A, H, U]`` in HBM twice per
iteration (sampler write, evaluator read) and gathers elite rows for the moment update — at
pod-scale populations that tensor is gigabytes per iteration. This module removes it entirely
using a deterministic counter-based in-kernel RNG (murmur3 mix over element indices —
backend-portable, no hardware PRNG state):

* **Kernel A (sample+rollout)**: each population tile synthesizes its candidates in VMEM
  (Box-Muller, clipped at +/-2 sigma — a clipped- rather than resampled-truncated normal;
  indistinguishable for elite selection), rolls them through the ensemble MLP held in VMEM,
  and emits only the ``[P]`` reward vector.
* **Kernel B (sample+reduce)**: *regenerates* the identical candidates tile by tile (same
  seed/tile PRNG stream) and reduces elite sums/sums-of-squares via a masked matmul
  ``mask^T @ samples`` on the MXU — the elite gather becomes a [T, A] x [T, HU] contraction,
  no candidate ever touching HBM.

``make_fused_cem`` wraps both into a CEM solver with the same update rules/state as
:mod:`blackbox_mpc_tpu.solvers.cem`. It is not in ``SOLVER_REGISTRY`` (its factory needs the
dynamics config + params, not an evaluator); construct it directly inside a jitted step.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux
from blackbox_mpc_tpu.models.dynamics import DynamicsParams, LearnedDynamicsConfig
from blackbox_mpc_tpu.ops import _kernel_common as kc
from blackbox_mpc_tpu.solvers import base
from blackbox_mpc_tpu.solvers.cem import CEMConfig, CEMState

__all__ = ["make_fused_cem_kernels", "make_fused_cem"]

_TWO_PI = 2.0 * np.pi
_round_up = kc.round_up


def _mix(x: jax.Array) -> jax.Array:
    """murmur3 finalizer: a high-quality 32-bit mix (counter-based RNG core)."""
    s16 = jnp.uint32(16)
    s13 = jnp.uint32(13)
    x = x ^ jax.lax.shift_right_logical(x, s16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ jax.lax.shift_right_logical(x, s13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ jax.lax.shift_right_logical(x, s16)
    return x


def _uniform(counter: jax.Array, seed: jax.Array) -> jax.Array:
    """Counter-based uniform in (0, 1) from int32 element indices + scalar seed."""
    x = _mix(counter.astype(jnp.uint32) * jnp.uint32(0x9E3779B1) + seed.astype(jnp.uint32))
    # Mosaic has no uint32->f32 cast; the top-24-bit value fits exactly in (positive) int32.
    top24 = jax.lax.shift_right_logical(x, jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
    return (top24 + 0.5) * (1.0 / 16777216.0)


def _sample_tile(seed_ref, tile_id, t_rows: int, n_flat: int):
    """Deterministic clipped-N(0,1) candidate block [T, n_flat] for one tile.

    Counter-based (element index + seed -> murmur3 mix -> Box-Muller): both kernels
    regenerate bit-identical streams for the same (seed, global row), on any backend —
    no hardware PRNG state involved.
    """
    seed = seed_ref[0]
    row_ids = tile_id * t_rows + jax.lax.broadcasted_iota(jnp.int32, (t_rows, n_flat), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t_rows, n_flat), 1)
    counter = row_ids * n_flat + col_ids
    u1 = _uniform(counter, seed)
    u2 = _uniform(counter, seed + jnp.int32(0x632BE5AB))
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
    return jnp.clip(z, -2.0, 2.0)




def make_fused_cem_kernels(
    config: LearnedDynamicsConfig,
    reward_fn: Callable,
    *,
    horizon: int,
    agents: int,
    population: int,
    tile: int = 256,
    streamed: bool = True,
    interpret: bool = False,
):
    """Builds (rollout_rewards, elite_moments) for the fused CEM iteration.

    rollout_rewards(dp, s0 [A,S], mean [A,H,U], std [A,H,U], seed) -> rewards [P, A]
    elite_moments(mean, std, seed, mask [P, A]) -> CENTERED elite moments
        (sum of (x - mean), sum of (x - mean)^2), each [A, H*U]

    Constraints: deterministic MLP ensemble with mean propagation; rows are laid out
    population-major (row = p * A + a), matching the flattened evaluator convention.

    ``streamed=True`` (default): the rollout kernel runs on a (tiles, horizon) grid and
    synthesizes step h's actions *inside* step h from the counter-based RNG — the [T, H*U]
    action block never exists, so tiles grow 2-4x (``_streamed_tile``), the per-step
    ``pltpu.roll`` disappears, and Mosaic pipelines the tiny per-step mean/std blocks while
    the weights stay VMEM-resident across the entire grid. Candidate streams are
    bit-identical to the block kernel's (same global (row, col) counters), so kernel B's
    regeneration keeps matching either way. ``streamed=False`` keeps the round-1 block
    kernel (one grid dim, whole action block in VMEM) for A/B comparison.
    """
    kc.check_kernel_support(config, "fused CEM")
    dim_s, dim_u = config.dim_s, config.dim_u
    ensemble = config.ensemble_size
    compute_dtype = jnp.dtype(config.compute_dtype)
    n_flat = horizon * dim_u
    rows = population * agents
    if rows * n_flat >= 2**32:
        # The counter-based RNG indexes elements with int32 arithmetic (uint32 wrap);
        # beyond 2^32 elements counters collide and candidates silently duplicate.
        raise ValueError(
            f"fused CEM candidate tensor has {rows * n_flat} elements (>= 2^32); "
            "the int32 RNG counters would collide — reduce population/horizon"
        )
    padded_rows = _round_up(rows, tile)
    n_tiles = padded_rows // tile
    # Use the TPU-semantics interpreter for CPU testing (matches Mosaic op behavior).
    interpret_mode = pltpu.InterpretParams() if interpret else False

    def _row_stats(mean_ref, std_ref, tile_id):
        """Per-row mean/std [T, n_flat] for a tile via one-hot agent matmul (row = p*A + a)."""
        row_ids = tile_id * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)[:, 0]
        agent_ids = jax.lax.rem(row_ids, agents)
        onehot = (agent_ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (tile, agents), 1)
                  ).astype(jnp.float32)
        mean_rows = jnp.dot(onehot, mean_ref[:], preferred_element_type=jnp.float32)
        std_rows = jnp.dot(onehot, std_ref[:], preferred_element_type=jnp.float32)
        return mean_rows, std_rows, onehot

    # ---------------- Kernel A: sample + rollout -> rewards ----------------

    def kernel_a(seed_ref, s0_ref, mean_ref, std_ref, stats_ref, *wb_refs):
        out_ref = wb_refs[-1]
        weight_refs = wb_refs[:-1]
        tile_id = pl.program_id(0)
        z = _sample_tile(seed_ref, tile_id, tile, n_flat)
        mean_rows, std_rows, _ = _row_stats(mean_ref, std_ref, tile_id)
        actions0 = mean_rows + std_rows * z  # [T, H*U]

        step_fn = kc.build_step_fn(config, reward_fn, stats_ref[:], weight_refs)

        def step(t, carry):
            # The action block rides in the loop carry: step t's actions are the leading
            # dim_u lanes (offset-0 static slice — Mosaic-legal), then the block rolls left
            # by dim_u so step t+1's actions come to the front. Avoids unaligned dynamic
            # lane slices, which Mosaic rejects for dim_u not a multiple of 128.
            s, total, acts = carry
            ns, r = step_fn(s, acts[:, :dim_u])
            return ns, total + r, pltpu.roll(acts, n_flat - dim_u, axis=1)

        s0 = s0_ref[:]
        total0 = jnp.zeros((tile,), jnp.float32)
        _, total, _ = jax.lax.fori_loop(0, horizon, step, (s0, total0, actions0))
        out_ref[:, 0] = total

    # ------------- Kernel A (streamed): per-step in-kernel generation + rollout -------------

    st_tile = min(kc.streamed_tile(config), _round_up(rows, 128))
    st_padded = _round_up(rows, st_tile)
    st_tiles = st_padded // st_tile

    def kernel_a_streamed(seed_ref, s0_ref, mean_ref, std_ref, stats_ref, *rest):
        # rest = [*weight_refs, out_ref, state_scratch, total_scratch]
        weight_refs, out_ref, state_ref, total_ref = rest[:-3], rest[-3], rest[-2], rest[-1]
        i = pl.program_id(0)
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            state_ref[:] = s0_ref[:].astype(jnp.float32)
            total_ref[:] = jnp.zeros_like(total_ref)

        # Step h's candidate slice, same global (row, col) counter stream as _sample_tile:
        # col = h*dim_u + u, so kernel B's full-block regeneration stays bit-identical.
        seed = seed_ref[0]
        row_ids = i * st_tile + jax.lax.broadcasted_iota(jnp.int32, (st_tile, dim_u), 0)
        col_ids = h * dim_u + jax.lax.broadcasted_iota(jnp.int32, (st_tile, dim_u), 1)
        counter = row_ids * n_flat + col_ids
        u1 = _uniform(counter, seed)
        u2 = _uniform(counter, seed + jnp.int32(0x632BE5AB))
        z = jnp.clip(jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2), -2.0, 2.0)

        agent_ids = jax.lax.rem(
            i * st_tile + jax.lax.broadcasted_iota(jnp.int32, (st_tile, agents), 0), agents
        )
        onehot = (agent_ids == jax.lax.broadcasted_iota(jnp.int32, (st_tile, agents), 1)
                  ).astype(jnp.float32)
        mean_rows = jnp.dot(onehot, mean_ref[0], preferred_element_type=jnp.float32)
        std_rows = jnp.dot(onehot, std_ref[0], preferred_element_type=jnp.float32)
        actions = mean_rows + std_rows * z  # [T, U]

        step_fn = kc.build_step_fn(config, reward_fn, stats_ref[:], weight_refs)
        ns, r = step_fn(state_ref[:], actions)
        state_ref[:] = ns
        total_ref[:, 0] += r

        @pl.when(h == horizon - 1)
        def _():
            out_ref[:] = total_ref[:]

    def rollout_rewards_streamed(dp: DynamicsParams, s0, mean, std, seed):
        s0_rows = jnp.tile(s0.astype(jnp.float32), (population, 1))
        if st_padded != rows:
            s0_rows = jnp.pad(s0_rows, ((0, st_padded - rows), (0, 0)))
        # Time-major [H, A, U] so step h's (tiny) mean/std blocks ride the grid pipeline.
        mean_hau = jnp.swapaxes(mean.astype(jnp.float32), 0, 1)
        std_hau = jnp.swapaxes(std.astype(jnp.float32), 0, 1)
        nstats = kc.stats_matrix(dp, dim_s, dim_u)
        weight_args = kc.weight_operands(dp, ensemble, compute_dtype)
        seed_arr = jnp.asarray([seed], jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(st_tiles, horizon),
            in_specs=[
                pl.BlockSpec((st_tile, dim_s), lambda i, h, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, agents, dim_u), lambda i, h, *_: (h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, agents, dim_u), lambda i, h, *_: (h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # norm stats
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_args],
            out_specs=pl.BlockSpec((st_tile, 1), lambda i, h, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((st_tile, dim_s), jnp.float32),  # carried state
                pltpu.VMEM((st_tile, 1), jnp.float32),      # carried return
            ],
        )
        total = pl.pallas_call(
            kernel_a_streamed,
            out_shape=jax.ShapeDtypeStruct((st_padded, 1), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret_mode,
        )(seed_arr, s0_rows, mean_hau, std_hau, nstats, *weight_args)
        return total[:rows, 0].reshape(population, agents)

    # ---------------- Kernel B: regenerate + masked elite reduction ----------------

    def kernel_b(seed_ref, mean_ref, std_ref, mask_ref, sum_ref, sumsq_ref):
        tile_id = pl.program_id(0)
        z = _sample_tile(seed_ref, tile_id, tile, n_flat)
        mean_rows, std_rows, onehot = _row_stats(mean_ref, std_ref, tile_id)
        # Reduce CENTERED moments (sample - sampling mean = std*z): E[x^2]-mean^2 on raw
        # samples cancels catastrophically in fp32 for large-magnitude action bounds, while
        # centered values are O(2 sigma). The caller reconstructs mean/var from these.
        centered = std_rows * z  # [T, H*U]
        # mask_ref is [T, 1]: row r's elite membership (for its own agent); the one-hot
        # restricts the reduction to the owning agent's column.
        mask = mask_ref[:] * onehot  # [T, A]
        part_sum = jnp.dot(mask.T, centered, preferred_element_type=jnp.float32)
        part_sq = jnp.dot(mask.T, centered * centered, preferred_element_type=jnp.float32)

        @pl.when(tile_id == 0)
        def _():
            sum_ref[:] = jnp.zeros_like(sum_ref)
            sumsq_ref[:] = jnp.zeros_like(sumsq_ref)

        sum_ref[:] += part_sum
        sumsq_ref[:] += part_sq

    def rollout_rewards(dp: DynamicsParams, s0, mean, std, seed):
        # s0 [A,S] tiled to rows; mean/std [A,H,U] -> [A, H*U]
        s0_rows = jnp.tile(s0.astype(jnp.float32), (population, 1))
        if padded_rows != rows:
            s0_rows = jnp.pad(s0_rows, ((0, padded_rows - rows), (0, 0)))
        mean_f = mean.reshape(agents, n_flat).astype(jnp.float32)
        std_f = std.reshape(agents, n_flat).astype(jnp.float32)
        nstats = kc.stats_matrix(dp, dim_s, dim_u)
        weight_args = kc.weight_operands(dp, ensemble, compute_dtype)
        seed_arr = jnp.asarray([seed], jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, dim_s), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # mean
                pl.BlockSpec(memory_space=pltpu.VMEM),  # std
                pl.BlockSpec(memory_space=pltpu.VMEM),  # norm stats
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_args],
            out_specs=pl.BlockSpec((tile, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        )
        total = pl.pallas_call(
            kernel_a,
            out_shape=jax.ShapeDtypeStruct((padded_rows, 1), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret_mode,
        )(seed_arr, s0_rows, mean_f, std_f, nstats, *weight_args)
        return total[:rows, 0].reshape(population, agents)

    def elite_moments(mean, std, seed, mask):
        """mask: [P, A] elite membership. Row r = p*A + a owns exactly mask[p, a] =
        mask.reshape(rows)[r], so the kernel needs only the flat per-row column."""
        mean_f = mean.reshape(agents, n_flat).astype(jnp.float32)
        std_f = std.reshape(agents, n_flat).astype(jnp.float32)
        mask_rows = mask.astype(jnp.float32).reshape(rows, 1)
        if padded_rows != rows:
            mask_rows = jnp.pad(mask_rows, ((0, padded_rows - rows), (0, 0)))
        seed_arr = jnp.asarray([seed], jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # mean
                pl.BlockSpec(memory_space=pltpu.VMEM),  # std
                pl.BlockSpec((tile, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )
        sums, sumsq = pl.pallas_call(
            kernel_b,
            out_shape=(
                jax.ShapeDtypeStruct((agents, n_flat), jnp.float32),
                jax.ShapeDtypeStruct((agents, n_flat), jnp.float32),
            ),
            grid_spec=grid_spec,
            interpret=interpret_mode,
        )(seed_arr, mean_f, std_f, mask_rows)
        return sums, sumsq

    return (rollout_rewards_streamed if streamed else rollout_rewards), elite_moments


def make_fused_cem(
    config: CEMConfig,
    bounds: Bounds,
    dyn_config: LearnedDynamicsConfig,
    dp: DynamicsParams,
    reward_fn: Callable,
    *,
    tile: int = 256,
    streamed: bool = False,
    interpret: bool = False,
) -> Solver:
    """CEM solver over the fused kernels (same update rules/state as solvers.cem).

    ``dp`` may be a traced value (construct the solver inside the jitted step, as MPCPolicy
    does) so freshly trained params flow in without recompilation.

    ``streamed`` defaults to the BLOCK kernel: measured r3 (backend_regimes_r3.jsonl) the
    block variant wins every fused-CEM shape (1.66x at the 4M beyond-HBM point, 1.07x at
    the flagship) — per-step in-kernel generation lane-pads the [T, U] noise block to 128
    lanes (~95% VPU waste at U=6) while the block kernel synthesizes packed [T, H*U] noise.
    """
    horizon, agents, pop, k = (
        config.planning_horizon, config.num_agents, config.population, config.num_elite,
    )
    if k > pop:
        raise ValueError(f"num_elite ({k}) must be <= population ({pop})")
    if getattr(config, "colored_noise_beta", 0.0) > 0.0:
        raise ValueError(
            "fused CEM samples white clipped normals in-kernel; colored_noise_beta is not "
            "supported — use the standard CEM solver for iCEM colored noise"
        )
    if getattr(config, "keep_elites", 0) > 0:
        raise ValueError(
            "fused CEM regenerates candidates in-kernel each iteration; keep_elites "
            "persistence is not supported — use the standard CEM solver"
        )
    if getattr(config, "population_decay", 1.0) != 1.0:
        raise ValueError(
            "fused CEM compiles one fixed-population kernel; population_decay is not "
            "supported — use the standard CEM solver"
        )
    if getattr(config, "mean_as_candidate", False) or getattr(config, "execute_best", False):
        raise ValueError(
            "fused CEM does not support mean_as_candidate/execute_best — use the "
            "standard CEM solver"
        )
    alpha = config.alpha
    rollout_rewards, elite_moments = make_fused_cem_kernels(
        dyn_config, reward_fn,
        horizon=horizon, agents=agents, population=pop, tile=tile, streamed=streamed,
        interpret=interpret,
    )

    def init(key: jax.Array) -> CEMState:
        del key
        return CEMState(
            mean=base.init_solution_mean(bounds, horizon, agents),
            variance=base.init_solution_variance(bounds, horizon, agents),
        )

    def solve(state: CEMState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t

        def iteration(_, carry):
            mean, var, key, _ = carry
            key, seed_key = jax.random.split(key)
            seed = jax.random.randint(seed_key, (), 0, jnp.iinfo(jnp.int32).max)
            constrained = base.constrain_variance(mean, var, bounds)
            std = jnp.sqrt(constrained)
            rewards = rollout_rewards(dp, obs, mean, std, seed)  # [P, A]
            rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
            elite_vals, elite_idx = jax.lax.top_k(rewards.T, k)  # [A, k]
            mask = jnp.zeros((pop, agents), jnp.float32).at[
                elite_idx.T, jnp.arange(agents)[None, :]
            ].set(1.0)
            csum, csumsq = elite_moments(mean, std, seed, mask)  # centered moments
            delta = (csum / k).reshape(agents, horizon, bounds.dim)
            new_mean = mean + delta  # sampling mean + mean of centered elite offsets
            new_var = (csumsq / k).reshape(agents, horizon, bounds.dim) - jnp.square(delta)
            new_var = jnp.maximum(new_var, 0.0)
            mean = alpha * mean + (1.0 - alpha) * new_mean
            var = alpha * var + (1.0 - alpha) * new_var
            return mean, var, key, jnp.mean(elite_vals, axis=1)

        best0 = jnp.full((agents,), -jnp.inf, dtype=state.mean.dtype)
        mean, var, _, elite_reward = jax.lax.fori_loop(
            0, config.max_iterations, iteration, (state.mean, state.variance, key, best0)
        )
        action = mean[:, 0]
        if config.warm_start:
            next_state = CEMState(mean=base.shift_time(mean), variance=state.variance)
        else:
            next_state = state
        return action, next_state, SolverAux(expected_reward=elite_reward, plan=mean)

    def reset(state: CEMState, key: jax.Array) -> CEMState:
        del state
        return init(key)

    return Solver(init=init, solve=solve, reset=reset, name="CEM-Fused", plan_field="mean")
