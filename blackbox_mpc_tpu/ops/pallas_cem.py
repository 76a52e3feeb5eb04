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

Round-3 feature parity with the XLA CEM (``solvers/cem.py``), all in-kernel: TS-1 ensemble
propagation (one member per tile, scalar-prefetched), iCEM colored noise (white gaussians
pushed through a fixed spectral basis — one extra MXU matmul), keep_elites and
mean-as-candidate (the last population slots read from a tiny injected-candidate buffer),
execute-best (elite values regenerated outside the kernels by the jnp mirror of the
counter RNG, :func:`_mirror_z`), and — since round 4 — ``population_decay`` (per-iteration
populations are static at trace time, so the solver instantiates one kernel pair per
distinct decayed population and unrolls the iteration loop, completing the iCEM set).

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
from blackbox_mpc_tpu.solvers.cem import CEMConfig, CEMState, iteration_populations
from blackbox_mpc_tpu.solvers.cma_es import CMAESConfig, CMAESState, cma_constants
from blackbox_mpc_tpu.solvers.pi2 import PI2Config, PI2State
from blackbox_mpc_tpu.solvers.random_search import RandomSearchConfig, RandomSearchState

__all__ = [
    "make_fused_cem_kernels",
    "make_fused_cem",
    "make_fused_pi2",
    "make_fused_random_search",
    "make_fused_sep_cma",
]

_TWO_PI = 2.0 * np.pi
_round_up = kc.round_up

# E[clip(z, -2, 2)^2] for z ~ N(0, 1): the fused family samples CLIPPED (not
# resampled-truncated) normals, so raw second moments of the candidate distribution are
# deflated by this factor relative to the unclipped N(0,1) the Hansen strategy constants
# assume (integral_{-2}^{2} z^2 phi(z) dz + 2 * 4 * Phi(-2) = 0.73854 + 0.18200).
_CLIPPED_Z_SECOND_MOMENT = 0.9205369256363231


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
    """Counter-based uniform in (0, 1) from int32 element indices + scalar seed.

    The seed is mixed into a KEY and xor-combined with the scaled counter. A raw additive
    seed (``mix(c*PHI + s)``) makes every seed's stream a shifted WINDOW of one global
    sequence — a seed shift is exactly a counter shift through the bijective mix — so two
    seeds whose windows overlap produce wholesale-identical runs (at pod scale the
    per-device streams of ``ops/fused_sharded.py`` provably overlapped: 8 devices x 1.2e9
    counters > 2^32). With ``key = mix(seed)`` xor'd in, two distinct seeds' streams are
    related only by the scattered permutation ``c -> ((c*PHI) ^ dkey) * PHI^-1`` — single
    elements may coincide at unrelated positions (birthday-level, statistically benign),
    but contiguous runs cannot. This also decorrelates the u1/u2 Box-Muller pair below,
    whose additive ``seed + K`` offset had the same window-overlap hazard.
    """
    key = _mix(jnp.asarray(seed).astype(jnp.uint32))
    x = _mix((counter.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)) ^ key)
    # Mosaic has no uint32->f32 cast; the top-24-bit value fits exactly in (positive) int32.
    top24 = jax.lax.shift_right_logical(x, jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
    return (top24 + 0.5) * (1.0 / 16777216.0)


def _normal(counter: jax.Array, seed: jax.Array) -> jax.Array:
    """Counter-based N(0,1) via Box-Muller (unclipped)."""
    u1 = _uniform(counter, seed)
    u2 = _uniform(counter, seed + jnp.int32(0x632BE5AB))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _colored_basis2(horizon: int, dim_u: int, beta: float) -> np.ndarray:
    """[U*2F, H*U] spectral-synthesis basis reproducing ``solvers.base.colored_noise``.

    colored_noise draws a white complex spectrum g1 + i*g2 over F = H//2+1 rfft bins,
    scales bin k by (k+1)^(-beta/2), and irffts over H. irfft is linear, so the signal is
    an exact linear map of the 2F white gaussians: precompute the irfft of each unit
    basis vector (numpy, trace time) and the in-kernel transform becomes ONE MXU matmul
    ``G [T, U*2F] @ basis2`` producing the action-layout block (col = h*U + u). Per-u
    blocks are disjoint (block-diagonal after the (u, k) -> u*2F + k packing).
    """
    from blackbox_mpc_tpu.solvers.base import colored_synthesis_basis

    nfreq = horizon // 2 + 1
    # real/imag unit responses: irfft(e_k) and irfft(i*e_k), each [H] — one shared source
    # of truth with the XLA time-major path (solvers/base.py).
    basis = colored_synthesis_basis(horizon, beta)
    big = np.zeros((dim_u * 2 * nfreq, horizon * dim_u), np.float32)
    for u in range(dim_u):
        big[u * 2 * nfreq:(u + 1) * 2 * nfreq, u::dim_u] = basis
    return big


def _gen_z(counter: jax.Array, seed: jax.Array, basis2, sampling: str = "normal") -> jax.Array:
    """Deterministic z block from int32 counters; shared by both kernels AND the jnp
    mirror (plain jnp ops — legal in Mosaic and in XLA), so candidate streams are
    identical everywhere.

    ``sampling="normal"``, white (``basis2 is None``): counter is [N, n_flat];
    z = clipped-N(0,1) (+/-2 sigma — a clipped rather than resampled truncated normal;
    indistinguishable for elite selection). Colored: counter is [N, U*2F]; white gaussians
    are pushed through the spectral basis (one matmul), normalized to unit std per row
    over the whole (H, U) sequence (matching ``solvers.base.colored_noise``), then clipped
    at +/-2. ``sampling="uniform"``: z ~ U(-1, 1) — with mean=midpoint and
    std=half-range this is the RandomSearch uniform-in-bounds candidate
    (``solvers/random_search.py``).
    """
    if sampling == "uniform":
        return 2.0 * _uniform(counter, seed) - 1.0
    g = _normal(counter, seed)
    if basis2 is None:
        return jnp.clip(g, -2.0, 2.0)
    sig = jnp.dot(g, basis2, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # [N, H*U]
    mu = jnp.mean(sig, axis=1, keepdims=True)
    std = jnp.sqrt(jnp.maximum(jnp.mean(jnp.square(sig - mu), axis=1, keepdims=True), 0.0))
    return jnp.clip(sig / (std + 1e-8), -2.0, 2.0)


def _tile_counter(row0, t_rows: int, n_cols: int):
    """[T, C] element counters for rows [row0, row0+T) (row-major: counter = row*C + col)."""
    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (t_rows, n_cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t_rows, n_cols), 1)
    return row_ids * n_cols + col_ids


def _sample_tile(seed_ref, tile_id, t_rows: int, n_flat: int):
    """White clipped-N(0,1) candidate block [T, n_flat] for one tile (streamed kernel)."""
    return _gen_z(_tile_counter(tile_id * t_rows, t_rows, n_flat), seed_ref[0], None)


def _mirror_z(seed, row_ids, n_flat: int, basis2=None, sampling: str = "normal") -> jax.Array:
    """jnp mirror of the in-kernel stream for arbitrary (non-contiguous) rows [N].

    Used by the fused solvers to extract candidate VALUES (carried elites, execute-best /
    argmax plans) without ever materializing the population — regenerates just the N
    requested rows. Same counters, same math as ``_gen_z`` in the kernels (XLA vs Mosaic
    transcendentals may differ in the last ulp, which only perturbs re-injected candidate
    values, never the in-kernel moment reduction).
    """
    n_cols = n_flat if basis2 is None else basis2.shape[0]
    counter = row_ids[:, None].astype(jnp.int32) * n_cols + jnp.arange(n_cols, dtype=jnp.int32)
    return _gen_z(counter, jnp.asarray(seed, jnp.int32), basis2, sampling)




def make_fused_cem_kernels(
    config: LearnedDynamicsConfig,
    reward_fn: Callable,
    *,
    horizon: int,
    agents: int,
    population: int,
    tile: int = 256,
    streamed: bool = False,
    interpret: bool = False,
    colored_noise_beta: float = 0.0,
    extra_slots: int = 0,
    sampling: str = "normal",
    aux_dot: bool = False,
    clip_bounds=None,
):
    """Builds (rollout_rewards, elite_moments) for the fused solver iterations.

    Shared by the fused CEM, PI2/MPPI (``elite_moments`` takes softmax weights in place
    of the 0/1 elite mask — the masked matmul is weight-agnostic), and RandomSearch
    (``sampling="uniform"``: z ~ U(-1,1), so mean=midpoint/std=half-range reproduce the
    uniform-in-bounds candidates). ``aux_dot=True`` makes ``rollout_rewards`` also return
    the per-row inner product ``<g_row, std*z>`` against a ``gvec [A, H*U]`` operand — the
    MPPI information-theoretic control cost (``solvers/pi2.py`` ``control_cost``) computed
    in-kernel without materializing the perturbations.

    rollout_rewards(dp, s0 [A,S], mean [A,H,U], std [A,H,U], seed[, extra]) -> rewards [P, A]
    elite_moments(mean, std, seed, mask [P, A][, extra]) -> CENTERED elite moments
        (sum of (x - mean), sum of (x - mean)^2), each [A, H*U]

    Constraints: deterministic MLP ensemble with ``"mean"`` or ``"ts1"`` propagation; rows
    are laid out population-major (row = p * A + a), matching the flattened evaluator
    convention. TS-1 assigns one ensemble member per TILE (a seeded balanced shuffle over
    tiles — coarser than the XLA path's per-row ``ts_member_ids`` but statistically
    equivalent: candidates are iid across rows, every candidate runs exactly one member,
    members are used with equal frequency to within one tile); the assignment is exposed
    as ``rollout_rewards.tile_member_ids`` / ``.tile_rows`` for verification.

    ``colored_noise_beta > 0`` generates iCEM temporally colored candidates in-kernel (one
    extra MXU matmul against a fixed spectral basis — see :func:`_colored_basis2`); the
    XLA path clips colored samples to bounds while this kernel clips z at +/-2 sigma (the
    white-path convention that keeps kernel B's centered moments exact).

    ``extra_slots > 0`` reserves the LAST ``extra_slots`` population indices for INJECTED
    candidates (iCEM keep_elites / mean-as-candidate): both kernels take an additional
    ``extra [extra_slots * agents, H*U]`` operand (slot e, agent a at flat row e*A + a)
    and rows with p >= population - extra_slots read their actions from it instead of the
    RNG stream. The buffer is tiny (tens of rows), so injection costs one one-hot matmul.

    The new features run on the BLOCK kernels only (the measured-default path —
    backend_regimes_r3.jsonl); ``streamed=True`` with any feature raises.

    ``streamed=False`` (default — the r3-measured winner, backend_regimes_r3.jsonl): one
    grid dim, the whole [T, H*U] action block in VMEM. ``streamed=True`` keeps the
    per-step-generation variant for A/B comparison: a (tiles, horizon) grid synthesizing
    step h's actions inside step h (bigger tiles, no roll) — measured SLOWER everywhere
    because the per-step [T, U] noise block lane-pads U to 128 on the VPU. Candidate
    streams are bit-identical between the two (same global (row, col) counters), so
    kernel B's regeneration matches either way.
    """
    kc.check_kernel_support(config, "fused CEM", allow_ts1=True)
    dim_s, dim_u = config.dim_s, config.dim_u
    ensemble = config.ensemble_size
    ts1 = ensemble > 1 and config.propagation == "ts1"
    compute_dtype = jnp.dtype(config.compute_dtype)
    n_flat = horizon * dim_u
    rows = population * agents
    if sampling not in ("normal", "uniform"):
        raise ValueError(f"sampling must be 'normal' or 'uniform', got {sampling!r}")
    colored = colored_noise_beta > 0.0
    if colored and sampling == "uniform":
        raise ValueError("colored noise applies to normal sampling only")
    basis2_np = _colored_basis2(horizon, dim_u, colored_noise_beta) if colored else None
    n_cols = basis2_np.shape[0] if colored else n_flat  # RNG counters per row
    fresh_pop = population - extra_slots
    if extra_slots and fresh_pop < 1:
        raise ValueError(f"extra_slots ({extra_slots}) must leave >= 1 fresh candidate")
    # clip_bounds=(lower [U], upper [U]) numpy: clip candidates to bounds in BOTH kernels
    # and subtract the squared-violation penalty from kernel A's rewards — exactly
    # solvers.base.bound_violation_penalty, used by the fused PI2/MPPI (whose mean, unlike
    # CEM's variance-constrained one, would otherwise drift out of the action space).
    if clip_bounds is not None:
        if extra_slots:
            raise ValueError("clip_bounds and extra_slots are mutually exclusive (no "
                             "current solver needs both; the penalty would be wrong on "
                             "injected rows)")
        # [2, n_flat] kernel operand (Mosaic rejects captured array constants)
        clip_arr = jnp.asarray(np.stack([
            np.tile(np.asarray(clip_bounds[0], np.float32), horizon),
            np.tile(np.asarray(clip_bounds[1], np.float32), horizon),
        ]))
    if streamed and (colored or extra_slots or ts1 or aux_dot or sampling != "normal"
                     or clip_bounds is not None):
        raise ValueError(
            "colored noise / injected candidates / ts1 / aux_dot / uniform sampling / "
            "clip_bounds run on the block fused kernels (the measured default); "
            "streamed=True supports the plain white-noise path only"
        )
    if rows * n_cols >= 2**32:
        # The counter-based RNG indexes elements with int32 arithmetic (uint32 wrap);
        # beyond 2^32 elements counters collide and candidates silently duplicate.
        raise ValueError(
            f"fused CEM candidate stream has {rows * n_cols} elements (>= 2^32); "
            "the int32 RNG counters would collide — reduce population/horizon"
        )
    padded_rows = _round_up(rows, tile)
    n_tiles = padded_rows // tile
    if ts1:
        # One member per tile: a seeded balanced shuffle over tiles (same spirit and seed
        # as models.dynamics.ts_member_ids, tile-granular so each tile runs exactly one
        # member's weights via scalar prefetch — the rollout kernel's scheme, ported).
        if n_tiles < ensemble:
            raise ValueError(
                f"ts1 fused CEM needs >= {ensemble} tiles (rows={rows}, tile={tile}) so "
                "every ensemble member is used; raise population or lower tile"
            )
        tile_members = np.resize(np.arange(ensemble, dtype=np.int32), n_tiles)
        np.random.default_rng(0x75B007).shuffle(tile_members)
    # Use the TPU-semantics interpreter for CPU testing (matches Mosaic op behavior).
    interpret_mode = pltpu.InterpretParams() if interpret else False

    def _row_stats(mean_ref, std_ref, tile_id):
        """Per-row mean/std [T, n_flat] for a tile via one-hot agent matmul (row = p*A + a)."""
        row_ids = tile_id * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)[:, 0]
        agent_ids = jax.lax.rem(row_ids, agents)
        onehot = (agent_ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (tile, agents), 1)
                  ).astype(jnp.float32)
        mean_rows = jnp.dot(onehot, mean_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        std_rows = jnp.dot(onehot, std_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        return mean_rows, std_rows, onehot

    def _inject_lookup(tile_id, extra_ref):
        """Values for rows owned by injected population slots (p >= fresh_pop), gathered
        from the extra buffer via a one-hot matmul (no dynamic VMEM gathers).
        Returns (inj_vals [T, H*U] — zeros on non-injected rows, mask [T, 1] bool)."""
        row_ids = tile_id * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)[:, 0]
        p_ids = jax.lax.div(row_ids, jnp.int32(agents))
        a_ids = jax.lax.rem(row_ids, jnp.int32(agents))
        is_inj = jnp.logical_and(p_ids >= fresh_pop, p_ids < population)
        inj_idx = jnp.clip(
            (p_ids - fresh_pop) * agents + a_ids, 0, extra_slots * agents - 1
        )
        onehot = (
            inj_idx[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (tile, extra_slots * agents), 1)
        ).astype(jnp.float32) * is_inj.astype(jnp.float32)[:, None]
        inj_vals = jnp.dot(onehot, extra_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        return inj_vals, is_inj[:, None]

    # ---------------- Kernel A: sample + rollout -> rewards ----------------

    def kernel_a(*refs):
        if ts1:
            seed_ref, member_ref, *refs = refs
            member = member_ref[pl.program_id(0)]
        else:
            seed_ref, *refs = refs
            member = None
        s0_ref, mean_ref, std_ref, *refs = refs
        basis_ref = refs.pop(0) if colored else None
        extra_ref = refs.pop(0) if extra_slots else None
        clip_ref = refs.pop(0) if clip_bounds is not None else None
        gvec_ref = refs.pop(0) if aux_dot else None
        stats_ref, *wb_refs = refs
        out_ref = wb_refs[-1]
        weight_refs = wb_refs[:-1]
        tile_id = pl.program_id(0)
        counter = _tile_counter(tile_id * tile, tile, n_cols)
        z = _gen_z(counter, seed_ref[0], basis_ref[:] if colored else None, sampling)
        mean_rows, std_rows, onehot = _row_stats(mean_ref, std_ref, tile_id)
        centered0 = std_rows * z
        actions0 = mean_rows + centered0  # [T, H*U]
        penalty = None
        if clip_bounds is not None:
            raw = actions0
            actions0 = jnp.clip(actions0, clip_ref[0], clip_ref[1])
            penalty = jnp.sum(jnp.square(raw - actions0), axis=1)  # [T]
            centered0 = actions0 - mean_rows  # post-clip perturbation (XLA pi2.py:96)
        if extra_slots:
            inj_vals, inj_mask = _inject_lookup(tile_id, extra_ref)
            actions0 = jnp.where(inj_mask, inj_vals, actions0)
            if aux_dot:
                centered0 = jnp.where(inj_mask, inj_vals - mean_rows, centered0)
        if aux_dot:
            # MPPI control cost term: <g_row, perturbation> per row, g = mean/variance.
            g_rows = jnp.dot(onehot, gvec_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
            dot = jnp.sum(g_rows * centered0, axis=1)

        step_fn = kc.build_step_fn(
            config, reward_fn, stats_ref[:], weight_refs, member=member
        )

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
        if penalty is not None:
            total = total - penalty  # rewards = evaluate(clipped) - penalty (pi2.py:92)
        out_ref[:, 0] = total
        if aux_dot:
            out_ref[:, 1] = dot

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
        mean_rows = jnp.dot(onehot, mean_ref[0], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        std_rows = jnp.dot(onehot, std_ref[0], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
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

    def kernel_b(seed_ref, mean_ref, std_ref, *refs):
        basis_ref = refs[0] if colored else None
        refs = refs[1:] if colored else refs
        extra_ref = refs[0] if extra_slots else None
        refs = refs[1:] if extra_slots else refs
        clip_ref = refs[0] if clip_bounds is not None else None
        refs = refs[1:] if clip_bounds is not None else refs
        mask_ref, sum_ref, sumsq_ref = refs
        tile_id = pl.program_id(0)
        counter = _tile_counter(tile_id * tile, tile, n_cols)
        z = _gen_z(counter, seed_ref[0], basis_ref[:] if colored else None, sampling)
        mean_rows, std_rows, onehot = _row_stats(mean_ref, std_ref, tile_id)
        # Reduce CENTERED moments (sample - sampling mean = std*z): E[x^2]-mean^2 on raw
        # samples cancels catastrophically in fp32 for large-magnitude action bounds, while
        # centered values are O(2 sigma). The caller reconstructs mean/var from these.
        centered = std_rows * z  # [T, H*U]
        if clip_bounds is not None:
            # post-clip perturbation: the weighted mean then reduces over CLIPPED samples
            # (a convex combination that stays in bounds, matching the XLA PI2 update).
            centered = jnp.clip(mean_rows + centered, clip_ref[0], clip_ref[1]) - mean_rows
        if extra_slots:
            inj_vals, inj_mask = _inject_lookup(tile_id, extra_ref)
            centered = jnp.where(inj_mask, inj_vals - mean_rows, centered)
        # mask_ref is [T, 1]: row r's elite membership (for its own agent); the one-hot
        # restricts the reduction to the owning agent's column.
        mask = mask_ref[:] * onehot  # [T, A]
        part_sum = jnp.dot(mask.T, centered, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        part_sq = jnp.dot(mask.T, centered * centered, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

        @pl.when(tile_id == 0)
        def _():
            sum_ref[:] = jnp.zeros_like(sum_ref)
            sumsq_ref[:] = jnp.zeros_like(sumsq_ref)

        sum_ref[:] += part_sum
        sumsq_ref[:] += part_sq

    basis2 = jnp.asarray(basis2_np) if colored else None

    def _feature_operands(extra):
        """The optional [basis], [extra], [clip] operands + their specs, in order."""
        ops, specs = [], []
        if colored:
            ops.append(basis2)
            specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if extra_slots:
            if extra is None:
                raise ValueError("extra_slots > 0: pass extra [extra_slots*agents, H*U]")
            ops.append(extra.reshape(extra_slots * agents, n_flat).astype(jnp.float32))
            specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if clip_bounds is not None:
            ops.append(clip_arr)
            specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        return ops, specs

    out_cols = 2 if aux_dot else 1

    def rollout_rewards(dp: DynamicsParams, s0, mean, std, seed, extra=None, gvec=None):
        # s0 [A,S] tiled to rows; mean/std [A,H,U] -> [A, H*U]
        s0_rows = jnp.tile(s0.astype(jnp.float32), (population, 1))
        if padded_rows != rows:
            s0_rows = jnp.pad(s0_rows, ((0, padded_rows - rows), (0, 0)))
        mean_f = mean.reshape(agents, n_flat).astype(jnp.float32)
        std_f = std.reshape(agents, n_flat).astype(jnp.float32)
        nstats = kc.stats_matrix(dp, dim_s, dim_u)
        weight_args = kc.weight_operands(dp, ensemble, compute_dtype)
        feat_ops, feat_specs = _feature_operands(extra)
        if aux_dot:
            if gvec is None:
                raise ValueError("aux_dot=True: pass gvec [A, H*U]")
            feat_ops.append(gvec.reshape(agents, n_flat).astype(jnp.float32))
            feat_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        prefetch = [jnp.asarray([seed], jnp.int32)]
        if ts1:
            prefetch.append(jnp.asarray(tile_members))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, dim_s), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # mean
                pl.BlockSpec(memory_space=pltpu.VMEM),  # std
            ]
            + feat_specs
            + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # norm stats
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_args],
            out_specs=pl.BlockSpec((tile, out_cols), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        total = pl.pallas_call(
            kernel_a,
            out_shape=jax.ShapeDtypeStruct((padded_rows, out_cols), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret_mode,
        )(*prefetch, s0_rows, mean_f, std_f, *feat_ops, nstats, *weight_args)
        rewards = total[:rows, 0].reshape(population, agents)
        if aux_dot:
            return rewards, total[:rows, 1].reshape(population, agents)
        return rewards

    if ts1:
        # Verification hooks: tile t covers rows [t*tile, (t+1)*tile) and runs member
        # tile_member_ids[t] (tests cross-check against per-member XLA dynamics).
        rollout_rewards.tile_member_ids = tile_members
        rollout_rewards.tile_rows = tile

    def elite_moments(mean, std, seed, mask, extra=None):
        """mask: [P, A] elite membership. Row r = p*A + a owns exactly mask[p, a] =
        mask.reshape(rows)[r], so the kernel needs only the flat per-row column."""
        mean_f = mean.reshape(agents, n_flat).astype(jnp.float32)
        std_f = std.reshape(agents, n_flat).astype(jnp.float32)
        mask_rows = mask.astype(jnp.float32).reshape(rows, 1)
        if padded_rows != rows:
            mask_rows = jnp.pad(mask_rows, ((0, padded_rows - rows), (0, 0)))
        seed_arr = jnp.asarray([seed], jnp.int32)
        feat_ops, feat_specs = _feature_operands(extra)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # mean
                pl.BlockSpec(memory_space=pltpu.VMEM),  # std
            ]
            + feat_specs
            + [pl.BlockSpec((tile, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)],
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
        )(seed_arr, mean_f, std_f, *feat_ops, mask_rows)
        return sums, sumsq

    rollout = rollout_rewards_streamed if streamed else rollout_rewards
    rollout.basis2 = basis2  # the exact matrix the kernels color with (None if white)
    return rollout, elite_moments


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
    keep = getattr(config, "keep_elites", 0)
    mean_as_candidate = getattr(config, "mean_as_candidate", False)
    execute_best = getattr(config, "execute_best", False)
    beta = getattr(config, "colored_noise_beta", 0.0)
    if k > pop:
        raise ValueError(f"num_elite ({k}) must be <= population ({pop})")
    reserved = 1 + (1 if mean_as_candidate else 0)
    if not 0 <= keep <= min(k, pop - reserved):
        raise ValueError(
            f"keep_elites ({keep}) must be in [0, min(num_elite, population - {reserved})]"
        )
    if not 0.0 < getattr(config, "population_decay", 1.0) <= 1.0:
        raise ValueError(
            f"population_decay ({config.population_decay}) must be in (0, 1]"
        )
    alpha = config.alpha
    n_flat = horizon * bounds.dim
    extra_slots = keep + (1 if mean_as_candidate else 0)
    fresh_pop = pop - extra_slots

    def build_kernels(pop_i: int):
        return make_fused_cem_kernels(
            dyn_config, reward_fn,
            horizon=horizon, agents=agents, population=pop_i, tile=tile,
            streamed=streamed, interpret=interpret, colored_noise_beta=beta,
            extra_slots=extra_slots,
        )

    rollout_rewards, elite_moments = build_kernels(pop)
    # iCEM population decay (Pinneri §4.2): per-iteration populations are STATIC at trace
    # time (same rule as the XLA solver, solvers/cem.py iteration_populations) — so the
    # fused path simply instantiates one kernel pair per DISTINCT per-iteration population
    # and unrolls the iteration loop. Kernel A/B shapes are compile-time grids anyway;
    # decay just means several grids instead of one.
    decay_pops = iteration_populations(config)
    kernels_by_pop = (
        {p_i: (rollout_rewards, elite_moments) if p_i == pop else build_kernels(p_i)
         for p_i in set(decay_pops)}
        if decay_pops is not None else None
    )
    # The kernels expose the spectral basis they generate with; the jnp mirror MUST use
    # the identical matrix or extracted values desynchronize from the in-kernel stream.
    basis2 = getattr(rollout_rewards, "basis2", None)
    n_extract = max(keep, 1 if execute_best else 0)

    def init(key: jax.Array) -> CEMState:
        del key
        return CEMState(
            mean=base.init_solution_mean(bounds, horizon, agents),
            variance=base.init_solution_variance(bounds, horizon, agents),
        )

    def extract_values(seed, mean_f, std_f, elite_idx_cols, extra_flat, fresh_i=fresh_pop):
        """Elite VALUES [A, n, H*U] for population indices elite_idx_cols [A, n] — the jnp
        mirror regenerates just those rows; injected slots (p >= ``fresh_i``, this
        iteration's fresh-sample count) read the extra buffer back."""
        p = elite_idx_cols  # [A, n]
        row_ids = (p * agents + jnp.arange(agents)[:, None]).reshape(-1)  # row = p*A + a
        z = _mirror_z(seed, row_ids, n_flat, basis2).reshape(agents, -1, n_flat)
        vals = mean_f[:, None, :] + std_f[:, None, :] * z
        if extra_slots:
            slot = jnp.clip(p - fresh_i, 0, extra_slots - 1)  # [A, n]
            inj = jnp.take_along_axis(
                extra_flat.reshape(extra_slots, agents, n_flat).transpose(1, 0, 2),
                slot[:, :, None], axis=1,
            )
            vals = jnp.where((p >= fresh_i)[:, :, None], inj, vals)
        return vals

    def solve(state: CEMState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t

        def make_iteration(rollout_rewards_i, elite_moments_i, pop_i):
            fresh_i = pop_i - extra_slots

            def iteration(_, carry):
                mean, var, key, _, best_val, best_plan, carried = carry
                key, seed_key = jax.random.split(key)
                seed = jax.random.randint(seed_key, (), 0, jnp.iinfo(jnp.int32).max)
                constrained = base.constrain_variance(mean, var, bounds)
                std = jnp.sqrt(constrained)
                mean_f = mean.reshape(agents, n_flat)
                std_f = std.reshape(agents, n_flat)
                extra = None
                if extra_slots:
                    # Injected slots, [extra_slots, A, n_flat]: mean-as-candidate first,
                    # then the carried elites (order is arbitrary but fixed).
                    parts = []
                    if mean_as_candidate:
                        parts.append(bounds.clip(mean).reshape(agents, n_flat)[None])
                    if keep:
                        parts.append(jnp.swapaxes(carried, 0, 1))
                    extra = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
                rewards = rollout_rewards_i(dp, obs, mean, std, seed, *(
                    (extra,) if extra_slots else ()))  # [P_i, A]
                rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
                elite_vals, elite_idx = jax.lax.top_k(rewards.T, k)  # [A, k]
                mask = jnp.zeros((pop_i, agents), jnp.float32).at[
                    elite_idx.T, jnp.arange(agents)[None, :]
                ].set(1.0)
                csum, csumsq = elite_moments_i(mean, std, seed, mask, *(
                    (extra,) if extra_slots else ()))  # centered moments
                delta = (csum / k).reshape(agents, horizon, bounds.dim)
                new_mean = mean + delta  # sampling mean + mean of centered elite offsets
                new_var = (csumsq / k).reshape(agents, horizon, bounds.dim) - jnp.square(delta)
                new_var = jnp.maximum(new_var, 0.0)
                if n_extract:
                    vals = extract_values(
                        seed, mean_f, std_f, elite_idx[:, :n_extract],
                        extra.reshape(extra_slots * agents, n_flat) if extra_slots else None,
                        fresh_i,
                    )  # [A, n_extract, n_flat] ranked best-first
                    if keep:
                        carried = vals[:, :keep]
                    if execute_best:
                        top_val = elite_vals[:, 0]
                        improve = top_val > best_val
                        best_val = jnp.where(improve, top_val, best_val)
                        best_plan = jnp.where(improve[:, None], vals[:, 0], best_plan)
                mean = alpha * mean + (1.0 - alpha) * new_mean
                var = alpha * var + (1.0 - alpha) * new_var
                return (mean, var, key, jnp.mean(elite_vals, axis=1), best_val,
                        best_plan, carried)

            return iteration

        iteration = make_iteration(rollout_rewards, elite_moments, pop)
        best0 = jnp.full((agents,), -jnp.inf, dtype=state.mean.dtype)
        if keep:
            # Initial carried elites: init-sampled placeholders around the incoming plan
            # distribution (mirrors solvers.cem.init_carried), via the counter RNG.
            key, seed_key = jax.random.split(key)
            seed0 = jax.random.randint(seed_key, (), 0, jnp.iinfo(jnp.int32).max)
            z0 = _mirror_z(seed0, jnp.arange(keep * agents), n_flat, basis2)
            carried0 = (
                state.mean.reshape(agents, n_flat)[:, None]
                + jnp.sqrt(state.variance).reshape(agents, n_flat)[:, None]
                * z0.reshape(keep, agents, n_flat).transpose(1, 0, 2)
            )
        else:
            carried0 = jnp.zeros((agents, 0, n_flat), state.mean.dtype)
        plan0 = state.mean.reshape(agents, n_flat)
        carry = (state.mean, state.variance, key, best0, best0, plan0, carried0)
        if kernels_by_pop is None:
            carry = jax.lax.fori_loop(0, config.max_iterations, iteration, carry)
        else:
            # Population decay: distinct static kernel grids per iteration — unrolled at
            # trace time, exactly like the XLA solver's decayed path (solvers/cem.py).
            for pop_i in decay_pops:
                rr_i, em_i = kernels_by_pop[pop_i]
                carry = make_iteration(rr_i, em_i, pop_i)(0, carry)
        mean, var, _, elite_reward, best_val, best_plan, _ = carry
        if execute_best:
            best_plan = best_plan.reshape(agents, horizon, bounds.dim)
            action = best_plan[:, 0]
            aux = SolverAux(expected_reward=best_val, plan=best_plan)
        else:
            action = mean[:, 0]
            aux = SolverAux(expected_reward=elite_reward, plan=mean)
        if config.warm_start:
            next_state = CEMState(mean=base.shift_time(mean), variance=state.variance)
        else:
            next_state = state
        return action, next_state, aux

    def reset(state: CEMState, key: jax.Array) -> CEMState:
        del state
        return init(key)

    return Solver(init=init, solve=solve, reset=reset, name="CEM-Fused", plan_field="mean")


def make_fused_pi2(
    config: PI2Config,
    bounds: Bounds,
    dyn_config: LearnedDynamicsConfig,
    dp: DynamicsParams,
    reward_fn: Callable,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> Solver:
    """PI2/MPPI over the fused kernels — beyond-HBM softmax-weighted planning.

    The PI2 update (``solvers/pi2.py:100-108``) is a weighted first/second moment of the
    population, and kernel B's masked-matmul reduction is weight-agnostic: passing the
    per-row softmax weights ``omega`` in place of the CEM's 0/1 elite mask yields
    ``sum omega * (std z)`` (the weighted mean offset) and ``sum omega * (std z)^2``
    (PI2-CMA's weighted variance) without ever materializing the candidates. MPPI's
    control cost is kernel A's ``aux_dot`` output (``<mean/variance, std z>`` per row).

    Bounds handling matches the XLA solver: candidates are clipped to bounds in-kernel
    with the squared-violation penalty subtracted from each row's reward
    (``solvers/base.py`` ``bound_violation_penalty``), so the weighted mean — a convex
    combination of clipped samples — always stays inside the action space. Remaining
    deviation: the underlying z is clipped at +/-2 sigma (fused-family convention) rather
    than resampled-truncated.
    """
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    lamda = config.lamda
    beta_cn = getattr(config, "colored_noise_beta", 0.0)
    rollout_rewards, weighted_moments = make_fused_cem_kernels(
        dyn_config, reward_fn,
        horizon=horizon, agents=agents, population=pop, tile=tile, interpret=interpret,
        colored_noise_beta=beta_cn, aux_dot=config.control_cost,
        clip_bounds=(bounds.lower, bounds.upper),
    )

    def init(key: jax.Array) -> PI2State:
        del key
        return PI2State(mean=base.init_solution_mean(bounds, horizon, agents))

    def solve(state: PI2State, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t
        variance0 = base.init_solution_variance(bounds, horizon, agents)

        def iteration(_, carry):
            mean, variance, key, _ = carry
            key, seed_key = jax.random.split(key)
            seed = jax.random.randint(seed_key, (), 0, jnp.iinfo(jnp.int32).max)
            std = jnp.sqrt(variance)
            if config.control_cost:
                rewards, dots = rollout_rewards(
                    dp, obs, mean, std, seed, gvec=mean / variance
                )
            else:
                rewards = rollout_rewards(dp, obs, mean, std, seed)
            rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
            costs = -rewards
            if config.control_cost:
                costs = costs + lamda * dots
            cbeta = jnp.min(costs, axis=0, keepdims=True)  # [1, A]
            prob = jnp.exp(-(costs - cbeta) / lamda)
            omega = prob / jnp.sum(prob, axis=0, keepdims=True)  # [P, A]
            wsum, wsumsq = weighted_moments(mean, std, seed, omega)
            delta = wsum.reshape(agents, horizon, bounds.dim)
            new_mean = mean + delta
            if config.adapt_variance:
                new_var = wsumsq.reshape(agents, horizon, bounds.dim) - jnp.square(delta)
                variance = jnp.maximum(
                    new_var, config.variance_floor_frac * variance0
                )
            return new_mean, variance, key, jnp.max(rewards, axis=0)

        best0 = jnp.full((agents,), -jnp.inf, dtype=state.mean.dtype)
        mean, _, _, best_reward = jax.lax.fori_loop(
            0, config.max_iterations, iteration, (state.mean, variance0, key, best0)
        )
        action = mean[:, 0]
        next_state = PI2State(mean=base.shift_time(mean))
        return action, next_state, SolverAux(expected_reward=best_reward, plan=mean)

    def reset(state: PI2State, key: jax.Array) -> PI2State:
        del state
        return init(key)

    name = "MPPI-Fused" if config.control_cost else "PI2-Fused"
    return Solver(init=init, solve=solve, reset=reset, name=name, plan_field="mean")


def make_fused_random_search(
    config: RandomSearchConfig,
    bounds: Bounds,
    dyn_config: LearnedDynamicsConfig,
    dp: DynamicsParams,
    reward_fn: Callable,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> Solver:
    """RandomSearch over the fused kernels — beyond-HBM single-shot argmax planning.

    Kernel A generates uniform-in-bounds candidates in-kernel (``sampling="uniform"``:
    midpoint + half-range * U(-1,1), exactly ``solvers/random_search.py``'s distribution)
    and emits only the [P, A] rewards; the per-agent argmax row is regenerated by the jnp
    RNG mirror — the [P, A, H, U] tensor never exists.
    """
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    n_flat = horizon * bounds.dim
    mid = base.init_solution_mean(bounds, horizon, agents)  # midpoint-tiled [A, H, U]
    half = jnp.broadcast_to(
        (bounds.upper - bounds.lower).astype(jnp.float32) / 2.0, mid.shape
    )
    rollout_rewards, _ = make_fused_cem_kernels(
        dyn_config, reward_fn,
        horizon=horizon, agents=agents, population=pop, tile=tile, interpret=interpret,
        sampling="uniform",
    )

    def init(key: jax.Array) -> RandomSearchState:
        del key
        return RandomSearchState()

    def solve(state: RandomSearchState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        rewards = rollout_rewards(dp, obs, mid, half, seed)  # [P, A]
        rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
        best_idx = jnp.argmax(rewards, axis=0)  # [A]
        row_ids = best_idx * agents + jnp.arange(agents)  # row = p*A + a
        z = _mirror_z(seed, row_ids, n_flat, sampling="uniform")  # [A, n_flat]
        best_plan = (
            mid.reshape(agents, n_flat) + half.reshape(agents, n_flat) * z
        ).reshape(agents, horizon, bounds.dim)
        best_reward = jnp.take_along_axis(rewards, best_idx[None, :], axis=0)[0]
        return best_plan[:, 0], state, SolverAux(expected_reward=best_reward, plan=best_plan)

    def reset(state: RandomSearchState, key: jax.Array) -> RandomSearchState:
        del key
        return state

    return Solver(init=init, solve=solve, reset=reset, name="RandomSearch-Fused")


def make_fused_sep_cma(
    config: CMAESConfig,
    bounds: Bounds,
    dyn_config: LearnedDynamicsConfig,
    dp: DynamicsParams,
    reward_fn: Callable,
    *,
    tile: int = 256,
    interpret: bool = False,
    _kernels=None,
    _name: str = "sep-CMA-Fused",
) -> Solver:
    """sep-CMA-ES over the fused kernels — beyond-HBM covariance-adaptive planning.

    The diagonal-covariance CMA update (``solvers/cma_es.py`` diagonal branch) needs only
    two weighted moments of the population: ``sum w (x - mean)`` (the recombination step,
    whitened into the sigma/covariance paths) and ``sum w (x - mean)^2`` (the diagonal
    rank-mu update) — exactly kernel B's weight-agnostic reduction with the log-rank
    recombination weights scattered by reward order. Sampling runs in kernel A with the
    per-coordinate effective std ``sigma * sqrt(diag C)`` and the in-kernel bounds clip +
    violation penalty (``bound_violation_penalty`` semantics, matching the XLA solver);
    strategy constants come from :func:`~blackbox_mpc_tpu.solvers.cma_es.cma_constants`,
    shared with the XLA solver so the two cannot drift. Full-covariance mode cannot fuse
    (the rank-mu update needs the [n, n] outer-product reduction): requires
    ``config.diagonal=True``.

    Fused-family conventions: z clipped at +/-2 sigma (not resampled-truncated); no lazy
    eigen machinery (the diagonal model has no factorization at all).

    Clipped-sampling bias accounting: the Hansen constants (``mu_eff``, ``c_mu``,
    ``expectation_of_normal``) assume unclipped N(0,1) draws, while the fused kernels clip
    z at +/-2, deflating second moments by E[clip(z)^2] = 0.9205. The rank-mu term is
    rescaled by 1/0.9205 in the iteration below (first-order correction). A residual bias
    remains on the step-size path: each coordinate of the recombination mean has its
    variance deflated by the same 0.9205, so ``|p_sigma|`` runs ~sqrt(0.9205) = 0.959 of
    the unclipped expectation and the CSA rule applies ~4.1% x (c_sigma/d_sigma) per-gen
    downward pressure on sigma (bounded below by ``sigma_floor``); left uncorrected
    because selection dominates the path statistics after the first few generations.
    """
    if not config.diagonal:
        raise ValueError(
            "the fused CMA-ES is sep-CMA only (diagonal=True): the full-covariance rank-mu "
            "update needs the [n, n] outer-product reduction, which does not fit the "
            "moment-regeneration scheme — use the XLA solver for full CMA-ES"
        )
    horizon, agents, pop, k = (
        config.planning_horizon, config.num_agents, config.population, config.num_elite,
    )
    C = cma_constants(config, bounds, horizon, pop, k)
    n = C.n
    if _kernels is not None:
        # Injected reward/moment callables with the same signatures as kernel A/B over
        # the GLOBAL population — how ops/fused_sharded.py reuses this update math with
        # shard_mapped per-device kernels + psum'd moments (make_sharded_fused_sep_cma).
        rollout_rewards, weighted_moments = _kernels
    else:
        rollout_rewards, weighted_moments = make_fused_cem_kernels(
            dyn_config, reward_fn,
            horizon=horizon, agents=agents, population=pop, tile=tile, interpret=interpret,
            clip_bounds=(bounds.lower, bounds.upper),
        )

    def init(key: jax.Array) -> CMAESState:
        del key
        dt = jnp.float32
        mean = base.init_solution_mean(bounds, horizon, agents, dt).reshape(agents, n)
        var = base.init_solution_variance(bounds, horizon, agents, dt).reshape(agents, n)
        eye = jnp.ones((agents, n), dt)
        return CMAESState(
            mean=mean, sigma=jnp.sqrt(var), cov=eye,
            p_sigma=jnp.zeros((agents, n), dt), p_cov=jnp.zeros((agents, n), dt),
            chol=eye, inv_sqrt=eye,
        )

    def solve(state: CMAESState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t
        if not config.persist_across_solves:
            fresh = init(jax.random.PRNGKey(0))
            state = fresh.replace(mean=state.mean)

        def iteration(i, carry):
            s, key, _ = carry
            key, seed_key = jax.random.split(key)
            seed = jax.random.randint(seed_key, (), 0, jnp.iinfo(jnp.int32).max)
            std_eff = s.sigma * s.chol  # per-coordinate sigma * sqrt(diag C), [A, n]
            rewards = rollout_rewards(dp, obs, s.mean, std_eff, seed)  # incl. -penalty
            rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
            # Log-rank recombination weights scattered to each row by reward order.
            order = jnp.argsort(-rewards.T, axis=1)  # [A, P], best first
            omega = jnp.zeros((pop, agents), jnp.float32).at[
                order.T, jnp.arange(agents)[None, :]
            ].set(jnp.asarray(C.weights)[:, None])
            csum, csumsq = weighted_moments(s.mean, std_eff, seed, omega)  # [A, n]
            x_mean = csum  # sum w (x_sorted - mean), post-clip (cma_es.py x_diff)
            new_mean = s.mean + x_mean
            y_mean = x_mean / s.sigma
            whitened = s.inv_sqrt * y_mean
            p_sigma = (1.0 - C.c_sigma) * s.p_sigma + jnp.sqrt(
                C.c_sigma * (2.0 - C.c_sigma) * C.mu_eff
            ) * whitened
            sigma = s.sigma * jnp.exp(
                (C.c_sigma / C.d_sigma)
                * (jnp.linalg.norm(p_sigma, axis=-1) / C.expectation_of_normal - 1.0)
            )[:, None]
            sigma = jnp.clip(
                sigma, config.sigma_floor * C.sigma0, config.sigma_ceil * C.sigma0
            )
            if config.adaptive_h_sigma:
                warmup = 1.0 - (1.0 - C.c_sigma) ** (
                    2.0 * (s.gen.astype(jnp.float32) + 1.0)
                )
                h = (
                    jnp.linalg.norm(p_sigma, axis=-1) / jnp.sqrt(warmup)
                    < (1.4 + 2.0 / (C.nf + 1.0)) * C.expectation_of_normal
                ).astype(s.mean.dtype)[:, None]
                delta = (1.0 - h) * C.cc * (2.0 - C.cc)
            else:
                h = config.h_sigma
                delta = None
            p_cov = (1.0 - C.cc) * s.p_cov + h * jnp.sqrt(
                C.cc * (2.0 - C.cc) * C.mu_eff
            ) * y_mean
            # sum w ((x-mean)/sigma)^2, rescaled by 1/E[clip(z)^2]: the clipped sampling
            # deflates second moments by 0.9205 vs the unclipped N(0,1) that c_mu/c_1
            # assume, which would bias the diagonal covariance (and hence sigma*chol)
            # systematically downward across generations. The rescale is the first-order
            # correction (elite selection reweights the distribution, so the residual is
            # second-order); see the docstring for the remaining p_sigma-path bias.
            rank_mu_d = csumsq / jnp.square(s.sigma) / _CLIPPED_Z_SECOND_MOMENT
            rank_one_d = jnp.square(p_cov)
            if delta is not None:
                rank_one_d = rank_one_d + delta * s.cov
            cov = (1.0 - C.c1 - C.c_mu) * s.cov + C.c1 * rank_one_d + C.c_mu * rank_mu_d
            cov = jnp.maximum(cov, 1e-20)
            chol = jnp.sqrt(cov)
            new_s = CMAESState(
                mean=new_mean, sigma=sigma, cov=cov, p_sigma=p_sigma, p_cov=p_cov,
                chol=chol, inv_sqrt=1.0 / chol, gen=s.gen + 1,
            )
            return new_s, key, jnp.max(rewards, axis=0)

        best0 = jnp.full((agents,), -jnp.inf, dtype=state.mean.dtype)
        state, _, best_reward = jax.lax.fori_loop(
            0, config.max_iterations, iteration, (state, key, best0)
        )
        plan = state.mean.reshape(agents, horizon, bounds.dim)
        action = plan[:, 0]
        if not config.persist_across_solves:
            state = state.replace(mean=base.shift_time(plan).reshape(agents, n))
        return action, state, SolverAux(expected_reward=best_reward, plan=plan)

    def reset(state: CMAESState, key: jax.Array) -> CMAESState:
        del state
        return init(key)

    # Same storage-dtype contract as the XLA make_cma_es (cma_es.py): a non-default
    # config.dtype stores the persistent state in that dtype between solves.
    return base.with_state_dtype(
        Solver(init=init, solve=solve, reset=reset, name=_name,
               plan_field="mean"),
        config.dtype,
    )
