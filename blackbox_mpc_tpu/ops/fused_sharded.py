"""Pod-scale fused solvers: generate-in-kernel CEM (incl. iCEM population decay), PI2/MPPI,
RandomSearch, and sep-CMA sharded over a mesh.

The single-chip fused solvers (:mod:`~blackbox_mpc_tpu.ops.pallas_cem`) remove the candidate
tensor from HBM; this module removes the single-chip ceiling. The population is sharded over
the ``"pop"`` mesh axis (``parallel/mesh.py``) and each device runs the SAME Mosaic kernels
on its local shard with a device-offset RNG seed — so a D-chip slice plans over D× the
beyond-HBM population (e.g. 32M candidates on an 8-chip v5e slice, none of them ever
materialized). The structure is a hybrid of ``jax.shard_map`` (the pallas calls, which need
per-device seed/row logic) and global XLA ops (top-k / softmax / argmax over the sharded
reward vector, where the SPMD partitioner inserts the gather/psum collectives):

* kernel A runs per device → a row-sharded ``[P, A]`` reward vector (the ONLY cross-device
  tensor; tiny — 4 bytes/candidate);
* elite selection / softmax weighting happens on that global vector;
* kernel B reduces moments per device from each device's own regenerated stream, followed
  by a ``psum`` — the update state (mean/variance) stays replicated.

Per-device streams use ``seed + device * _SEED_STRIDE`` as distinct KEYS of the keyed
counter RNG (``ops.pallas_cem._uniform`` mixes the seed before xor-combining with the
counter, so distinct seeds' streams share no contiguous runs at any scale — each device's
counter budget is the full 2^32 elements); any candidate can still be regenerated anywhere
from its owner's seed (RandomSearch argmax extraction). Reference baseline being scaled:
the reference's optimizers are strictly single-device (SURVEY §2.2 — no distributed layer
exists there at all).

Verification boundary: the D>1 capacity claim above is a composition of two verified
pieces, not a single measured run. Evidence on record: (a) a D=1-mesh sharded solve on the
real chip is bit-identical to the single-chip fused CEM (docs/performance.md, r3 commit
16c762d), and (b) the 8-device dryrun executes the full shard_map + collectives path in
Mosaic INTERPRET mode on a virtual CPU mesh (``__graft_entry__.dryrun_multichip``,
``tests/test_fused_sharded.py``). Multi-device fused-on-TPU has never been executed — this
environment has exactly one physical chip — so treat the 32M-candidate figure as designed
capacity, hardware-verified per device and interpreter-verified across devices.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux
from blackbox_mpc_tpu.models.dynamics import DynamicsParams, LearnedDynamicsConfig
from blackbox_mpc_tpu.ops.pallas_cem import _mirror_z, make_fused_cem_kernels
from blackbox_mpc_tpu.parallel.mesh import POP_AXIS
from blackbox_mpc_tpu.solvers import base
from blackbox_mpc_tpu.solvers.cem import CEMConfig, CEMState, iteration_populations
from blackbox_mpc_tpu.solvers.pi2 import PI2Config, PI2State
from blackbox_mpc_tpu.solvers.random_search import RandomSearchConfig, RandomSearchState

__all__ = [
    "make_sharded_fused_cem",
    "make_sharded_fused_pi2",
    "make_sharded_fused_random_search",
    "make_sharded_fused_sep_cma",
]

# Per-device seed offset. Stream independence does NOT come from this stride — it comes
# from the keyed mix in ops.pallas_cem._uniform (key = mix(seed), xor-combined with the
# counter): any two distinct per-device seeds give streams with no contiguous overlap, at
# any scale. The stride only needs to make the D seeds distinct (int32 wraparound is fine).
_SEED_STRIDE = 0x7F4A7C15


def _device_seed(seed):
    """THE per-device key derivation — every kernel call and every mirror regeneration
    must use this one function or streams desynchronize across rollout/moments/extraction."""
    return seed + jax.lax.axis_index(POP_AXIS) * _SEED_STRIDE


def _mesh_size(mesh) -> int:
    return int(mesh.shape[POP_AXIS])


def _local_population(population: int, mesh) -> int:
    d = _mesh_size(mesh)
    if population % d:
        raise ValueError(
            f"population ({population}) must divide the mesh's {POP_AXIS} axis ({d})"
        )
    return population // d


def _reject_injection(config, what: str):
    if getattr(config, "keep_elites", 0) or getattr(config, "mean_as_candidate", False) \
            or getattr(config, "execute_best", False):
        raise ValueError(
            f"{what} does not support keep_elites/mean_as_candidate/execute_best yet — "
            "use the single-chip fused solver or the XLA path"
        )
    if not 0.0 < getattr(config, "population_decay", 1.0) <= 1.0:
        raise ValueError(
            f"population_decay ({config.population_decay}) must be in (0, 1]"
        )


def make_sharded_fused_cem(
    config: CEMConfig,
    bounds: Bounds,
    dyn_config: LearnedDynamicsConfig,
    dp: DynamicsParams,
    reward_fn: Callable,
    mesh,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> Solver:
    """CEM over per-device fused kernels, population sharded over ``mesh``'s pop axis.

    Same update rules as :func:`~blackbox_mpc_tpu.ops.pallas_cem.make_fused_cem` (colored
    noise, ts1, and — since r5 — iCEM ``population_decay`` supported; injected-candidate
    features not yet). Per iteration the only cross-device communication is the [P, A]
    reward vector's top-k and one psum of the [A, H*U] centered moments.

    ``population_decay`` follows the single-chip fused rule (one static kernel grid per
    distinct per-iteration population, iteration loop unrolled at trace time —
    ``ops/pallas_cem.py``), instantiated here as one *sharded* grid pair per distinct
    population. Each decayed population is rounded UP to the nearest multiple of the mesh
    size so it shards evenly; on a D=1 mesh the schedule is bit-identical to the
    single-chip fused path (rounding is the identity).
    """
    horizon, agents, pop, k = (
        config.planning_horizon, config.num_agents, config.population, config.num_elite,
    )
    if k > pop:
        raise ValueError(f"num_elite ({k}) must be <= population ({pop})")
    _reject_injection(config, "sharded fused CEM")
    alpha = config.alpha
    beta = getattr(config, "colored_noise_beta", 0.0)
    d = _mesh_size(mesh)
    decay_pops = iteration_populations(config)
    if decay_pops is not None:
        decay_pops = [-(-p_i // d) * d for p_i in decay_pops]

    def build_sharded_kernels(pop_i: int):
        p_loc_i = _local_population(pop_i, mesh)
        rollout_rewards, elite_moments = make_fused_cem_kernels(
            dyn_config, reward_fn,
            horizon=horizon, agents=agents, population=p_loc_i, tile=tile,
            interpret=interpret, colored_noise_beta=beta,
        )

        def _dev_rewards(dp, obs, mean, std, seed):
            return rollout_rewards(dp, obs, mean, std, _device_seed(seed))

        def _dev_moments(mean, std, seed, mask_loc):
            csum, csumsq = elite_moments(mean, std, _device_seed(seed), mask_loc)
            return (
                jax.lax.psum(csum, POP_AXIS),
                jax.lax.psum(csumsq, POP_AXIS),
            )

        shard_rewards = jax.shard_map(
            _dev_rewards, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()), out_specs=P(POP_AXIS), check_vma=False,
        )
        shard_moments = jax.shard_map(
            _dev_moments, mesh=mesh,
            in_specs=(P(), P(), P(), P(POP_AXIS)), out_specs=(P(), P()), check_vma=False,
        )
        return shard_rewards, shard_moments

    kernels_by_pop = {pop: build_sharded_kernels(pop)}
    if decay_pops is not None:
        for p_i in set(decay_pops):
            if p_i not in kernels_by_pop:
                kernels_by_pop[p_i] = build_sharded_kernels(p_i)

    def init(key: jax.Array) -> CEMState:
        del key
        return CEMState(
            mean=base.init_solution_mean(bounds, horizon, agents),
            variance=base.init_solution_variance(bounds, horizon, agents),
        )

    def solve(state: CEMState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t

        def make_iteration(shard_rewards, shard_moments, pop_i):
            def iteration(_, carry):
                mean, var, key, _ = carry
                key, seed_key = jax.random.split(key)
                seed = jax.random.randint(seed_key, (), 0, jnp.iinfo(jnp.int32).max)
                constrained = base.constrain_variance(mean, var, bounds)
                std = jnp.sqrt(constrained)
                rewards = shard_rewards(dp, obs, mean, std, seed)  # [P_i, A], row-sharded
                rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
                elite_vals, elite_idx = jax.lax.top_k(rewards.T, k)  # [A, k]
                mask = jnp.zeros((pop_i, agents), jnp.float32).at[
                    elite_idx.T, jnp.arange(agents)[None, :]
                ].set(1.0)
                csum, csumsq = shard_moments(mean, std, seed, mask)
                delta = (csum / k).reshape(agents, horizon, bounds.dim)
                new_mean = mean + delta
                new_var = (
                    (csumsq / k).reshape(agents, horizon, bounds.dim) - jnp.square(delta)
                )
                new_var = jnp.maximum(new_var, 0.0)
                mean = alpha * mean + (1.0 - alpha) * new_mean
                var = alpha * var + (1.0 - alpha) * new_var
                return mean, var, key, jnp.mean(elite_vals, axis=1)

            return iteration

        best0 = jnp.full((agents,), -jnp.inf, dtype=state.mean.dtype)
        carry = (state.mean, state.variance, key, best0)
        if decay_pops is None:
            carry = jax.lax.fori_loop(
                0, config.max_iterations, make_iteration(*kernels_by_pop[pop], pop), carry
            )
        else:
            # Decayed populations: per-iteration static sharded grids, unrolled at trace
            # time — same structure as the single-chip fused decay path (pallas_cem.py).
            for pop_i in decay_pops:
                carry = make_iteration(*kernels_by_pop[pop_i], pop_i)(0, carry)
        mean, var, _, elite_reward = carry
        action = mean[:, 0]
        if config.warm_start:
            next_state = CEMState(mean=base.shift_time(mean), variance=state.variance)
        else:
            next_state = state
        return action, next_state, SolverAux(expected_reward=elite_reward, plan=mean)

    def reset(state: CEMState, key: jax.Array) -> CEMState:
        del state
        return init(key)

    return Solver(init=init, solve=solve, reset=reset, name="CEM-Fused-Sharded",
                  plan_field="mean")


def make_sharded_fused_pi2(
    config: PI2Config,
    bounds: Bounds,
    dyn_config: LearnedDynamicsConfig,
    dp: DynamicsParams,
    reward_fn: Callable,
    mesh,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> Solver:
    """PI2/MPPI over per-device fused kernels (softmax over the sharded reward vector,
    weighted moments psum-reduced; in-kernel bounds clip + violation penalty as in
    :func:`~blackbox_mpc_tpu.ops.pallas_cem.make_fused_pi2`)."""
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    lamda = config.lamda
    beta_cn = getattr(config, "colored_noise_beta", 0.0)
    p_loc = _local_population(pop, mesh)
    rollout_rewards, weighted_moments = make_fused_cem_kernels(
        dyn_config, reward_fn,
        horizon=horizon, agents=agents, population=p_loc, tile=tile, interpret=interpret,
        colored_noise_beta=beta_cn, aux_dot=config.control_cost,
        clip_bounds=(bounds.lower, bounds.upper),
    )

    def _dev_rewards(dp, obs, mean, std, seed, gvec):
        if config.control_cost:
            return rollout_rewards(dp, obs, mean, std, _device_seed(seed), gvec=gvec)
        return rollout_rewards(dp, obs, mean, std, _device_seed(seed)), jnp.zeros(())

    def _dev_moments(mean, std, seed, omega_loc):
        wsum, wsumsq = weighted_moments(mean, std, _device_seed(seed), omega_loc)
        return jax.lax.psum(wsum, POP_AXIS), jax.lax.psum(wsumsq, POP_AXIS)

    shard_rewards = jax.shard_map(
        _dev_rewards, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(POP_AXIS), P(POP_AXIS) if config.control_cost else P()),
        check_vma=False,
    )
    shard_moments = jax.shard_map(
        _dev_moments, mesh=mesh,
        in_specs=(P(), P(), P(), P(POP_AXIS)), out_specs=(P(), P()), check_vma=False,
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
            gvec = mean / variance if config.control_cost else jnp.zeros_like(mean)
            rewards, dots = shard_rewards(dp, obs, mean, std, seed, gvec)
            rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
            costs = -rewards
            if config.control_cost:
                costs = costs + lamda * dots
            cbeta = jnp.min(costs, axis=0, keepdims=True)
            prob = jnp.exp(-(costs - cbeta) / lamda)
            omega = prob / jnp.sum(prob, axis=0, keepdims=True)  # [P, A]
            wsum, wsumsq = shard_moments(mean, std, seed, omega)
            delta = wsum.reshape(agents, horizon, bounds.dim)
            new_mean = mean + delta
            if config.adapt_variance:
                new_var = wsumsq.reshape(agents, horizon, bounds.dim) - jnp.square(delta)
                variance = jnp.maximum(new_var, config.variance_floor_frac * variance0)
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

    name = "MPPI-Fused-Sharded" if config.control_cost else "PI2-Fused-Sharded"
    return Solver(init=init, solve=solve, reset=reset, name=name, plan_field="mean")


def make_sharded_fused_random_search(
    config: RandomSearchConfig,
    bounds: Bounds,
    dyn_config: LearnedDynamicsConfig,
    dp: DynamicsParams,
    reward_fn: Callable,
    mesh,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> Solver:
    """Single-shot RandomSearch over per-device fused kernels: a global argmax over the
    sharded reward vector, the winning candidate regenerated from its OWNER device's seed
    by the jnp RNG mirror (any device can regenerate any row)."""
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    n_flat = horizon * bounds.dim
    p_loc = _local_population(pop, mesh)
    mid = base.init_solution_mean(bounds, horizon, agents)
    half = jnp.broadcast_to(
        (bounds.upper - bounds.lower).astype(jnp.float32) / 2.0, mid.shape
    )
    rollout_rewards, _ = make_fused_cem_kernels(
        dyn_config, reward_fn,
        horizon=horizon, agents=agents, population=p_loc, tile=tile, interpret=interpret,
        sampling="uniform",
    )

    def _dev_rewards(dp, obs, mean, std, seed):
        return rollout_rewards(dp, obs, mean, std, _device_seed(seed))

    shard_rewards = jax.shard_map(
        _dev_rewards, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()), out_specs=P(POP_AXIS), check_vma=False,
    )

    def init(key: jax.Array) -> RandomSearchState:
        del key
        return RandomSearchState()

    def solve(state: RandomSearchState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        rewards = shard_rewards(dp, obs, mid, half, seed)  # [P, A]
        rewards = jnp.where(jnp.isnan(rewards), jnp.float32(-1e6), rewards)
        best_idx = jnp.argmax(rewards, axis=0)  # [A] global candidate index
        dev = best_idx // p_loc  # owner device
        local_row = (best_idx % p_loc) * agents + jnp.arange(agents)
        owner_seed = seed + dev * _SEED_STRIDE  # [A]
        z = jax.vmap(
            lambda s, r: _mirror_z(s, r[None], n_flat, sampling="uniform")[0]
        )(owner_seed, local_row)  # [A, n_flat]
        best_plan = (
            mid.reshape(agents, n_flat) + half.reshape(agents, n_flat) * z
        ).reshape(agents, horizon, bounds.dim)
        best_reward = jnp.take_along_axis(rewards, best_idx[None, :], axis=0)[0]
        return best_plan[:, 0], state, SolverAux(expected_reward=best_reward, plan=best_plan)

    def reset(state: RandomSearchState, key: jax.Array) -> RandomSearchState:
        del key
        return state

    return Solver(init=init, solve=solve, reset=reset, name="RandomSearch-Fused-Sharded")


def make_sharded_fused_sep_cma(
    config,
    bounds: Bounds,
    dyn_config: LearnedDynamicsConfig,
    dp: DynamicsParams,
    reward_fn: Callable,
    mesh,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> Solver:
    """sep-CMA-ES over per-device fused kernels, population sharded over ``mesh``.

    The diagonal-CMA update math lives in ONE place —
    :func:`~blackbox_mpc_tpu.ops.pallas_cem.make_fused_sep_cma` — and is reused here by
    injecting shard_mapped kernel callables with the same global-population signatures:
    kernel A becomes a row-sharded ``[P, A]`` reward vector (the argsort/log-rank weight
    scatter runs on the replicated view, exactly like the CEM path's top-k), and kernel B
    becomes a per-device weighted-moment reduction followed by the same psum the CEM/PI2
    paths do. ``config.diagonal=True`` required (checked by the wrapped factory).
    """
    from blackbox_mpc_tpu.ops.pallas_cem import make_fused_sep_cma

    p_loc = _local_population(config.population, mesh)
    rollout_rewards, weighted_moments = make_fused_cem_kernels(
        dyn_config, reward_fn,
        horizon=config.planning_horizon, agents=config.num_agents, population=p_loc,
        tile=tile, interpret=interpret, clip_bounds=(bounds.lower, bounds.upper),
    )

    def _dev_rewards(dp, obs, mean, std, seed):
        return rollout_rewards(dp, obs, mean, std, _device_seed(seed))

    def _dev_moments(mean, std, seed, omega_loc):
        wsum, wsumsq = weighted_moments(mean, std, _device_seed(seed), omega_loc)
        return jax.lax.psum(wsum, POP_AXIS), jax.lax.psum(wsumsq, POP_AXIS)

    shard_rewards = jax.shard_map(
        _dev_rewards, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()), out_specs=P(POP_AXIS), check_vma=False,
    )
    shard_moments = jax.shard_map(
        _dev_moments, mesh=mesh,
        in_specs=(P(), P(), P(), P(POP_AXIS)), out_specs=(P(), P()), check_vma=False,
    )
    return make_fused_sep_cma(
        config, bounds, dyn_config, dp, reward_fn, tile=tile, interpret=interpret,
        _kernels=(shard_rewards, shard_moments), _name="sep-CMA-Fused-Sharded",
    )
