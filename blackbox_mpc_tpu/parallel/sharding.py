"""Population-axis sharding hooks: constraint-annotated evaluators and sharded training.

Strategy (the "annotate shardings, let XLA insert collectives" recipe): solver math stays
untouched; a sharding constraint on the sampled population forces XLA's SPMD partitioner to

* generate each chip's population shard locally (random bits partition),
* run the rollout scan on the local shard (dynamics params replicated, zero communication
  along the horizon),
* insert the small cross-chip collectives only where the algorithms reduce over the population:
  ``top_k`` elite merges (CEM/RandomSearch), softmax normalizations (PI2), means (SPSA), argmax
  (PSO) — all latency-bound reward-vector ops over ICI, never the [P, A, H, U] sample tensor.

This is the TPU-native replacement for the reference's single-device reductions (SURVEY §5.8).
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from blackbox_mpc_tpu.core.types import DynamicsFn, RewardFn, TrajectoryEvaluator
from blackbox_mpc_tpu.parallel.mesh import POP_AXIS
from blackbox_mpc_tpu.rollout.evaluator import make_trajectory_evaluator

__all__ = ["make_sharded_evaluator", "shard_population"]


def shard_population(mesh: Mesh, x: jax.Array, axis: int = 0) -> jax.Array:
    """Constrains dim ``axis`` of ``x`` to be sharded over the pop mesh axis."""
    spec = [None] * x.ndim
    spec[axis] = POP_AXIS
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, PartitionSpec(*spec)))


def make_sharded_evaluator(
    dynamics_fn: DynamicsFn,
    reward_fn: RewardFn,
    mesh: Mesh,
    *,
    discount: float = 1.0,
    nan_guard: bool = True,
    shard_axis: str = "population",
    num_particles: int = 1,
    remat: bool = False,
    action_smoothness_weight: float = 0.0,
    dynamics_returns_penalty: bool = False,
    time_major: bool = False,
) -> TrajectoryEvaluator:
    """A trajectory evaluator sharded over ``mesh``.

    ``time_major``: candidates arrive ``[H, P, A, U]`` (see
    :func:`~blackbox_mpc_tpu.rollout.evaluator.make_trajectory_evaluator`) — the shard
    axis moves one position right on the candidate tensor; rewards stay ``[P, A]``.

    Drop-in for :func:`make_trajectory_evaluator`; the input/output constraints are what let
    XLA partition the *producer* (the solver's sampling) and *consumer* (elite selection /
    weighting) around the rollout, keeping each chip's candidates resident in its own HBM.

    ``shard_axis``: ``"population"`` (default) shards candidates — per-agent reductions
    (top-k, softmax) become small cross-chip collectives. ``"agents"`` shards the agent axis —
    each chip owns whole agents and the solve needs ZERO collectives (best when
    num_agents >= num_devices, e.g. vectorized multi-agent control).
    """
    if shard_axis not in ("population", "agents"):
        raise ValueError(f"shard_axis must be 'population' or 'agents', got {shard_axis!r}")
    axis = 0 if shard_axis == "population" else 1
    cand_axis = axis + 1 if time_major else axis
    base = make_trajectory_evaluator(
        dynamics_fn, reward_fn, discount=discount, nan_guard=nan_guard,
        num_particles=num_particles, remat=remat,
        action_smoothness_weight=action_smoothness_weight,
        dynamics_returns_penalty=dynamics_returns_penalty,
        time_major=time_major,
    )

    def evaluate(
        initial_states: jax.Array,
        action_sequences: jax.Array,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        action_sequences = shard_population(mesh, action_sequences, axis=cand_axis)
        rewards = base(initial_states, action_sequences, key)
        return shard_population(mesh, rewards, axis=axis)

    return evaluate
