"""Trajectory evaluation: the rollout hot loop, as a fused ``lax.scan``.

TPU-native counterpart of ``DeterministicTrajectoryEvaluator``
(``/root/reference/blackbox_mpc/trajectory_evaluators/deterministic.py:26-77``). The reference
runs a ``tf.while_loop`` over the horizon, reshaping ``[pop, agents, H, U]`` into an
``[H, pop*agents, U]`` batch; here the same dataflow is a ``lax.scan`` whose carried state is the
``[pop*agents, S]`` batch, so XLA fuses each step's dynamics matmuls + reward into one kernel and
keeps the population resident on-device. The population axis is the sharding axis for multi-chip
execution (see :mod:`blackbox_mpc_tpu.parallel`).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from blackbox_mpc_tpu.core.types import DynamicsFn, RewardFn, TrajectoryEvaluator

__all__ = [
    "make_trajectory_evaluator", "rollout_trajectories", "action_smoothness_penalty",
    "NAN_REWARD",
]

# NaN rewards are clamped to this, matching the reference's guard
# (/root/reference/blackbox_mpc/trajectory_evaluators/deterministic.py:75-77).
NAN_REWARD = -1e6


def rollout_trajectories(
    dynamics_fn: DynamicsFn,
    reward_fn: RewardFn,
    initial_states: jax.Array,  # [B, S]
    action_sequences: jax.Array,  # [B, H, U]
    *,
    discount: float = 1.0,
    return_states: bool = False,
    key: jax.Array | None = None,
    remat: bool = False,
    dynamics_returns_penalty: bool = False,
    time_major: bool = False,
):
    """Rolls a batch of action sequences through the dynamics, accumulating reward.

    Returns total_reward [B] (and the visited state trajectory [H, B, S] if requested).

    ``time_major``: ``action_sequences`` is already ``[H, B, U]`` — the scan consumes it
    directly with NO relayout. The default ``[B, H, U]`` contract pays a materialized
    transpose before the scan (XLA cannot fuse it into the producer); at the 256-agent x
    1k-candidate bench shape that copy is 13.6 ms/solve (~10 % — the r4 profile,
    docs/performance.md "The 256-agent shape"). Solvers that can generate candidates
    time-major (``CEMConfig(time_major=True)``) avoid it entirely.

    ``key``: for stochastic dynamics (PETS TS-∞ sampling propagation) — split into one
    subkey per horizon step and passed as ``dynamics_fn(state, action, key_t)``. ``None``
    keeps the deterministic two-argument call.

    ``dynamics_returns_penalty``: the dynamics function returns
    ``(next_state, penalty [B])`` and each step accumulates ``discount^t * (r - penalty)``
    — the hook for uncertainty-penalized (pessimistic) planning on learned ensembles
    (``LearnedDynamicsConfig.plan_uncertainty_penalty``, models/dynamics.py).

    ``remat``: checkpoint the scan body (``jax.checkpoint``), so differentiating through
    the rollout (Gradient/CEM-GD planners) stores only the per-step carry instead of every
    MLP activation — backward memory drops from O(H x B x layer widths) to
    O(H x B x S) at the cost of one extra forward during the backward pass. Purely a
    memory/FLOPs trade: gradients are mathematically identical. No effect on
    forward-only (derivative-free) solves.
    """
    if time_major:
        actions_time_major = action_sequences  # already [H, B, U]
    else:
        actions_time_major = jnp.swapaxes(action_sequences, 0, 1)  # [H, B, U]
    horizon = actions_time_major.shape[0]

    def step(carry, xs):
        state, total, disc = carry
        if key is None:
            (actions_t,) = xs
            out_t = dynamics_fn(state, actions_t)
        else:
            actions_t, key_t = xs
            out_t = dynamics_fn(state, actions_t, key_t)
        next_state, penalty = out_t if dynamics_returns_penalty else (out_t, 0.0)
        r = reward_fn(state, actions_t, next_state) - penalty
        out = next_state if return_states else None
        return (next_state, total + disc * r, disc * discount), out

    if remat:
        step = jax.checkpoint(step)
    xs = (actions_time_major,) if key is None else (
        actions_time_major, jax.random.split(key, horizon)
    )
    init = (
        initial_states,
        jnp.zeros(initial_states.shape[0], dtype=initial_states.dtype),
        jnp.ones((), dtype=initial_states.dtype),
    )
    (final_state, total_reward, _), states = jax.lax.scan(step, init, xs)
    del final_state
    if return_states:
        return total_reward, states
    return total_reward


def action_smoothness_penalty(
    action_sequences: jax.Array, weight: float, discount: float = 1.0,
    time_major: bool = False,
) -> jax.Array:
    """``w * sum_t discount^t * ||a_t - a_{t-1}||^2`` over [P, A, H, U] plans -> [P, A].

    The actuation-rate cost of :func:`make_trajectory_evaluator`'s
    ``action_smoothness_weight``, exposed separately so kernel backends (whose reward comes
    out of Mosaic) can apply the identical term on the candidate tensor in XLA.

    ``time_major``: plans are ``[H, P, A, U]`` — the diff runs along axis 0 (same math,
    no relayout of the candidate tensor).
    """
    h_axis = 0 if time_major else 2
    horizon = action_sequences.shape[h_axis]
    # [P, A, H-1] (or [H-1, P, A] time-major)
    diffs = jnp.sum(jnp.square(jnp.diff(action_sequences, axis=h_axis)), axis=-1)
    if discount != 1.0:
        disc = jnp.asarray(discount, diffs.dtype) ** jnp.arange(1, horizon)
        diffs = diffs * (disc[:, None, None] if time_major else disc)
    return weight * jnp.sum(diffs, axis=h_axis)


def make_trajectory_evaluator(
    dynamics_fn: DynamicsFn,
    reward_fn: RewardFn,
    *,
    discount: float = 1.0,
    nan_guard: bool = True,
    num_particles: int = 1,
    remat: bool = False,
    action_smoothness_weight: float = 0.0,
    dynamics_returns_penalty: bool = False,
    time_major: bool = False,
) -> TrajectoryEvaluator:
    """Builds ``evaluate(initial_states [A,S], action_sequences [P,A,H,U]) -> rewards [P,A]``.

    ``time_major``: the candidate contract becomes ``[H, P, A, U]`` (rewards stay
    ``[P, A]``) and the horizon scan consumes it with no relayout — see
    :func:`rollout_trajectories`. Pair with a solver that samples time-major
    (``CEMConfig(time_major=True)``).

    ``dynamics_returns_penalty``: see :func:`rollout_trajectories` — pessimistic planning
    over uncertainty-penalized dynamics.

    ``remat``: checkpoint the horizon scan body (see :func:`rollout_trajectories`) —
    enables much larger restart clouds / populations for the differentiable planners.

    ``action_smoothness_weight`` (w >= 0): actuation-rate cost — subtracts
    ``w * sum_t discount^t * ||a_t - a_{t-1}||^2`` (t = 1..H-1, intra-plan differences;
    the hand-off from the previously *executed* action is not visible here) from each
    candidate's return. A standard MPC regularizer the reference lacks: it needs no
    dynamics pass (computed directly on the candidate tensor) and steers every solver
    toward low-jerk plans — complementary to iCEM's colored-noise *sampling* bias
    (solvers/base.py), which shapes proposals but not selection.

    Semantics match the reference evaluator call
    (/root/reference/blackbox_mpc/trajectory_evaluators/deterministic.py:26-77): the initial
    state of agent ``a`` is tiled across the population, each candidate sequence is rolled out
    for H steps, and per-trajectory rewards are summed (NaN -> -1e6).

    ``num_particles`` (stochastic dynamics only, i.e. when a ``key`` is passed): each
    candidate is rolled out K times — different particle rows get different ensemble members
    and independent aleatoric noise — and the K returns are AVERAGED. This is the PETS
    trajectory-sampling estimator: with K=1 elite selection rewards lucky noise draws
    (measured: single-particle ts_inf peaked at 197 vs 449 for mean propagation on cheetah);
    averaging restores a low-variance value estimate while keeping uncertainty-awareness.
    """
    if num_particles < 1:
        raise ValueError(f"num_particles must be >= 1, got {num_particles}")
    if action_smoothness_weight < 0:
        raise ValueError(
            f"action_smoothness_weight must be >= 0, got {action_smoothness_weight}"
        )

    def evaluate(
        initial_states: jax.Array,
        action_sequences: jax.Array,
        key: jax.Array | None = None,
    ) -> jax.Array:
        if time_major:
            horizon, pop, agents, dim_u = action_sequences.shape
        else:
            pop, agents, horizon, dim_u = action_sequences.shape
        k = num_particles if key is not None else 1
        p_axis = 1 if time_major else 0
        if k > 1:
            # [P, A, H, U] -> [P*K, A, H, U]: particle j of candidate i is row i*K + j; the
            # member-partitioned dynamics assigns each flattened row a member via the
            # balanced static shuffle ts_member_ids (models/dynamics.py), which cannot
            # alias with this layout's agent stride. (Time-major: same repeat on axis 1.)
            action_sequences = jnp.repeat(action_sequences, k, axis=p_axis)
        if time_major:
            # [H, P*K, A, U] -> [H, P*K*A, U]: contiguous view, no relayout before the scan.
            flat_actions = action_sequences.reshape(horizon, pop * k * agents, dim_u)
        else:
            flat_actions = action_sequences.reshape(pop * k * agents, horizon, dim_u)
        # Tile [A, S] -> [P*A, S] with agent minor, matching tf.tile(current_states, [pop, 1]).
        flat_states = jnp.tile(initial_states, (pop * k, 1))
        total = rollout_trajectories(
            dynamics_fn, reward_fn, flat_states, flat_actions, discount=discount, key=key,
            remat=remat, dynamics_returns_penalty=dynamics_returns_penalty,
            time_major=time_major,
        )
        rewards = total.reshape(pop, k, agents).mean(axis=1) if k > 1 else total.reshape(
            pop, agents
        )
        if action_smoothness_weight > 0.0:
            # On the K-repeated tensor rows of one candidate are identical, so slice back
            # to [P, A, H, U] (every particle carries the same plan penalty).
            if k > 1:
                plans = action_sequences[:, ::k] if time_major else action_sequences[::k]
            else:
                plans = action_sequences
            rewards = rewards - action_smoothness_penalty(
                plans, action_smoothness_weight, discount, time_major=time_major
            )
        if nan_guard:
            rewards = jnp.where(jnp.isnan(rewards), jnp.asarray(NAN_REWARD, rewards.dtype), rewards)
        return rewards

    return evaluate
