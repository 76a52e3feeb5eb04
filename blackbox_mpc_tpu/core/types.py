"""Core pytree types shared by every solver and the rollout engine.

Design stance (vs. the reference): the reference keeps solver state in hidden mutable
``tf.Variable``s inside ``tf.Module`` subclasses (``/root/reference/blackbox_mpc/optimizers/
cem.py:61-72``, ``pso.py:50-59``). The TPU build replaces that with *explicit, immutable state
pytrees* threaded through pure functions, so the whole solve step jit-compiles once, shards over
a device mesh, and replays deterministically from a PRNG key.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from blackbox_mpc_tpu.core.spaces import BoxSpace

__all__ = [
    "Bounds",
    "SolverAux",
    "Solver",
    "TrajectoryEvaluator",
    "DynamicsFn",
    "RewardFn",
]

# (state [B, S], action [B, U]) -> next_state [B, S]
DynamicsFn = Callable[[jax.Array, jax.Array], jax.Array]
# (state [B, S], action [B, U], next_state [B, S]) -> reward [B]
# NOTE: the canonical argument order is (s, a, s'). The reference documents this order
# (/root/reference/blackbox_mpc/policies/mpc_policy.py:42-44) but its bundled pendulum reward
# declares (s, s', a) and silently receives swapped arguments
# (/root/reference/blackbox_mpc/utils/pendulum.py:11 vs trajectory_evaluators/deterministic.py:65).
# This build standardizes on (s, a, s') everywhere.
RewardFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]
# (initial_states [A, S], action_sequences [P, A, H, U]) -> rewards [P, A]
TrajectoryEvaluator = Callable[[jax.Array, jax.Array], jax.Array]


@struct.dataclass
class Bounds:
    """Per-dimension action bounds, and the derived quantities every solver needs.

    Mirrors the bound bookkeeping of the reference's optimizer base
    (``/root/reference/blackbox_mpc/optimizers/optimizer_base.py:32-50``) as a pytree.

    The fields are **host numpy arrays** by design: solvers close over a ``Bounds`` when
    tracing, and numpy leaves bake into the compiled program as literals. Device-array
    (``jnp``) closure constants instead become captured buffers of the executable, which some
    runtimes (notably remote-dispatch TPU frontends) re-bind per execution at large fixed
    cost — measured at ~30 ms/call on the axon tunnel, vs microseconds with literals.
    """

    lower: np.ndarray  # [U]
    upper: np.ndarray  # [U]

    @classmethod
    def from_space(cls, space: BoxSpace, dtype=jnp.float32) -> "Bounds":
        np_dtype = np.dtype(dtype)
        return cls(
            lower=np.asarray(space.low, dtype=np_dtype),
            upper=np.asarray(space.high, dtype=np_dtype),
        )

    @classmethod
    def of(cls, lower, upper, dim: Optional[int] = None, dtype=jnp.float32) -> "Bounds":
        space = BoxSpace.of(np.asarray(lower), np.asarray(upper), dim=dim)
        return cls.from_space(space, dtype=dtype)

    @property
    def dim(self) -> int:
        return int(self.lower.shape[-1])

    @property
    def midpoint(self) -> jax.Array:
        return (self.lower + self.upper) / 2.0

    @property
    def range(self) -> jax.Array:
        return self.upper - self.lower

    @property
    def default_variance(self) -> jax.Array:
        # (range/4)^2 — the init variance used by every reference solver
        # (/root/reference/blackbox_mpc/optimizers/cem.py:66-68).
        return jnp.square(self.range) / 16.0

    def clip(self, x: jax.Array) -> jax.Array:
        return jnp.clip(x, self.lower, self.upper)


class SolverAux(NamedTuple):
    """Diagnostics returned by one solve call."""

    expected_reward: jax.Array  # [A] — best/expected planned reward for the chosen plan
    plan: jax.Array  # [A, H, U] — full refined action plan (first action is the output)


class Solver(NamedTuple):
    """A derivative-free trajectory optimizer as a pure-function triple (optax-style).

    init:  (key) -> state                       allocate fresh solver state
    solve: (state, obs [A,S], t, key) ->        one MPC solve: returns the refined first
           (action [A,U], state, SolverAux)     action, the updated state, and diagnostics
    reset: (state, key) -> state                per-episode reset (reference ``reset()``,
                                                e.g. /root/reference/blackbox_mpc/optimizers/cem.py:138)
    """

    init: Callable[[jax.Array], Any]
    solve: Callable[[Any, jax.Array, jax.Array, jax.Array], tuple]
    reset: Callable[[Any, jax.Array], Any]
    name: str = "solver"
    # Name of the state field holding the incumbent plan (total size A*H*U), or None if
    # the solver carries no externally-seedable plan. Consumed by MPCPolicy's POPLIN-style
    # proposer seeding; declared here so new solvers opt in explicitly instead of being
    # duck-typed by field name.
    plan_field: Any = None


def truncated_normal(key: jax.Array, mean: jax.Array, stddev: jax.Array, shape) -> jax.Array:
    """Samples N(mean, stddev^2) truncated to +/-2 stddev.

    Matches ``tf.random.truncated_normal`` semantics used throughout the reference
    (e.g. /root/reference/blackbox_mpc/optimizers/cem.py:90-94).
    """
    z = jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype=mean.dtype)
    return mean + z * stddev
