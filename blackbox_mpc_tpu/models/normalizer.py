"""Normalization statistics for dynamics-model inputs/targets, as a state pytree.

Counterpart of the six numpy side-arrays the reference keeps on the handler
(``/root/reference/blackbox_mpc/dynamics_handlers/system_dynamics_handler.py:334-349``:
mean/std of states, actions, targets). Living in a pytree means the stats ride inside jitted
functions and checkpoints with everything else.

The reference freezes stats after the first ``train()`` call
(``system_dynamics_handler.py:193-198``); :func:`fit` here recomputes from whatever data it is
given, and the handler decides the freeze policy (default matches the reference, with a flag).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["NormalizerStats", "fit_normalizer", "identity_stats"]

_EPS = 1e-7


@struct.dataclass
class NormalizerStats:
    mean_states: jax.Array  # [S]
    std_states: jax.Array  # [S]
    mean_actions: jax.Array  # [U]
    std_actions: jax.Array  # [U]
    mean_targets: jax.Array  # [S]
    std_targets: jax.Array  # [S]

    def normalize_states(self, states: jax.Array) -> jax.Array:
        return (states - self.mean_states) / (self.std_states + _EPS)

    def normalize_actions(self, actions: jax.Array) -> jax.Array:
        return (actions - self.mean_actions) / (self.std_actions + _EPS)

    def normalize_targets(self, targets: jax.Array) -> jax.Array:
        return (targets - self.mean_targets) / (self.std_targets + _EPS)

    def denormalize_targets(self, targets: jax.Array) -> jax.Array:
        return targets * (self.std_targets + _EPS) + self.mean_targets


def identity_stats(dim_s: int, dim_u: int) -> NormalizerStats:
    return NormalizerStats(
        mean_states=jnp.zeros(dim_s),
        std_states=jnp.ones(dim_s),
        mean_actions=jnp.zeros(dim_u),
        std_actions=jnp.ones(dim_u),
        mean_targets=jnp.zeros(dim_s),
        std_targets=jnp.ones(dim_s),
    )


def fit_normalizer(states: jax.Array, actions: jax.Array, targets: jax.Array) -> NormalizerStats:
    """Computes mean/std stats from (state, action, target) training arrays."""
    return NormalizerStats(
        mean_states=jnp.mean(states, axis=0),
        std_states=jnp.std(states, axis=0),
        mean_actions=jnp.mean(actions, axis=0),
        std_actions=jnp.std(actions, axis=0),
        mean_targets=jnp.mean(targets, axis=0),
        std_targets=jnp.std(targets, axis=0),
    )
