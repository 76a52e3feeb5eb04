"""Pluggable target transforms for dynamics learning.

Counterpart of ``/root/reference/blackbox_mpc/utils/transforms.py:4-34``: the network predicts a
transformed target (by default the state delta ``s' - s``) and the inverse transform recovers
the next state (``s' = delta + s``).
"""
from __future__ import annotations

import jax

__all__ = ["delta_transform", "delta_inverse_transform", "identity_transform", "identity_inverse_transform"]


def delta_transform(state: jax.Array, next_state: jax.Array) -> jax.Array:
    """target = next_state - state (reference ``default_transform_targets``)."""
    return next_state - state


def delta_inverse_transform(state: jax.Array, target: jax.Array) -> jax.Array:
    """next_state = target + state (reference ``default_inverse_transform_targets``)."""
    return target + state


def identity_transform(state: jax.Array, next_state: jax.Array) -> jax.Array:
    del state
    return next_state


def identity_inverse_transform(state: jax.Array, target: jax.Array) -> jax.Array:
    del state
    return target
