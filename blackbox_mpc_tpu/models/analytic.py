"""Analytical (closed-form) dynamics models and reward functions.

TPU-native counterpart of the reference's true-model path
(``/root/reference/blackbox_mpc/utils/pendulum.py:38-92``): pure jnp functions returning the
*full next state* under the canonical ``dynamics(state, action) -> next_state`` convention.
The reference returns state deltas composed through an inverse target transform
(``utils/pendulum.py:91-92`` + ``utils/transforms.py:20``); here that composition is pre-applied
so the hot rollout loop carries no transform indirection.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "pendulum_dynamics",
    "pendulum_reward",
    "angle_normalize",
    "cartpole_dynamics",
    "cartpole_reward",
    "ANALYTIC_MODELS",
]

_PI = math.pi

# Physical constants of gym's Pendulum-v1 (matches the reference's hard-coded values,
# /root/reference/blackbox_mpc/utils/pendulum.py:50-56).
_G = 10.0
_M = 1.0
_L = 1.0
_DT = 0.05
_MAX_SPEED = 8.0
_MAX_TORQUE = 2.0


def angle_normalize(x: jax.Array) -> jax.Array:
    """Wraps an angle to [-pi, pi) (reference ``_pendulum_angle_normalize``, pendulum.py:5-7)."""
    return ((x + _PI) % (2.0 * _PI)) - _PI


def pendulum_dynamics(state: jax.Array, action: jax.Array) -> jax.Array:
    """Closed-form pendulum step. state=[B,3]([cos th, sin th, thdot]), action=[B,1] -> [B,3].

    Physics of gymnasium Pendulum-v1: the angular velocity is clipped to +/-8 BEFORE theta is
    integrated. (The reference, /root/reference/blackbox_mpc/utils/pendulum.py:58-92, follows
    the older gym-v0 order — integrate with the unclipped velocity, then clip — which drifts
    from the env it controls whenever |thdot| saturates; this build matches the env.) Returns
    the next state directly instead of a delta.
    """
    cos_th = state[..., 0]
    sin_th = state[..., 1]
    thdot = state[..., 2]
    u = action[..., 0]
    th = jnp.arctan2(sin_th, cos_th)
    newthdot = thdot + (
        -3.0 * _G / (2.0 * _L) * jnp.sin(th + _PI) + 3.0 / (_M * _L**2) * u
    ) * _DT
    newthdot = jnp.clip(newthdot, -_MAX_SPEED, _MAX_SPEED)
    newth = th + newthdot * _DT
    return jnp.stack([jnp.cos(newth), jnp.sin(newth), newthdot], axis=-1)


def pendulum_reward(state: jax.Array, action: jax.Array, next_state: jax.Array) -> jax.Array:
    """Pendulum swing-up reward -(th^2 + 0.1 thdot^2 + 0.001 ||u||^2), per batch row.

    Canonical (s, a, s') argument order. The reference's bundled version declares (s, s', a)
    and receives swapped args from the evaluator (/root/reference/blackbox_mpc/utils/
    pendulum.py:11 vs trajectory_evaluators/deterministic.py:65-66), so its "action penalty"
    actually penalizes ``||s'||^2``; this build applies the true action penalty.
    """
    del next_state
    th = angle_normalize(jnp.arctan2(state[..., 1], state[..., 0]))
    thdot = state[..., 2]
    return -(th**2 + 0.1 * thdot**2) - 0.001 * jnp.sum(jnp.square(action), axis=-1)


# --- CartPole (continuous-torque swing-up) ------------------------------------------------
# Not present in the reference; added because an analytic second task exercises dim_U == 1,
# dim_S == 4 paths cheaply in tests and benchmarks.

_CP_GRAVITY = 9.8
_CP_MASSCART = 1.0
_CP_MASSPOLE = 0.1
_CP_LENGTH = 0.5
_CP_DT = 0.02
_CP_FORCE_SCALE = 10.0


def cartpole_dynamics(state: jax.Array, action: jax.Array) -> jax.Array:
    """Continuous-force cart-pole Euler step. state=[B,4](x, xdot, th, thdot), action=[B,1]."""
    x, x_dot, th, th_dot = (state[..., i] for i in range(4))
    force = _CP_FORCE_SCALE * action[..., 0]
    total_mass = _CP_MASSCART + _CP_MASSPOLE
    polemass_length = _CP_MASSPOLE * _CP_LENGTH
    costh, sinth = jnp.cos(th), jnp.sin(th)
    temp = (force + polemass_length * th_dot**2 * sinth) / total_mass
    thacc = (_CP_GRAVITY * sinth - costh * temp) / (
        _CP_LENGTH * (4.0 / 3.0 - _CP_MASSPOLE * costh**2 / total_mass)
    )
    xacc = temp - polemass_length * thacc * costh / total_mass
    return jnp.stack(
        [
            x + _CP_DT * x_dot,
            x_dot + _CP_DT * xacc,
            th + _CP_DT * th_dot,
            th_dot + _CP_DT * thacc,
        ],
        axis=-1,
    )


def cartpole_reward(state: jax.Array, action: jax.Array, next_state: jax.Array) -> jax.Array:
    """Upright-pole reward: cos(theta) minus small position/action penalties."""
    del next_state
    return (
        jnp.cos(state[..., 2])
        - 0.01 * jnp.square(state[..., 0])
        - 0.001 * jnp.sum(jnp.square(action), axis=-1)
    )


ANALYTIC_MODELS = {
    "pendulum": (pendulum_dynamics, pendulum_reward),
    "cartpole": (cartpole_dynamics, cartpole_reward),
}
