"""Plain-pytree MLP dynamics model, with ensembles as a stacked leading parameter axis.

Counterpart of ``DeterministicMLP`` (``/root/reference/blackbox_mpc/dynamics_functions/
deterministic_mlp.py:27-51``), which is a Keras ``Dense`` stack iterated through a TF2.0
ListWrapper quirk (``deterministic_mlp.py:49``). Here the model is a pure
``(params, x) -> y`` apply over a params pytree, so

* ensembles are ``jax.vmap`` over a stacked params axis (the reference supports a single model
  only; its README lists ensembles as future work),
* the same apply runs inside the rollout ``lax.scan``, the training step, and a Pallas kernel,
* matmuls can run in bfloat16 on the MXU with float32 accumulation (``compute_dtype``).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["MLPConfig", "mlp_init", "mlp_apply", "ensemble_init", "ensemble_apply"]

_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.swish,
}


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Layer sizes exclude input/output dims; reference tutorials use 3x32 tanh (pendulum)
    and 3x500 tanh (HalfCheetah, /root/reference/tutorials/mujoco/tutorial_two.py:23-32)."""

    in_dim: int
    out_dim: int
    hidden: Sequence[int] = (32, 32, 32)
    activation: str = "tanh"
    compute_dtype: jnp.dtype = jnp.float32  # set jnp.bfloat16 to run matmuls on the MXU in bf16


def _layer_init(key: jax.Array, fan_in: int, fan_out: int):
    """Glorot-uniform weights + zero bias (Keras Dense default, deterministic_mlp.py:19-24)."""
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    w_key, _ = jax.random.split(key)
    w = jax.random.uniform(w_key, (fan_in, fan_out), minval=-limit, maxval=limit)
    return {"w": w, "b": jnp.zeros((fan_out,))}


def mlp_init(key: jax.Array, config: MLPConfig):
    """Returns a params pytree: list of {'w','b'} dicts."""
    sizes = [config.in_dim, *config.hidden, config.out_dim]
    keys = jax.random.split(key, len(sizes) - 1)
    return [_layer_init(k, sizes[i], sizes[i + 1]) for i, k in enumerate(keys)]


def mlp_apply(params, x: jax.Array, *, config: MLPConfig) -> jax.Array:
    """Forward pass [B, in_dim] -> [B, out_dim]; hidden activations, linear head."""
    act = _ACTIVATIONS[config.activation]
    dtype = config.compute_dtype
    h = x.astype(dtype)
    for i, layer in enumerate(params):
        h = (
            jnp.dot(h, layer["w"].astype(dtype), preferred_element_type=jnp.float32)
            + layer["b"]
        )
        if i < len(params) - 1:
            h = act(h)
        h = h.astype(dtype) if i < len(params) - 1 else h
    return h.astype(jnp.float32)


def ensemble_init(key: jax.Array, config: MLPConfig, num_members: int):
    """Stacked-params ensemble: every leaf gains a leading [E] axis."""
    keys = jax.random.split(key, num_members)
    return jax.vmap(lambda k: mlp_init(k, config))(keys)


def ensemble_apply(params, x: jax.Array, *, config: MLPConfig) -> jax.Array:
    """Applies every member to the same batch: [B, in] -> [E, B, out]."""
    return jax.vmap(lambda p: mlp_apply(p, x, config=config))(params)
