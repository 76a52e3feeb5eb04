"""Shared in-kernel pieces for the Pallas rollout kernels.

Both :mod:`~blackbox_mpc_tpu.ops.pallas_rollout` (evaluate pre-materialized actions) and
:mod:`~blackbox_mpc_tpu.ops.pallas_cem` (generate candidates in-kernel) run the same inner
chain per horizon step: normalize -> ensemble-MLP (VMEM-resident weights) -> denormalize ->
delta -> reward. This module holds that chain once.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from blackbox_mpc_tpu.models.dynamics import DynamicsParams, LearnedDynamicsConfig

_EPS = 1e-7  # must match models/normalizer.py

_ACTS = {"tanh": jnp.tanh, "relu": jax.nn.relu, "gelu": jax.nn.gelu}


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def streamed_tile(config: LearnedDynamicsConfig, extra_row_bytes: int = 0) -> int:
    """Largest row tile whose working set fits comfortably in scoped VMEM.

    For the streamed (per-step) kernels, which hold: the bf16 weights (resident across the
    whole grid), one activation set (~max_width x (input + f32 accumulator + slack)), the
    f32 state/return scratch, and ``extra_row_bytes`` per row of kernel-specific blocks
    (e.g. the double-buffered per-step action block, lane-padded to 128). No [T, H*U]
    action block — that is the point: tiles grow 2-4x over the block kernels, giving
    bigger matmuls and fewer grid steps.
    """
    widths = [config.dim_s + config.dim_u, *config.hidden, config.dim_s]
    itemsize = jnp.dtype(config.compute_dtype).itemsize
    w_bytes = 0
    for a, b in zip(widths[:-1], widths[1:]):
        w_bytes += config.ensemble_size * (a * b * itemsize + b * 4)
    max_w = max(widths)
    budget = 12 * 1024 * 1024  # leave headroom under the ~16 MB scoped-VMEM limit
    for tile in (1024, 512, 256, 128):
        act_bytes = tile * (max_w * (itemsize + 4 + 4) + config.dim_s * 8 + extra_row_bytes)
        if w_bytes + act_bytes <= budget:
            return tile
    return 128


def check_kernel_support(config: LearnedDynamicsConfig, what: str, allow_ts1: bool = False) -> None:
    allowed = ("mean", "ts1") if allow_ts1 else ("mean",)
    if config.ensemble_size > 1 and config.propagation not in allowed:
        raise ValueError(f"{what} supports propagation in {allowed} (or ensemble_size=1)")
    if getattr(config, "probabilistic", False):
        raise ValueError(f"{what} supports deterministic heads only (probabilistic=False)")
    if config.activation not in _ACTS:
        raise ValueError(f"unsupported activation for {what}: {config.activation}")


def build_step_fn(
    config: LearnedDynamicsConfig, reward_fn: Callable, stats, weight_refs, member=None
):
    """Returns ``step(s [T,S], a [T,U]) -> (next_state, reward)`` for use inside a kernel.

    ``stats`` is the [6, max(S,U)] normalizer matrix value; ``weight_refs`` the per-layer
    (w, b) refs with a leading ensemble axis. With ``member=None`` the net is the ensemble
    mean; with a traced scalar ``member`` (TS-1 tiles) only that member's weights run,
    selected via a static ``lax.switch`` over the (small) ensemble.
    """
    dim_s, dim_u = config.dim_s, config.dim_u
    n_layers = len(config.hidden) + 1
    ensemble = config.ensemble_size
    act = _ACTS[config.activation]
    compute_dtype = jnp.dtype(config.compute_dtype)
    mean_s, std_s = stats[0, :dim_s], stats[1, :dim_s]
    mean_a, std_a = stats[2, :dim_u], stats[3, :dim_u]
    mean_t, std_t = stats[4, :dim_s], stats[5, :dim_s]

    def _member_forward(e, x):
        h = x
        for layer in range(n_layers):
            w = weight_refs[2 * layer][e]
            b = weight_refs[2 * layer + 1][e]
            h = jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32) + b
            if layer < n_layers - 1:
                h = act(h).astype(compute_dtype)
        return h

    def net(x):
        if member is not None:
            return jax.lax.switch(
                member, [lambda x=x, e=e: _member_forward(e, x) for e in range(ensemble)]
            )
        acc = jnp.zeros((x.shape[0], dim_s), jnp.float32)
        for e in range(ensemble):
            acc = acc + _member_forward(e, x)
        return acc / ensemble

    def step(s, a):
        if config.normalized:
            xs = (s - mean_s) / (std_s + _EPS)
            xa = (a - mean_a) / (std_a + _EPS)
        else:
            xs, xa = s, a
        x = jnp.concatenate([xs, xa], axis=-1).astype(compute_dtype)
        raw = net(x)
        if config.normalized:
            raw = raw * (std_t + _EPS) + mean_t
        ns = s + raw if config.predict_delta else raw
        return ns, reward_fn(s, a, ns)

    return step


def stats_matrix(dp: DynamicsParams, dim_s: int, dim_u: int) -> jax.Array:
    """Packs normalizer stats into the [6, max(S,U)] kernel input layout."""
    width = max(dim_s, dim_u)

    def row(v):
        return jnp.pad(v.astype(jnp.float32), (0, width - v.shape[0]))

    st = dp.stats
    return jnp.stack(
        [
            row(st.mean_states), row(st.std_states), row(st.mean_actions),
            row(st.std_actions), row(st.mean_targets), row(st.std_targets),
        ]
    )


def weight_operands(dp: DynamicsParams, ensemble: int, compute_dtype):
    """Per-layer (w, b) kernel operands, stacked with a leading ensemble axis."""
    params = dp.params
    if ensemble == 1:
        params = jax.tree_util.tree_map(lambda x: x[None], params)
    out = []
    for layer in params:
        out.append(layer["w"].astype(compute_dtype))
        out.append(layer["b"].astype(jnp.float32))
    return out
