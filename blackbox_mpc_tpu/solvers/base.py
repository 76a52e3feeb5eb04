"""Shared configuration and helpers for the derivative-free trajectory solvers.

Counterpart of ``OptimizerBase`` (``/root/reference/blackbox_mpc/optimizers/optimizer_base.py``),
reworked as pure functions: bounds bookkeeping, midpoint/variance initialization
(``optimizer_base.py:37-50``), warm-start time-shifting (``pi2.py:92-93``), and the
exploration-noise rule (``optimizer_base.py:82-90``) live here; the per-algorithm update rules
live in sibling modules, each exporting ``make_<name>(config, bounds, evaluate) -> Solver``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from blackbox_mpc_tpu.core.types import Bounds, Solver, truncated_normal

__all__ = [
    "SolverConfig",
    "adam_polish",
    "with_state_dtype",
    "init_solution_mean",
    "init_solution_variance",
    "constrain_variance",
    "shift_time",
    "bound_violation_penalty",
    "colored_noise",
    "colored_noise_time_major",
    "exploration_noise",
]


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static (trace-time) configuration common to all solvers.

    Defaults mirror the reference CEM signature
    (``/root/reference/blackbox_mpc/optimizers/cem.py:7-10``).
    """

    planning_horizon: int = 50
    population: int = 500
    num_agents: int = 1
    max_iterations: int = 5
    # Storage dtype of the persistent solver state between solves (plan mean/variance,
    # swarm, CMA matrices) — halves warm-start state HBM at bfloat16. Iteration math always
    # runs in float32: moment accumulation and eigh are not bf16-safe, so the state is
    # upcast at solve entry and cast back on exit (see with_state_dtype).
    dtype: jnp.dtype = jnp.float32


def with_state_dtype(solver: Solver, dtype) -> Solver:
    """Stores the persistent solver state in ``dtype`` between solves.

    Identity for float32. Otherwise: float leaves of the state pytree are cast to
    ``dtype`` by init/reset and after each solve, and upcast to float32 before the
    update math (which stays f32 — bf16 accumulation of elite moments / covariance
    updates diverges, and ``jnp.linalg.eigh`` rejects bf16). Actions and aux outputs
    are always float32.
    """
    if jnp.dtype(dtype) == jnp.float32:
        return solver

    def _cast(tree, dt):
        return jax.tree.map(
            lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
        )

    def init(key):
        return _cast(solver.init(key), dtype)

    def solve(state, obs, t, key):
        action, next_state, aux = solver.solve(_cast(state, jnp.float32), obs, t, key)
        return action, _cast(next_state, dtype), aux

    def reset(state, key):
        return _cast(solver.reset(_cast(state, jnp.float32), key), dtype)

    return Solver(
        init=init, solve=solve, reset=reset, name=solver.name,
        plan_field=solver.plan_field,
    )


def init_solution_mean(
    bounds: Bounds, horizon: int, num_agents: int, dtype=jnp.float32
) -> jax.Array:
    """Midpoint-of-action-space initial plan, [A, H, U] (reference cem.py:55-63)."""
    mid = bounds.midpoint
    return jnp.broadcast_to(mid, (num_agents, horizon) + mid.shape).astype(dtype)


def init_solution_variance(
    bounds: Bounds, horizon: int, num_agents: int, dtype=jnp.float32
) -> jax.Array:
    """(range/4)^2 initial variance, [A, H, U] (reference cem.py:64-72)."""
    var = bounds.default_variance
    return jnp.broadcast_to(var, (num_agents, horizon) + var.shape).astype(dtype)


def constrain_variance(mean: jax.Array, variance: jax.Array, bounds: Bounds) -> jax.Array:
    """Caps the sampling variance so +/-2 sigma stays inside the bounds.

    Reference rule (``cem.py:81-88``): min(((m-lb)/2)^2, ((ub-m)/2)^2, var).
    """
    lower_dist = mean - bounds.lower
    upper_dist = bounds.upper - mean
    return jnp.minimum(
        jnp.minimum(jnp.square(lower_dist / 2.0), jnp.square(upper_dist / 2.0)), variance
    )


def shift_time(plan: jax.Array) -> jax.Array:
    """Warm-start shift: drop step 0, repeat the final step. plan=[..., H, U].

    Reference: ``tf.concat([sol[:, 1:], sol[:, -1:]], 1)`` (pi2.py:92-93, spsa.py:114-115).
    """
    return jnp.concatenate([plan[..., 1:, :], plan[..., -1:, :]], axis=-2)


def bound_violation_penalty(
    samples: jax.Array, bounds: Bounds, time_major: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Clips samples to bounds; returns (feasible samples, squared-violation penalty [P, A]).

    Reference pattern (pi2.py:70-76, spsa.py:80-91, pso.py:79-85, cma_es.py:147-152).

    ``time_major``: samples are ``[H, P, A, U]`` (the penalty stays ``[P, A]``).
    """
    feasible = bounds.clip(samples)
    violation = jnp.square(samples - feasible)
    if time_major:
        return feasible, jnp.sum(violation, axis=(0, 3))
    pop, agents = samples.shape[0], samples.shape[1]
    penalty = jnp.sum(violation.reshape(pop, agents, -1), axis=-1)
    return feasible, penalty


def colored_noise(key: jax.Array, beta: float, shape, dtype=jnp.float32) -> jax.Array:
    """Temporally colored (power-law) noise along the horizon axis.

    The returned signal is normalized to unit standard deviation over each whole ``(H, U)``
    action sequence (not per step — individual steps of a colored sequence are correlated,
    so their marginal variance varies with position).

    ``shape`` is ``[..., H, U]``; the spectrum over the H axis is scaled ``f^(-beta/2)``
    (beta=0 -> white noise; beta~1-4 -> smooth action sequences). This is the iCEM
    colored-noise sampler (Pinneri et al., 2020) — an improvement the reference lacks; its
    CEM always samples white truncated normals (cem.py:90-94).
    """
    *lead, horizon, dim_u = shape
    nfreq = horizon // 2 + 1
    real_key, imag_key = jax.random.split(key)
    spectrum = jax.random.normal(real_key, (*lead, dim_u, nfreq), dtype) + 1j * jax.random.normal(
        imag_key, (*lead, dim_u, nfreq), dtype
    )
    freqs = jnp.arange(1, nfreq + 1, dtype=dtype)  # avoid f=0 blowup
    spectrum = spectrum * freqs ** (-beta / 2.0)
    signal = jnp.fft.irfft(spectrum, n=horizon, axis=-1)  # [..., U, H]
    signal = jnp.swapaxes(signal, -1, -2)  # [..., H, U]
    std = jnp.std(signal, axis=(-2, -1), keepdims=True) + 1e-8
    return signal / std


def colored_noise_time_major(key: jax.Array, beta: float, shape, dtype=jnp.float32) -> jax.Array:
    """:func:`colored_noise` for the time-major candidate layout: ``shape`` is
    ``(H, *lead, U)`` with the power-law correlation along axis 0.

    The irfft is replaced by an equivalent spectral-basis contraction (the same trick the
    fused kernels use, ops/pallas_cem.py ``_colored_basis2``): the per-frequency impulse
    responses form a static ``[2F, H]`` numpy basis at trace time and the synthesis is one
    ``einsum('fh,...f->h...')`` whose dot_general writes the output H-major DIRECTLY — no
    ``[..., H] -> [H, ...]`` relayout of the full candidate tensor. The spectrum draw
    shapes match :func:`colored_noise` exactly, so with the same key the result equals
    ``colored_noise(key, beta, (*lead, H, U))`` transposed, up to fp error (asserted in
    tests/test_time_major.py).
    """
    horizon, *lead, dim_u = shape
    nfreq = horizon // 2 + 1
    real_key, imag_key = jax.random.split(key)
    re = jax.random.normal(real_key, (*lead, dim_u, nfreq), dtype)
    im = jax.random.normal(imag_key, (*lead, dim_u, nfreq), dtype)
    coeffs = jnp.stack([re, im], axis=-1).reshape(*lead, dim_u, 2 * nfreq)
    basis = jnp.asarray(colored_synthesis_basis(horizon, beta), dtype)
    # precision=HIGHEST: default MXU precision (bf16 passes) would break the documented
    # fp-level cross-layout equivalence — same reason the in-kernel basis matmul pins it
    # (ops/pallas_cem.py _gen_z).
    signal = jnp.einsum(
        "fh,...f->h...", basis, coeffs, precision=jax.lax.Precision.HIGHEST
    )  # [H, *lead, U], written H-major by the dot itself
    std = jnp.std(signal, axis=(0, signal.ndim - 1), keepdims=True) + 1e-8
    return signal / std


def colored_synthesis_basis(horizon: int, beta: float):
    """Static [2F, H] spectral-synthesis basis (numpy, trace time), F = H//2 + 1.

    Row 2k / 2k+1 = irfft of the ``(k+1)^(-beta/2)``-scaled unit real / imaginary impulse
    at frequency k, so ``coeffs [.., 2F] @ basis -> [.., H]`` reproduces
    ``irfft(spectrum * f^(-beta/2)))`` for ``spectrum = re + i*im``. Single source of
    truth for the synthesis convention — :func:`colored_noise_time_major` contracts it
    directly and the fused kernels pack it per-u block-diagonal
    (ops/pallas_cem.py ``_colored_basis2``).
    """
    import numpy as np

    nfreq = horizon // 2 + 1
    scale = np.arange(1, nfreq + 1, dtype=np.float64) ** (-beta / 2.0)
    basis = np.zeros((2 * nfreq, horizon), np.float64)
    for k in range(nfreq):
        spec = np.zeros(nfreq, np.complex128)
        spec[k] = scale[k]
        basis[2 * k] = np.fft.irfft(spec, n=horizon)
        spec[k] = 1j * scale[k]
        basis[2 * k + 1] = np.fft.irfft(spec, n=horizon)
    return basis


def exploration_noise(
    key: jax.Array, action: jax.Array, bounds: Bounds, scale: float = 0.05
) -> jax.Array:
    """Adds truncated-normal exploration noise to an [A, U] action and clips to bounds.

    Preserves the reference quirk: the noise is centered at the *action-space midpoint*
    (not zero) and added to the action (``optimizer_base.py:46-50,82-90``), which biases
    exploration for asymmetric spaces exactly as the reference does.
    """
    var = bounds.default_variance * scale
    noise = truncated_normal(key, bounds.midpoint, jnp.sqrt(var), action.shape)
    return bounds.clip(action + noise)


def adam_polish(evaluate, bounds: Bounds, optimizer, plans: jax.Array, iterations: int) -> jax.Array:
    """Projected Adam ascent of ``evaluate`` over a batch of plans [P, A, H, U].

    Shared by the first-order solvers (``gradient.py``, ``cem_gd.py``). Each plan's reward
    depends only on its own actions, so the gradient of the batch mean decomposes per plan
    (no cross terms); bounds are enforced by clipping after every step.
    """
    import optax

    def objective(p):
        return -jnp.mean(evaluate(p))

    def iteration(carry, _):
        plans, opt_state = carry
        grads = jax.grad(objective)(plans)
        updates, opt_state = optimizer.update(grads, opt_state, plans)
        plans = bounds.clip(optax.apply_updates(plans, updates))
        return (plans, opt_state), None

    (plans, _), _ = jax.lax.scan(
        iteration, (plans, optimizer.init(plans)), None, length=iterations
    )
    return plans
