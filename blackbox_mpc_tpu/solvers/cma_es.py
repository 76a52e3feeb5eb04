"""CMA-ES trajectory solver (per-agent covariance adaptation).

Rebuild of ``CMAESOptimizer`` (``/root/reference/blackbox_mpc/optimizers/cma_es.py:129-213``)
with the standard Hansen update rules: rank-based recombination weights (``cma_es.py:62-68``),
step-size path ``p_sigma`` (``:170-173``), covariance path + rank-mu update (``:177-184``), and
eigendecomposition refresh each iteration.

Deliberate departures from the reference, both fixing documented defects:

* **Per-agent covariance.** The reference flattens all agents into one ``n = A*H*U`` solution
  vector and *sums* rewards across agents (``cma_es.py:158``, flagged "#TODO ... very flaky";
  docstring admits "not optimized for more than one agent", ``:13``). Here every agent runs an
  independent CMA-ES over ``n = H*U`` via ``vmap``-style batched einsums — O(A*n^2) memory
  instead of O((A*n)^2), and correct for A > 1. For A == 1 the math is identical.
* **``eigh`` instead of SVD** on the symmetric covariance (``cma_es.py:195`` uses full SVD) —
  cheaper and the right decomposition for a symmetric PSD matrix; and **Cholesky sampling**:
  candidates are drawn through the (unique, perturbation-stable) Cholesky factor of C rather
  than the eigenbasis ``B D`` (``cma_es.py:139-141``), which makes sharded and single-device
  solves agree to fp tolerance (the eigenbasis is unstable under near-degenerate spectra).
  The eigendecomposition is kept only for the basis-invariant ``C^(-1/2)`` whitening.
* ``reset`` restores the *full* state (the reference's ``reset`` leaves C/B/D/paths stale,
  ``cma_es.py:218-227``).

Beyond the reference: ``diagonal=True`` selects **sep-CMA-ES** (Ros & Hansen 2008) — C is
restricted to its diagonal, updates are O(n) with no eigh/cholesky, and the covariance
learning rates scale by (n+2)/3. The right mode for long horizons / high-dim action spaces
(n = H*U), where the full solver's per-iteration eigendecomposition dominates (measured
25.9 ms vs CEM's 8.9 ms on the flagship workload, docs/performance.md).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux, TrajectoryEvaluator
from blackbox_mpc_tpu.solvers import base

__all__ = ["CMAESConfig", "CMAESState", "make_cma_es"]


@dataclasses.dataclass(frozen=True)
class CMAESConfig(base.SolverConfig):
    """Defaults match the reference (``cma_es.py:7-10``) except ``persist_across_solves``."""

    num_elite: int = 50
    alpha_cov: float = 2.0
    h_sigma: float = 1.0
    # Hansen's state-dependent Heaviside stall indicator. The reference hardcodes
    # h_sigma = 1.0 (cma_es.py:10), which over-applies the rank-one update when the
    # sigma path is long (fast sigma growth after a stall). True computes, per agent
    # and iteration, h = 1{ ||p_sigma|| / sqrt(1-(1-c_sigma)^(2(g+1))) <
    # (1.4 + 2/(n+1)) * E||N(0,I)|| } and (a) gates the p_cov input by h, (b) adds the
    # standard variance-loss correction (1-h) * cc * (2-cc) * C to the rank-one term.
    # Default False keeps the reference-parity constant above.
    adaptive_h_sigma: bool = False
    # The reference carries sigma/C/paths across MPC solves (state assigned in-place each
    # iteration, cma_es.py:199-206, reset only per episode). Measured on pendulum, sigma then
    # collapses to ~0 within ~20 control steps and the controller goes open-loop. Default here:
    # every solve restarts sigma/C/paths fresh and warm-starts only the time-shifted mean.
    # Set True to reproduce the reference's persistent behavior.
    persist_across_solves: bool = False
    # Relative floor/ceiling on the per-coordinate step size, as multiples of the initial
    # sigma ((range/4) per coordinate). Guards the documented collapse mode (sigma -> 0 within
    # ~20 control steps when persist_across_solves=True) and runaway growth; the reference has
    # no guard at all (cma_es.py:199-206).
    sigma_floor: float = 1e-6
    sigma_ceil: float = 1e3
    # sep-CMA-ES (Ros & Hansen 2008): restrict C to its diagonal — O(n) covariance updates,
    # no eigendecomposition or Cholesky, learning rates scaled by (n+2)/3. The right mode for
    # long horizons / high-dim actions, where the full solver's per-iteration O(n^3) eigh is
    # the dominant cost (n = H*U; e.g. 300 for cheetah H=50 U=6). No reference counterpart.
    diagonal: bool = False
    # Lazy factor refresh (full mode only): recompute the Cholesky/C^(-1/2) factors every
    # this many iterations instead of every one — Hansen's standard lazy update; C changes
    # by O(c1+c_mu) per iteration, so sampling through a factor a few iterations stale is
    # within the method's own noise. 1 = refresh every iteration (reference-equivalent,
    # default); 0 = auto, the Hansen gap max(1, 0.5/(n*(c1+c_mu))).
    eigen_update_every: int = 1


@struct.dataclass
class CMAESState:
    mean: jax.Array  # [A, n]
    sigma: jax.Array  # [A, n] — per-coordinate step size (vector, as in the reference)
    cov: jax.Array  # [A, n, n]; diagonal mode: [A, n] (the diagonal of C)
    p_sigma: jax.Array  # [A, n]
    p_cov: jax.Array  # [A, n]
    chol: jax.Array  # [A, n, n] lower Cholesky of cov; diagonal mode: [A, n] (sqrt(C))
    inv_sqrt: jax.Array  # [A, n, n] C^(-1/2); diagonal mode: [A, n]
    # Hansen generation counter g since the adaptation state was (re)initialized — the
    # adaptive_h_sigma warm-up factor must track the TRUE age of p_sigma, which with
    # persist_across_solves=True spans solves (a per-solve loop index would spuriously
    # reset the warm-up and fire h=0 on every MPC step's first iterations).
    gen: jax.Array = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


def cma_constants(config: CMAESConfig, bounds: Bounds, horizon: int, pop: int, k: int):
    """Hansen strategy constants, all numpy/python (they bake into the program as HLO
    literals — jnp closure constants become per-execution bound buffers on remote TPU
    frontends). Shared by :func:`make_cma_es` and the fused sep-CMA solver
    (``ops.pallas_cem.make_fused_sep_cma``) so the two cannot drift."""
    import types

    dim_u = bounds.dim
    n = horizon * dim_u
    # Recombination weights (cma_es.py:62-68): log-rank weights for the top-k, zero after.
    w = np.concatenate(
        [np.log(k + 0.5) - np.log(np.arange(1, k + 1)), np.zeros(pop - k)]
    ).astype(np.float32)
    w = w / w.sum()
    mu_eff = float(1.0 / np.sum(w**2))
    nf = float(n)
    c_sigma = (mu_eff + 2.0) / (nf + mu_eff + 5.0)
    d_sigma = 1.0 + 2.0 * max(0.0, np.sqrt((mu_eff - 1.0) / (nf + 1.0)) - 1.0) + c_sigma
    cc = (4.0 + mu_eff / nf) / (nf + 4.0 + 2.0 * mu_eff / nf)
    c1 = config.alpha_cov / ((nf + 1.3) ** 2 + mu_eff)
    c_mu = min(
        1.0 - c1,
        config.alpha_cov * (mu_eff - 2.0 + 1.0 / mu_eff)
        / ((nf + 2.0) ** 2 + config.alpha_cov * mu_eff / 2.0),
    )
    if config.diagonal:
        # sep-CMA-ES: the diagonal model has n (not n^2/2) free parameters, so the
        # covariance learning rates can be ~(n+2)/3 times larger (Ros & Hansen 2008, eq. 4).
        scale = (nf + 2.0) / 3.0
        c1 = min(1.0, c1 * scale)
        c_mu = min(1.0 - c1, c_mu * scale)
    expectation_of_normal = float(np.sqrt(nf) * (1.0 - 1.0 / (4.0 * nf) + 1.0 / (21.0 * nf**2)))
    if config.eigen_update_every < 0:
        raise ValueError(f"eigen_update_every must be >= 0, got {config.eigen_update_every}")
    # 0 = auto: Hansen's lazy gap (pycma lazy_gap_evals in iteration units) — C moves
    # O(c1+c_mu) per iteration, so ~0.5/(n*(c1+c_mu)) iterations pass before the
    # factorization error reaches the adaptation noise floor (~3 for the flagship
    # n=300, pop=1000 shape).
    eigen_gap = config.eigen_update_every or max(1, int(0.5 / (nf * (c1 + c_mu))))
    # Initial per-coordinate sigma. Computed with numpy from the numpy bound fields — NOT
    # via the jnp-backed ``bounds.default_variance`` property, which becomes a tracer when
    # this factory runs inside a jitted step (MPCPolicy builds the solver per solve).
    sigma0 = np.tile(
        (np.asarray(bounds.upper, np.float32) - np.asarray(bounds.lower, np.float32))
        .reshape(-1) / 4.0, horizon
    )  # [n] — sqrt((range/4)^2) = range/4, the reference init sigma
    return types.SimpleNamespace(
        n=n, weights=w, mu_eff=mu_eff, nf=nf, c_sigma=c_sigma, d_sigma=d_sigma, cc=cc,
        c1=c1, c_mu=c_mu, expectation_of_normal=expectation_of_normal,
        eigen_gap=eigen_gap, sigma0=sigma0,
    )


def make_cma_es(config: CMAESConfig, bounds: Bounds, evaluate: TrajectoryEvaluator) -> Solver:
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    dim_u = bounds.dim
    k = config.num_elite
    C = cma_constants(config, bounds, horizon, pop, k)
    n, weights, mu_eff, nf = C.n, C.weights, C.mu_eff, C.nf
    c_sigma, d_sigma, cc, c1, c_mu = C.c_sigma, C.d_sigma, C.cc, C.c1, C.c_mu
    expectation_of_normal, eigen_gap, sigma0 = (
        C.expectation_of_normal, C.eigen_gap, C.sigma0,
    )
    diagonal = config.diagonal

    def init(key: jax.Array) -> CMAESState:
        del key
        # f32 always: with_state_dtype owns the storage dtype at the solver boundary
        # (solve's per-solve restart calls init and must stay in the f32 compute dtype).
        dt = jnp.float32
        mean = base.init_solution_mean(bounds, horizon, agents, dt).reshape(agents, n)
        var = base.init_solution_variance(bounds, horizon, agents, dt).reshape(agents, n)
        if diagonal:
            eye = jnp.ones((agents, n), dt)  # diag(C) = 1
        else:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=dt), (agents, n, n))
        return CMAESState(
            mean=mean,
            sigma=jnp.sqrt(var),
            cov=eye,
            p_sigma=jnp.zeros((agents, n), dt),
            p_cov=jnp.zeros((agents, n), dt),
            chol=eye,
            inv_sqrt=eye,
        )

    def solve(state: CMAESState, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t
        if not config.persist_across_solves:
            # Fresh adaptation state each solve; only the (already time-shifted) mean carries.
            fresh = init(jax.random.PRNGKey(0))
            state = fresh.replace(mean=state.mean)

        def iteration(i, carry):
            s, key, _ = carry
            key, z_key = jax.random.split(key)
            z = jax.random.normal(z_key, (agents, pop, n), s.mean.dtype)
            # y_i = L z_i ~ N(0, C) via the Cholesky factor. The reference samples through
            # the eigenbasis z (B D) (cma_es.py:139-141), but eigenvectors of matrices with
            # near-degenerate spectra are unstable (arbitrary sign, large rotations under fp
            # reduction-order perturbations), which breaks sharded==single-device parity.
            # The Cholesky factor is unique and Lipschitz-stable for PD matrices; the
            # sampling distribution is identical.
            if diagonal:
                y = z * s.chol[:, None, :]  # [A, P, n]: y_i ~ N(0, diag(C))
            else:
                y = jnp.einsum("apk,ank->apn", z, s.chol)
            flat_samples = s.mean[:, None, :] + s.sigma[:, None, :] * y  # [A, P, n]
            samples = jnp.swapaxes(flat_samples, 0, 1).reshape(pop, agents, horizon, dim_u)
            samples, penalty = base.bound_violation_penalty(samples, bounds)
            rewards = evaluate(obs, samples) - penalty  # [P, A]
            # Per-agent descending sort of the feasible flattened samples.
            order = jnp.argsort(-rewards.T, axis=1)  # [A, P]
            feasible_flat = jnp.swapaxes(samples.reshape(pop, agents, n), 0, 1)  # [A, P, n]
            x_sorted = jnp.take_along_axis(feasible_flat, order[:, :, None], axis=1)
            x_diff = x_sorted - s.mean[:, None, :]  # [A, P, n]
            x_mean = jnp.einsum("p,apn->an", weights, x_diff)
            new_mean = s.mean + x_mean
            # Step-size control (cma_es.py:166-175).
            y_mean = x_mean / s.sigma
            whitened = (
                s.inv_sqrt * y_mean if diagonal
                else jnp.einsum("aik,ak->ai", s.inv_sqrt, y_mean)
            )
            p_sigma = (1.0 - c_sigma) * s.p_sigma + jnp.sqrt(
                c_sigma * (2.0 - c_sigma) * mu_eff
            ) * whitened
            sigma = s.sigma * jnp.exp(
                (c_sigma / d_sigma)
                * (jnp.linalg.norm(p_sigma, axis=-1) / expectation_of_normal - 1.0)
            )[:, None]
            sigma = jnp.clip(sigma, config.sigma_floor * sigma0, config.sigma_ceil * sigma0)
            # Covariance adaptation (cma_es.py:177-190).
            if config.adaptive_h_sigma:
                # Hansen stall indicator from the freshly updated sigma path: under the
                # null (stationary selection) p_sigma's stationary norm is E||N(0,I)||
                # scaled by the warm-up factor sqrt(1-(1-c_sigma)^(2(g+1))); a path much
                # longer than that signals sigma is still catching up and the rank-one
                # update would imprint the (transient) path direction into C.
                warmup = 1.0 - (1.0 - c_sigma) ** (
                    2.0 * (s.gen.astype(jnp.float32) + 1.0)
                )
                h = (
                    jnp.linalg.norm(p_sigma, axis=-1) / jnp.sqrt(warmup)
                    < (1.4 + 2.0 / (nf + 1.0)) * expectation_of_normal
                ).astype(s.mean.dtype)[:, None]  # [A, 1]
                delta = (1.0 - h) * cc * (2.0 - cc)  # [A, 1] variance-loss correction
            else:
                h = config.h_sigma  # reference behavior: a constant (cma_es.py:10)
                delta = None
            p_cov = (1.0 - cc) * s.p_cov + h * jnp.sqrt(
                cc * (2.0 - cc) * mu_eff
            ) * y_mean
            y_unweighted = x_diff / s.sigma[:, None, :]
            if diagonal:
                # sep-CMA: only the diagonal of the rank-mu / rank-one updates — O(n).
                rank_mu_d = jnp.einsum("p,apn->an", weights, jnp.square(y_unweighted))
                rank_one_d = jnp.square(p_cov)
                if delta is not None:
                    rank_one_d = rank_one_d + delta * s.cov
                cov = (
                    (1.0 - c1 - c_mu) * s.cov
                    + c1 * rank_one_d
                    + c_mu * rank_mu_d
                )
                cov = jnp.maximum(cov, 1e-20)
                chol = jnp.sqrt(cov)
                inv_sqrt = 1.0 / chol
            else:
                rank_mu = jnp.einsum("p,apn,apm->anm", weights, y_unweighted, y_unweighted)
                rank_one = p_cov[:, :, None] * p_cov[:, None, :]
                if delta is not None:
                    rank_one = rank_one + delta[:, :, None] * s.cov
                cov = (
                    (1.0 - c1 - c_mu) * s.cov
                    + c1 * rank_one
                    + c_mu * rank_mu
                )
                cov = (cov + jnp.swapaxes(cov, -1, -2)) / 2.0

                def compute_factors(c):
                    # C^(-1/2) as a matrix function of C — invariant to the eigenbasis
                    # ambiguities (sign flips / degenerate rotations cancel in B f(D) B^T).
                    eigvals, eigvecs = jnp.linalg.eigh(c)
                    inv_sqrt = jnp.einsum(
                        "aij,aj,akj->aik",
                        eigvecs, 1.0 / jnp.sqrt(jnp.maximum(eigvals, 1e-20)), eigvecs,
                    )
                    # PD is preserved by construction (nonnegative recombination weights);
                    # the tiny jitter guards fp round-off at the PSD boundary so cholesky
                    # never NaNs.
                    return jnp.linalg.cholesky(c + 1e-10 * jnp.eye(n, dtype=c.dtype)), inv_sqrt

                if eigen_gap == 1:
                    chol, inv_sqrt = compute_factors(cov)
                else:
                    # Lazy refresh: the O(n^3) eigh/cholesky run only every eigen_gap
                    # iterations; in between, sampling/whitening use the previous factors
                    # (stale by O((c1+c_mu)*gap) relative change in C).
                    chol, inv_sqrt = jax.lax.cond(
                        i % eigen_gap == 0,
                        compute_factors,
                        lambda _: (s.chol, s.inv_sqrt),
                        cov,
                    )
            new_s = CMAESState(
                mean=new_mean,
                sigma=sigma,
                cov=cov,
                p_sigma=p_sigma,
                p_cov=p_cov,
                chol=chol,
                inv_sqrt=inv_sqrt,
                gen=s.gen + 1,
            )
            return new_s, key, jnp.max(rewards, axis=0)

        best0 = jnp.full((agents,), -jnp.inf, dtype=state.mean.dtype)
        state, _, best_reward = jax.lax.fori_loop(
            0, config.max_iterations, iteration, (state, key, best0)
        )
        plan = state.mean.reshape(agents, horizon, dim_u)
        action = plan[:, 0]
        if not config.persist_across_solves:
            shifted = base.shift_time(plan).reshape(agents, n)
            state = state.replace(mean=shifted)
        return action, state, SolverAux(expected_reward=best_reward, plan=plan)

    def reset(state: CMAESState, key: jax.Array) -> CMAESState:
        del state
        return init(key)

    return base.with_state_dtype(
        Solver(init=init, solve=solve, reset=reset, name="CMA-ES", plan_field="mean"), config.dtype
    )
