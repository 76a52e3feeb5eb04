"""PI2 / path-integral (MPPI-style) trajectory solver.

Pure-functional rebuild of ``PI2Optimizer``
(``/root/reference/blackbox_mpc/optimizers/pi2.py:58-96``): sample a truncated-normal population
around the running mean with *static* variance (never adapted, ``pi2.py:50-55``), clip to bounds
with a squared-violation penalty, turn rewards into costs, and softmax-weight the samples with
temperature ``lamda`` against the per-agent best cost baseline. Warm-starts by time-shifting the
solution (``pi2.py:92-93``). The softmax here is the numerically identical
exp(-(cost-beta)/lambda)/eta form computed per agent in one batched reduction.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from blackbox_mpc_tpu.core.types import Bounds, Solver, SolverAux, TrajectoryEvaluator, truncated_normal
from blackbox_mpc_tpu.solvers import base

__all__ = ["MPPIConfig", "PI2Config", "PI2State", "make_pi2"]


@dataclasses.dataclass(frozen=True)
class PI2Config(base.SolverConfig):
    lamda: float = 1.0  # energy temperature (reference pi2.py:11)
    # iCEM-style colored noise exponent; 0.0 = white truncated normal (reference behavior).
    colored_noise_beta: float = 0.0
    # PI2-CMA (Stulp & Sigaud 2012; "Path Integral Policy Improvement with Covariance
    # Matrix Adaptation", arxiv 1206.4621 — see PAPERS.md): adapt the per-coordinate
    # sampling variance across iterations as the softmax-weighted empirical variance of the
    # population. The reference never adapts variance (pi2.py:50-55); off by default for
    # parity. Variance restarts fresh each solve; the floor (as a fraction of the initial
    # variance) prevents premature collapse.
    adapt_variance: bool = False
    variance_floor_frac: float = 0.01
    # MPPI (Williams et al. 2017, "Information Theoretic MPC for Model-Based RL"): add the
    # control-affine exploration cost lambda * sum_t u_t^T Sigma^-1 eps_t to each sample's
    # cost before the softmax, where u is the nominal (carried) mean, eps the sampled
    # perturbation, and Sigma the (diagonal) sampling covariance. This is what separates
    # information-theoretic MPPI from plain reward-weighted PI2: perturbations aligned with
    # an already-large nominal control are charged for the control energy they add. Off by
    # default (reference PI2 parity); the "MPPI" registry name turns it on.
    control_cost: bool = False
    # Time-major candidate layout ([H, P, A, U]; pair with a time_major=True evaluator):
    # the horizon scan consumes candidates with no relayout — see CEMConfig.time_major
    # (solvers/cem.py) for the measured win and the caveats (same distribution; truncated
    # normals get a different RNG element association, colored noise draws the identical
    # spectrum in both layouts).
    time_major: bool = False


@dataclasses.dataclass(frozen=True)
class MPPIConfig(PI2Config):
    """The ``"MPPI"`` registry entry: PI2 with the information-theoretic control cost on.

    Same state/update machinery (one softmax-weighted batched reduction); only the cost
    definition differs. Registered separately so users find the canonical name and so
    ``switch_solver`` carries the right default.
    """

    control_cost: bool = True


@struct.dataclass
class PI2State:
    mean: jax.Array  # [A, H, U]


def make_pi2(config: PI2Config, bounds: Bounds, evaluate: TrajectoryEvaluator) -> Solver:
    horizon, agents, pop = config.planning_horizon, config.num_agents, config.population
    lamda = config.lamda
    tm = config.time_major

    def init(key: jax.Array) -> PI2State:
        del key
        return PI2State(mean=base.init_solution_mean(bounds, horizon, agents))

    def solve(state: PI2State, obs: jax.Array, t: jax.Array, key: jax.Array):
        del t
        variance0 = base.init_solution_variance(bounds, horizon, agents)

        def iteration(_, carry):
            mean, variance, key, _ = carry
            stddev = jnp.sqrt(variance)
            key, sample_key = jax.random.split(key)
            if tm:
                # [H, 1, A, U] broadcast anchors (tiny transposes of the [A, H, U] state).
                mean_t = jnp.transpose(mean, (1, 0, 2))[:, None]
                std_t = jnp.transpose(stddev, (1, 0, 2))[:, None]
                if config.colored_noise_beta > 0.0:
                    z = base.colored_noise_time_major(
                        sample_key, config.colored_noise_beta,
                        (horizon, pop, agents, bounds.dim),
                    )
                    samples = mean_t + std_t * z
                else:
                    samples = truncated_normal(
                        sample_key, mean_t, std_t, (horizon, pop, agents, bounds.dim)
                    )
            elif config.colored_noise_beta > 0.0:
                z = base.colored_noise(
                    sample_key, config.colored_noise_beta,
                    (pop, agents, horizon, bounds.dim),
                )
                samples = mean + stddev * z
            else:
                samples = truncated_normal(
                    sample_key, mean, stddev, (pop, agents, horizon, bounds.dim)
                )
            samples, penalty = base.bound_violation_penalty(samples, bounds, time_major=tm)
            rewards = evaluate(obs, samples) - penalty  # [P, A]
            costs = -rewards
            if config.control_cost:
                # MPPI exploration cost on the post-clip (actually applied) perturbation.
                if tm:
                    eps = samples - jnp.transpose(mean, (1, 0, 2))[:, None]
                    costs = costs + lamda * jnp.einsum(
                        "hau,hpau->pa", jnp.transpose(mean / variance, (1, 0, 2)), eps
                    )
                else:
                    eps = samples - mean[None]
                    costs = costs + lamda * jnp.einsum(
                        "ahu,pahu->pa", mean / variance, eps
                    )
            beta = jnp.min(costs, axis=0, keepdims=True)  # [1, A]
            prob = jnp.exp(-(costs - beta) / lamda)
            omega = prob / jnp.sum(prob, axis=0, keepdims=True)  # [P, A]
            if tm:
                # Weighted moments as multiply+reduce over the population axis (axis 1) —
                # same rationale as the CEM time-major moments (solvers/cem.py).
                w = omega[None, :, :, None]  # [1, P, A, 1]
                new_mean_t = jnp.sum(w * samples, axis=1)  # [H, A, U]
                new_mean = jnp.transpose(new_mean_t, (1, 0, 2))
                if config.adapt_variance:
                    dev = samples - new_mean_t[:, None]
                    new_var = jnp.transpose(
                        jnp.sum(w * jnp.square(dev), axis=1), (1, 0, 2)
                    )
                    variance = jnp.maximum(
                        new_var, config.variance_floor_frac * variance0
                    )
                return new_mean, variance, key, jnp.max(rewards, axis=0)
            new_mean = jnp.einsum("pa,pahu->ahu", omega, samples)
            if config.adapt_variance:
                # PI2-CMA diagonal update: weighted empirical variance about the new mean.
                dev = samples - new_mean[None]
                new_var = jnp.einsum("pa,pahu->ahu", omega, jnp.square(dev))
                variance = jnp.maximum(new_var, config.variance_floor_frac * variance0)
            return new_mean, variance, key, jnp.max(rewards, axis=0)

        best0 = jnp.full((agents,), -jnp.inf, dtype=state.mean.dtype)
        mean, _, _, best_reward = jax.lax.fori_loop(
            0, config.max_iterations, iteration, (state.mean, variance0, key, best0)
        )
        action = mean[:, 0]
        next_state = PI2State(mean=base.shift_time(mean))
        return action, next_state, SolverAux(expected_reward=best_reward, plan=mean)

    def reset(state: PI2State, key: jax.Array) -> PI2State:
        del state
        return init(key)

    name = "MPPI" if config.control_cost else "PI2"
    return base.with_state_dtype(
        Solver(init=init, solve=solve, reset=reset, name=name, plan_field="mean"), config.dtype
    )
