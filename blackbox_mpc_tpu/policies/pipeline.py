"""Depth-1 speculative MPC pipelining: hide solve + readback latency behind env stepping.

The reference control loop is strictly sequential — ``policy.act`` blocks, then ``env.step``
blocks (``/root/reference/blackbox_mpc/utils/rollouts.py:91-102``;
``subprocess_env.py:185-194``). Here the policy's one-step lookahead already predicts the next
observation (the ``next_obs`` output of the jitted step), so while the real environment is
stepping we can *speculatively* solve step ``t+1`` from that prediction and start the
device->host copy of its action. When the real observation arrives within ``spec_tol`` of the
prediction, the speculative action is adopted — its readback overlapped with the env step; on
a miss the solver re-runs from the true observation with the SAME per-step PRNG key, so a
miss is bit-identical to never having speculated.

On a tunneled TPU frontend (device->host readback ~40 ms, see docs/performance.md) this hides
``min(T_env, RTT + solve)`` per control step: the win grows with env cost and is bounded by
the solve+readback latency. The speculation changes the executed action only on accepted
steps, by at most the solver's sensitivity to a ``spec_tol``-sized observation perturbation;
``spec_tol=0`` (never accept) recovers the synchronous semantics exactly.

Used by ``workflows.perform_rollouts(overlap=True)`` via the env's ``step_async``/``step_wait``
split (the reference's SubprocVecEnv has no async API at all).
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["SpeculativePipeline"]


class SpeculativePipeline:
    """Wraps an :class:`~blackbox_mpc_tpu.policies.mpc_policy.MPCPolicy` with depth-1
    speculative execution.

    Usage (the pattern ``perform_rollouts(overlap=True)`` runs)::

        pipe = SpeculativePipeline(policy, spec_tol=0.05)
        pipe.reset()
        obs = env.reset()
        for t in range(T):
            action, pred_next, pred_reward, hit = pipe.act(obs, t)
            env.step_async(action)          # env steps while the t+1 speculation's
            obs, reward, done, _ = env.step_wait()  # ... readback is in flight

    ``spec_tol``: max-abs observation mismatch below which the speculative action is
    adopted. ``None`` disables acceptance (pure prefetch mode — the speculative dispatch
    still warms the device pipeline but every step re-solves exactly).
    """

    def __init__(self, policy, spec_tol: Optional[float] = 0.05,
                 exploration_noise: bool = False):
        # The pipeline drives the policy's jitted step and device-resident state
        # directly (_dispatch below) — it needs a live MPCPolicy, not just anything
        # passing the ModelBasedPolicy isinstance gate (e.g. a loaded
        # deploy.ServingPolicy, which is a virtual subclass with none of these).
        required = ("_step", "_solver_state", "_handler", "_proposer_params_arg")
        missing = [a for a in required if not hasattr(policy, a)]
        if missing:
            raise TypeError(
                f"SpeculativePipeline (perform_rollouts overlap=True) requires a live "
                f"MPCPolicy; {type(policy).__name__} lacks {missing}. Served artifacts "
                f"(ServingPolicy) do not support speculative overlap."
            )
        self._policy = policy
        self._spec_tol = spec_tol
        self._noise = bool(exploration_noise)
        self._spec = None  # (t, action, new_state, next_obs, pred_reward) device handles
        self.hits = 0
        self.misses = 0

    # ------------------------------------------------------------------ internals

    def _step_key(self, t: int) -> jax.Array:
        # Deterministic per-step key: the speculative solve of step t and an exact re-solve
        # of step t consume the SAME randomness, so a miss is bit-identical to a
        # never-speculated run (and accept/reject cannot bias the sampling).
        return jax.random.fold_in(self._ep_key, t)

    def _dispatch(self, obs_dev, t: int):
        """Runs the policy's jitted step; returns device handles (no sync)."""
        p = self._policy
        action, new_state, aux, next_obs, pred_reward = p._step(
            p._solver_state, p._handler.dynamics_params, p._proposer_params_arg(),
            obs_dev, jnp.asarray(t, jnp.int32), self._step_key(t), self._noise,
        )
        del aux
        return action, new_state, next_obs, pred_reward

    @staticmethod
    def _start_host_copy(*arrays):
        for a in arrays:
            try:
                a.copy_to_host_async()
            except AttributeError:  # non-jax array (already host)
                pass

    # ------------------------------------------------------------------ public API

    def reset(self) -> None:
        self._policy.reset()
        p = self._policy
        p._key, self._ep_key = jax.random.split(p._key)
        self._spec = None

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0

    def act(self, observations, t: int = 0):
        """Returns ``(action, pred_next, pred_reward, speculation_hit)`` — host arrays.

        Accepts batched ``[num_agents, S]`` (or unbatched ``[S]``) observations like
        ``MPCPolicy.act``; after returning, the next step's speculative solve is in flight.
        """
        p = self._policy
        obs = np.asarray(observations, dtype=np.float32)
        batched = obs.ndim > 1
        if not batched:
            obs = np.tile(obs[None], (p._num_agents, 1))
        if obs.shape[0] != p._num_agents:
            # Same early validation as MPCPolicy.act — without it a size mismatch
            # surfaces as an opaque jit shape error inside the solver.
            raise ValueError(
                f"observations batch {obs.shape[0]} != num_agents {p._num_agents}"
            )

        hit = False
        had_spec = self._spec is not None and self._spec[0] == t and self._spec_tol is not None
        if had_spec:
            s_action, s_state, s_next, s_pred_r, s_obs_pred = self._spec[1:]
            # The prediction the speculation was based on was already copied to host
            # during the env step; this sync is (close to) free.
            mismatch = float(np.max(np.abs(np.asarray(s_obs_pred) - obs)))
            if mismatch <= self._spec_tol:
                hit = True
                action, new_state, next_obs, pred_reward = s_action, s_state, s_next, s_pred_r
        if not hit:
            obs_dev = jnp.asarray(obs)
            action, new_state, next_obs, pred_reward = self._dispatch(obs_dev, t)
        self._spec = None
        if had_spec:
            # Steps with no speculation in flight (the first act of every episode) can
            # neither hit nor miss — counting them as misses would bias hit_rate down.
            self.hits += hit
            self.misses += not hit

        # Commit solver state, then speculate on step t+1 from the (device-resident)
        # predicted next observation and start the async device->host copies — these
        # overlap the caller's env.step.
        p._solver_state = new_state
        spec = self._dispatch(next_obs, t + 1)
        self._start_host_copy(spec[0], spec[3], next_obs)
        self._spec = (t + 1, *spec, next_obs)

        action, next_obs, pred_reward = jax.device_get((action, next_obs, pred_reward))
        p._act_counter += 1
        if p._writer is not None:
            # Keep the reference-parity per-step scalar flowing in overlap mode too
            # (MPCPolicy.act emits it on the non-overlap path).
            p._writer.scalar(
                "rewards/predicted_reward", float(np.mean(pred_reward)), p._act_counter
            )
        if batched:
            return action, next_obs, pred_reward, hit
        return action[0], next_obs[0], pred_reward[0], hit
