"""POPLIN-style amortized plan proposer: a policy network that seeds the trajectory solver.

No reference counterpart (the reference plans from the action-space midpoint every solve,
``/root/reference/blackbox_mpc/optimizers/cem.py:55-63``). Following the POPLIN lineage
(Wang & Ba, 2020 — policy networks for model-predictive control), a small MLP
``obs -> action`` is behavior-cloned on the MPC's own replayed (state, action) pairs; at
solve time it is unrolled through the posterior-mean dynamics for the planning horizon to
produce an informed initial plan, which replaces the solver's carried mean. The solver then
refines from a policy-shaped starting point instead of the midpoint, and the trained
proposer doubles as a distilled reactive policy (``act``).

TPU notes: the proposer's parameters are threaded through the policy's jitted step as
arguments (never closed over — device-array closure constants are pathological on remote
frontends, see ``core/types.py`` Bounds docstring); the horizon unroll is a ``lax.scan``
fused into the same program as the solve.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.models.mlp import MLPConfig, mlp_apply, mlp_init

__all__ = ["ProposerConfig", "PolicyProposer", "make_plan_proposal_fn"]


@dataclasses.dataclass(frozen=True)
class ProposerConfig:
    dim_s: int
    dim_u: int
    hidden: Sequence[int] = (64, 64)
    activation: str = "tanh"
    learning_rate: float = 1e-3


def make_proposer_apply(config: ProposerConfig, bounds: Bounds) -> Callable:
    """Pure ``(params, obs [B,S]) -> action [B,U]`` squashed into the action bounds."""
    mlp_cfg = MLPConfig(
        in_dim=config.dim_s, out_dim=config.dim_u,
        hidden=tuple(config.hidden), activation=config.activation,
    )
    mid = np.asarray((bounds.lower + bounds.upper) / 2.0)
    half = np.asarray((bounds.upper - bounds.lower) / 2.0)

    def apply(params, obs: jax.Array) -> jax.Array:
        return mid + half * jnp.tanh(mlp_apply(params, obs, config=mlp_cfg))

    return apply


def make_plan_proposal_fn(
    config: ProposerConfig, bounds: Bounds, mean_dynamics_fn: Callable, horizon: int
) -> Callable:
    """Pure ``(proposer_params, dynamics_params, obs [A,S]) -> plan [A,H,U]``.

    Unrolls the policy net through the posterior-mean dynamics — the planning-time analogue
    of the rollout evaluator's scan, but over a single (per-agent) trajectory.
    """
    apply = make_proposer_apply(config, bounds)

    def propose(proposer_params, dynamics_params, obs: jax.Array) -> jax.Array:
        def step(s, _):
            a = apply(proposer_params, s)
            return mean_dynamics_fn(dynamics_params, s, a), a

        _, actions = jax.lax.scan(step, obs, None, length=horizon)  # [H, A, U]
        return jnp.swapaxes(actions, 0, 1)  # [A, H, U]

    return propose


class PolicyProposer:
    """Stateful wrapper: params + Adam state + jitted behavior-cloning train step."""

    def __init__(self, config: ProposerConfig, bounds: Bounds, seed: int = 0):
        self.config = config
        self.bounds = bounds
        self._apply = make_proposer_apply(config, bounds)
        mlp_cfg = MLPConfig(
            in_dim=config.dim_s, out_dim=config.dim_u,
            hidden=tuple(config.hidden), activation=config.activation,
        )
        self.params = mlp_init(jax.random.PRNGKey(seed), mlp_cfg)
        self._opt = optax.adam(config.learning_rate)
        self._opt_state = self._opt.init(self.params)
        self._rng = np.random.default_rng(seed)

        def train_step(params, opt_state, obs, target_actions):
            def loss_fn(p):
                return jnp.mean(jnp.square(self._apply(p, obs) - target_actions))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self._opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = jax.jit(train_step)

    def act(self, observations) -> np.ndarray:
        """The distilled reactive policy: one forward pass, no planning."""
        obs = jnp.asarray(np.atleast_2d(np.asarray(observations, np.float32)))
        return np.asarray(self._apply(self.params, obs))

    def train(self, replay, epochs: int = 20, batch_size: int = 256) -> dict:
        """Behavior cloning on the replay's (state, action) pairs (the MPC's own actions).

        Targets are clipped to bounds (exploration noise can exceed them); tanh squashing
        means exact saturation is unreachable, which regularizes toward the interior.
        """
        states, actions, _ = replay.arrays(validation=False)
        n = states.shape[0]
        if n == 0:
            return {"bc_loss": float("nan"), "num_pairs": 0}
        actions = np.clip(actions, self.bounds.lower, self.bounds.upper)
        batch_size = min(batch_size, n)
        loss = float("nan")
        for _ in range(epochs):
            order = self._rng.permutation(n)
            for start in range(0, n - batch_size + 1, batch_size):
                idx = order[start : start + batch_size]
                self.params, self._opt_state, loss_arr = self._train_step(
                    self.params, self._opt_state,
                    jnp.asarray(states[idx]), jnp.asarray(actions[idx]),
                )
            loss = float(loss_arr)
        return {"bc_loss": loss, "num_pairs": int(n)}

    # --- checkpointing (mirrors DynamicsHandler's pytree-state convention) ---

    def state_dict(self) -> dict:
        return {
            "params": jax.tree.map(np.asarray, self.params),
            "opt_state": jax.tree.map(np.asarray, self._opt_state),
        }

    def load_state_dict(self, state: dict) -> None:
        self.params = jax.tree.map(jnp.asarray, state["params"])
        self._opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
