"""DynamicsHandler: the facade owning a dynamics model + replay + normalizer + trainer.

Counterpart of ``SystemDynamicsHandler``
(``/root/reference/blackbox_mpc/dynamics_handlers/system_dynamics_handler.py``), rebuilt around
explicit pytrees: the model/normalizer live in a :class:`DynamicsParams` the MPC policy threads
into its jitted solve, training is the jitted optax step from :mod:`~blackbox_mpc_tpu.learning.
trainer`, and checkpointing is an orbax snapshot of *everything* (params, optimizer state,
stats, replay, counters) — a superset of the reference's SavedModel + six ``.npy`` stat files
(``system_dynamics_handler.py:213-241``).
"""
from __future__ import annotations

import json
import logging
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_mpc_tpu.learning.replay import ReplayBuffer
from blackbox_mpc_tpu.learning.trainer import make_trainer
from blackbox_mpc_tpu.models.dynamics import (
    DynamicsParams,
    LearnedDynamicsConfig,
    make_learned_dynamics,
    true_model_dynamics,
)
from blackbox_mpc_tpu.models.normalizer import fit_normalizer

logger = logging.getLogger(__name__)

__all__ = ["DynamicsHandler", "CHECKPOINT_FORMAT_VERSION"]

# Training-checkpoint payload version (mirrors the `.bbmpc` serving artifacts' stamp,
# deploy/serving.py). 0 = pre-r5 unstamped; 1 = adds replay_keys manifest + this stamp.
CHECKPOINT_FORMAT_VERSION = 1


class DynamicsHandler:
    """Owns dynamics params + replay + training for learned models, or wraps a true model."""

    def __init__(
        self,
        config: Optional[LearnedDynamicsConfig] = None,
        true_model: Optional[Callable] = None,
        learning_rate: float = 1e-3,
        validation_fraction: float = 0.2,
        refit_normalizer: bool = False,
        replay_max_size: Optional[int] = None,
        metrics_writer=None,
        save_dir: Optional[str] = None,
        save_frequency: int = 1,
        seed: int = 0,
        mesh=None,
    ):
        """Exactly one of ``config`` (learned) / ``true_model`` (analytic) must be given.

        ``refit_normalizer=False`` reproduces the reference's freeze-after-first-train policy
        (system_dynamics_handler.py:193-198); ``True`` recomputes stats every ``train()``.
        """
        if (config is None) == (true_model is None):
            raise ValueError("provide exactly one of config= or true_model=")
        self._writer = metrics_writer
        self._save_dir = save_dir
        self._save_frequency = save_frequency
        self._train_calls = 0
        self._stats_fitted = False
        self._refit_normalizer = refit_normalizer

        if true_model is not None:
            self._is_true_model = True
            self._config = None
            self._dynamics_fn = true_model_dynamics(true_model)
            self._mean_dynamics_fn = self._dynamics_fn
            self._penalized_dynamics_fn = None
            self._params: Optional[DynamicsParams] = DynamicsParams(params=(), stats=())
            self._replay = None
            return

        self._is_true_model = False
        self._config = config
        init, self._dynamics_fn = make_learned_dynamics(config)
        if config.plan_uncertainty_penalty > 0:
            from blackbox_mpc_tpu.models.dynamics import make_penalized_dynamics

            self._penalized_dynamics_fn = make_penalized_dynamics(config)
        else:
            self._penalized_dynamics_fn = None
        if config.propagation in ("mean", "mm"):
            # mm with key=None returns the moment-matched mean == ensemble mean of means,
            # and has no batch-divisibility constraint, so it doubles as its own mean fn.
            self._mean_dynamics_fn = self._dynamics_fn
        else:
            # Posterior-mean variant (ensemble-averaged, head means) for diagnostics such
            # as the policy's one-step lookahead: member-partitioned propagation (ts1/
            # ts_inf) requires batch % ensemble == 0, which a [num_agents, S] probe batch
            # need not satisfy — and a *report* should not be a noise sample anyway.
            import dataclasses

            _, self._mean_dynamics_fn = make_learned_dynamics(
                dataclasses.replace(config, propagation="mean")
            )
        self._params = init(jax.random.PRNGKey(seed))
        self._replay = ReplayBuffer(
            config.dim_s,
            config.dim_u,
            validation_fraction=validation_fraction,
            max_size=replay_max_size,
            seed=seed,
        )
        self._trainer_init, self._train_step, self._eval_step = make_trainer(
            config, learning_rate=learning_rate, mesh=mesh
        )
        self._train_state = self._trainer_init(self._params.params)

    # ------------------------------------------------------------------ properties

    @property
    def is_true_model(self) -> bool:
        return self._is_true_model

    @property
    def config(self) -> Optional[LearnedDynamicsConfig]:
        return self._config

    @property
    def dynamics_fn(self) -> Callable:
        """``(DynamicsParams, state [B,S], action [B,U], key=None) -> next_state [B,S]``."""
        return self._dynamics_fn

    @property
    def mean_dynamics_fn(self) -> Callable:
        """Posterior-mean dynamics (ensemble-averaged, head means) for diagnostics; equals
        :attr:`dynamics_fn` unless propagation is member-partitioned (``ts1``/``ts_inf``)."""
        return self._mean_dynamics_fn

    @property
    def penalized_dynamics_fn(self) -> Optional[Callable]:
        """``(dp, state, action, key=None) -> (next_state, penalty [B])`` when the config
        sets ``plan_uncertainty_penalty > 0`` (pessimistic planning), else ``None``."""
        return self._penalized_dynamics_fn

    @property
    def dynamics_params(self) -> DynamicsParams:
        return self._params

    @property
    def replay(self) -> Optional[ReplayBuffer]:
        return self._replay

    # ------------------------------------------------------------------ prediction

    def predict(self, states, actions) -> jax.Array:
        """One-step posterior-mean prediction through the full normalize/denormalize chain
        (diagnostic path: batch need not divide the ensemble)."""
        return self._mean_dynamics_fn(
            self._params, jnp.asarray(states, jnp.float32), jnp.asarray(actions, jnp.float32)
        )

    def process_input(self, states, actions) -> jax.Array:
        """Normalized, concatenated network input (parity with
        ``SystemDynamicsHandler.process_input``, system_dynamics_handler.py:97-126)."""
        states = jnp.asarray(states, jnp.float32)
        actions = jnp.asarray(actions, jnp.float32)
        if self._is_true_model or self._config is None or not self._config.normalized:
            return jnp.concatenate([states, actions], axis=-1)
        stats = self._params.stats
        return jnp.concatenate(
            [stats.normalize_states(states), stats.normalize_actions(actions)], axis=-1
        )

    def process_output(self, states, raw_targets) -> jax.Array:
        """Next state from a raw network output (parity with
        ``SystemDynamicsHandler.process_output``, system_dynamics_handler.py:128-161)."""
        states = jnp.asarray(states, jnp.float32)
        raw_targets = jnp.asarray(raw_targets, jnp.float32)
        if not self._is_true_model and self._config is not None and self._config.normalized:
            raw_targets = self._params.stats.denormalize_targets(raw_targets)
        if self._is_true_model or self._config is None or self._config.predict_delta:
            return states + raw_targets
        return raw_targets

    # ------------------------------------------------------------------ training

    def train(
        self,
        observations=None,
        actions=None,
        *,
        epochs: int = 30,
        batch_size: int = 128,
        patience: Optional[int] = None,
    ) -> dict:
        """Appends rollouts to replay (if given) and runs ``epochs`` of minibatch Adam.

        ``observations``: sequence of [T+1, S] episode arrays (or [N, T+1, S]);
        ``actions``: matching [T, U] arrays. Returns a metrics dict (final train/val loss).
        Mirrors ``SystemDynamicsHandler.train`` (system_dynamics_handler.py:163-243).

        ``patience``: PETS-style per-member early stopping (Chua et al. 2018, absent in the
        reference). After each epoch the per-member validation loss is evaluated; each
        member's best weights are snapshotted independently, and training stops once
        ``patience`` consecutive epochs improve NO member. The PLANNING params
        (``dynamics_params``) are restored to the per-member bests; the optimizer state
        keeps training from the latest weights on the next ``train()`` call. ``None``
        (default) trains exactly ``epochs`` epochs (reference behavior).
        """
        if self._is_true_model:
            raise RuntimeError("cannot train a true-model handler")
        if observations is not None:
            self._replay.add_rollouts(observations, actions)
        if len(self._replay) == 0:
            raise RuntimeError("replay buffer is empty; collect rollouts first")

        if not self._stats_fitted or self._refit_normalizer:
            s, a, ns = self._replay.arrays(validation=False)
            targets = ns - s if self._config.predict_delta else ns
            stats = fit_normalizer(jnp.asarray(s), jnp.asarray(a), jnp.asarray(targets))
            self._params = self._params.replace(stats=stats)
            self._stats_fitted = True

        ensemble = self._config.ensemble_size
        stats = self._params.stats
        last_train = np.nan

        def val_member_losses(params):
            # Size-weighted mean over the deterministic full validation split ([E]).
            total, count = None, 0
            for s, a, ns in self._replay.minibatches(batch_size, ensemble, validation=True):
                v = np.atleast_1d(np.asarray(self._eval_step(params, stats, s, a, ns)))
                b = s.shape[1]
                total = v * b if total is None else total + v * b
                count += b
            return total / count if count else None

        if patience is not None and patience < 1:
            raise ValueError(
                f"patience must be >= 1 (got {patience}); pass None to disable "
                "early stopping"
            )
        track = patience is not None
        best_val = np.full(ensemble, np.inf)
        best_params = self._train_state.params
        stall = 0
        epochs_ran = 0
        for _ in range(epochs):
            losses = []
            for s, a, ns in self._replay.minibatches(batch_size, ensemble):
                self._train_state, member_losses = self._train_step(
                    self._train_state, stats, s, a, ns
                )
                losses.append(np.asarray(member_losses))
            if losses:
                last_train = float(np.mean(losses))
            epochs_ran += 1
            if track:
                member_val = val_member_losses(self._train_state.params)
                if member_val is None:
                    track = False  # no validation split — fall back to fixed epochs
                    continue
                # Relative improvement threshold (PETS uses 1%): magnitude-based so it
                # also behaves for negative NLL losses. First epoch (best == inf) always
                # counts for finite losses.
                # Two masks: ANY decrease snapshots that member's weights (the planning
                # params must be the true per-member bests); only a >=1% relative
                # decrease (PETS threshold; magnitude-based so negative NLL works)
                # resets the stall counter.
                better = member_val < best_val
                improved = np.where(
                    np.isinf(best_val),
                    np.isfinite(member_val),
                    (best_val - member_val) > 0.01 * np.maximum(np.abs(best_val), 1e-3),
                )
                if ensemble > 1:
                    sel = jnp.asarray(better)

                    def _pick(b, p):
                        return jnp.where(
                            sel.reshape((ensemble,) + (1,) * (p.ndim - 1)), p, b
                        )

                    cur = self._train_state.params
                    if isinstance(cur, dict) and "net" in cur:
                        # learn_logvar_bounds: member-select only the net stacks; the
                        # shared [S] bound pair has no member axis — carry the CURRENT
                        # bounds (they tighten monotonically under the regularizer).
                        best_params = {
                            "net": jax.tree.map(_pick, best_params["net"], cur["net"]),
                            "lv_min": cur["lv_min"],
                            "lv_max": cur["lv_max"],
                        }
                    else:
                        best_params = jax.tree.map(_pick, best_params, cur)
                elif better[0]:
                    best_params = self._train_state.params
                best_val = np.minimum(best_val, member_val)
                stall = 0 if improved.any() else stall + 1
                if stall >= patience:
                    break

        planning_params = best_params if track else self._train_state.params
        self._params = self._params.replace(params=planning_params)
        if track and np.isfinite(best_val).all():
            # The planning params ARE the per-member bests, so their validation loss is
            # exactly best_val — no extra sweep needed.
            final_val = best_val
        else:
            final_val = val_member_losses(self._params.params)
        val_loss = float(np.mean(final_val)) if final_val is not None else float("nan")
        self._train_calls += 1
        # Variance calibration of the probabilistic heads on the val split — the r5 PETS
        # study's gate metric (learning/calibration.py): drift away from ~1.0 is the
        # leading indicator of sampled-propagation failure in long runs.
        calibration = None
        if self._config.probabilistic:
            from blackbox_mpc_tpu.learning.calibration import calibration_summary

            cal = calibration_summary(self)
            if cal is not None:
                calibration = cal["variance_ratio"]
        if self._writer is not None:
            self._writer.scalar("system_model/train_loss", last_train, self._train_calls)
            self._writer.scalar("system_model/val_loss", val_loss, self._train_calls)
            if calibration is not None:
                self._writer.scalar(
                    "system_model/val_calibration_ratio", calibration, self._train_calls
                )
        logger.info(
            "dynamics train call %d: train_loss=%.5f val_loss=%.5f (replay: %d train / %d val)",
            self._train_calls, last_train, val_loss, self._replay.num_train, self._replay.num_val,
        )
        if self._save_dir is not None and self._train_calls % self._save_frequency == 0:
            self.save(self._save_dir)
        metrics = {
            "train_loss": last_train,
            "val_loss": val_loss,
            "replay_size": len(self._replay),
            "train_calls": self._train_calls,
            "epochs_ran": epochs_ran,
        }
        if calibration is not None:
            metrics["val_calibration_ratio"] = calibration
        return metrics

    # ------------------------------------------------------------------ checkpointing

    def save(self, directory: str) -> None:
        """Orbax checkpoint of params, optimizer state, stats, replay, and counters."""
        if self._is_true_model:
            raise RuntimeError("true-model handler has nothing to save")
        import orbax.checkpoint as ocp

        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        cfg = {k: v for k, v in self._config.__dict__.items() if k != "compute_dtype"}
        cfg["compute_dtype"] = jnp.dtype(self._config.compute_dtype).name
        replay_state = self._replay.state_dict()
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(
                {
                    # Version stamp + the saved replay-key manifest: load() restores
                    # against exactly these keys instead of introspecting the orbax
                    # checkpoint's internal metadata tree (an unstable API surface).
                    "format_version": CHECKPOINT_FORMAT_VERSION,
                    "replay_keys": sorted(replay_state.keys()),
                    "config": cfg,
                    "train_calls": self._train_calls,
                    "stats_fitted": self._stats_fitted,
                },
                f,
            )
        payload = {
            "params": self._train_state.params,
            "opt_state": self._train_state.opt_state,
            "step": self._train_state.step,
            "stats": self._params.stats,
            "replay": replay_state,
        }
        ckpt_dir = os.path.join(directory, "checkpoint")
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(ckpt_dir, payload, force=True)
        logger.info("saved dynamics checkpoint to %s", directory)

    @classmethod
    def load(cls, directory: str, **kwargs) -> "DynamicsHandler":
        """Restores a handler saved with :meth:`save` (model + stats + replay + counters)."""
        import orbax.checkpoint as ocp

        directory = os.path.abspath(directory)
        with open(os.path.join(directory, "config.json")) as f:
            meta = json.load(f)
        version = int(meta.get("format_version", 0))  # pre-r5 checkpoints are unstamped
        if version > CHECKPOINT_FORMAT_VERSION:
            raise ValueError(
                f"checkpoint {directory} has format_version={version}, newer than this "
                f"build supports ({CHECKPOINT_FORMAT_VERSION}); upgrade blackbox_mpc_tpu"
            )
        cfg_dict = dict(meta["config"])
        cfg_dict["hidden"] = tuple(cfg_dict["hidden"])
        cfg_dict["compute_dtype"] = jnp.dtype(cfg_dict["compute_dtype"])
        config = LearnedDynamicsConfig(**cfg_dict)
        handler = cls(config=config, **kwargs)
        ckptr = ocp.PyTreeCheckpointer()
        template = {
            "params": handler._train_state.params,
            "opt_state": handler._train_state.opt_state,
            "step": handler._train_state.step,
            "stats": handler._params.stats,
            "replay": handler._replay.state_dict(),
        }
        ckpt_path = os.path.join(directory, "checkpoint")
        # The restore template must match the saved structure exactly; pre-round-2
        # checkpoints lack replay["rng"] (added later for resume bit-reproducibility),
        # so trim template keys the checkpoint doesn't have — load_state_dict treats a
        # missing "rng" as "keep the fresh stream". Stamped checkpoints carry the saved
        # key list in config.json; unstamped (pre-r5) ones are probed by attempting the
        # full template and retrying without "rng" on a structure mismatch — no
        # dependence on orbax's internal metadata tree either way.
        def _restore(tmpl):
            # Restore every leaf as a HOST numpy array: orbax records the saving
            # device's sharding ("TPU v5 lite0") in the checkpoint, and restoring
            # as jax.Array on a host without that device kind fails — numpy-typed
            # restore makes checkpoints device-portable (train on TPU, load anywhere).
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tmpl
            )
            return ckptr.restore(ckpt_path, item=tmpl, restore_args=restore_args)

        replay_keys = meta.get("replay_keys")
        if replay_keys is not None:
            template["replay"] = {
                k: v for k, v in template["replay"].items() if k in replay_keys
            }
            restored = _restore(template)
        else:
            try:
                restored = _restore(template)
            except Exception:
                template["replay"] = {
                    k: v for k, v in template["replay"].items() if k != "rng"
                }
                restored = _restore(template)
        handler._train_state = handler._trainer_init(restored["params"])
        handler._train_state = handler._train_state.replace(
            opt_state=restored["opt_state"], step=restored["step"]
        )
        handler._params = DynamicsParams(params=restored["params"], stats=restored["stats"])
        handler._replay.load_state_dict(restored["replay"])
        handler._train_calls = int(meta["train_calls"])
        handler._stats_fitted = bool(meta["stats_fitted"])
        logger.info("restored dynamics checkpoint from %s", directory)
        return handler
