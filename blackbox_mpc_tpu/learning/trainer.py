"""Jitted dynamics-model training: optax Adam over (ensembles of) MLPs.

Counterpart of the reference's epoch loop with ``tf.GradientTape`` + Adam
(``/root/reference/blackbox_mpc/dynamics_handlers/system_dynamics_handler.py:245-298``). The
whole minibatch update — forward, MSE on normalized delta targets, backward, Adam — is one
jit-compiled ``train_step``; ensembles train all members in parallel inside the same step via
``vmap`` (independent gradients, elementwise Adam on the stacked params pytree).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from blackbox_mpc_tpu.models import transforms
from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
from blackbox_mpc_tpu.models.mlp import mlp_apply
from blackbox_mpc_tpu.models.normalizer import NormalizerStats

__all__ = ["TrainState", "make_trainer"]


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def make_trainer(
    config: LearnedDynamicsConfig,
    learning_rate: float = 1e-3,
    optimizer: Optional[optax.GradientTransformation] = None,
    mesh=None,
):
    """Returns ``(init, train_step, eval_step)``.

    * ``init(params) -> TrainState``
    * ``train_step(ts, stats, s, a, ns) -> (ts, member_losses [E])`` — batches shaped [E, B, .]
    * ``eval_step(params, stats, s, a, ns) -> member_losses [E]``

    The default Adam(1e-3) matches the reference (system_dynamics_handler.py:184, lr default
    in ``train``'s signature).
    """
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    mlp_cfg = config.mlp
    ensemble = config.ensemble_size
    learn_lv = config.probabilistic and getattr(config, "learn_logvar_bounds", False)
    transform = transforms.delta_transform if config.predict_delta else transforms.identity_transform

    def _member_loss(net, lv, stats: NormalizerStats, s, a, ns):
        target = transform(s, ns)
        if config.normalized:
            x = jnp.concatenate([stats.normalize_states(s), stats.normalize_actions(a)], axis=-1)
            target = stats.normalize_targets(target)
        else:
            x = jnp.concatenate([s, a], axis=-1)
        pred = mlp_apply(net, x, config=mlp_cfg)
        if config.probabilistic:
            # Gaussian NLL on (mean, logvar) head (PETS); logvar soft-bounded (against
            # the learnable per-dim bounds when learn_logvar_bounds=True).
            from blackbox_mpc_tpu.models.dynamics import bound_logvar

            mean, logvar = pred[..., : config.dim_s], pred[..., config.dim_s :]
            logvar = bound_logvar(logvar, *lv)
            inv_var = jnp.exp(-logvar)
            return jnp.mean(jnp.square(mean - target) * inv_var + logvar)
        return jnp.mean(jnp.square(pred - target))

    def _losses(params, stats, s, a, ns):
        if learn_lv:
            net, lv = params["net"], (params["lv_min"], params["lv_max"])
        else:
            net, lv = params, (None, None)
        if ensemble > 1:
            # lv bounds are SHARED across members (in_axes None) — every member's NLL
            # gradient flows into the one [S] pair.
            return jax.vmap(_member_loss, in_axes=(0, None, None, 0, 0, 0))(
                net, lv, stats, s, a, ns
            )
        return _member_loss(net, lv, stats, s[0], a[0], ns[0])[None]

    def _bound_regularizer(params):
        # PETS appendix A.1: a 0.01-weighted band penalty squeezes the admissible logvar
        # band tight around the data — THE term that un-sticks heads from the variance
        # ceiling (its gradient on the bounds never vanishes). PETS pairs the 0.01 with a
        # per-dim-SUMMED NLL; our member NLL is a per-dim MEAN (so val-loss histories
        # stay comparable across configs), so the band penalty uses the per-dim mean too
        # — the same relative weight as PETS at any state dimension.
        if not learn_lv:
            return 0.0
        return 0.01 * (jnp.mean(params["lv_max"]) - jnp.mean(params["lv_min"]))

    def init(params) -> TrainState:
        return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))

    def _shard_batch(s, a, ns):
        # Data-parallel training: shard the minibatch axis ([E, B, .] -> B) over the mesh's
        # "pop" axis; params/opt state stay replicated, XLA psums the gradients over ICI.
        if mesh is None:
            return s, a, ns
        from blackbox_mpc_tpu.parallel.sharding import shard_population

        return tuple(shard_population(mesh, x, axis=1) for x in (s, a, ns))

    @jax.jit
    def train_step(ts: TrainState, stats: NormalizerStats, s, a, ns) -> Tuple[TrainState, jax.Array]:
        s, a, ns = _shard_batch(s, a, ns)

        def total(params):
            losses = _losses(params, stats, s, a, ns)
            # Sum (not mean) keeps each member's gradient identical to training it alone.
            return jnp.sum(losses) + _bound_regularizer(params), losses

        (_, losses), grads = jax.value_and_grad(total, has_aux=True)(ts.params)
        updates, opt_state = opt.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=ts.step + 1), losses

    @jax.jit
    def eval_step(params, stats: NormalizerStats, s, a, ns) -> jax.Array:
        return _losses(params, stats, s, a, ns)

    return init, train_step, eval_step
