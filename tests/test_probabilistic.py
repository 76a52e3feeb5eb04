"""Probabilistic (Gaussian-head) ensemble dynamics tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.learning import DynamicsHandler
from blackbox_mpc_tpu.models import LearnedDynamicsConfig, make_learned_dynamics, pendulum_dynamics


def _pendulum_transitions(n, seed=0):
    rng = np.random.default_rng(seed)
    th = rng.uniform(-np.pi, np.pi, n)
    s = np.stack([np.cos(th), np.sin(th), rng.uniform(-8, 8, n)], axis=-1).astype(np.float32)
    a = rng.uniform(-2, 2, (n, 1)).astype(np.float32)
    ns = np.asarray(pendulum_dynamics(jnp.asarray(s), jnp.asarray(a)))
    return s, a, ns


def test_probabilistic_head_shapes():
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,), probabilistic=True)
    assert cfg.mlp.out_dim == 6
    init, dyn = make_learned_dynamics(cfg)
    dp = init(jax.random.PRNGKey(0))
    out = dyn(dp, jnp.zeros((4, 3)), jnp.zeros((4, 1)))
    assert out.shape == (4, 3)  # planning path returns mean next states


@pytest.mark.parametrize("ensemble", [1, 3])
def test_probabilistic_handler_learns(ensemble):
    cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=1, hidden=(64, 64), ensemble_size=ensemble, probabilistic=True
    )
    handler = DynamicsHandler(config=cfg, seed=0, learning_rate=5e-3)
    s, a, ns = _pendulum_transitions(2000)
    handler.replay.add_transitions(s, a, ns)
    metrics = handler.train(epochs=40, batch_size=128)
    assert np.isfinite(metrics["val_loss"])
    s2, a2, ns2 = _pendulum_transitions(200, seed=1)
    pred = np.asarray(handler.predict(s2, a2))
    err = np.abs(pred - ns2).mean()
    assert err < 0.2, err  # NLL-trained means stay accurate


def test_pallas_rejects_probabilistic():
    from blackbox_mpc_tpu.ops import make_pallas_rollout_evaluator

    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, probabilistic=True)
    with pytest.raises(ValueError, match="probabilistic"):
        make_pallas_rollout_evaluator(cfg, lambda s, a, ns: jnp.zeros(s.shape[0]))
