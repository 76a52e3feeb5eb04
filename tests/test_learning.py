"""Tests for the learned-dynamics stack: MLP, normalizer, replay, trainer, handler."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.learning import DynamicsHandler, ReplayBuffer
from blackbox_mpc_tpu.models import (
    LearnedDynamicsConfig,
    MLPConfig,
    fit_normalizer,
    make_learned_dynamics,
    mlp_apply,
    mlp_init,
    pendulum_dynamics,
)


def _pendulum_transitions(n, seed=0):
    rng = np.random.default_rng(seed)
    s = np.stack(
        [
            np.cos(th := rng.uniform(-np.pi, np.pi, n)),
            np.sin(th),
            rng.uniform(-8, 8, n),
        ],
        axis=-1,
    ).astype(np.float32)
    a = rng.uniform(-2, 2, (n, 1)).astype(np.float32)
    ns = np.asarray(pendulum_dynamics(jnp.asarray(s), jnp.asarray(a)))
    return s, a, ns


def test_mlp_shapes_and_determinism():
    cfg = MLPConfig(in_dim=4, out_dim=3, hidden=(16, 16))
    params = mlp_init(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((5, 4))
    y = mlp_apply(params, x, config=cfg)
    assert y.shape == (5, 3)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(mlp_apply(params, x, config=cfg)))


def test_normalizer_roundtrip(rng):
    s = rng.normal(3.0, 2.0, (100, 3)).astype(np.float32)
    a = rng.normal(-1.0, 0.5, (100, 1)).astype(np.float32)
    t = rng.normal(0.0, 4.0, (100, 3)).astype(np.float32)
    stats = fit_normalizer(jnp.asarray(s), jnp.asarray(a), jnp.asarray(t))
    normed = stats.normalize_targets(jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(normed).mean(axis=0), 0.0, atol=1e-5)
    back = stats.denormalize_targets(normed)
    np.testing.assert_allclose(np.asarray(back), t, rtol=1e-4, atol=1e-4)


def test_replay_split_and_minibatches():
    buf = ReplayBuffer(3, 1, validation_fraction=0.25, seed=0)
    s, a, ns = _pendulum_transitions(400)
    buf.add_transitions(s, a, ns)
    assert len(buf) == 400
    assert 50 < buf.num_val < 150
    batches = list(buf.minibatches(32, ensemble_size=2))
    assert batches[0][0].shape == (2, 32, 3)
    # bootstrap: member orderings differ
    assert not np.array_equal(batches[0][0][0], batches[0][0][1])


def test_replay_rollout_ingestion():
    buf = ReplayBuffer(3, 1)
    obs = [np.zeros((11, 3)), np.ones((11, 3))]
    acts = [np.zeros((10, 1)), np.ones((10, 1))]
    buf.add_rollouts(obs, acts)
    assert len(buf) == 20


@pytest.mark.parametrize("ensemble", [1, 3])
def test_handler_learns_pendulum(ensemble):
    cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=1, hidden=(64, 64), ensemble_size=ensemble,
        propagation="mean" if ensemble > 1 else "mean",
    )
    handler = DynamicsHandler(config=cfg, seed=0, learning_rate=5e-3)
    s, a, ns = _pendulum_transitions(2000)
    handler.replay.add_transitions(s, a, ns)
    metrics = handler.train(epochs=40, batch_size=128)
    assert np.isfinite(metrics["val_loss"])
    assert metrics["val_loss"] < 0.05, metrics
    # one-step prediction accuracy on fresh data
    s2, a2, ns2 = _pendulum_transitions(100, seed=1)
    pred = np.asarray(handler.predict(s2, a2))
    err = np.abs(pred - ns2).mean()
    assert err < 0.2, err


def test_ts1_propagation_partitions_batch():
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, ensemble_size=2, propagation="ts1")
    init, dyn = make_learned_dynamics(cfg)
    dp = init(jax.random.PRNGKey(0))
    s = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (4, 1))
    a = jnp.zeros((4, 1))
    out = np.asarray(dyn(dp, s, a))
    # Rows assigned the same member (balanced static shuffle, ts_member_ids) agree;
    # rows assigned different members differ.
    from blackbox_mpc_tpu.models.dynamics import ts_member_ids

    ids = ts_member_ids(4, 2)
    (m0,) = np.nonzero(ids == 0)
    (m1,) = np.nonzero(ids == 1)
    assert len(m0) == len(m1) == 2  # balanced
    np.testing.assert_allclose(out[m0[0]], out[m0[1]], rtol=1e-5)
    np.testing.assert_allclose(out[m1[0]], out[m1[1]], rtol=1e-5)
    assert not np.allclose(out[m0[0]], out[m1[0]])


def test_handler_checkpoint_roundtrip(tmp_path):
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,), ensemble_size=2)
    handler = DynamicsHandler(config=cfg, seed=0)
    s, a, ns = _pendulum_transitions(300)
    handler.replay.add_transitions(s, a, ns)
    handler.train(epochs=2, batch_size=64)
    pred_before = np.asarray(handler.predict(s[:10], a[:10]))
    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    handler.save(ckpt_dir)
    restored = DynamicsHandler.load(ckpt_dir)
    pred_after = np.asarray(restored.predict(s[:10], a[:10]))
    np.testing.assert_allclose(pred_before, pred_after, rtol=1e-6, atol=1e-6)
    assert len(restored.replay) == len(handler.replay)
    # restored handler can keep training
    m = restored.train(epochs=1, batch_size=64)
    assert np.isfinite(m["train_loss"])


def test_handler_checkpoint_version_stamp_and_manifest(tmp_path):
    """r5 checkpoints carry format_version + the replay-key manifest in config.json, and
    load() refuses a checkpoint stamped newer than this build supports."""
    import json

    from blackbox_mpc_tpu.learning.handler import CHECKPOINT_FORMAT_VERSION

    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(8,), ensemble_size=1)
    handler = DynamicsHandler(config=cfg, seed=0)
    s, a, ns = _pendulum_transitions(100)
    handler.replay.add_transitions(s, a, ns)
    handler.train(epochs=1, batch_size=32)
    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    handler.save(ckpt_dir)
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        meta = json.load(f)
    assert meta["format_version"] == CHECKPOINT_FORMAT_VERSION
    assert sorted(meta["replay_keys"]) == sorted(handler.replay.state_dict().keys())
    # A future-versioned checkpoint must be rejected with a clear error, not garbage.
    meta["format_version"] = CHECKPOINT_FORMAT_VERSION + 1
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="format_version"):
        DynamicsHandler.load(ckpt_dir)


def test_handler_loads_pre_r5_unstamped_checkpoint(tmp_path):
    """Compat: a checkpoint whose config.json lacks format_version/replay_keys (the pre-r5
    on-disk layout) still restores — load() probes the replay structure by retry instead of
    reading orbax-internal metadata."""
    import json

    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(8,), ensemble_size=1)
    handler = DynamicsHandler(config=cfg, seed=0)
    s, a, ns = _pendulum_transitions(100)
    handler.replay.add_transitions(s, a, ns)
    handler.train(epochs=1, batch_size=32)
    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    handler.save(ckpt_dir)
    # Strip the r5 fields to reproduce the pre-r5 config.json exactly.
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        meta = json.load(f)
    del meta["format_version"], meta["replay_keys"]
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        json.dump(meta, f)
    restored = DynamicsHandler.load(ckpt_dir)
    pred_before = np.asarray(handler.predict(s[:5], a[:5]))
    pred_after = np.asarray(restored.predict(s[:5], a[:5]))
    np.testing.assert_allclose(pred_before, pred_after, rtol=1e-6, atol=1e-6)


def test_early_stopping_patience():
    """PETS-style per-member early stopping: training stops once no member's validation
    loss improves for `patience` epochs, and the planning params are the per-member
    bests (never worse on validation than the final weights)."""
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(32,), ensemble_size=3)
    rng = np.random.default_rng(0)
    s = rng.normal(size=(600, 3)).astype(np.float32)
    a = rng.uniform(-1, 1, (600, 1)).astype(np.float32)
    ns = s + 0.1 * np.tanh(s) + 0.05 * a  # learnable map

    handler = DynamicsHandler(config=cfg, seed=0)
    handler.replay.add_transitions(s, a, ns)
    m = handler.train(epochs=200, batch_size=64, patience=3)
    assert m["epochs_ran"] < 200, m  # stopped early on this easy problem
    assert np.isfinite(m["val_loss"])

    # The snapshotted planning params predict at least as well as a plain fixed-epoch
    # run of the same length would at its final (possibly overfit/noisy) weights.
    handler2 = DynamicsHandler(config=cfg, seed=0)
    handler2.replay.add_transitions(s, a, ns)
    m2 = handler2.train(epochs=m["epochs_ran"], batch_size=64)
    assert m["val_loss"] <= m2["val_loss"] + 1e-3, (m["val_loss"], m2["val_loss"])


def test_early_stopping_single_member():
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,), ensemble_size=1)
    rng = np.random.default_rng(1)
    s = rng.normal(size=(400, 3)).astype(np.float32)
    a = rng.uniform(-1, 1, (400, 1)).astype(np.float32)
    ns = s + 0.05 * a
    handler = DynamicsHandler(config=cfg, seed=0)
    handler.replay.add_transitions(s, a, ns)
    m = handler.train(epochs=150, batch_size=64, patience=2)
    assert m["epochs_ran"] <= 150 and np.isfinite(m["val_loss"])
