"""Learned-dynamics (L2) training parity vs the ACTUAL reference stack (TF-gated).

Small always-on slice of ``benchmarks/learned_dynamics_parity.py`` (full results:
``benchmarks/learned_dynamics_parity_r4.jsonl``, table in PARITY.md): the REAL
``SystemDynamicsHandler.train`` (system_dynamics_handler.py:163-298) and our
``learning/trainer.py`` train the same 3x32 MLP on the reference handler's exact
post-split arrays, and the final validation losses must be equivalent.

Skipped automatically when TensorFlow or the reference tree is unavailable.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

tf = pytest.importorskip("tensorflow")
pytestmark = [
    pytest.mark.tf,
    pytest.mark.skipif(
        not os.path.isdir("/root/reference/blackbox_mpc"),
        reason="reference tree unavailable",
    ),
]

from learned_dynamics_parity import (  # noqa: E402
    collect_rollouts,
    train_ours_matched,
    train_reference,
)

# Few epochs keep the slice fast; the equivalence band is widened accordingly (early-epoch
# losses are init/shuffle-noisy — the full 30-epoch run in the benchmark uses 1.5x).
EPOCHS = 8
BAND = 2.0


def test_matched_split_training_is_equivalent():
    data = collect_rollouts(n_episodes=4, steps=200, seed=0)
    ref_handler, ref_row = train_reference(data, EPOCHS, batch_size=128, lr=1e-3, seed=0)
    _, _, our_row = train_ours_matched(ref_handler, EPOCHS, batch_size=128, lr=1e-3, seed=0)
    # identical data: our trainer consumed the reference handler's exact split
    assert our_row["n_train"] == ref_row["n_train"]
    assert our_row["n_val"] == ref_row["n_val"]
    ref_val, our_val = ref_row["final_val_loss"], our_row["final_val_loss"]
    assert np.isfinite(ref_val) and np.isfinite(our_val)
    assert ref_val > 0 and our_val > 0
    ratio = our_val / ref_val
    assert 1.0 / BAND <= ratio <= BAND, (ref_row, our_row)
    # both sides actually learned. These are sanity floors, not the parity criterion (the
    # ratio band above is). Both sides are now bit-deterministic for the seed: ours by
    # construction, the reference since train_reference pins clear_session() +
    # keras.utils.set_random_seed() — without that reset, Keras-3 layer inits draw from a
    # process-global op-seed counter, so the same seed gave different weights depending on
    # what TF code ran earlier in the process (the old full-suite flake). Measured at
    # 8 epochs, seed 0: ref drop 0.610, ours 0.683, ratio 0.993.
    assert our_row["val_loss_curve"][-1] < 0.7 * our_row["val_loss_curve"][0]
    assert ref_row["val_loss_curve"][-1] < 0.8 * ref_row["val_loss_curve"][0]
