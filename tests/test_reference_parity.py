"""Behavioral parity against the ACTUAL reference package (TF-gated).

Imports the real ``/root/reference/blackbox_mpc`` (TF2 graph mode, with the
two-line tensorflow_probability stub from ``benchmarks/reference_parity.py``) and runs it
head-to-head with this framework on the same numpy pendulum simulator at matched configs.
The full 6-optimizer x 3-seed x 200-step sweep lives in ``benchmarks/reference_parity.py``
(results: ``benchmarks/reference_parity_r3.jsonl``, table in PARITY.md); this test keeps a
small always-on slice of it in the suite so parity regressions are caught without a
benchmark run.

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

from reference_parity import (  # noqa: E402
    MATCHED_CONFIGS,
    run_ours_episode,
    run_reference_episode,
)

# Short episodes keep the TF side fast; tolerance widened accordingly (a 50-step episode
# from a random initial state is dominated by the swing-up transient both sides share).
STEPS = 50
ABS_TOL = 40.0


@pytest.mark.parametrize("optimizer", ["CEM", "RandomSearch"])
def test_matches_actual_reference_episode_reward(optimizer):
    assert optimizer in MATCHED_CONFIGS
    ref = run_reference_episode(optimizer, seed=0, steps=STEPS)
    ours = run_ours_episode(optimizer, seed=0, steps=STEPS)
    assert np.isfinite(ours["episode_reward"]) and np.isfinite(ref["episode_reward"])
    # Same-or-better control quality within tolerance, scored by the true gym cost.
    assert ours["episode_reward"] >= ref["episode_reward"] - ABS_TOL, (ref, ours)
