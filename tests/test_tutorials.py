"""Smoke tests: every tutorial runs end-to-end as a script (the reference's de-facto
integration suite was its tutorials; here they are tested, SURVEY §4). Scaled-down args keep
each under a couple of minutes on CPU; the MuJoCo ones are gated on the mujoco import."""
import os
import pathlib
import subprocess
import sys

import pytest

# Gated out of the default fast run (pyproject addopts -m 'not slow'); run the full
# suite with `pytest -m ""` (see README).
pytestmark = pytest.mark.slow

ROOT = pathlib.Path(__file__).resolve().parents[1]

# script -> extra CLI args (every tutorial accepts the _common.setup() flags)
TUTORIALS = {
    "tutorials/true_model_mpc/tutorial_one.py": ["--steps", "40"],
    "tutorials/true_model_mpc/tutorial_two.py": ["--steps", "40"],
    "tutorials/true_model_mpc/tutorial_three.py": [],
    "tutorials/true_model_mpc/tutorial_four.py": ["--steps", "60"],
    "tutorials/low_level_api/tutorial_one.py": [],
    "tutorials/distributed/tutorial_one.py": [],
    "tutorials/distributed/tutorial_two.py": [],
    "tutorials/learn_dynamics/tutorial_one.py": ["--steps", "30"],
    "tutorials/model_based_rl/tutorial_one.py": ["--steps", "30", "--refinements", "1"],
    "tutorials/model_based_rl/tutorial_two.py": ["--steps", "30", "--refinements", "1"],
    "tutorials/model_based_rl/tutorial_three.py": ["--steps", "30"],
    "tutorials/save_load/tutorial_one.py": ["--steps", "30"],
    "tutorials/save_load/tutorial_two.py": ["--steps", "30"],
    "tutorials/probabilistic/tutorial_one.py": ["--steps", "40"],
    "tutorials/probabilistic/tutorial_two.py": ["--steps", "30"],
    "tutorials/gradient_planning/tutorial_one.py": ["--steps", "40"],
    "tutorials/proposer/tutorial_one.py": ["--steps", "30", "--refinements", "1"],
    "tutorials/record_videos/tutorial_one.py": [],
    "tutorials/beyond_hbm/tutorial_one.py": ["--population", "256"],
    "tutorials/deploy/tutorial_one.py": ["--steps", "30"],
}

MUJOCO_TUTORIALS = {
    "tutorials/mujoco/tutorial_one.py": ["--steps", "25"],
    "tutorials/mujoco/tutorial_two.py": ["--steps", "25", "--refinements", "1"],
    "tutorials/mujoco/tutorial_three.py": ["--steps", "20", "--refinements", "1"],
}


def _run(script, extra, tmp_path, timeout=300):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    args = list(extra)
    if "save_load/tutorial_two" in script or "model_based_rl/tutorial_two" in script:
        args += ["--ckpt", str(tmp_path / "ckpt")]
    result = subprocess.run(
        [sys.executable, str(ROOT / script), *args],
        env=env, capture_output=True, text=True, timeout=timeout, cwd=str(ROOT),
    )
    assert result.returncode == 0, f"{script} failed:\n{result.stdout}\n{result.stderr}"


@pytest.mark.parametrize("script", sorted(TUTORIALS))
def test_tutorial_runs(script, tmp_path):
    _run(script, TUTORIALS[script], tmp_path)


@pytest.mark.parametrize("script", sorted(MUJOCO_TUTORIALS))
def test_mujoco_tutorial_runs(script, tmp_path):
    pytest.importorskip("mujoco")
    _run(script, MUJOCO_TUTORIALS[script], tmp_path, timeout=900)
