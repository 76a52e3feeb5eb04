"""Smoke tests: the quick tutorials run end-to-end as scripts (the reference's de-facto
integration suite was its tutorials; here they are tested, SURVEY §4)."""
import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]

QUICK_TUTORIALS = [
    "tutorials/true_model_mpc/tutorial_one.py",
    "tutorials/true_model_mpc/tutorial_two.py",
    "tutorials/low_level_api/tutorial_one.py",
    "tutorials/distributed/tutorial_one.py",
]


@pytest.mark.parametrize("script", QUICK_TUTORIALS)
def test_tutorial_runs(script):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, str(ROOT / script), "--steps", "40"]
        if "tutorial_one" in script or "tutorial_two" in script
        else [sys.executable, str(ROOT / script)],
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
        cwd=str(ROOT),
    )
    assert result.returncode == 0, f"{script} failed:\n{result.stdout}\n{result.stderr}"
