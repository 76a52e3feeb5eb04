"""The multi-process distributed path, actually exercised.

Two OS processes, each with 4 virtual CPU devices, join via
``jax.distributed.initialize(localhost:<port>)`` into one 8-device global mesh and run a
population-sharded CEM solve + a data-parallel probabilistic-ensemble train step
(tests/_multiproc_worker.py). Asserts (a) both processes produce the identical result and
(b) it matches the single-process 8-device run of the same program — i.e. the SPMD program
is topology-independent, which is exactly the property a pod deployment relies on
(parallel/multihost.py; BASELINE config #5). The reference has no distributed layer at all
(SURVEY §2.2)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# Gated out of the default fast run (pyproject addopts -m 'not slow'); run the full
# suite with `pytest -m ""` (see README).
pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_sharded_solve_matches_single_process(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"p{i}.json" for i in range(2)]
    env = dict(os.environ)
    # The worker sets its own JAX_PLATFORMS/XLA_FLAGS before importing jax; scrub the
    # parent's 8-device forcing so each child really has 4 local devices.
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests._multiproc_worker", str(i), "2", str(port),
             "4", str(outs[i])],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    logs = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=300)
            logs.append((p.returncode, stdout, stderr))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out")
    for rc, stdout, stderr in logs:
        assert rc == 0, f"worker failed (rc={rc}):\n{stdout}\n{stderr}"

    results = [json.loads(p.read_text()) for p in outs]
    for r in results:
        assert r["devices"] == 8
        assert r["processes"] == 2

    # (a) both processes computed the same replicated result
    for field in ("action", "expected_reward", "losses", "param_digest"):
        np.testing.assert_array_equal(
            np.asarray(results[0][field]), np.asarray(results[1][field]), err_msg=field
        )

    # (b) the 2-process global-mesh result matches the single-process 8-device run of the
    # same program (this pytest process holds the 8-device mesh via conftest).
    from tests._multiproc_worker import run_global_program

    single = run_global_program()
    assert single["devices"] == 8 and single["processes"] == 1
    for field in ("action", "expected_reward", "losses"):
        np.testing.assert_allclose(
            np.asarray(results[0][field]),
            np.asarray(single[field]),
            rtol=1e-5, atol=1e-6,
            err_msg=f"2-process vs single-process mismatch in {field}",
        )
    np.testing.assert_allclose(
        results[0]["param_digest"], single["param_digest"], rtol=1e-5
    )
