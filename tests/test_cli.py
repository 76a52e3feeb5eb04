"""CLI surface: the three subcommands run end-to-end as a user would invoke them."""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=300):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "blackbox_mpc_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout, cwd=ROOT, env=env,
    )


def _last_json(stdout):
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in: {stdout!r}")


def test_solvers_lists_registry():
    proc = _run(["solvers"])
    assert proc.returncode == 0, proc.stderr
    for name in ("CEM", "CMA-ES", "PI2", "PSO", "RandomSearch", "SPSA", "Gradient",
                 "CEM-GD"):
        assert name in proc.stdout, proc.stdout


def test_solve_pendulum_and_cartpole():
    for env_name, reward_floor in (("pendulum", -1500.0), ("cartpole", -50.0)):
        proc = _run(["solve", "--env", env_name, "--cpu", "--steps", "40",
                     "--population", "128", "--planning-horizon", "15"])
        assert proc.returncode == 0, proc.stderr[-800:]
        row = _last_json(proc.stdout)
        assert row["env"] == env_name
        assert row["episode_rewards"][0] > reward_floor
        assert row["act_latency"]["count"] == 40


def test_solve_with_smoothness_flag():
    proc = _run(["solve", "--env", "pendulum", "--cpu", "--steps", "30",
                 "--population", "128", "--planning-horizon", "15",
                 "--smoothness", "0.1"])
    assert proc.returncode == 0, proc.stderr[-800:]
    row = _last_json(proc.stdout)
    assert row["episode_rewards"][0] > -1600.0


def test_solve_with_time_major_flag():
    proc = _run(["solve", "--env", "pendulum", "--cpu", "--steps", "30",
                 "--population", "128", "--planning-horizon", "15",
                 "--time-major"])
    assert proc.returncode == 0, proc.stderr[-800:]
    row = _last_json(proc.stdout)
    assert row["episode_rewards"][0] > -1600.0


def test_solve_unknown_solver_clean_error():
    proc = _run(["solve", "--cpu", "--solver", "NotASolver", "--steps", "5"])
    assert proc.returncode == 2
    assert "error:" in proc.stderr and "NotASolver" in proc.stderr
    assert "Traceback" not in proc.stderr


def test_solve_unknown_env_clean_error():
    proc = _run(["solve", "--cpu", "--env", "warpdrive"])
    assert proc.returncode == 2
    assert "warpdrive" in proc.stderr


def test_learn_pendulum_tiny():
    proc = _run(["learn", "--cpu", "--env", "Pendulum-v1", "--steps", "10",
                 "--initial-rollouts", "1", "--refinements", "1", "--epochs", "1",
                 "--hidden", "16", "--population", "128", "--planning-horizon", "5",
                 "--iterations", "1"], timeout=420)
    assert proc.returncode == 0, proc.stderr[-800:]
    row = _last_json(proc.stdout)
    assert row["done"] and row["replay_size"] >= 20  # 2 rollouts x 10 steps


def test_learn_unknown_env_reward_warns_loudly():
    """Any env without a built-in reward must warn that a surrogate is being planned
    with (VERDICT r1 item: silent fabricated reward)."""
    proc = _run(["learn", "--cpu", "--env", "MountainCarContinuous-v0", "--steps", "5",
                 "--initial-rollouts", "1", "--refinements", "0", "--epochs", "1",
                 "--hidden", "8", "--population", "64", "--planning-horizon", "4",
                 "--iterations", "1"], timeout=420)
    assert proc.returncode == 0, proc.stderr[-800:]
    assert "WARNING" in proc.stderr and "surrogate" in proc.stderr


def test_export_writes_loadable_artifact(tmp_path):
    out = str(tmp_path / "pendulum_cem.bbmpc")
    proc = _run(["export", "--env", "pendulum", "--cpu", "-o", out,
                 "--population", "64", "--planning-horizon", "10", "--iterations", "2"])
    assert proc.returncode == 0, proc.stderr[-800:]
    row = _last_json(proc.stdout)
    assert row["artifact"] == out and row["solver_name"] == "CEM"
    import numpy as np

    from blackbox_mpc_tpu.deploy import ServingPolicy

    srv = ServingPolicy.load(out)
    action, next_obs, reward = srv.act(np.array([0.5, 0.1, 0.0], np.float32))
    assert action.shape == (1,) and next_obs.shape == (3,) and np.isfinite(reward)


def test_serve_json_lines_protocol(tmp_path):
    """export -> serve: the stdin/stdout action server answers act/reset/close, and a
    second start with --compiled-cache reports a zero-compile load."""
    art = str(tmp_path / "ctrl.bbmpc")
    proc = _run(["export", "--env", "pendulum", "--cpu", "-o", art,
                 "--population", "64", "--planning-horizon", "10", "--iterations", "2"])
    assert proc.returncode == 0, proc.stderr[-800:]
    cache = str(tmp_path / "ctrl.xla")
    requests = "\n".join([
        json.dumps({"obs": [0.5, 0.1, 0.0], "t": 0}),
        json.dumps({"cmd": "reset"}),
        json.dumps({"obs": [0.5, 0.1, 0.0], "t": 0, "explore": True}),
        json.dumps({"not_obs": 1}),
        json.dumps({"cmd": "close"}),
    ]) + "\n"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
    env["JAX_PLATFORMS"] = "cpu"

    def serve_once():
        return subprocess.run(
            [sys.executable, "-m", "blackbox_mpc_tpu.cli", "serve", art, "--cpu",
             "--compiled-cache", cache],
            input=requests, capture_output=True, text=True, timeout=300, cwd=ROOT, env=env,
        )

    out1 = serve_once()
    assert out1.returncode == 0, out1.stderr[-800:]
    lines = [json.loads(ln) for ln in out1.stdout.strip().splitlines()]
    assert lines[0]["ready"] and lines[0]["solver"] == "CEM"
    assert not lines[0]["used_compiled_cache"]
    assert len(lines[1]["action"]) == 1 and lines[2]["ok"]
    assert len(lines[3]["action"]) == 1 and "error" in lines[4]
    # second start: the cache written by the first run gives a zero-compile load
    out2 = serve_once()
    assert out2.returncode == 0, out2.stderr[-800:]
    ready2 = json.loads(out2.stdout.strip().splitlines()[0])
    assert ready2["used_compiled_cache"]


def test_inspect_prints_artifact_metadata(tmp_path):
    art = str(tmp_path / "ctrl.bbmpc")
    proc = _run(["export", "--env", "pendulum", "--cpu", "-o", art,
                 "--population", "64", "--planning-horizon", "10", "--iterations", "2"])
    assert proc.returncode == 0, proc.stderr[-800:]
    proc = _run(["inspect", art])
    assert proc.returncode == 0, proc.stderr[-800:]
    row = _last_json(proc.stdout)
    assert row["solver_name"] == "CEM" and row["dim_s"] == 3
    assert row["tensors"]["state"]["leaves"] >= 1
    assert row["program_bytes"]["step.jaxexport"] > 0


def test_learn_checkpoint_export_serve_pipeline(tmp_path):
    """The full production story end-to-end through the CLI: learn dynamics on
    Pendulum-v1, checkpoint, export a learned-dynamics controller from the checkpoint
    (exercising the Pendulum-v1 reward/bounds mapping), then serve it."""
    ckpt = str(tmp_path / "ckpt")
    proc = _run(["learn", "--env", "Pendulum-v1", "--cpu", "--steps", "40",
                 "--initial-rollouts", "2", "--refinements", "0", "--epochs", "3",
                 "--population", "64", "--planning-horizon", "10",
                 "--checkpoint-dir", ckpt], timeout=600)
    assert proc.returncode == 0, proc.stderr[-1200:]
    art = str(tmp_path / "learned.bbmpc")
    proc = _run(["export", "--env", "Pendulum-v1", "--cpu", "--checkpoint-dir", ckpt,
                 "-o", art, "--population", "64", "--planning-horizon", "10",
                 "--iterations", "2"])
    assert proc.returncode == 0, proc.stderr[-1200:]
    row = _last_json(proc.stdout)
    assert row["dim_s"] == 3 and row["dim_u"] == 1
    req = json.dumps({"obs": [0.5, 0.1, 0.0], "t": 0}) + "\n" + json.dumps({"cmd": "close"}) + "\n"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "blackbox_mpc_tpu.cli", "serve", art, "--cpu"],
        input=req, capture_output=True, text=True, timeout=300, cwd=ROOT, env=env,
    )
    assert out.returncode == 0, out.stderr[-1200:]
    lines = [json.loads(ln) for ln in out.stdout.strip().splitlines()]
    action = lines[1]["action"]
    assert len(action) == 1 and -2.0 <= action[0] <= 2.0  # the real pendulum bounds


def test_export_checkpoint_unknown_env_requires_bounds(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    proc = _run(["learn", "--env", "Pendulum-v1", "--cpu", "--steps", "30",
                 "--initial-rollouts", "2", "--refinements", "0", "--epochs", "2",
                 "--population", "64", "--planning-horizon", "8",
                 "--checkpoint-dir", ckpt], timeout=600)
    assert proc.returncode == 0, proc.stderr[-1200:]
    proc = _run(["export", "--env", "SomeOther-v0", "--cpu", "--checkpoint-dir", ckpt,
                 "-o", str(tmp_path / "x.bbmpc"), "--population", "64",
                 "--planning-horizon", "8"])
    assert proc.returncode == 2 and "action-low" in proc.stderr
    proc = _run(["export", "--env", "SomeOther-v0", "--cpu", "--checkpoint-dir", ckpt,
                 "-o", str(tmp_path / "x.bbmpc"), "--population", "64",
                 "--planning-horizon", "8", "--action-low", "-2", "--action-high", "2"])
    assert proc.returncode == 0, proc.stderr[-1200:]


def test_export_checkpoint_dim_mismatch_with_analytic_env(tmp_path):
    """ADVICE r4: a checkpoint whose dims don't match the analytic --env's reward must be
    refused (exit 2), not exported with the reward silently reading wrong state slots.
    A cartpole-shaped (S=4) checkpoint is synthesized directly via the handler API."""
    import numpy as np

    from blackbox_mpc_tpu import DynamicsHandler, LearnedDynamicsConfig

    cfg = LearnedDynamicsConfig(dim_s=4, dim_u=1, hidden=(8,), ensemble_size=1)
    handler = DynamicsHandler(config=cfg, seed=0)
    rng = np.random.default_rng(0)
    s = rng.normal(size=(64, 4)).astype(np.float32)
    a = rng.uniform(-1, 1, (64, 1)).astype(np.float32)
    handler.replay.add_transitions(s, a, s + 0.01 * a)
    handler.train(epochs=1, batch_size=32)
    ckpt = str(tmp_path / "ckpt")
    handler.save(ckpt)
    proc = _run(["export", "--env", "pendulum", "--cpu", "--checkpoint-dir", ckpt,
                 "-o", str(tmp_path / "x.bbmpc"), "--population", "64",
                 "--planning-horizon", "8"])
    assert proc.returncode == 2 and "dim_s=4" in proc.stderr, proc.stderr[-800:]
    # The matching analytic env still exports fine.
    proc = _run(["export", "--env", "cartpole", "--cpu", "--checkpoint-dir", ckpt,
                 "-o", str(tmp_path / "ok.bbmpc"), "--population", "64",
                 "--planning-horizon", "8"])
    assert proc.returncode == 0, proc.stderr[-800:]


def test_inspect_clean_error_on_foreign_zip(tmp_path):
    """ADVICE r4: a valid zip that isn't a .bbmpc artifact gets a clean exit-2 error,
    not a KeyError traceback."""
    import zipfile

    foreign = str(tmp_path / "foreign.zip")
    with zipfile.ZipFile(foreign, "w") as zf:
        zf.writestr("readme.txt", "not an artifact")
    proc = _run(["inspect", foreign])
    assert proc.returncode == 2, (proc.returncode, proc.stderr[-400:])
    assert "not a .bbmpc artifact" in proc.stderr and "Traceback" not in proc.stderr


def test_serve_survives_runtime_error_in_request(tmp_path):
    """ADVICE r4: a request that fails inside the served step (wrong obs rank making the
    exported program reject the call) yields a JSON error line; the server keeps serving
    subsequent requests instead of dying with a traceback."""
    art = str(tmp_path / "ctrl.bbmpc")
    proc = _run(["export", "--env", "pendulum", "--cpu", "-o", art,
                 "--population", "64", "--planning-horizon", "8", "--iterations", "2"])
    assert proc.returncode == 0, proc.stderr[-800:]
    reqs = "\n".join([
        json.dumps({"obs": [[0.5, 0.1, 0.0]] * 7}),  # wrong agent count -> in-step failure
        json.dumps({"obs": [0.5, 0.1, 0.0], "t": 0}),  # still served afterwards
        json.dumps({"cmd": "close"}),
    ]) + "\n"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "blackbox_mpc_tpu.cli", "serve", art, "--cpu"],
        input=reqs, capture_output=True, text=True, timeout=300, cwd=ROOT, env=env,
    )
    assert out.returncode == 0, out.stderr[-1200:]
    lines = [json.loads(ln) for ln in out.stdout.strip().splitlines()]
    assert "error" in lines[1]
    assert "action" in lines[2]


def test_calibrate_checkpoint(tmp_path):
    """`calibrate` prints the variance-calibration summary for a probabilistic
    checkpoint and refuses deterministic ones with a clean error (r5: the calibration
    ratio is the gate metric for sampled propagation, docs/performance.md)."""
    import numpy as np

    from blackbox_mpc_tpu.learning import DynamicsHandler
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig

    rng = np.random.default_rng(0)
    s = rng.uniform(-1, 1, (600, 3)).astype(np.float32)
    a = rng.uniform(-1, 1, (600, 1)).astype(np.float32)
    ns = (0.9 * s + 0.2 * a + 0.1 * rng.standard_normal((600, 3))).astype(np.float32)

    prob = tmp_path / "prob"
    h = DynamicsHandler(
        config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,), ensemble_size=2,
                                     probabilistic=True, learn_logvar_bounds=True),
        seed=0,
    )
    h.replay.add_transitions(s, a, ns)
    h.train(epochs=3, batch_size=128)
    h.save(str(prob))

    proc = _run(["calibrate", "--cpu", str(prob)])
    assert proc.returncode == 0, proc.stderr[-800:]
    row = _last_json(proc.stdout)
    assert row["variance_ratio"] > 0 and row["val_points"] > 0
    assert len(row["per_dim_variance_ratio"]) == 3
    assert row["verdict"] in (
        "approximately calibrated",
        "overconfident (sampled noise too small)",
        "underconfident (sampled noise too large)",
    )

    det = tmp_path / "det"
    hd = DynamicsHandler(
        config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(8,)), seed=0
    )
    hd.replay.add_transitions(s[:100], a[:100], ns[:100])
    hd.train(epochs=1, batch_size=64)
    hd.save(str(det))
    proc = _run(["calibrate", "--cpu", str(det)])
    assert proc.returncode == 2 and "deterministic" in proc.stderr

    proc = _run(["calibrate", "--cpu", str(tmp_path / "missing")])
    assert proc.returncode == 2 and "no checkpoint" in proc.stderr
