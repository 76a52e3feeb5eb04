"""Deployment/serving subsystem: AOT policy export + standalone loading.

The contract under test: a ``.bbmpc`` artifact written by ``export_policy_artifact``
snapshots the policy's solver state AND PRNG stream, so a loaded ``ServingPolicy``
continues BIT-IDENTICALLY where the exporting ``MPCPolicy`` stood — greedy actions,
exploration-noise actions, lookahead predictions, and per-episode resets — with no
framework code (``deploy/serving.py`` is self-contained) and no Python re-tracing.

Reference counterpart being superseded: ``tf.saved_model.save`` of the dynamics
function only (system_dynamics_handler.py:213-241) — the controller itself was never
deployable there.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import blackbox_mpc_tpu.deploy.serving as serving_mod
from blackbox_mpc_tpu import DynamicsHandler, LearnedDynamicsConfig, MPCPolicy
from blackbox_mpc_tpu.core.spaces import BoxSpace
from blackbox_mpc_tpu.deploy import ServingPolicy, export_dynamics, export_policy_artifact
from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward

SPACE = BoxSpace.of(np.array([-2.0]), np.array([2.0]))
OBS = np.array([0.5, 0.1, 0.0], np.float32)


def _true_model_policy(solver="CEM", **kw):
    kwargs = dict(planning_horizon=10, population=64, max_iterations=2, seed=3)
    if solver in ("CEM", "CEM-GD"):
        kwargs["num_elite"] = 8
    kwargs.update(kw)
    return MPCPolicy(
        SPACE, pendulum_reward, DynamicsHandler(true_model=pendulum_dynamics),
        solver_name=solver, **kwargs,
    )


def _learned_policy(**kw):
    handler = DynamicsHandler(
        config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16, 16), ensemble_size=2)
    )
    return handler, MPCPolicy(
        SPACE, pendulum_reward, handler, solver_name="CEM", planning_horizon=8,
        population=32, num_elite=4, max_iterations=2, seed=7, **kw,
    )


@pytest.mark.parametrize("solver", ["CEM", "PSO", "RandomSearch", "PI2"])
def test_artifact_continues_bitwise_from_export_point(tmp_path, solver):
    pol = _true_model_policy(solver)
    pol.act(OBS, t=0)  # advance state + stream: the artifact must resume MID-EPISODE
    path = str(tmp_path / "pol.bbmpc")
    meta = export_policy_artifact(pol, path, dim_s=3)
    assert meta["solver_name"] == solver and meta["platforms"] == ["cpu"]
    srv = ServingPolicy.load(path)
    # greedy, exploration-noise, and post-reset acts all bit-match the live policy
    for t, explore in ((1, False), (2, True)):
        a1, n1, r1 = pol.act(OBS, t=t, exploration_noise=explore)
        a2, n2, r2 = srv.act(OBS, t=t, exploration_noise=explore)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(r1, r2)
    pol.reset()
    srv.reset()
    a1, _, _ = pol.act(OBS, t=0)
    a2, _, _ = srv.act(OBS, t=0)
    np.testing.assert_array_equal(a1, a2)


def test_exploration_noise_differs_and_stays_in_bounds(tmp_path):
    pol = _true_model_policy("CEM", exploration_noise_scale=0.3)
    path = str(tmp_path / "pol.bbmpc")
    export_policy_artifact(pol, path, dim_s=3)
    srv = ServingPolicy.load(path)
    greedy, _, _ = srv.act(OBS, t=0)
    srv2 = ServingPolicy.load(path)
    noisy, _, _ = srv2.act(OBS, t=0, exploration_noise=True)
    assert not np.array_equal(greedy, noisy)
    assert np.all(noisy >= SPACE.low - 1e-6) and np.all(noisy <= SPACE.high + 1e-6)


def test_plan_exposed_after_act(tmp_path):
    pol = _true_model_policy("CEM")
    path = str(tmp_path / "pol.bbmpc")
    export_policy_artifact(pol, path, dim_s=3)
    srv = ServingPolicy.load(path)
    assert srv.plan() == (None, None)
    srv.act(OBS)
    plan, expected = srv.plan()
    assert plan.shape == (1, 10, 1) and expected.shape == (1,)


def test_learned_policy_roundtrip_and_param_hotswap(tmp_path):
    handler, pol = _learned_policy()
    path = str(tmp_path / "learned.bbmpc")
    export_policy_artifact(pol, path)  # dim_s inferred from the config
    srv = ServingPolicy.load(path)
    a1, n1, r1 = pol.act(OBS, t=0)
    a2, n2, r2 = srv.act(OBS, t=0)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(n1, n2)
    # hot-swap: perturbed params change the action through the SAME compiled artifact,
    # and match the live policy fed the same params.
    import jax

    new_params = jax.tree.map(lambda x: x + 0.05, handler.dynamics_params)
    srv2 = ServingPolicy.load(path)
    srv2.update_dynamics_params(new_params)
    b2, _, _ = srv2.act(OBS, t=0)
    handler._params = new_params
    pol2 = MPCPolicy(
        SPACE, pendulum_reward, handler, solver_name="CEM", planning_horizon=8,
        population=32, num_elite=4, max_iterations=2, seed=7,
    )
    b1, _, _ = pol2.act(OBS, t=0)
    np.testing.assert_array_equal(b1, b2)
    assert not np.array_equal(a2, b2)


def test_param_hotswap_validates_shapes(tmp_path):
    handler, pol = _learned_policy()
    path = str(tmp_path / "learned.bbmpc")
    export_policy_artifact(pol, path)
    srv = ServingPolicy.load(path)
    import jax

    leaves = jax.tree.leaves(handler.dynamics_params)
    with pytest.raises(ValueError, match="parameter leaves"):
        srv.update_dynamics_params(leaves[:-1])
    bad = [np.zeros((2, 2), np.float32) for _ in leaves]
    with pytest.raises(ValueError, match="artifact expects"):
        srv.update_dynamics_params(bad)


def test_export_dynamics_polymorphic_batch(tmp_path):
    handler, _ = _learned_policy()
    path = str(tmp_path / "dyn.stablehlo")
    exp = export_dynamics(handler, path)
    import jax

    restored = jax.export.deserialize(bytearray(open(path, "rb").read()))
    for b in (3, 17):  # the reference's [None, S+U] SavedModel signature, done TPU-style
        s = np.random.default_rng(b).normal(size=(b, 3)).astype(np.float32)
        a = np.random.default_rng(b + 1).normal(size=(b, 1)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(restored.call(s, a)), np.asarray(handler.predict(s, a)),
            rtol=1e-6, atol=1e-6,
        )
    assert exp.platforms == restored.platforms


def test_standalone_loader_needs_no_framework(tmp_path):
    """deploy/serving.py must load+serve the artifact WITHOUT importing the package."""
    pol = _true_model_policy("CEM")
    path = str(tmp_path / "pol.bbmpc")
    export_policy_artifact(pol, path, dim_s=3)
    expected, _, _ = ServingPolicy.load(path).act(OBS, t=0)
    script = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import importlib.util, json, sys
import numpy as np
spec = importlib.util.spec_from_file_location("bbmpc_serving", {serving_mod.__file__!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
assert not any(m.split(".")[0] == "blackbox_mpc_tpu" for m in sys.modules), (
    "serving.py imported framework modules: "
    + str([m for m in sys.modules if m.startswith("blackbox_mpc_tpu")])
)
srv = mod.ServingPolicy.load({path!r})
a, n, r = srv.act(np.array([0.5, 0.1, 0.0], np.float32), t=0)
print(json.dumps({{"action": np.asarray(a).tolist()}}))
"""
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, env=env, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    action = json.loads(out.stdout.strip().splitlines()[-1])["action"]
    np.testing.assert_array_equal(np.asarray(action, np.float32), expected)


def test_export_rejects_unexportable_configurations(tmp_path):
    # true model without dim_s
    pol = _true_model_policy("CEM")
    with pytest.raises(ValueError, match="dim_s"):
        export_policy_artifact(pol, str(tmp_path / "x.bbmpc"))
    # kernel backend
    handler2, _ = _learned_policy()
    kern = MPCPolicy(
        SPACE, pendulum_reward, handler2, solver_name="CEM", planning_horizon=8,
        population=32, num_elite=4, max_iterations=2, rollout_backend="pallas",
    )
    with pytest.raises(ValueError, match="rollout_backend"):
        export_policy_artifact(kern, str(tmp_path / "x.bbmpc"))
    # true-model dynamics-only export
    with pytest.raises(ValueError, match="true-model"):
        export_dynamics(DynamicsHandler(true_model=pendulum_dynamics))


def test_format_version_gate(tmp_path):
    pol = _true_model_policy("CEM")
    path = str(tmp_path / "pol.bbmpc")
    export_policy_artifact(pol, path, dim_s=3)
    import zipfile

    bad = str(tmp_path / "bad.bbmpc")
    with zipfile.ZipFile(path) as zin, zipfile.ZipFile(bad, "w") as zout:
        for name in zin.namelist():
            data = zin.read(name)
            if name == "meta.json":
                meta = json.loads(data)
                meta["format_version"] = 999
                data = json.dumps(meta)
            zout.writestr(name, data)
    with pytest.raises(ValueError, match="format_version"):
        ServingPolicy.load(bad)


def test_serving_policy_drives_perform_rollouts(tmp_path):
    """ServingPolicy slots into the rollout runner as a model-based policy (virtual
    subclass registration in deploy/__init__.py) — the full workflow layer runs on a
    served artifact."""
    from blackbox_mpc_tpu import perform_rollouts
    from blackbox_mpc_tpu.envs import NativePendulumVecEnv
    from blackbox_mpc_tpu.policies.base import ModelBasedPolicy

    pol = _true_model_policy("CEM")
    path = str(tmp_path / "pol.bbmpc")
    export_policy_artifact(pol, path, dim_s=3)
    srv = ServingPolicy.load(path)
    assert isinstance(srv, ModelBasedPolicy)
    env = NativePendulumVecEnv(num_envs=1, seed=0)
    result = perform_rollouts(env, srv, number_of_rollouts=1, rollout_horizon=10)
    env.close()
    assert len(result["reward_sum"]) == 1 and np.isfinite(result["reward_sum"][0])
    assert result["latency"]["count"] == 10


def test_compiled_executable_cache_roundtrip(tmp_path):
    """save_compiled -> load(compiled_cache=...) serves with zero XLA compilation and
    bit-matches the plain (compile-at-load) path."""
    pol = _true_model_policy("CEM")
    art = str(tmp_path / "pol.bbmpc")
    cache = str(tmp_path / "pol.xla")
    export_policy_artifact(pol, art, dim_s=3)
    ServingPolicy.load(art).save_compiled(cache)
    assert os.path.getsize(cache) > 0
    # r5: the write publishes atomically — no .tmp sibling may survive
    assert not [p for p in os.listdir(str(tmp_path)) if ".tmp" in p]
    plain = ServingPolicy.load(art)
    cached = ServingPolicy.load(art, compiled_cache=cache)
    assert cached.used_compiled_cache and not plain.used_compiled_cache
    a1, n1, r1 = plain.act(OBS, t=0)
    a2, n2, r2 = cached.act(OBS, t=0)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(r1, r2)
    cached.reset()
    plain.reset()
    np.testing.assert_array_equal(plain.act(OBS)[0], cached.act(OBS)[0])


def test_stale_compiled_cache_falls_back_with_warning(tmp_path):
    pol = _true_model_policy("CEM")
    art = str(tmp_path / "pol.bbmpc")
    cache = str(tmp_path / "stale.xla")
    export_policy_artifact(pol, art, dim_s=3)
    with open(cache, "wb") as f:
        f.write(b"not a pickle")
    with pytest.warns(RuntimeWarning, match="ignoring compiled cache"):
        srv = ServingPolicy.load(art, compiled_cache=cache)
    assert not srv.used_compiled_cache
    action, _, _ = srv.act(OBS)
    assert np.all(np.isfinite(action))


def test_mismatched_fingerprint_falls_back(tmp_path):
    import pickle

    pol = _true_model_policy("CEM")
    art = str(tmp_path / "pol.bbmpc")
    cache = str(tmp_path / "pol.xla")
    export_policy_artifact(pol, art, dim_s=3)
    ServingPolicy.load(art).save_compiled(cache)
    with open(cache, "rb") as f:
        payload = pickle.load(f)
    payload["fingerprint"]["device_kind"] = "TPU v9000"
    with open(cache, "wb") as f:
        pickle.dump(payload, f)
    with pytest.warns(RuntimeWarning, match="fingerprint"):
        srv = ServingPolicy.load(art, compiled_cache=cache)
    assert not srv.used_compiled_cache


def test_proposer_policy_exports_and_matches(tmp_path):
    """POPLIN-style proposer seeding survives export: the proposer params ride in the
    artifact's proposer leaves and the served solve bit-matches the live one."""
    from blackbox_mpc_tpu.core.types import Bounds
    from blackbox_mpc_tpu.learning.proposer import PolicyProposer, ProposerConfig

    handler = DynamicsHandler(
        config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16, 16))
    )
    proposer = PolicyProposer(
        ProposerConfig(dim_s=3, dim_u=1, hidden=(8, 8)), Bounds.of(-2.0, 2.0, dim=1)
    )
    pol = MPCPolicy(
        SPACE, pendulum_reward, handler, solver_name="CEM", planning_horizon=8,
        population=32, num_elite=4, max_iterations=2, seed=7, proposer=proposer,
    )
    path = str(tmp_path / "proposed.bbmpc")
    export_policy_artifact(pol, path)
    srv = ServingPolicy.load(path)
    a1, n1, r1 = pol.act(OBS, t=0)
    a2, n2, r2 = srv.act(OBS, t=0)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(n1, n2)


def test_rbg_typed_key_policy_exports_and_matches(tmp_path):
    """Hardware-RNG policies (rng_impl='rbg', typed keys) export: the impl rides in the
    artifact meta and the served stream continues bit-identically."""
    pol = _true_model_policy("CEM", rng_impl="rbg")
    path = str(tmp_path / "rbg.bbmpc")
    meta = export_policy_artifact(pol, path, dim_s=3)
    assert meta["rng_impl"] == "rbg"
    srv = ServingPolicy.load(path)
    a1, _, _ = pol.act(OBS, t=0)
    a2, _, _ = srv.act(OBS, t=0)
    np.testing.assert_array_equal(a1, a2)


def test_stochastic_propagation_policy_exports_and_matches(tmp_path):
    """TS-inf (stochastic propagation, PETS particles) policies export: the rollout-noise
    key derivation is part of the exported step, so serving matches bitwise."""
    handler = DynamicsHandler(
        config=LearnedDynamicsConfig(
            dim_s=3, dim_u=1, hidden=(16, 16), ensemble_size=2, probabilistic=True,
            propagation="ts_inf", num_particles=2,
        )
    )
    pol = MPCPolicy(
        SPACE, pendulum_reward, handler, solver_name="CEM", planning_horizon=6,
        population=16, num_elite=4, max_iterations=2, seed=11,
    )
    path = str(tmp_path / "tsinf.bbmpc")
    export_policy_artifact(pol, path)
    srv = ServingPolicy.load(path)
    a1, n1, r1 = pol.act(OBS, t=0)
    a2, n2, r2 = srv.act(OBS, t=0)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(n1, n2)


def test_save_compiled_from_cache_loaded_instance_raises(tmp_path):
    pol = _true_model_policy("CEM")
    art = str(tmp_path / "pol.bbmpc")
    cache = str(tmp_path / "pol.xla")
    export_policy_artifact(pol, art, dim_s=3)
    ServingPolicy.load(art).save_compiled(cache)
    cached = ServingPolicy.load(art, compiled_cache=cache)
    with pytest.raises(RuntimeError, match="compiled cache"):
        cached.save_compiled(str(tmp_path / "other.xla"))


def test_overlap_pipelining_rejects_serving_policy(tmp_path):
    from blackbox_mpc_tpu import perform_rollouts
    from blackbox_mpc_tpu.envs import NativePendulumVecEnv

    pol = _true_model_policy("CEM")
    path = str(tmp_path / "pol.bbmpc")
    export_policy_artifact(pol, path, dim_s=3)
    srv = ServingPolicy.load(path)
    env = NativePendulumVecEnv(num_envs=1, seed=0)
    try:
        with pytest.raises(TypeError, match="ServingPolicy"):
            perform_rollouts(env, srv, number_of_rollouts=1, rollout_horizon=5,
                             overlap=True)
    finally:
        env.close()


def test_compiled_cache_rejected_after_artifact_reexport(tmp_path):
    """The cache fingerprint binds to the artifact's program bytes: re-exporting with
    different solver settings (same input shapes!) must invalidate the cache."""
    art = str(tmp_path / "pol.bbmpc")
    cache = str(tmp_path / "pol.xla")
    export_policy_artifact(_true_model_policy("CEM"), art, dim_s=3)
    ServingPolicy.load(art).save_compiled(cache)
    # same state shapes, different program: more iterations
    export_policy_artifact(_true_model_policy("CEM", max_iterations=3), art, dim_s=3)
    with pytest.warns(RuntimeWarning, match="fingerprint"):
        srv = ServingPolicy.load(art, compiled_cache=cache)
    assert not srv.used_compiled_cache


def test_exported_step_composes_under_jit_scan(tmp_path):
    """The exported step is traceable INTO an outer jit: a whole control episode can run
    device-resident (lax.scan over the served step, feeding the predicted next obs),
    eliminating the per-step host round-trip that dominates act() latency on tunneled
    TPU frontends. Must match the eager served stream bitwise."""
    import jax
    import jax.numpy as jnp

    pol = _true_model_policy("CEM")
    path = str(tmp_path / "pol.bbmpc")
    export_policy_artifact(pol, path, dim_s=3)

    # eager reference: 4 served acts feeding the predicted next obs back in
    srv = ServingPolicy.load(path)
    obs = OBS
    eager_actions = []
    for t in range(4):
        a, n, _ = srv.act(obs, t=t)
        eager_actions.append(a)
        obs = n

    # device-resident: the same 4 steps as ONE jitted lax.scan over exported.call
    srv2 = ServingPolicy.load(path)
    exported_call = jax.export.deserialize(
        bytearray(__import__("zipfile").ZipFile(path).read("step.jaxexport"))
    ).call
    keys = []
    key = srv2._key
    for _ in range(4):
        key, k = jax.random.split(key)
        keys.append(jax.random.key_data(k))

    def body(carry, inp):
        state, obs = carry
        t, key_data = inp
        action, new_state, _, _, next_obs, _ = exported_call(
            state, srv2._params, srv2._proposer, obs[None], t, key_data,
            jnp.zeros((), jnp.bool_),
        )
        return (new_state, next_obs[0]), action[0]

    (_, _), actions = jax.jit(
        lambda st, o: jax.lax.scan(
            body, (st, o),
            (jnp.arange(4, dtype=jnp.int32), jnp.stack(keys)),
        )
    )(srv2._state, jnp.asarray(OBS))
    np.testing.assert_array_equal(np.asarray(actions), np.stack(eager_actions))


def test_export_is_deterministic_per_entry(tmp_path):
    """Two exports of the same policy state are equivalent: every tensor/meta entry is
    byte-identical and the served behavior matches bitwise. (The jax.export program
    blobs themselves embed fresh trace uids, so THEIR bytes legitimately differ.)"""
    import zipfile

    pol = _true_model_policy("CEM")
    p1, p2 = str(tmp_path / "a.bbmpc"), str(tmp_path / "b.bbmpc")
    export_policy_artifact(pol, p1, dim_s=3)
    export_policy_artifact(pol, p2, dim_s=3)
    with zipfile.ZipFile(p1) as z1, zipfile.ZipFile(p2) as z2:
        assert sorted(z1.namelist()) == sorted(z2.namelist())
        for name in z1.namelist():
            if name.endswith(".jaxexport"):
                continue
            assert z1.read(name) == z2.read(name), f"entry {name} differs between exports"
    a1, _, _ = ServingPolicy.load(p1).act(OBS, t=0)
    a2, _, _ = ServingPolicy.load(p2).act(OBS, t=0)
    np.testing.assert_array_equal(a1, a2)


@pytest.mark.parametrize("shard_axis,agents", [("population", 1), ("agents", 8)])
def test_sharded_policy_exports_topology_pinned(tmp_path, shard_axis, agents):
    """Mesh-sharded policies export: the collectives ride along in the StableHLO and the
    artifact is topology-pinned (nr_devices recorded + validated; serving bit-matches
    the live sharded policy on the 8-device CPU mesh)."""
    from blackbox_mpc_tpu.parallel import make_pop_mesh

    handler = DynamicsHandler(
        config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16, 16))
    )
    pol = MPCPolicy(
        SPACE, pendulum_reward, handler, solver_name="CEM", planning_horizon=8,
        population=32, num_elite=4, max_iterations=2, seed=7, num_agents=agents,
        mesh=make_pop_mesh(8), shard_axis=shard_axis,
    )
    path = str(tmp_path / "sharded.bbmpc")
    meta = export_policy_artifact(pol, path)
    assert meta["nr_devices"] == 8 and meta["mesh_axes"] == {"pop": 8}
    srv = ServingPolicy.load(path)
    obs = np.tile(OBS, (agents, 1))
    for t in (0, 1):
        a1, n1, _ = pol.act(obs, t=t)
        a2, n2, _ = srv.act(obs, t=t)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(n1, n2)
    pol.reset()
    srv.reset()
    np.testing.assert_array_equal(pol.act(obs)[0], srv.act(obs)[0])


def test_topology_pinned_artifact_refuses_smaller_runtime(tmp_path, monkeypatch):
    from blackbox_mpc_tpu.parallel import make_pop_mesh

    handler = DynamicsHandler(
        config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16, 16))
    )
    pol = MPCPolicy(
        SPACE, pendulum_reward, handler, solver_name="CEM", planning_horizon=8,
        population=32, num_elite=4, max_iterations=2, mesh=make_pop_mesh(8),
    )
    path = str(tmp_path / "sharded.bbmpc")
    export_policy_artifact(pol, path)
    import jax

    one = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: one)
    with pytest.raises(ValueError, match="topology-pinned to 8"):
        ServingPolicy.load(path)


def test_icem_featured_policy_exports_and_matches(tmp_path):
    """iCEM features (colored noise, population decay, elite persistence) are part of
    the traced program — they export like anything else."""
    pol = _true_model_policy(
        "CEM", colored_noise_beta=2.0, population_decay=0.8, keep_elites=2,
    )
    path = str(tmp_path / "icem.bbmpc")
    export_policy_artifact(pol, path, dim_s=3)
    srv = ServingPolicy.load(path)
    for t in (0, 1):
        a1, _, _ = pol.act(OBS, t=t)
        a2, _, _ = srv.act(OBS, t=t)
        np.testing.assert_array_equal(a1, a2)


def test_sharded_artifact_compiled_cache_roundtrip(tmp_path):
    """The zero-compile cache works for topology-pinned artifacts too: execution
    devices must be pinned to the artifact's nr_devices, not [:1] (regression: the
    cache load failed with FAILED_PRECONDITION and silently fell back to compiling)."""
    from blackbox_mpc_tpu.parallel import make_pop_mesh

    handler = DynamicsHandler(
        config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16, 16))
    )
    pol = MPCPolicy(
        SPACE, pendulum_reward, handler, solver_name="CEM", planning_horizon=8,
        population=32, num_elite=4, max_iterations=2, seed=7, mesh=make_pop_mesh(8),
    )
    art = str(tmp_path / "sharded.bbmpc")
    cache = str(tmp_path / "sharded.xla")
    meta = export_policy_artifact(pol, art)
    assert meta["nr_devices"] == 8
    # sharded artifacts carry format_version 2 (old loaders reject at the gate)
    import zipfile

    with zipfile.ZipFile(art) as zf:
        assert json.loads(zf.read("meta.json"))["format_version"] == 2
    ServingPolicy.load(art).save_compiled(cache)
    plain = ServingPolicy.load(art)
    cached = ServingPolicy.load(art, compiled_cache=cache)
    assert cached.used_compiled_cache
    a1, _, _ = plain.act(OBS, t=0)
    a2, _, _ = cached.act(OBS, t=0)
    np.testing.assert_array_equal(a1, a2)
