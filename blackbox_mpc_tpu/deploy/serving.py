"""Standalone serving runtime for exported MPC policy artifacts.

This module is deliberately **self-contained**: it imports only the standard library,
numpy, jax (and ml_dtypes for low-precision leaves) — never the rest of
``blackbox_mpc_tpu``. Copy this single file (or the installed module) into a serving
container together with a ``.bbmpc`` artifact produced by
:func:`blackbox_mpc_tpu.deploy.export_policy_artifact` and you can run the full MPC
control step — solver iterations, rollouts, exploration noise, one-step lookahead —
without the framework, its solver code, or any Python re-tracing of it. The artifact
carries the whole solve as serialized StableHLO (``jax.export``), which XLA compiles
directly for the serving device.

Counterpart of the reference's deployment story — ``tf.saved_model.save`` of the
dynamics function only (``/root/reference/blackbox_mpc/dynamics_handlers/
system_dynamics_handler.py:213-241``), which still needs the whole Python package to
rebuild the optimizer around it. Here the *entire policy step* is the artifact.

Artifact layout (one zip file, conventional suffix ``.bbmpc``)::

    meta.json            solver/shape/RNG metadata (format_version 1)
    step.jaxexport       jax.export-serialized solve step (see export.py for signature)
    reset.jaxexport      jax.export-serialized per-episode solver-state reset
    state/…              solver-state leaves (manifest.json + <i>.bin raw tensors)
    params/…             dynamics-parameter leaves
    proposer/…           proposer-parameter leaves (a dummy scalar when unused)
    key/…                the exporting policy's PRNG key data (stream resume point)

Tensors are stored as raw bytes + a manifest of shapes/dtypes (``np.savez`` cannot
round-trip ml_dtypes like bfloat16; raw bytes + dtype names can).
"""
from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ServingPolicy", "pack_tensors", "unpack_tensors", "FORMAT_VERSION",
           "SUPPORTED_FORMAT_VERSIONS"]

# Version 1: single-device artifacts. Version 2: topology-pinned sharded artifacts
# (nr_devices > 1) — stamped v2 so that a pre-sharding copy of this loader rejects them
# at the version gate with a clear message instead of dying inside the exported call
# with an opaque device-count error. Single-device artifacts stay v1 (loadable by old
# deployed copies of this file).
FORMAT_VERSION = 1
SHARDED_FORMAT_VERSION = 2
SUPPORTED_FORMAT_VERSIONS = (1, 2)


def _np_dtype(name: str) -> np.dtype:
    """Resolves a dtype name, falling back to ml_dtypes for bf16/fp8 and friends."""
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def pack_tensors(zf: zipfile.ZipFile, group: str, leaves: Sequence[Any]) -> None:
    """Writes flat array leaves as ``<group>/manifest.json`` + ``<group>/<i>.bin``."""
    manifest = []
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        manifest.append({"shape": list(arr.shape), "dtype": arr.dtype.name})
        zf.writestr(f"{group}/{i}.bin", arr.tobytes())
    zf.writestr(f"{group}/manifest.json", json.dumps(manifest))


def unpack_tensors(zf: zipfile.ZipFile, group: str) -> list[np.ndarray]:
    manifest = json.loads(zf.read(f"{group}/manifest.json"))
    leaves = []
    for i, spec in enumerate(manifest):
        dtype = _np_dtype(spec["dtype"])
        buf = zf.read(f"{group}/{i}.bin")
        leaves.append(np.frombuffer(buf, dtype=dtype).reshape(spec["shape"]))
    return leaves


class ServingPolicy:
    """Loads a ``.bbmpc`` artifact and serves ``act()`` / ``reset()`` from it.

    The behavioral contract matches ``MPCPolicy``: ``act`` accepts an unbatched ``[S]``
    observation (tiled across agents) or a batched ``[num_agents, S]`` array and returns
    ``(action, predicted_next_obs, predicted_reward)``, un-batched iff the input was.
    Because the artifact snapshots the exporting policy's solver state *and* PRNG stream,
    a freshly loaded ServingPolicy continues bit-identically where the exporting
    MPCPolicy stood at export time (asserted by tests/test_deploy.py).
    """

    def __init__(self, meta: dict, step_exported, reset_exported,
                 state_leaves, params_leaves, proposer_leaves, key_data,
                 program_hash: str = "") -> None:
        self.meta = dict(meta)
        self._num_agents = int(meta["num_agents"])
        self._dim_s = int(meta["dim_s"])
        self._impl = meta["rng_impl"]
        # jit(exported.call): XLA compiles the embedded StableHLO for this device; there
        # is no Python-level tracing of solver/model code (none is present). Compiles
        # land in the persistent compilation cache like any jit.
        self._step = jax.jit(step_exported.call)
        self._reset = jax.jit(reset_exported.call)
        self._program_hash = program_hash
        self._precompiled = False
        self.used_compiled_cache = False
        nr = int(meta.get("nr_devices", 1))
        if nr > len(jax.devices()):
            raise ValueError(
                f"artifact is topology-pinned to {nr} devices "
                f"(mesh_axes={meta.get('mesh_axes')}), but this runtime has "
                f"{len(jax.devices())}"
            )
        if nr == 1:
            # device_put (committed), not asarray (uncommitted): after the first act the
            # state leaves are COMMITTED outputs of the compiled step, and committedness
            # is part of the jit cache key — loading them uncommitted would force one
            # silent recompile on the second act (measured as a 481 ms spike on CPU).
            dev = jax.devices()[0]
            put = lambda x: jax.device_put(jnp.asarray(x), dev)  # noqa: E731
        else:
            # Sharded artifact: an Exported must be CALLED in a context with the same
            # device count it was exported for. Committing the inputs replicated over
            # the first nr devices gives the call that context (the program's internal
            # sharding constraints then distribute the candidate tensors).
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            mesh = Mesh(np.asarray(jax.devices()[:nr]), ("_serve",))
            repl = NamedSharding(mesh, PartitionSpec())
            put = lambda x: jax.device_put(jnp.asarray(x), repl)  # noqa: E731
        self._put = put
        as_dev = lambda xs: tuple(put(x) for x in xs)  # noqa: E731
        self._state = as_dev(state_leaves)
        self._params = as_dev(params_leaves)
        self._proposer = as_dev(proposer_leaves)
        self._key = put(jax.random.wrap_key_data(jnp.asarray(key_data), impl=self._impl))

    # ------------------------------------------------------------------ construction

    @classmethod
    def load(cls, path: str, compiled_cache: str | None = None) -> "ServingPolicy":
        """Loads an artifact; ``compiled_cache`` optionally points at a device-pinned
        executable cache written by :meth:`save_compiled` — when it exists and matches
        this device/jax version, serving starts with ZERO compilation (else it is
        ignored with a warning and XLA compiles as usual)."""
        import hashlib

        with zipfile.ZipFile(path) as zf:
            meta = json.loads(zf.read("meta.json"))
            if meta.get("format_version") not in SUPPORTED_FORMAT_VERSIONS:
                raise ValueError(
                    f"artifact format_version {meta.get('format_version')} not in "
                    f"supported {SUPPORTED_FORMAT_VERSIONS}"
                )
            step_bytes = zf.read("step.jaxexport")
            reset_bytes = zf.read("reset.jaxexport")
            step = jax.export.deserialize(bytearray(step_bytes))
            reset = jax.export.deserialize(bytearray(reset_bytes))
            state = unpack_tensors(zf, "state")
            params = unpack_tensors(zf, "params")
            proposer = unpack_tensors(zf, "proposer")
            (key_data,) = unpack_tensors(zf, "key")
        program_hash = hashlib.sha256(step_bytes + reset_bytes).hexdigest()
        self = cls(meta, step, reset, state, params, proposer, key_data,
                   program_hash=program_hash)
        if compiled_cache is not None and os.path.exists(compiled_cache):
            self._load_compiled_cache(compiled_cache)
        return self

    # ------------------------------------------------------------ AOT executable cache

    def _fingerprint(self) -> dict:
        """Validity domain of a compiled-executable cache: serialized XLA executables
        are pinned to the device kind and the jax/jaxlib pair that produced them, and —
        via ``program_hash`` (sha256 of the artifact's serialized StableHLO) — to the
        exact program they were compiled from, so a cache saved against one artifact is
        rejected after the artifact is re-exported with different solver settings (same
        input shapes, different program: invisible to every other field)."""
        return {
            "jax_version": jax.__version__,
            "device_kind": jax.devices()[0].device_kind,
            "platform": jax.default_backend(),
            "solver_name": self.meta["solver_name"],
            "num_agents": self._num_agents,
            "dim_s": self._dim_s,
            "nr_devices": int(self.meta.get("nr_devices", 1)),
            "program_hash": self._program_hash,
        }

    def _example_args(self):
        obs = jnp.zeros((self._num_agents, self._dim_s), jnp.float32)
        return (
            self._state, self._params, self._proposer, obs,
            jnp.zeros((), jnp.int32), jax.random.key_data(self._key),
            jnp.zeros((), jnp.bool_),
        )

    def precompile(self) -> "ServingPolicy":
        """AOT-compiles the step and reset for this device now (instead of on the first
        ``act``); required before :meth:`save_compiled`. Returns ``self``."""
        if not self._precompiled:
            # _step/_reset are jitted at construction, so they expose .lower directly.
            self._step = self._step.lower(*self._example_args()).compile()
            self._reset = self._reset.lower(
                self._state, jax.random.key_data(self._key)
            ).compile()
            self._precompiled = True
        return self

    def save_compiled(self, path: str) -> None:
        """Writes a device-pinned executable cache: the XLA-compiled step/reset,
        serialized via ``jax.experimental.serialize_executable``. A later
        ``ServingPolicy.load(artifact, compiled_cache=path)`` on the SAME device kind
        and jax version starts serving with zero compile time. The cache is a pickle —
        treat it with the same trust as the artifact itself."""
        import pickle

        from jax.experimental import serialize_executable as se

        if self.used_compiled_cache:
            raise RuntimeError(
                "this ServingPolicy was itself loaded from a compiled cache; the cache "
                "file already exists — copy it instead of re-serializing"
            )
        self.precompile()
        payload = {
            "fingerprint": self._fingerprint(),
            "step": se.serialize(self._step),
            "reset": se.serialize(self._reset),
        }
        # Atomic publish: write to a sibling tmp file then os.replace, so a
        # concurrently-starting server can never observe a truncated cache.
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)

    def _load_compiled_cache(self, path: str) -> None:
        import pickle
        import warnings

        from jax.experimental import serialize_executable as se

        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            fp, want = payload["fingerprint"], self._fingerprint()
            if fp != want:
                raise ValueError(f"compiled cache fingerprint {fp} != this runtime {want}")
            # Pin execution_devices to the artifact's device count: without pinning,
            # deserialize_and_load spreads a single-device program over ALL local
            # devices (wrong on a multi-device host); and a topology-pinned sharded
            # program must get exactly its nr_devices (a [:1] pin would fail its load
            # with FAILED_PRECONDITION on a multi-device mesh).
            dev = jax.devices()[: int(self.meta.get("nr_devices", 1))]
            self._step = se.deserialize_and_load(*payload["step"], execution_devices=dev)
            self._reset = se.deserialize_and_load(*payload["reset"], execution_devices=dev)
            self._precompiled = True
            self.used_compiled_cache = True
        except Exception as e:  # noqa: BLE001 — a stale cache must never block serving
            warnings.warn(
                f"ignoring compiled cache {path!r} ({type(e).__name__}: {e}); "
                "falling back to XLA compilation", RuntimeWarning, stacklevel=3,
            )

    # ------------------------------------------------------------------ public API

    @property
    def solver_name(self) -> str:
        return self.meta["solver_name"]

    @property
    def num_agents(self) -> int:
        return self._num_agents

    def act(self, observations, t: int = 0, exploration_noise: bool = False):
        obs = np.asarray(observations, dtype=np.float32)
        batched = obs.ndim > 1
        if not batched:
            obs = np.tile(obs[None], (self._num_agents, 1))
        if obs.shape != (self._num_agents, self._dim_s):
            raise ValueError(
                f"observations shape {obs.shape} != ({self._num_agents}, {self._dim_s})"
            )
        self._key, step_key = jax.random.split(self._key)
        action, self._state, self._last_expected_reward, self._last_plan, next_obs, rew = (
            self._step(
                self._state, self._params, self._proposer, self._put(obs),
                self._put(jnp.asarray(t, jnp.int32)),
                self._put(jax.random.key_data(step_key)),
                self._put(jnp.asarray(bool(exploration_noise))),
            )
        )
        action, next_obs, rew = jax.device_get((action, next_obs, rew))
        if batched:
            return action, next_obs, rew
        return action[0], next_obs[0], rew[0]

    def plan(self):
        """Last solve's refined plan ``[A, H, U]`` and expected reward ``[A]`` (None
        before the first ``act``)."""
        if not hasattr(self, "_last_plan"):
            return None, None
        return np.asarray(self._last_plan), np.asarray(self._last_expected_reward)

    def reset(self) -> None:
        """Per-episode solver-state reset, mirroring ``MPCPolicy.reset``."""
        self._key, reset_key = jax.random.split(self._key)
        self._state = self._reset(self._state, self._put(jax.random.key_data(reset_key)))

    def reseed(self, seed: int) -> None:
        """Replaces the resumed PRNG stream with a fresh one (same impl)."""
        self._key = jax.random.key(seed, impl=self._impl)

    def update_dynamics_params(self, params) -> None:
        """Swaps the dynamics parameters without re-exporting.

        Accepts either a pytree (e.g. a freshly trained ``DynamicsHandler.
        dynamics_params``) or an already-flat leaf sequence; leaf count, shapes, and
        dtypes must match the exported ones — the compiled step is shape-specialized.
        """
        leaves = list(params) if isinstance(params, (list, tuple)) else jax.tree.leaves(params)
        if len(leaves) != len(self._params):
            raise ValueError(
                f"got {len(leaves)} parameter leaves, artifact expects {len(self._params)}"
            )
        new = []
        for i, (got, want) in enumerate(zip(leaves, self._params)):
            arr = jnp.asarray(got)
            if arr.shape != want.shape or arr.dtype != want.dtype:
                raise ValueError(
                    f"parameter leaf {i}: got {arr.shape}/{arr.dtype}, artifact expects "
                    f"{want.shape}/{want.dtype}"
                )
            # committed, matching the load-time placement (see __init__) — a mixed
            # committed/uncommitted swap would silently recompile the step.
            new.append(self._put(arr))
        self._params = tuple(new)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"ServingPolicy(solver={self.meta['solver_name']!r}, "
            f"agents={self._num_agents}, horizon={self.meta['planning_horizon']}, "
            f"platforms={self.meta['platforms']})"
        )


def _read_artifact_blobs(path: str) -> dict:
    """Raw artifact pieces (for tooling/tests; not needed to serve)."""
    with zipfile.ZipFile(path) as zf:
        return {name: zf.read(name) for name in zf.namelist()}


def write_artifact(path: str, meta: dict, step_bytes: bytes, reset_bytes: bytes,
                   state_leaves, params_leaves, proposer_leaves, key_data) -> None:
    """Writes the zip layout documented in the module docstring (used by export.py;
    lives here so the format reader/writer stay in one self-contained file)."""
    version = (
        SHARDED_FORMAT_VERSION if int(meta.get("nr_devices", 1)) > 1 else FORMAT_VERSION
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.json", json.dumps({**meta, "format_version": version}))
        zf.writestr("step.jaxexport", step_bytes)
        zf.writestr("reset.jaxexport", reset_bytes)
        pack_tensors(zf, "state", state_leaves)
        pack_tensors(zf, "params", params_leaves)
        pack_tensors(zf, "proposer", proposer_leaves)
        pack_tensors(zf, "key", [key_data])
    with open(path, "wb") as f:
        f.write(buf.getvalue())
