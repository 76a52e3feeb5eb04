"""AOT export of MPC policies and dynamics models to serialized StableHLO artifacts.

The deployment story the reference lacks: ``tf.saved_model.save`` there covers only the
dynamics function (``/root/reference/blackbox_mpc/dynamics_handlers/
system_dynamics_handler.py:213-241``) — reconstructing the *controller* still requires
the whole Python package. Here :func:`export_policy_artifact` serializes the ENTIRE
policy step — solver iterations, trajectory rollouts, exploration noise, one-step
lookahead — via ``jax.export`` into one ``.bbmpc`` file that
:class:`~blackbox_mpc_tpu.deploy.serving.ServingPolicy` (a self-contained module)
loads and runs with no framework code and no Python re-tracing.

Exported step signature (flat pytrees only, so the loader needs no custom classes)::

    step(state_leaves, params_leaves, proposer_leaves,
         obs [A, S] f32, t i32, key_data, explore bool)
      -> (action [A, U], new_state_leaves, expected_reward [A], plan [A, H, U],
          predicted_next_obs [A, S], predicted_reward [A])

``explore`` is a *traced* boolean: the exported program computes both the greedy and
the exploration-noise action and selects — both paths are bit-identical to
``MPCPolicy.act(..., exploration_noise=...)`` because the noise key is derived by the
same ``jax.random.split(key, 3)`` the policy's own step performs.

Scope: the XLA rollout backend. The kernel backends (``pallas``/``fused``) ship Mosaic
custom calls that are not portable StableHLO and raise here. Mesh-sharded policies DO
export — the collectives ride along in the StableHLO — but the artifact is then
**topology-pinned**: ``meta["nr_devices"]``/``meta["mesh_axes"]`` record the pin and
``ServingPolicy`` validates the serving runtime has that many devices (verified bitwise
on the 8-device CPU mesh for both ``shard_axis="population"`` and ``"agents"``).
"""
from __future__ import annotations

import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_mpc_tpu.deploy.serving import write_artifact
from blackbox_mpc_tpu.solvers.base import exploration_noise as _exploration_noise

__all__ = ["export_policy_artifact", "export_dynamics"]


def _impl_of(policy) -> str:
    return policy._rng_impl or "threefry2x32"


def export_policy_artifact(
    policy,
    path: str,
    *,
    dim_s: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Exports ``policy`` (an ``MPCPolicy``) to a ``.bbmpc`` serving artifact at ``path``.

    The artifact snapshots the policy's CURRENT solver state and PRNG stream, so a
    loaded :class:`ServingPolicy` continues bit-identically from the export point.

    ``dim_s``: observation dimension. Required for true-model handlers (the policy never
    learns it until the first ``act``); inferred from the learned-dynamics config
    otherwise. ``platforms``: lowering targets, e.g. ``("tpu", "cpu")`` for an artifact
    that serves on either; defaults to the current default backend only.

    Returns the artifact's ``meta`` dict.
    """
    if policy._rollout_backend != "xla":
        raise ValueError(
            f"rollout_backend={policy._rollout_backend!r} is not exportable (sharded or "
            "not): the Mosaic kernels are device-specific custom calls, not portable "
            "StableHLO. Build the policy with rollout_backend='xla' for export."
        )
    handler = policy._handler
    if dim_s is None:
        if handler.config is None:
            raise ValueError(
                "dim_s= is required when exporting a true-model policy (learned-dynamics "
                "policies infer it from the handler config)"
            )
        dim_s = int(handler.config.dim_s)

    raw_step = policy._step_fn  # the unjitted step MPCPolicy._build staged
    raw_reset = policy._solver_reset.__wrapped__
    bounds = policy._bounds
    noise_scale = policy._noise_scale
    mean_dyn = handler.mean_dynamics_fn
    reward_fn = policy._reward_fn
    impl = _impl_of(policy)

    state = policy._solver_state
    params = handler.dynamics_params
    prop = policy._proposer_params_arg()
    state_leaves, state_td = jax.tree.flatten(state)
    params_leaves, params_td = jax.tree.flatten(params)
    prop_leaves, prop_td = jax.tree.flatten(prop)

    def serving_step(state_leaves, params_leaves, prop_leaves, obs, t, key_data, explore):
        st = jax.tree.unflatten(state_td, state_leaves)
        dp = jax.tree.unflatten(params_td, params_leaves)
        pp = jax.tree.unflatten(prop_td, prop_leaves)
        key = jax.random.wrap_key_data(key_data, impl=impl)
        action, new_state, aux, _, _ = raw_step(st, dp, pp, obs, t, key, False)
        # Reproduce MPCPolicy's add_noise=True path exactly: its step splits the SAME
        # key into (solve, noise, rollout) and perturbs post-solve, so deriving the
        # noise key the same way makes both explore branches bit-identical to act().
        _, noise_key, _ = jax.random.split(key, 3)
        noisy = _exploration_noise(noise_key, action, bounds, noise_scale)
        chosen = jnp.where(explore, noisy, action)
        # One-step lookahead on the CHOSEN action (matches act(): with noise on, the
        # reference-style lookahead reports the perturbed action's prediction).
        next_obs = mean_dyn(dp, obs, chosen)
        pred_reward = reward_fn(obs, chosen, next_obs)
        return (
            chosen, tuple(jax.tree.leaves(new_state)),
            aux.expected_reward, aux.plan, next_obs, pred_reward,
        )

    def serving_reset(state_leaves, key_data):
        st = jax.tree.unflatten(state_td, state_leaves)
        key = jax.random.wrap_key_data(key_data, impl=impl)
        return tuple(jax.tree.leaves(raw_reset(st, key)))

    key_data = jax.random.key_data(
        policy._key if jnp.issubdtype(policy._key.dtype, jax.dtypes.prng_key)
        else jax.random.wrap_key_data(policy._key, impl=impl)
    )
    obs_spec = jax.ShapeDtypeStruct((policy._num_agents, dim_s), jnp.float32)
    t_spec = jax.ShapeDtypeStruct((), jnp.int32)
    key_spec = jax.ShapeDtypeStruct(key_data.shape, key_data.dtype)
    flag_spec = jax.ShapeDtypeStruct((), jnp.bool_)
    spec_of = lambda leaves: tuple(  # noqa: E731
        jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype) for x in leaves
    )
    kw = {"platforms": tuple(platforms)} if platforms else {}
    step_exp = jax.export.export(jax.jit(serving_step), **kw)(
        spec_of(state_leaves), spec_of(params_leaves), spec_of(prop_leaves),
        obs_spec, t_spec, key_spec, flag_spec,
    )
    reset_exp = jax.export.export(jax.jit(serving_reset), **kw)(
        spec_of(state_leaves), key_spec
    )

    from blackbox_mpc_tpu import __version__ as pkg_version

    meta = {
        "solver_name": policy._solver_name,
        "num_agents": int(policy._num_agents),
        "planning_horizon": int(policy._planning_horizon),
        "dim_s": int(dim_s),
        "dim_u": int(bounds.dim),
        "rng_impl": impl,
        "noise_scale": float(noise_scale),
        "platforms": list(step_exp.platforms),
        "jax_version": jax.__version__,
        "package_version": pkg_version,
        "calling_convention_version": int(step_exp.calling_convention_version),
        # Topology pinning: a mesh-sharded policy exports with its collectives baked in;
        # the artifact then requires EXACTLY this many devices to serve (ServingPolicy
        # validates at load). 1 for single-device policies.
        "nr_devices": int(step_exp.nr_devices),
        "mesh_axes": (
            {name: int(size) for name, size in
             zip(policy._mesh.axis_names, policy._mesh.devices.shape)}
            if policy._mesh is not None else None
        ),
    }
    write_artifact(
        path, meta, step_exp.serialize(), reset_exp.serialize(),
        [np.asarray(x) for x in state_leaves],
        [np.asarray(x) for x in params_leaves],
        [np.asarray(x) for x in prop_leaves],
        np.asarray(key_data),
    )
    return meta


def export_dynamics(handler, path: Optional[str] = None, *,
                    platforms: Optional[Sequence[str]] = None):
    """Exports the learned dynamics model alone, with a POLYMORPHIC batch dimension.

    The direct analogue of the reference's checkpointing of a SavedModel with a concrete
    ``[None, dim_S + dim_U]`` signature (system_dynamics_handler.py:226-241): the
    exported function is ``(states [b, S], actions [b, U]) -> next_states [b, S]`` — the
    full normalize → ensemble-mean MLP → denormalize/integrate chain with the weights
    baked in — callable at ANY batch size. Returns the ``jax.export.Exported``; also
    writes its ``serialize()`` bytes to ``path`` when given (load with
    ``jax.export.deserialize``).
    """
    if handler.is_true_model:
        raise ValueError("true-model handlers have no learned dynamics to export")
    cfg = handler.config
    params = handler.dynamics_params

    def predict(states, actions):
        return handler.mean_dynamics_fn(params, states, actions)

    (b,) = jax.export.symbolic_shape("b")
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp = jax.export.export(jax.jit(predict), **kw)(
        jax.ShapeDtypeStruct((b, cfg.dim_s), jnp.float32),
        jax.ShapeDtypeStruct((b, cfg.dim_u), jnp.float32),
    )
    if path is not None:
        with open(path, "wb") as f:
            f.write(exp.serialize())
    return exp
