"""Fused CEM kernels: stream consistency + solver behavior (interpreter mode)."""
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics
from blackbox_mpc_tpu.ops.pallas_cem import make_fused_cem, make_fused_cem_kernels
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers.cem import CEMConfig


def reward_fn(s, a, ns):
    return -jnp.sum(jnp.square(ns), axis=-1) - 0.01 * jnp.sum(jnp.square(a), axis=-1)


@pytest.fixture(scope="module")
def setup():
    dyn_cfg = LearnedDynamicsConfig(dim_s=3, dim_u=2, hidden=(16,), ensemble_size=2)
    init_model, dyn = make_learned_dynamics(dyn_cfg)
    dp = init_model(jax.random.PRNGKey(0))
    horizon, agents, pop, tile = 5, 2, 16, 8
    kernels = make_fused_cem_kernels(
        dyn_cfg, reward_fn, horizon=horizon, agents=agents, population=pop,
        tile=tile, interpret=True,
    )
    return dyn_cfg, dyn, dp, kernels, (horizon, agents, pop)


@pytest.mark.slow
def test_kernel_streams_match_and_rollout_correct(setup):
    dyn_cfg, dyn, dp, (rollout_rewards, elite_moments), (H, A, P) = setup
    mean = jnp.full((A, H, 2), 0.3)  # nonzero: exercises the centered-moment contract
    std = jnp.full((A, H, 2), 0.5)
    s0 = jnp.asarray([[0.3, -0.2, 0.1], [0.0, 0.5, -0.5]])
    seed = 1234
    rewards = rollout_rewards(dp, s0, mean, std, seed)  # [P, A]
    assert rewards.shape == (P, A)

    # Extract every sample via kernel B with single-row masks, then re-evaluate with the
    # standard XLA evaluator — rewards must match, proving A and B share one stream and the
    # fused rollout math is right.
    evaluate = make_trajectory_evaluator(partial(dyn, dp), reward_fn)
    extracted = np.zeros((P, A, H, 2), np.float32)
    for p in range(P):
        for a in range(A):
            mask = jnp.zeros((P, A)).at[p, a].set(1.0)
            csum, csumsq = elite_moments(mean, std, seed, mask)  # CENTERED moments
            extracted[p, a] = np.asarray(mean[a]).reshape(H, 2) + np.asarray(csum[a]).reshape(H, 2)
            # centered sum-of-squares consistency for the single row
            np.testing.assert_allclose(
                np.asarray(csumsq[a]), np.asarray(csum[a]) ** 2, rtol=1e-4, atol=1e-5
            )
    ref_rewards = evaluate(s0, jnp.asarray(extracted))
    np.testing.assert_allclose(np.asarray(rewards), np.asarray(ref_rewards), rtol=1e-3, atol=1e-3)
    # samples follow the requested distribution roughly
    z = (extracted - np.asarray(mean)[None]) / np.asarray(std)[None]
    assert np.abs(z).max() <= 2.0 + 1e-5
    assert 0.5 < z.std() < 1.1


def test_fused_cem_solves_quadratic(setup):
    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    cfg = CEMConfig(planning_horizon=H, num_agents=A, population=64, num_elite=8,
                    max_iterations=6)
    # dynamics: contracting toward 0; reward favors small states and actions -> mean -> ~0
    solver = make_fused_cem(cfg, bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
    state = solver.init(jax.random.PRNGKey(0))
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    action, state2, aux = solver.solve(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
    assert action.shape == (A, 2)
    assert np.all(np.isfinite(np.asarray(action)))
    assert np.all(np.isfinite(np.asarray(aux.expected_reward)))


def test_mpc_policy_fused_cem_backend():
    """rollout_backend='fused_cem' drives the generate-in-kernel CEM through the policy
    facade (interpreter mode off-TPU)."""
    import numpy as np

    from blackbox_mpc_tpu.core.spaces import BoxSpace
    from blackbox_mpc_tpu.learning import DynamicsHandler
    from blackbox_mpc_tpu.models import pendulum_reward
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.policies import MPCPolicy

    handler = DynamicsHandler(config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)))
    policy = MPCPolicy(
        action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
        reward_function=pendulum_reward,
        dynamics_handler=handler,
        solver_name="CEM",
        planning_horizon=5,
        population=32,
        num_elite=4,
        max_iterations=2,
        rollout_backend="fused_cem",
    )
    action, next_obs, pred_reward = policy.act(np.asarray([1.0, 0.0, 0.0], np.float32))
    assert action.shape == (1,) and np.isfinite(action).all()
    assert np.isfinite(pred_reward)

    import pytest

    with pytest.raises(ValueError, match="fused"):
        MPCPolicy(
            action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
            reward_function=pendulum_reward,
            dynamics_handler=handler,
            solver_name="SPSA",  # no fused path (PI2/MPPI/RandomSearch have one since r3)
            planning_horizon=5,
            population=32,
            rollout_backend="fused_cem",
        )


def test_backend_auto_selects_fused_cem_beyond_hbm():
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.ops.backend_select import choose_backend

    cfg = LearnedDynamicsConfig(dim_s=17, dim_u=6, hidden=(200, 200))
    # 8M candidates x H=50 x U=6 x 4B = 9.6 GB candidate tensor: beyond HBM -> fused CEM.
    assert choose_backend(cfg, 8_000_000, 1, platform="tpu", horizon=50, dim_u=6,
                          solver_name="CEM") == "fused_cem"
    # Same scale but a solver outside the fused family (CEM/PI2/MPPI/RandomSearch) has
    # no fused path: XLA (will OOM, but honestly).
    assert choose_backend(cfg, 8_000_000, 1, platform="tpu", horizon=50, dim_u=6,
                          solver_name="SPSA") == "xla"
    # Ordinary populations stay on the measured xla/pallas rule.
    assert choose_backend(cfg, 1000, 1, platform="tpu", horizon=50, dim_u=6,
                          solver_name="CEM") == "xla"


def test_streamed_kernel_bitmatches_block_kernel(rng):
    """The streamed (per-step generation, (tiles, H) grid) rollout kernel must reproduce
    the block kernel exactly: same global (row, col) RNG counters, same step math — only
    the schedule differs. Odd sizes exercise the padding paths of both."""
    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=2, hidden=(16, 16), ensemble_size=2)
    init_model, _ = make_learned_dynamics(cfg)
    dp = init_model(jax.random.PRNGKey(0))
    H, A, P = 7, 3, 90  # rows = 270: not a multiple of either kernel's tile
    kw = dict(horizon=H, agents=A, population=P, interpret=True)
    rr_block, _ = make_fused_cem_kernels(cfg, reward_fn, streamed=False, **kw)
    rr_stream, _ = make_fused_cem_kernels(cfg, reward_fn, streamed=True, **kw)
    s0 = jnp.asarray(rng.uniform(-1, 1, (A, 3)).astype(np.float32))
    mean = jnp.asarray(rng.uniform(-0.5, 0.5, (A, H, 2)).astype(np.float32))
    std = jnp.asarray(rng.uniform(0.1, 0.5, (A, H, 2)).astype(np.float32))
    a = np.asarray(rr_block(dp, s0, mean, std, 1234))
    b = np.asarray(rr_stream(dp, s0, mean, std, 1234))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


# --- round-3 feature parity: colored noise, injected candidates, ts1 ------------------------


def _extract_all(elite_moments, mean, std, seed, P, A, H, U, extra=None):
    """Every candidate's value via single-row kernel-B masks (mean + centered sum)."""
    vals = np.zeros((P, A, H, U), np.float32)
    for p in range(P):
        for a in range(A):
            mask = jnp.zeros((P, A)).at[p, a].set(1.0)
            args = (mean, std, seed, mask) + ((extra,) if extra is not None else ())
            csum, _ = elite_moments(*args)
            vals[p, a] = np.asarray(mean[a]).reshape(H, U) + np.asarray(csum[a]).reshape(H, U)
    return jnp.asarray(vals)


@pytest.mark.slow
def test_colored_noise_stream_matches_and_is_temporally_smooth(setup):
    """Colored generation: kernels A and B share one stream (extracted candidates
    re-evaluate to identical rewards on the XLA evaluator) and the candidates are
    temporally correlated along the horizon, unlike the white path. H=16 here: at the
    fixture's H=5, beta=2 noise has lag-1 ~ -0.07 (too few rfft bins to be smooth —
    verified identical in the reference sampler)."""
    dyn_cfg, dyn, dp, _, (_, A, P) = setup
    H = 16
    rr, em = make_fused_cem_kernels(
        dyn_cfg, reward_fn, horizon=H, agents=A, population=P, tile=8, interpret=True,
        colored_noise_beta=2.0,
    )
    mean = jnp.full((A, H, 2), 0.1)
    std = jnp.full((A, H, 2), 0.5)
    s0 = jnp.asarray([[0.3, -0.2, 0.1], [0.0, 0.5, -0.5]])
    seed = 777
    rewards = rr(dp, s0, mean, std, seed)
    extracted = _extract_all(em, mean, std, seed, P, A, H, 2)
    evaluate = make_trajectory_evaluator(partial(dyn, dp), reward_fn)
    np.testing.assert_allclose(
        np.asarray(rewards), np.asarray(evaluate(s0, extracted)), rtol=1e-3, atol=1e-3
    )
    # temporal smoothness: mean lag-1 autocorrelation along H far above the white path's
    z = (np.asarray(extracted) - 0.1) / 0.5  # [P, A, H, U]
    z = z - z.mean(axis=2, keepdims=True)
    num = (z[:, :, 1:] * z[:, :, :-1]).sum()
    den = np.sqrt((z[:, :, 1:] ** 2).sum() * (z[:, :, :-1] ** 2).sum())
    assert num / den > 0.4, num / den  # beta=2 (red-ish noise); white is ~0


def test_colored_mirror_matches_reference_sampler_statistics():
    """_mirror_z's spectral-basis construction reproduces solvers.base.colored_noise's
    distribution: compare lag-1 autocorrelation and per-sequence std on large samples."""
    from blackbox_mpc_tpu.ops.pallas_cem import _colored_basis2, _mirror_z
    from blackbox_mpc_tpu.solvers.base import colored_noise

    H, U, beta, N = 16, 2, 2.0, 4000
    basis2 = jnp.asarray(_colored_basis2(H, U, beta))
    z_k = np.asarray(_mirror_z(123, jnp.arange(N), H * U, basis2)).reshape(N, H, U)
    z_r = np.asarray(colored_noise(jax.random.PRNGKey(0), beta, (N, 1, H, U)))[:, 0]

    def lag1(z):
        zc = z - z.mean(axis=1, keepdims=True)
        return float((zc[:, 1:] * zc[:, :-1]).sum()
                     / np.sqrt((zc[:, 1:] ** 2).sum() * (zc[:, :-1] ** 2).sum()))

    assert abs(lag1(z_k) - lag1(z_r)) < 0.05, (lag1(z_k), lag1(z_r))
    # per-sequence normalization is to sample-std around the sequence mean, so the pooled
    # std around zero is slightly above 1 (+mean^2 term); the kernel's +/-2 clip pulls it
    # back down. Both must sit in the same band.
    assert 0.9 < z_k.std() < 1.15 and 0.95 < z_r.std() < 1.2, (z_k.std(), z_r.std())


@pytest.mark.slow
def test_injected_candidates_roundtrip(setup):
    """extra_slots: the last population indices read their actions from the extra buffer —
    kernel A must score exactly those actions and kernel B must return them verbatim."""
    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    extra_slots = 3
    rr, em = make_fused_cem_kernels(
        dyn_cfg, reward_fn, horizon=H, agents=A, population=P, tile=8, interpret=True,
        extra_slots=extra_slots,
    )
    rng = np.random.default_rng(5)
    extra = jnp.asarray(rng.uniform(-1, 1, (extra_slots, A, H * 2)).astype(np.float32))
    mean = jnp.full((A, H, 2), 0.3)
    std = jnp.full((A, H, 2), 0.5)
    s0 = jnp.asarray([[0.3, -0.2, 0.1], [0.0, 0.5, -0.5]])
    seed = 99
    rewards = rr(dp, s0, mean, std, seed, extra)
    evaluate = make_trajectory_evaluator(partial(dyn, dp), reward_fn)
    # injected rows: rewards equal the XLA evaluator on the buffer's exact actions
    inj_actions = jnp.swapaxes(extra.reshape(extra_slots, A, H, 2), 0, 1)  # [A, E, H, 2]
    ref = evaluate(s0, jnp.swapaxes(inj_actions, 0, 1))  # [E, A]
    np.testing.assert_allclose(
        np.asarray(rewards)[P - extra_slots:], np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    # kernel B returns injected values verbatim
    vals = _extract_all(em, mean, std, seed, P, A, H, 2, extra=extra)
    np.testing.assert_allclose(
        np.asarray(vals)[P - extra_slots:],
        np.asarray(extra.reshape(extra_slots, A, H, 2)), rtol=1e-5, atol=1e-5,
    )
    # fresh rows still re-evaluate correctly (stream unchanged by the extra operand)
    np.testing.assert_allclose(
        np.asarray(rewards)[: P - extra_slots],
        np.asarray(evaluate(s0, vals))[: P - extra_slots], rtol=1e-3, atol=1e-3,
    )


@pytest.mark.slow
def test_ts1_runs_one_member_per_tile(setup):
    """ts1 fused CEM: each tile's rewards must equal the XLA rollout under exactly the
    ensemble member named by rollout_rewards.tile_member_ids."""
    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    ts1_cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=2, hidden=(16,), ensemble_size=2, propagation="ts1"
    )
    rr, em = make_fused_cem_kernels(
        ts1_cfg, reward_fn, horizon=H, agents=A, population=P, tile=8, interpret=True,
    )
    mean = jnp.full((A, H, 2), 0.2)
    std = jnp.full((A, H, 2), 0.4)
    s0 = jnp.asarray([[0.3, -0.2, 0.1], [0.0, 0.5, -0.5]])
    seed = 41
    rewards = np.asarray(rr(dp, s0, mean, std, seed))  # [P, A]
    extracted = _extract_all(em, mean, std, seed, P, A, H, 2)

    # per-member XLA dynamics: slice member e's params out of the stacked ensemble
    single_cfg = LearnedDynamicsConfig(dim_s=3, dim_u=2, hidden=(16,), ensemble_size=1)
    _, single_dyn = make_learned_dynamics(single_cfg)
    per_member = []
    for e in range(2):
        dp_e = dp.replace(params=jax.tree.map(lambda x, e=e: x[e], dp.params))
        ev = make_trajectory_evaluator(partial(single_dyn, dp_e), reward_fn)
        per_member.append(np.asarray(ev(s0, extracted)))  # [P, A]

    members = rr.tile_member_ids
    tile_rows = rr.tile_rows
    assert sorted(set(members.tolist())) == [0, 1]  # both members used
    for p in range(P):
        for a in range(A):
            row = p * A + a
            m = members[row // tile_rows]
            np.testing.assert_allclose(
                rewards[p, a], per_member[m][p, a], rtol=1e-3, atol=1e-3,
                err_msg=f"row {row} tile member {m}",
            )


@pytest.mark.parametrize("features", [
    dict(keep_elites=4),
    dict(mean_as_candidate=True),
    dict(execute_best=True),
    dict(colored_noise_beta=2.0),
    dict(population_decay=0.7),
    dict(keep_elites=4, mean_as_candidate=True, execute_best=True, colored_noise_beta=2.0),
    dict(keep_elites=4, mean_as_candidate=True, execute_best=True, colored_noise_beta=2.0,
         population_decay=0.7),
])
def test_fused_cem_feature_matrix_solves(setup, features):
    """Every iCEM feature combination must run through the fused solver and still drive
    the contracting-dynamics task (reward favors small states/actions -> action near 0)."""
    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    cfg = CEMConfig(planning_horizon=H, num_agents=A, population=64, num_elite=8,
                    max_iterations=6, **features)
    solver = make_fused_cem(cfg, bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
    state = solver.init(jax.random.PRNGKey(0))
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    action, _, aux = jax.jit(solver.solve)(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(action)))
    assert np.all(np.isfinite(np.asarray(aux.expected_reward)))
    if features.get("execute_best"):
        # action is the best plan's first step, and the plan rides in aux
        np.testing.assert_allclose(np.asarray(action), np.asarray(aux.plan)[:, 0])


def test_fused_cem_population_decay_schedule_and_quality(setup):
    """r4: population_decay fuses (per-iteration kernel grids, unrolled). The fused
    schedule must be the XLA solver's iteration_populations rule, and the decayed solve
    must still contract the mean toward the task optimum (actions near 0)."""
    from blackbox_mpc_tpu.solvers.cem import iteration_populations

    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    cfg = CEMConfig(planning_horizon=H, num_agents=A, population=64, num_elite=8,
                    max_iterations=4, population_decay=0.5)
    # Pinneri rule with the 2k floor: 64, 32, 16, 16
    assert iteration_populations(cfg) == [64, 32, 16, 16]
    solver = make_fused_cem(cfg, bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
    state = solver.init(jax.random.PRNGKey(0))
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    action, _, aux = jax.jit(solver.solve)(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(action)))
    # the decayed solve (128 total samples vs 256) stays close to full-budget quality
    full = make_fused_cem(
        dataclasses.replace(cfg, population_decay=1.0),
        bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
    _, _, aux_full = jax.jit(full.solve)(
        full.init(jax.random.PRNGKey(0)), obs, jnp.asarray(0), jax.random.PRNGKey(1))
    r_d = np.asarray(aux.expected_reward)
    r_f = np.asarray(aux_full.expected_reward)
    assert np.all(r_d >= r_f - np.maximum(0.5, 0.5 * np.abs(r_f)))
    # invalid decay rejected like the XLA solver
    with pytest.raises(ValueError, match="population_decay"):
        make_fused_cem(
            CEMConfig(planning_horizon=H, num_agents=A, population=64, num_elite=8,
                      population_decay=0.0),
            bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)


def test_fused_cem_ts1_solver(setup):
    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    ts1_cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=2, hidden=(16,), ensemble_size=2, propagation="ts1"
    )
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    cfg = CEMConfig(planning_horizon=H, num_agents=A, population=64, num_elite=8,
                    max_iterations=4)
    solver = make_fused_cem(cfg, bounds, ts1_cfg, dp, reward_fn, tile=8, interpret=True)
    state = solver.init(jax.random.PRNGKey(0))
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    action, _, aux = jax.jit(solver.solve)(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(action)))


def test_streamed_rejects_features():
    dyn_cfg = LearnedDynamicsConfig(dim_s=3, dim_u=2, hidden=(16,))
    with pytest.raises(ValueError, match="streamed"):
        make_fused_cem_kernels(
            dyn_cfg, reward_fn, horizon=5, agents=1, population=16, tile=8,
            streamed=True, colored_noise_beta=2.0, interpret=True,
        )


def test_backend_auto_allows_icem_features_beyond_hbm():
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.ops.backend_select import choose_backend

    cfg = LearnedDynamicsConfig(dim_s=17, dim_u=6, hidden=(200, 200))
    icem = CEMConfig(population=8_000_000, colored_noise_beta=2.0, keep_elites=20,
                     mean_as_candidate=True, execute_best=True)
    assert choose_backend(cfg, 8_000_000, 1, platform="tpu", horizon=50, dim_u=6,
                          solver_name="CEM", solver_config=icem) == "fused_cem"
    # population_decay fuses single-device since r4 (per-iteration kernel grids) ...
    decay = CEMConfig(population=8_000_000, population_decay=0.5)
    assert choose_backend(cfg, 8_000_000, 1, platform="tpu", horizon=50, dim_u=6,
                          solver_name="CEM", solver_config=decay) == "fused_cem"
    # ... and since r5 the SHARDED fused path instantiates per-iteration sharded grids,
    # so decay + mesh stays fused too (fused_sharded.py make_sharded_fused_cem).
    import jax as _jax

    from blackbox_mpc_tpu.parallel import make_pop_mesh

    mesh = make_pop_mesh(len(_jax.devices()))
    assert choose_backend(cfg, 8_000_000 * len(_jax.devices()), 1, platform="tpu",
                          horizon=50, dim_u=6, mesh=mesh,
                          solver_name="CEM", solver_config=decay) == "fused_cem"


# --- fused PI2/MPPI and RandomSearch (beyond-HBM solver family) ------------------------------


@pytest.mark.slow
def test_fused_weighted_moments_match_einsum(setup):
    """kernel B is weight-agnostic: arbitrary softmax-style weights must reduce to exactly
    einsum('pa,pax->ax', w, centered) over the extracted candidates — the fused-PI2 update."""
    dyn_cfg, dyn, dp, (rr, em), (H, A, P) = setup
    mean = jnp.full((A, H, 2), 0.2)
    std = jnp.full((A, H, 2), 0.5)
    seed = 31
    extracted = _extract_all(em, mean, std, seed, P, A, H, 2)  # [P, A, H, 2]
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.uniform(0, 1, (P, A)).astype(np.float32))
    w = w / w.sum(axis=0, keepdims=True)
    wsum, wsumsq = em(mean, std, seed, w)
    centered = np.asarray(extracted).reshape(P, A, H * 2) - np.asarray(mean).reshape(A, H * 2)
    np.testing.assert_allclose(
        np.asarray(wsum), np.einsum("pa,pax->ax", np.asarray(w), centered),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(wsumsq), np.einsum("pa,pax->ax", np.asarray(w), centered**2),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_fused_mppi_dot_output_matches_einsum(setup):
    """aux_dot: kernel A's second output column is <g_row, std*z> per row — the MPPI
    control-cost inner product against the extracted perturbations."""
    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    rr, em = make_fused_cem_kernels(
        dyn_cfg, reward_fn, horizon=H, agents=A, population=P, tile=8, interpret=True,
        aux_dot=True,
    )
    mean = jnp.full((A, H, 2), 0.3)
    std = jnp.full((A, H, 2), 0.5)
    s0 = jnp.asarray([[0.3, -0.2, 0.1], [0.0, 0.5, -0.5]])
    seed = 13
    rng = np.random.default_rng(7)
    gvec = jnp.asarray(rng.uniform(-1, 1, (A, H * 2)).astype(np.float32))
    rewards, dots = rr(dp, s0, mean, std, seed, gvec=gvec)
    extracted = _extract_all(em, mean, std, seed, P, A, H, 2)
    centered = np.asarray(extracted).reshape(P, A, H * 2) - np.asarray(mean).reshape(A, H * 2)
    expect = np.einsum("ax,pax->pa", np.asarray(gvec), centered)
    np.testing.assert_allclose(np.asarray(dots), expect, rtol=1e-4, atol=1e-4)
    # rewards still correct alongside the extra output column
    evaluate = make_trajectory_evaluator(partial(dyn, dp), reward_fn)
    np.testing.assert_allclose(
        np.asarray(rewards), np.asarray(evaluate(s0, extracted)), rtol=1e-3, atol=1e-3
    )


def test_fused_pi2_and_mppi_solve(setup):
    from blackbox_mpc_tpu.ops.pallas_cem import make_fused_pi2
    from blackbox_mpc_tpu.solvers.pi2 import MPPIConfig, PI2Config

    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    for cfg in (
        PI2Config(planning_horizon=H, num_agents=A, population=64, max_iterations=4),
        PI2Config(planning_horizon=H, num_agents=A, population=64, max_iterations=4,
                  adapt_variance=True, colored_noise_beta=2.0),
        MPPIConfig(planning_horizon=H, num_agents=A, population=64, max_iterations=4),
    ):
        solver = make_fused_pi2(cfg, bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
        state = solver.init(jax.random.PRNGKey(0))
        action, next_state, aux = jax.jit(solver.solve)(
            state, obs, jnp.asarray(0), jax.random.PRNGKey(1)
        )
        assert np.all(np.isfinite(np.asarray(action))), solver.name
        assert np.all(np.isfinite(np.asarray(aux.expected_reward))), solver.name
        # PI2 warm-starts by time-shift: carried mean differs from init
        assert not np.allclose(np.asarray(next_state.mean), np.asarray(state.mean))


def test_fused_random_search_matches_xla_argmax(setup):
    from blackbox_mpc_tpu.ops.pallas_cem import _mirror_z, make_fused_random_search
    from blackbox_mpc_tpu.solvers.random_search import RandomSearchConfig

    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    cfg = RandomSearchConfig(planning_horizon=H, num_agents=A, population=64)
    solver = make_fused_random_search(cfg, bounds, dyn_cfg, dp, reward_fn, tile=8,
                                      interpret=True)
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    key = jax.random.PRNGKey(4)
    action, _, aux = jax.jit(solver.solve)(
        solver.init(jax.random.PRNGKey(0)), obs, jnp.asarray(0), key
    )
    # regenerate the WHOLE candidate set via the mirror and cross-check the argmax
    seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
    rows = jnp.arange(64 * A)
    z = np.asarray(_mirror_z(seed, rows, H * 2, sampling="uniform")).reshape(64, A, H, 2)
    assert np.abs(z).max() <= 1.0 and -0.2 < z.mean() < 0.2  # U(-1,1)
    samples = jnp.asarray(0.0 + 1.0 * z)  # mid=0, half-range=1 for these bounds
    evaluate = make_trajectory_evaluator(partial(dyn, dp), reward_fn)
    rewards = np.asarray(evaluate(obs, samples))  # [P, A]
    best = rewards.argmax(axis=0)
    np.testing.assert_allclose(
        np.asarray(aux.expected_reward), rewards[best, np.arange(A)], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(action), np.asarray(samples)[best, np.arange(A), 0], rtol=1e-4, atol=1e-4
    )


def test_mpc_policy_fused_family_backends():
    """rollout_backend='fused' drives PI2, MPPI, and RandomSearch through the policy."""
    from blackbox_mpc_tpu.core.spaces import BoxSpace
    from blackbox_mpc_tpu.learning import DynamicsHandler
    from blackbox_mpc_tpu.models import pendulum_reward
    from blackbox_mpc_tpu.policies import MPCPolicy

    handler = DynamicsHandler(config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)))
    for solver_name in ("PI2", "MPPI", "RandomSearch"):
        policy = MPCPolicy(
            action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
            reward_function=pendulum_reward,
            dynamics_handler=handler,
            solver_name=solver_name,
            planning_horizon=5,
            population=32,
            max_iterations=2,
            rollout_backend="fused",
        )
        action, _, pred = policy.act(np.asarray([1.0, 0.0, 0.0], np.float32))
        assert action.shape == (1,) and np.isfinite(action).all(), solver_name
        assert np.isfinite(pred), solver_name
    with pytest.raises(ValueError, match="fused"):
        MPCPolicy(
            action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
            reward_function=pendulum_reward,
            dynamics_handler=handler,
            solver_name="SPSA",
            planning_horizon=5,
            population=32,
            rollout_backend="fused",
        )


def test_backend_auto_routes_fused_family_beyond_hbm():
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.ops.backend_select import choose_backend
    from blackbox_mpc_tpu.solvers.pi2 import PI2Config

    cfg = LearnedDynamicsConfig(dim_s=17, dim_u=6, hidden=(200, 200))
    common = dict(population=8_000_000, num_agents=1, platform="tpu", horizon=50, dim_u=6)
    for name in ("PI2", "MPPI", "RandomSearch"):
        assert choose_backend(cfg, solver_name=name, **common) == "fused_cem", name
    assert choose_backend(
        cfg, solver_name="PI2",
        solver_config=PI2Config(population=8_000_000, adapt_variance=True,
                                control_cost=True),
        **common,
    ) == "fused_cem"
    assert choose_backend(cfg, solver_name="SPSA", **common) == "xla"


@pytest.mark.slow
def test_fused_pi2_clips_to_bounds_and_penalizes(setup):
    """Review fix: fused PI2 must clip candidates to bounds in-kernel (subtracting the
    squared-violation penalty, solvers/base.bound_violation_penalty) so the weighted mean
    — a convex combination of clipped samples — can never leave the action space."""
    from blackbox_mpc_tpu.ops.pallas_cem import _mirror_z, make_fused_pi2
    from blackbox_mpc_tpu.solvers.pi2 import PI2Config

    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    bounds = Bounds.of(-0.3, 0.3, dim=2)  # tight bounds: sigma = range/4 clips often
    # kernel-level: rewards == evaluate(clipped extracted) - penalty(raw)
    rr, em = make_fused_cem_kernels(
        dyn_cfg, reward_fn, horizon=H, agents=A, population=P, tile=8, interpret=True,
        clip_bounds=(bounds.lower, bounds.upper),
    )
    mean = jnp.full((A, H, 2), 0.25)  # near the upper bound -> frequent clipping
    std = jnp.full((A, H, 2), 0.15)
    s0 = jnp.asarray([[0.3, -0.2, 0.1], [0.0, 0.5, -0.5]])
    seed = 55
    rewards = np.asarray(rr(dp, s0, mean, std, seed))
    clipped = _extract_all(em, mean, std, seed, P, A, H, 2)  # kernel B returns CLIPPED
    assert np.asarray(clipped).max() <= 0.3 + 1e-6 and np.asarray(clipped).min() >= -0.3 - 1e-6
    rows = jnp.arange(P * A)
    z = np.asarray(_mirror_z(seed, rows, H * 2)).reshape(P, A, H, 2)
    raw = np.asarray(mean)[None] + np.asarray(std)[None] * z
    assert (np.abs(raw) > 0.3).any()  # clipping actually exercised
    penalty = np.square(raw - np.clip(raw, -0.3, 0.3)).reshape(P, A, -1).sum(-1)
    evaluate = make_trajectory_evaluator(partial(dyn, dp), reward_fn)
    np.testing.assert_allclose(
        rewards, np.asarray(evaluate(s0, clipped)) - penalty, rtol=1e-3, atol=1e-3
    )
    # solver-level: the plan mean never drifts out of bounds, even over many iterations
    cfg = PI2Config(planning_horizon=H, num_agents=A, population=64, max_iterations=10)
    solver = make_fused_pi2(cfg, bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    action, next_state, _ = jax.jit(solver.solve)(
        solver.init(jax.random.PRNGKey(0)), obs, jnp.asarray(0), jax.random.PRNGKey(1)
    )
    assert np.abs(np.asarray(action)).max() <= 0.3 + 1e-5
    assert np.abs(np.asarray(next_state.mean)).max() <= 0.3 + 1e-5


def test_fused_backend_rejects_discount():
    from blackbox_mpc_tpu.core.spaces import BoxSpace
    from blackbox_mpc_tpu.learning import DynamicsHandler
    from blackbox_mpc_tpu.models import pendulum_reward
    from blackbox_mpc_tpu.policies import MPCPolicy

    handler = DynamicsHandler(config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)))
    with pytest.raises(ValueError, match="discount"):
        MPCPolicy(
            action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
            reward_function=pendulum_reward,
            dynamics_handler=handler,
            solver_name="CEM", planning_horizon=5, population=32, num_elite=4,
            discount=0.95, rollout_backend="fused",
        )


def test_fused_sep_cma_solves_and_respects_bounds(setup):
    """Fused sep-CMA-ES: diagonal covariance adaptation from the weighted moments."""
    from blackbox_mpc_tpu.ops.pallas_cem import make_fused_sep_cma
    from blackbox_mpc_tpu.solvers.cma_es import CMAESConfig

    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    cfg = CMAESConfig(planning_horizon=H, num_agents=A, population=64, num_elite=16,
                      max_iterations=6, diagonal=True)
    solver = make_fused_sep_cma(cfg, bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
    state = solver.init(jax.random.PRNGKey(0))
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    action, ns, aux = jax.jit(solver.solve)(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(action)))
    assert np.all(np.isfinite(np.asarray(aux.expected_reward)))
    # contracting task: covariance adapts but stays positive/finite
    assert np.all(np.asarray(ns.cov) > 0) and np.all(np.isfinite(np.asarray(ns.sigma)))
    # adaptive h_sigma variant also runs
    cfg2 = CMAESConfig(planning_horizon=H, num_agents=A, population=64, num_elite=16,
                       max_iterations=3, diagonal=True, adaptive_h_sigma=True)
    solver2 = make_fused_sep_cma(cfg2, bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
    a2, _, _ = jax.jit(solver2.solve)(
        solver2.init(jax.random.PRNGKey(0)), obs, jnp.asarray(0), jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(a2)))
    # full-covariance mode cannot fuse
    with pytest.raises(ValueError, match="diagonal"):
        make_fused_sep_cma(
            CMAESConfig(planning_horizon=H, num_agents=A, population=64, num_elite=16),
            bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)


def test_fused_sep_cma_respects_state_dtype(setup):
    """Advisor r3: a non-default CMAESConfig.dtype was silently ignored on the fused path
    (the XLA make_cma_es wraps with with_state_dtype; the fused factory returned bare)."""
    from blackbox_mpc_tpu.ops.pallas_cem import make_fused_sep_cma
    from blackbox_mpc_tpu.solvers.cma_es import CMAESConfig

    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    cfg = CMAESConfig(planning_horizon=H, num_agents=A, population=64, num_elite=16,
                      max_iterations=2, diagonal=True, dtype=jnp.bfloat16)
    solver = make_fused_sep_cma(cfg, bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
    state = solver.init(jax.random.PRNGKey(0))
    assert state.mean.dtype == jnp.bfloat16 and state.cov.dtype == jnp.bfloat16
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    action, ns, _ = jax.jit(solver.solve)(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
    # actions stay f32 at the boundary; persistent state is stored back in bf16
    assert action.dtype == jnp.float32 and ns.mean.dtype == jnp.bfloat16


@pytest.mark.slow
def test_fused_sep_cma_update_matches_xla_math(setup):
    """One fused sep-CMA iteration must reproduce the XLA solver's update computed by hand
    from the extracted candidates (same weights, same clipped x_diff, same constants)."""
    from blackbox_mpc_tpu.ops.pallas_cem import make_fused_sep_cma
    from blackbox_mpc_tpu.solvers.cma_es import CMAESConfig, cma_constants

    dyn_cfg, dyn, dp, _, (H, A, P) = setup
    bounds = Bounds.of(-0.8, 0.8, dim=2)
    pop, k = 16, 4
    cfg = CMAESConfig(planning_horizon=H, num_agents=A, population=pop, num_elite=k,
                      max_iterations=1, diagonal=True)
    C = cma_constants(cfg, bounds, H, pop, k)
    solver = make_fused_sep_cma(cfg, bounds, dyn_cfg, dp, reward_fn, tile=8, interpret=True)
    state = solver.init(jax.random.PRNGKey(0))
    obs = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.5]])
    key = jax.random.PRNGKey(9)
    action, ns, aux = jax.jit(solver.solve)(state, obs, jnp.asarray(0), key)

    # hand recompute: same seed derivation, kernels with clip_bounds for extraction
    _, seed_key = jax.random.split(key)
    seed = jax.random.randint(seed_key, (), 0, jnp.iinfo(jnp.int32).max)
    rr, em = make_fused_cem_kernels(
        dyn_cfg, reward_fn, horizon=H, agents=A, population=pop, tile=8, interpret=True,
        clip_bounds=(bounds.lower, bounds.upper),
    )
    std_eff = state.sigma * state.chol
    rewards = np.asarray(rr(dp, obs, state.mean, std_eff, seed))
    vals = _extract_all(em, state.mean.reshape(A, H, 2),
                        std_eff.reshape(A, H, 2), seed, pop, A, H, 2)  # clipped x
    x_diff = np.asarray(vals).reshape(pop, A, -1).transpose(1, 0, 2) \
        - np.asarray(state.mean)[:, None]
    order = np.argsort(-rewards.T, axis=1)  # [A, P]
    x_sorted = np.take_along_axis(x_diff, order[:, :, None], axis=1)
    x_mean = np.einsum("p,apn->an", C.weights, x_sorted)
    # aux.plan is the pre-shift updated mean: mean + sum w (x_sorted - mean)
    np.testing.assert_allclose(
        np.asarray(aux.plan).reshape(A, -1),
        np.asarray(state.mean) + x_mean, rtol=1e-4, atol=1e-5,
    )
    # and the reported best reward is the max of the recomputed vector
    np.testing.assert_allclose(
        np.asarray(aux.expected_reward), rewards.max(axis=0), rtol=1e-5, atol=1e-5
    )


def test_rng_seed_is_a_key_not_a_counter_offset():
    """Review regression: with an ADDITIVE seed, mix(c*PHI + s) satisfies the window
    identity stream(s + d, c) == stream(s, c + d*PHI^-1 mod 2^32) for every c — so two
    per-device seeds were shifted windows of ONE sequence and overlapped wholesale at pod
    scale. The keyed mix (key = mix(seed), xor-combined) must break that identity."""
    from blackbox_mpc_tpu.ops.pallas_cem import _uniform

    PHI = 0x9E3779B1
    phi_inv = pow(PHI, -1, 2**32)
    seed = jnp.int32(12345)
    delta = 0x7F4A7C15  # the sharded-fused per-device stride
    shift = (delta * phi_inv) % 2**32
    c = jnp.arange(1000, dtype=jnp.int32)
    lhs = np.asarray(_uniform(c, seed + jnp.int32(delta)))
    # counter + shift with int32 wraparound (shift may exceed int32 max: split it)
    c_shifted = (c.astype(jnp.uint32) + jnp.uint32(shift)).astype(jnp.int32)
    rhs = np.asarray(_uniform(c_shifted, seed))
    matches = (lhs == rhs).mean()
    assert matches < 0.01, (
        f"{matches:.1%} of elements satisfy the additive-seed window identity — the seed "
        "is acting as a counter offset again; per-device streams would overlap"
    )
