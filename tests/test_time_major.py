"""Time-major candidate layout (round 4).

``CEMConfig(time_major=True)`` + ``make_trajectory_evaluator(time_major=True)`` sample and
evaluate the candidate tensor as ``[H, P, A, U]`` so the horizon scan consumes it with no
relayout — eliminating the materialized ``[P·A, H, U] -> [H, P·A, U]`` transpose that the
r4 hardware profile measured at 13.6 ms/solve (~10 %) on the 256-agent x 1k bench shape
(docs/performance.md, "The 256-agent shape"). These tests pin:

* the evaluator itself is BITWISE identical under either layout (same scan, same
  reduction order — only the input view changes);
* ``cem_iteration`` computes the same update in either layout when fed the same samples
  (the RNG element association differs in production, so equality is asserted by
  injecting a deterministic sampler);
* the sharded evaluator and the policy wiring carry the flag end-to-end;
* the documented incompatibilities (colored noise, kernel backends, CEM-GD) raise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.rollout.evaluator import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import cem


def _tm(candidates):
    """[P, A, H, U] -> [H, P, A, U]."""
    return jnp.transpose(candidates, (2, 0, 1, 3))


def test_evaluator_time_major_bitmatches_standard():
    ev = make_trajectory_evaluator(
        pendulum_dynamics, pendulum_reward, discount=0.97,
        action_smoothness_weight=0.01,
    )
    ev_tm = make_trajectory_evaluator(
        pendulum_dynamics, pendulum_reward, discount=0.97,
        action_smoothness_weight=0.01, time_major=True,
    )
    key = jax.random.PRNGKey(0)
    cands = jax.random.uniform(key, (17, 3, 9, 1), minval=-2.0, maxval=2.0)
    obs = jax.random.normal(jax.random.PRNGKey(1), (3, 3))
    r_std = ev(obs, cands)
    r_tm = ev_tm(obs, _tm(cands))
    assert r_std.shape == r_tm.shape == (17, 3)
    np.testing.assert_array_equal(np.asarray(r_std), np.asarray(r_tm))


def test_evaluator_time_major_bitmatches_standard_stochastic_particles():
    """PETS particles (key passed, num_particles>1): the particle repeat happens on the
    population axis in both layouts and flattens to the identical row order, so the
    rollout-noise keys line up row-for-row -> bitwise-equal rewards."""
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig, make_learned_dynamics

    cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=1, hidden=(16,), ensemble_size=2, probabilistic=True,
        propagation="ts_inf",
    )
    init_model, dyn = make_learned_dynamics(cfg)
    params = init_model(jax.random.PRNGKey(3))
    kw = dict(discount=1.0, num_particles=3)
    ev = make_trajectory_evaluator(lambda s, a, k: dyn(params, s, a, k),
                                   pendulum_reward, **kw)
    ev_tm = make_trajectory_evaluator(lambda s, a, k: dyn(params, s, a, k),
                                      pendulum_reward, time_major=True, **kw)
    cands = jax.random.uniform(jax.random.PRNGKey(4), (8, 2, 5, 1), minval=-1, maxval=1)
    obs = jax.random.normal(jax.random.PRNGKey(5), (2, 3))
    rk = jax.random.PRNGKey(6)
    np.testing.assert_array_equal(
        np.asarray(ev(obs, cands, rk)), np.asarray(ev_tm(obs, _tm(cands), rk))
    )


def _fake_truncated_normal(H, A):
    """Deterministic stand-in for cem.truncated_normal: both layouts receive the SAME
    canonical draw (transposed), so the two cem_iteration paths see identical samples.
    Layout is identified by shape position (dims are chosen distinct in the tests)."""

    def fake(key, mean, stddev, shape):
        del key
        if len(shape) == 4 and shape[2] == H:        # [n, A, H, U] (standard)
            n = shape[0]
            z = _canon(n, A, H, shape[3])
        elif len(shape) == 4 and shape[0] == H:      # [H, n, A, U] (time-major)
            n = shape[1]
            z = jnp.transpose(_canon(n, A, H, shape[3]), (2, 0, 1, 3))
        else:
            raise AssertionError(f"unexpected sample shape {shape}")
        return mean + z * stddev

    def _canon(n, a, h, u):
        size = n * a * h * u
        # seeded by n so fresh-sample and carried-init draws differ
        return (jnp.arange(size, dtype=jnp.float32).reshape(n, a, h, u) % 7 - 3.0) / (
            3.0 + n
        )

    return fake


@pytest.mark.parametrize("features", ["plain", "icem"])
def test_cem_iteration_time_major_matches_standard(monkeypatch, features):
    H, A, U, P, K = 5, 3, 2, 11, 4
    icem = features == "icem"
    base_kw = dict(
        planning_horizon=H, num_agents=A, population=P, num_elite=K,
        max_iterations=1, alpha=0.25,
    )
    if icem:
        base_kw.update(keep_elites=2, mean_as_candidate=True)
    cfg_std = cem.CEMConfig(**base_kw)
    cfg_tm = cem.CEMConfig(**base_kw, time_major=True)
    bounds = Bounds.of(-2.0, 2.0, dim=U)
    # toy linear dynamics with S=3, U=2 (dims deliberately all-distinct for the fake RNG)
    dyn = lambda s, a: s + 0.1 * jnp.pad(a, ((0, 0), (0, 1)))  # noqa: E731
    rew = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    ev = make_trajectory_evaluator(dyn, rew)
    ev_tm = make_trajectory_evaluator(dyn, rew, time_major=True)

    monkeypatch.setattr(cem, "truncated_normal", _fake_truncated_normal(H, A))

    mean = jnp.linspace(-1.0, 1.0, A * H * U).reshape(A, H, U)
    var = jnp.full((A, H, U), 0.5)
    obs = jnp.linspace(0.0, 1.0, A * 3).reshape(A, 3)
    state = cem.CEMState(mean=mean, variance=var)
    key = jax.random.PRNGKey(7)

    key_s, carried_s = cem.init_carried(cfg_std, bounds, state, key)
    key_t, carried_t = cem.init_carried(cfg_tm, bounds, state, key)
    out_s = cem.cem_iteration(
        cfg_std, bounds, ev, obs, mean, var, key_s, carried_s, n_extract=K
    )
    out_t = cem.cem_iteration(
        cfg_tm, bounds, ev_tm, obs, mean, var, key_t, carried_t, n_extract=K
    )
    names = ("mean", "var", "key", "carried", "elites", "elite_vals")
    for name, a, b in zip(names, out_s, out_t):
        if name == "key":
            continue
        if name == "carried":
            if not icem:
                continue
            b = jnp.transpose(b, (2, 1, 0, 3))  # [H, keep, A, U] -> [A, keep, H, U]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6,
            err_msg=f"{name} diverged between layouts",
        )


def test_pi2_time_major_matches_standard(monkeypatch):
    """Full PI2/MPPI solve equality across layouts when both draw the same samples
    (deterministic injected sampler); covers the control-cost and adapt-variance
    branches of the time-major path."""
    from blackbox_mpc_tpu.solvers import pi2

    H, A, U, P = 5, 3, 2, 11
    dyn = lambda s, a: s + 0.1 * jnp.pad(a, ((0, 0), (0, 1)))  # noqa: E731
    rew = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    ev = make_trajectory_evaluator(dyn, rew)
    ev_tm = make_trajectory_evaluator(dyn, rew, time_major=True)
    monkeypatch.setattr(pi2, "truncated_normal", _fake_truncated_normal(H, A))
    bounds = Bounds.of(-2.0, 2.0, dim=U)
    kw = dict(
        planning_horizon=H, num_agents=A, population=P, max_iterations=3,
        control_cost=True, adapt_variance=True,
    )
    obs = jnp.linspace(0.0, 1.0, A * 3).reshape(A, 3)
    outs = {}
    for tm, e in ((False, ev), (True, ev_tm)):
        solver = pi2.make_pi2(pi2.PI2Config(**kw, time_major=tm), bounds, e)
        state = solver.init(jax.random.PRNGKey(0))
        action, nstate, aux = solver.solve(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
        outs[tm] = (action, nstate.mean, aux.expected_reward)
    for a, b, name in zip(outs[False], outs[True], ("action", "mean", "reward")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6,
            err_msg=f"PI2 {name} diverged between layouts",
        )


def test_random_search_time_major_swingup():
    from blackbox_mpc_tpu.core.types import Bounds as B
    from blackbox_mpc_tpu.solvers.random_search import (
        RandomSearchConfig, make_random_search,
    )

    bounds = B.of(-2.0, 2.0, dim=1)
    ev_tm = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward, time_major=True)
    solver = make_random_search(
        RandomSearchConfig(
            planning_horizon=25, num_agents=1, population=2048, time_major=True
        ),
        bounds, ev_tm,
    )
    key = jax.random.PRNGKey(0)
    state = solver.init(key)
    solve = jax.jit(solver.solve)
    obs = jnp.asarray([[-1.0, 0.0, 0.0]])
    for t in range(120):
        key, sub = jax.random.split(key)
        action, state, aux = solve(state, obs, jnp.asarray(t), sub)
        obs = pendulum_dynamics(obs, action)
        assert aux.plan.shape == (1, 25, 1)
    assert float(obs[0, 0]) > 0.8, f"no swing-up: cos(theta)={float(obs[0, 0]):.3f}"


def test_pso_time_major_matches_standard_single_iteration():
    """One PSO iteration from hand-built identical swarms (transposed across layouts):
    the action/plan/reward outputs are pure functions of the initial swarm (the
    warm-start resampling only touches the NEXT state), and scalar r1/r2 draws are
    layout-independent, so the solve outputs must agree."""
    from blackbox_mpc_tpu.solvers.pso import PSOConfig, PSOState, make_pso

    H, A, U, P = 5, 3, 2, 7
    dyn = lambda s, a: s + 0.1 * jnp.pad(a, ((0, 0), (0, 1)))  # noqa: E731
    rew = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    kw = dict(planning_horizon=H, num_agents=A, population=P, max_iterations=1)
    positions = jax.random.uniform(
        jax.random.PRNGKey(0), (P, A, H, U), minval=-2.5, maxval=2.5
    )  # deliberately partly out of bounds to exercise the penalty
    velocities = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (P, A, H, U))
    obs = jnp.linspace(0.0, 1.0, A * 3).reshape(A, 3)
    outs = {}
    for tm in (False, True):
        ev = make_trajectory_evaluator(dyn, rew, time_major=tm)
        solver = make_pso(PSOConfig(**kw, time_major=tm), Bounds.of(-2.0, 2.0, dim=U), ev)
        swap = (lambda x: jnp.transpose(x, (2, 0, 1, 3))) if tm else (lambda x: x)
        state = PSOState(
            positions=swap(positions),
            velocities=swap(velocities),
            best_positions=swap(positions),
            best_rewards=jnp.full((P, A), -jnp.inf),
            global_best_position=jnp.zeros((A, H, U)),
            global_best_reward=jnp.full((A,), -jnp.inf),
        )
        action, _, aux = solver.solve(state, obs, jnp.asarray(0), jax.random.PRNGKey(2))
        outs[tm] = (action, aux.plan, aux.expected_reward)
    for a, b, name in zip(outs[False], outs[True], ("action", "plan", "reward")):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"PSO {name} diverged between layouts"
        )


def test_pi2_colored_noise_time_major_matches_standard():
    """Full PI2 (and MPPI control-cost) solve equality across layouts with colored noise
    and NO injected sampler: the colored spectrum draw shapes are layout-independent, so
    the same key yields the same candidates up to the irfft-vs-basis fp difference."""
    from blackbox_mpc_tpu.solvers import pi2

    H, A, U, P = 6, 3, 2, 9
    dyn = lambda s, a: s + 0.1 * jnp.pad(a, ((0, 0), (0, 1)))  # noqa: E731
    rew = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    bounds = Bounds.of(-2.0, 2.0, dim=U)
    obs = jnp.linspace(0.0, 1.0, A * 3).reshape(A, 3)
    for control_cost in (False, True):
        kw = dict(planning_horizon=H, num_agents=A, population=P, max_iterations=2,
                  colored_noise_beta=2.0, control_cost=control_cost)
        outs = {}
        for tm in (False, True):
            ev = make_trajectory_evaluator(dyn, rew, time_major=tm)
            solver = pi2.make_pi2(pi2.PI2Config(**kw, time_major=tm), bounds, ev)
            state = solver.init(jax.random.PRNGKey(0))
            action, nstate, aux = solver.solve(
                state, obs, jnp.asarray(0), jax.random.PRNGKey(1)
            )
            outs[tm] = (action, nstate.mean, aux.expected_reward)
        for a, b, name in zip(outs[False], outs[True], ("action", "mean", "reward")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
                err_msg=f"PI2(control_cost={control_cost}) {name} diverged",
            )


def test_sharded_evaluator_time_major_matches():
    from blackbox_mpc_tpu.parallel import make_pop_mesh
    from blackbox_mpc_tpu.parallel.sharding import make_sharded_evaluator

    mesh = make_pop_mesh(len(jax.devices()))
    dyn = lambda s, a: s + 0.1 * jnp.pad(a, ((0, 0), (0, 1)))  # noqa: E731
    rew = lambda s, a, ns: ns[:, 0] - jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    A = len(jax.devices())  # agent-sharded needs A % D == 0
    kw = dict(mesh=mesh, shard_axis="agents")
    ev = make_sharded_evaluator(dyn, rew, **kw)
    ev_tm = make_sharded_evaluator(dyn, rew, time_major=True, **kw)
    cands = jax.random.uniform(jax.random.PRNGKey(0), (16, A, 6, 2), minval=-1, maxval=1)
    obs = jax.random.normal(jax.random.PRNGKey(1), (A, 3))
    np.testing.assert_array_equal(
        np.asarray(ev(obs, cands)), np.asarray(ev_tm(obs, _tm(cands)))
    )


def test_mpc_policy_time_major_end_to_end():
    """Full MPCPolicy solve with time_major=True on the analytic pendulum: swings up."""
    from blackbox_mpc_tpu.learning.handler import DynamicsHandler
    from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy

    class BoxSpace:
        low = np.asarray([-2.0], np.float32)
        high = np.asarray([2.0], np.float32)

    policy = MPCPolicy(
        action_space=BoxSpace(),
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name="CEM",
        planning_horizon=25,
        population=200,
        num_elite=20,
        max_iterations=5,
        time_major=True,
    )
    obs = jnp.asarray([[-1.0, 0.0, 0.0]])
    for t in range(100):
        action, _, _ = policy.act(obs, t)
        obs = pendulum_dynamics(obs, jnp.asarray(action).reshape(1, -1))
    assert float(obs[0, 0]) > 0.9, f"no swing-up: cos(theta)={float(obs[0, 0]):.3f}"


@pytest.mark.parametrize("horizon", [8, 7])  # even and odd H (different irfft bins)
def test_colored_noise_time_major_matches_standard(horizon):
    """Same key -> the SAME spectrum draw in both layouts, so the time-major synthesis
    (spectral-basis matmul) must reproduce colored_noise's irfft output transposed, to fp
    tolerance — incl. the whole-sequence unit-std normalization."""
    from blackbox_mpc_tpu.solvers.base import colored_noise, colored_noise_time_major

    key = jax.random.PRNGKey(42)
    for beta in (0.5, 1.0, 2.5):
        std_z = colored_noise(key, beta, (6, 3, horizon, 2))
        tm_z = colored_noise_time_major(key, beta, (horizon, 6, 3, 2))
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(std_z, (2, 0, 1, 3))), np.asarray(tm_z),
            rtol=2e-4, atol=2e-5, err_msg=f"beta={beta} H={horizon}",
        )


def test_cem_colored_noise_time_major_matches_standard():
    """Full cem_iteration equality across layouts with colored noise and NO injected
    sampler: the colored draw shapes are layout-independent, so the same key produces
    the same candidates (up to irfft-vs-basis fp error)."""
    H, A, U, P = 6, 3, 2, 9
    dyn = lambda s, a: s + 0.1 * jnp.pad(a, ((0, 0), (0, 1)))  # noqa: E731
    rew = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    bounds = Bounds.of(-2.0, 2.0, dim=U)
    kw = dict(planning_horizon=H, num_agents=A, population=P, num_elite=3,
              max_iterations=1, colored_noise_beta=2.0)
    obs = jnp.linspace(0.0, 1.0, A * 3).reshape(A, 3)
    mean = jnp.linspace(-1.0, 1.0, A * H * U).reshape(A, H, U)
    var = jnp.full((A, H, U), 0.5)
    outs = {}
    for tm in (False, True):
        cfg = cem.CEMConfig(**kw, time_major=tm)
        ev = make_trajectory_evaluator(dyn, rew, time_major=tm)
        state = cem.CEMState(mean=mean, variance=var)
        key, carried = cem.init_carried(cfg, bounds, state, jax.random.PRNGKey(7))
        outs[tm] = cem.cem_iteration(
            cfg, bounds, ev, obs, mean, var, key, carried, n_extract=3
        )
    for name, a, b in zip(("mean", "var", "key", "carried", "elites", "elite_vals"),
                          outs[False], outs[True]):
        if name in ("key", "carried"):
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"colored-noise CEM {name} diverged between layouts",
        )


def test_cem_gd_time_major_matches_standard(monkeypatch):
    """CEM-GD full solve equality across layouts under the injected sampler: phase 1
    rides the time-major cem_iteration; phase 2 polishes the tiny [m+2, A, H, U] block
    through a transposed view of the time-major evaluator (gradients included)."""
    from blackbox_mpc_tpu.solvers import cem as cem_mod
    from blackbox_mpc_tpu.solvers.cem_gd import CEMGDConfig, make_cem_gd

    H, A, U, P = 5, 3, 2, 11
    dyn = lambda s, a: s + 0.1 * jnp.pad(a, ((0, 0), (0, 1)))  # noqa: E731
    rew = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    monkeypatch.setattr(cem_mod, "truncated_normal", _fake_truncated_normal(H, A))
    bounds = Bounds.of(-2.0, 2.0, dim=U)
    kw = dict(
        planning_horizon=H, num_agents=A, population=P, num_elite=4, max_iterations=2,
        gd_candidates=2, gd_iterations=3,
    )
    obs = jnp.linspace(0.0, 1.0, A * 3).reshape(A, 3)
    outs = {}
    for tm in (False, True):
        ev = make_trajectory_evaluator(dyn, rew, time_major=tm)
        solver = make_cem_gd(CEMGDConfig(**kw, time_major=tm), bounds, ev)
        state = solver.init(jax.random.PRNGKey(0))
        action, _, aux = solver.solve(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
        outs[tm] = (action, aux.plan, aux.expected_reward)
    for a, b, name in zip(outs[False], outs[True], ("action", "plan", "reward")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6,
            err_msg=f"CEM-GD {name} diverged between layouts",
        )


def test_auto_routes_time_major_to_xla():
    """rollout_backend='auto' must never pick a kernel backend for a time-major config
    (the policy would then raise): both the pallas-eligible small shape and the
    fused-eligible beyond-HBM shape route to XLA when time_major is requested."""
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.ops.backend_select import choose_backend
    from blackbox_mpc_tpu.solvers.cem import CEMConfig

    common = dict(num_agents=1, platform="tpu", horizon=50, dim_u=6, solver_name="CEM")
    big = dict(planning_horizon=50, population=8_000_000, num_elite=50)
    dyn_big = LearnedDynamicsConfig(dim_s=17, dim_u=6, hidden=(200, 200))
    assert choose_backend(
        dyn_big, population=8_000_000, solver_config=CEMConfig(**big), **common
    ) == "fused_cem"
    # Beyond-HBM + time_major: the layout choice is honored (XLA) but the downgrade is
    # LOUD — the XLA path must materialize the candidate tensor that selected fused.
    with pytest.warns(RuntimeWarning, match="beyond the fused backend"):
        routed = choose_backend(
            dyn_big, population=8_000_000,
            solver_config=CEMConfig(**big, time_major=True), **common
        )
    assert routed == "xla"


def test_switch_solver_carries_or_drops_time_major():
    """CEM(time_major) -> PI2 keeps the layout (PI2 has the field, and the evaluator is
    rebuilt to match); -> CMA-ES drops it (no field; evaluator reverts to standard) —
    both must act without error."""
    from blackbox_mpc_tpu.learning.handler import DynamicsHandler
    from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy

    class BoxSpace:
        low = np.asarray([-2.0], np.float32)
        high = np.asarray([2.0], np.float32)

    policy = MPCPolicy(
        action_space=BoxSpace(),
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name="CEM",
        planning_horizon=10,
        population=64,
        num_elite=8,
        max_iterations=2,
        time_major=True,
    )
    obs = jnp.asarray([[-1.0, 0.0, 0.0]])
    a0, _, _ = policy.act(obs, 0)
    policy.switch_solver("PI2")
    assert getattr(policy._config, "time_major", False), "PI2 should keep time_major"
    a1, _, _ = policy.act(obs, 1)
    policy.switch_solver("CMA-ES")
    assert not getattr(policy._config, "time_major", False)
    a2, _, _ = policy.act(obs, 2)
    for a in (a0, a1, a2):
        assert np.all(np.isfinite(np.asarray(a)))


def test_policy_rejects_time_major_on_kernel_backends():
    from blackbox_mpc_tpu.learning.handler import DynamicsHandler
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.policies.mpc_policy import MPCPolicy

    class BoxSpace:
        low = np.asarray([-1.0], np.float32)
        high = np.asarray([1.0], np.float32)

    with pytest.raises(ValueError, match="time_major"):
        MPCPolicy(
            action_space=BoxSpace(),
            reward_function=pendulum_reward,
            dynamics_handler=DynamicsHandler(
                config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,))
            ),
            solver_name="CEM",
            planning_horizon=5,
            population=32,
            num_elite=4,
            max_iterations=2,
            rollout_backend="fused_cem",
            time_major=True,
        )


def test_spsa_time_major_matches_standard(monkeypatch):
    """r5: SPSA was the last sampled solver without the time-major layout. Full solve
    equality across layouts when both draw the same Rademacher perturbations
    (deterministic injected sampler); covers the fused 2P concat + penalty + ghat path."""
    from blackbox_mpc_tpu.solvers import spsa

    H, A, U, P = 5, 3, 2, 11

    def fake_rademacher(key, shape, dtype=jnp.float32):
        del key
        if len(shape) == 4 and shape[2] == H:        # [P, A, H, U] (standard)
            p = shape[0]
            z = _canon_signs(p, A, H, shape[3], dtype)
        elif len(shape) == 4 and shape[0] == H:      # [H, P, A, U] (time-major)
            p = shape[1]
            z = jnp.transpose(_canon_signs(p, A, H, shape[3], dtype), (2, 0, 1, 3))
        else:
            raise AssertionError(f"unexpected perturbation shape {shape}")
        return z

    def _canon_signs(p, a, h, u, dtype):
        size = p * a * h * u
        bits = ((jnp.arange(size) * 31 + 7) % 97) % 2  # deterministic pseudo-pattern
        return (bits.astype(dtype) * 2.0 - 1.0).reshape(p, a, h, u)

    monkeypatch.setattr(spsa.jax.random, "rademacher", fake_rademacher)
    dyn = lambda s, a: s + 0.1 * jnp.pad(a, ((0, 0), (0, 1)))  # noqa: E731
    rew = lambda s, a, ns: ns[:, 0] - 0.1 * jnp.sum(jnp.square(a), axis=-1)  # noqa: E731
    ev = make_trajectory_evaluator(dyn, rew)
    ev_tm = make_trajectory_evaluator(dyn, rew, time_major=True)
    bounds = Bounds.of(-0.5, 0.5, dim=U)  # tight bounds so the violation penalty fires
    kw = dict(planning_horizon=H, num_agents=A, population=P, max_iterations=3,
              noise_parameter=0.9)
    obs = jnp.linspace(0.0, 1.0, A * 3).reshape(A, 3)
    outs = {}
    for tm, e in ((False, ev), (True, ev_tm)):
        solver = spsa.make_spsa(spsa.SPSAConfig(**kw, time_major=tm), bounds, e)
        state = solver.init(jax.random.PRNGKey(0))
        action, nstate, aux = solver.solve(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
        outs[tm] = (action, nstate.solution, aux.expected_reward)
    for a, b, name in zip(outs[False], outs[True], ("action", "solution", "reward")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6,
            err_msg=f"SPSA {name} diverged between layouts",
        )


def test_spsa_time_major_solves_jitted():
    """The time-major SPSA compiles and produces finite actions under jit with the real
    RNG (production path; the equality test above injects a deterministic sampler)."""
    from blackbox_mpc_tpu.solvers.spsa import SPSAConfig, make_spsa

    ev_tm = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward, time_major=True)
    solver = make_spsa(
        SPSAConfig(planning_horizon=10, num_agents=2, population=32, max_iterations=4,
                   time_major=True),
        Bounds.of(-2.0, 2.0, dim=1), ev_tm,
    )
    state = solver.init(jax.random.PRNGKey(0))
    obs = jnp.asarray([[-1.0, 0.0, 0.0], [0.5, 0.2, 0.1]])
    action, nstate, aux = jax.jit(solver.solve)(
        state, obs, jnp.asarray(0), jax.random.PRNGKey(1)
    )
    assert action.shape == (2, 1) and np.all(np.isfinite(np.asarray(action)))
    assert np.all(np.isfinite(np.asarray(aux.expected_reward)))
