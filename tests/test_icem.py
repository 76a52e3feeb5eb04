"""iCEM feature set (Pinneri et al. 2020): population decay, mean-as-candidate,
execute-best — on top of the existing colored noise + keep_elites."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core import Bounds
from blackbox_mpc_tpu.solvers import make_solver
from blackbox_mpc_tpu.solvers.cem import CEMConfig, iteration_populations

BOUNDS = Bounds.of(-1.0, 1.0, dim=1)


def quadratic_evaluate(record=None):
    """Deterministic bowl with optimum at 0.4; optionally records (samples, rewards)."""

    def evaluate(obs, actions):
        r = -jnp.sum(jnp.square(actions - 0.4), axis=(2, 3))
        if record is not None:
            record.append((np.asarray(actions), np.asarray(r)))
        return r

    return evaluate


def test_iteration_populations_decay_schedule():
    cfg = CEMConfig(population=512, num_elite=16, max_iterations=5, population_decay=0.5)
    pops = iteration_populations(cfg)
    assert pops == [512, 256, 128, 64, 32]
    # floor at 2*num_elite
    cfg = CEMConfig(population=64, num_elite=16, max_iterations=5, population_decay=0.25)
    assert iteration_populations(cfg) == [64, 32, 32, 32, 32]
    # gamma == 1 keeps the fori_loop path
    assert iteration_populations(CEMConfig(population_decay=1.0)) is None


def test_population_decay_solves_with_fewer_samples():
    record = []
    s = make_solver(
        "CEM", BOUNDS, quadratic_evaluate(record), planning_horizon=6, num_agents=2,
        population=256, num_elite=16, max_iterations=4, population_decay=0.5,
    )
    # Eager call: the decay path unrolls, so the recorder sees one concrete batch per
    # iteration. (The jitted path compiles the same program — covered by the MPC tests.)
    action, _, aux = s.solve(
        s.init(jax.random.PRNGKey(0)), jnp.zeros((2, 3)), jnp.asarray(0),
        jax.random.PRNGKey(1),
    )
    assert np.abs(np.asarray(action) - 0.4).max() < 0.1
    sizes = [a.shape[0] for a, _ in record]
    assert sizes == [256, 128, 64, 32], sizes


def test_mean_as_candidate_injected():
    from blackbox_mpc_tpu.solvers.cem import cem_iteration, init_carried
    from blackbox_mpc_tpu.solvers.cem import CEMState

    record = []
    cfg = CEMConfig(planning_horizon=4, num_agents=1, population=32, num_elite=8,
                    max_iterations=1, mean_as_candidate=True)
    mean = jnp.full((1, 4, 1), 0.3)
    var = jnp.full((1, 4, 1), 0.25)
    key, carried = init_carried(cfg, BOUNDS, CEMState(mean=mean, variance=var),
                                jax.random.PRNGKey(1))
    cem_iteration(cfg, BOUNDS, quadratic_evaluate(record), jnp.zeros((1, 3)),
                  mean, var, key, carried)
    samples, _ = record[0]
    assert samples.shape[0] == 32  # total population unchanged
    # The clipped current mean is the last candidate of the batch.
    np.testing.assert_allclose(samples[-1, 0], np.full((4, 1), 0.3), atol=1e-7)


def test_execute_best_returns_best_seen_candidate():
    record = []
    # population_decay just below 1 routes through the unrolled (eager-traceable) loop so
    # the recorder captures concrete candidate batches; semantics are identical.
    s = make_solver(
        "CEM", BOUNDS, quadratic_evaluate(record), planning_horizon=4, num_agents=2,
        population=64, num_elite=8, max_iterations=3, execute_best=True,
        population_decay=0.9999,
    )
    action, _, aux = s.solve(
        s.init(jax.random.PRNGKey(0)), jnp.zeros((2, 3)), jnp.asarray(0),
        jax.random.PRNGKey(2),
    )
    # The returned plan IS the argmax candidate over every iteration (not the blended
    # mean).
    all_samples = np.concatenate([a for a, _ in record], axis=0)  # [sumP, A, H, U]
    all_rewards = np.concatenate([r for _, r in record], axis=0)  # [sumP, A]
    for agent in range(2):
        best_idx = int(np.argmax(all_rewards[:, agent]))
        np.testing.assert_allclose(
            np.asarray(aux.plan)[agent], all_samples[best_idx, agent], rtol=1e-6
        )
        np.testing.assert_allclose(
            float(np.asarray(aux.expected_reward)[agent]),
            float(all_rewards[best_idx, agent]), rtol=1e-6,
        )
    np.testing.assert_allclose(np.asarray(action), np.asarray(aux.plan)[:, 0], rtol=1e-6)


def test_default_path_unchanged_by_new_flags():
    """Flags off => bit-identical to the pre-iCEM solve (RNG stream untouched)."""
    kw = dict(planning_horizon=6, num_agents=1, population=64, num_elite=8,
              max_iterations=3)
    a = make_solver("CEM", BOUNDS, quadratic_evaluate(), **kw)
    b = make_solver("CEM", BOUNDS, quadratic_evaluate(), **kw,
                    population_decay=1.0, mean_as_candidate=False, execute_best=False)
    sa = a.init(jax.random.PRNGKey(0))
    act_a, _, aux_a = a.solve(sa, jnp.zeros((1, 3)), jnp.asarray(0), jax.random.PRNGKey(7))
    act_b, _, aux_b = b.solve(sa, jnp.zeros((1, 3)), jnp.asarray(0), jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(act_a), np.asarray(act_b))
    np.testing.assert_array_equal(np.asarray(aux_a.plan), np.asarray(aux_b.plan))


def test_cem_gd_supports_decay_and_rejects_execute_best():
    s = make_solver(
        "CEM-GD", BOUNDS, quadratic_evaluate(), planning_horizon=4, num_agents=1,
        population=64, num_elite=8, gd_candidates=4, max_iterations=3,
        gd_iterations=3, population_decay=0.5,
    )
    action, _, _ = jax.jit(s.solve)(
        s.init(jax.random.PRNGKey(0)), jnp.zeros((1, 3)), jnp.asarray(0),
        jax.random.PRNGKey(1),
    )
    assert abs(float(action[0, 0]) - 0.4) < 0.1
    with pytest.raises(ValueError, match="execute_best"):
        make_solver(
            "CEM-GD", BOUNDS, quadratic_evaluate(), planning_horizon=4,
            population=64, num_elite=8, execute_best=True,
        )


def test_fused_cem_auto_routes_icem_flags_and_rejects_decay():
    """Round 3: the fused CEM supports the iCEM feature set in-kernel, so the auto route
    keeps beyond-HBM populations on the fused path. Round 4: population_decay fuses too
    (per-iteration kernel grids, unrolled) — single-device decay now routes fused."""
    from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
    from blackbox_mpc_tpu.ops.backend_select import choose_backend

    dyn = LearnedDynamicsConfig(dim_s=17, dim_u=6, hidden=(200, 200))
    common = dict(population=8_000_000, num_agents=1, platform="tpu",
                  horizon=50, dim_u=6, solver_name="CEM")
    base_kw = dict(planning_horizon=50, population=8_000_000, num_elite=50)
    for flag in (dict(mean_as_candidate=True), dict(execute_best=True),
                 dict(keep_elites=20), dict(colored_noise_beta=2.0)):
        assert choose_backend(
            dyn, solver_config=CEMConfig(**base_kw, **flag), **common
        ) == "fused_cem", flag
    assert choose_backend(
        dyn, solver_config=CEMConfig(**base_kw, population_decay=0.5), **common
    ) == "fused_cem"
