"""Per-solver update-rule tests on analytic objectives plus pendulum swing-up integration.

The reference ships no tests; these follow the strategy in SURVEY.md §4 — each solver must
(a) drive a known quadratic objective toward its optimum, and (b) swing up the pendulum from
hanging within a fixed step budget when given the true analytical model.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.models.analytic import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import SOLVER_REGISTRY, make_solver

ALL_SOLVERS = sorted(SOLVER_REGISTRY)

# --- (a) quadratic objective: maximize -sum((plan - target)^2) over the whole plan ---------


def quadratic_evaluate(target):
    def evaluate(obs, actions):  # actions [P, A, H, U]
        del obs
        err = jnp.sum(jnp.square(actions - target), axis=(2, 3))  # [P, A]
        return -err

    return evaluate


@pytest.mark.parametrize("name", ALL_SOLVERS)
def test_solver_improves_quadratic(name):
    horizon, agents = 8, 2
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    target = 0.7
    evaluate = quadratic_evaluate(target)
    kwargs = dict(planning_horizon=horizon, num_agents=agents, population=200,
                  max_iterations=8)
    if name in ("CEM", "CEM-GD", "CMA-ES"):
        kwargs["num_elite"] = 20
    if name == "RandomSearch":
        # single-shot uniform sampling: shrink the search space so best-of-N is meaningful
        kwargs = dict(planning_horizon=4, num_agents=agents, population=4000)
    if name == "PSO":
        # The reference's scalar-normal velocity coefficients (pso.py:107-109) make PSO a
        # weak optimizer; use the textbook elementwise mode and more iterations here.
        kwargs.update(max_iterations=30, elementwise_random=True)
    s = make_solver(name, bounds, evaluate, **kwargs)
    key = jax.random.PRNGKey(0)
    state = s.init(key)
    obs = jnp.zeros((agents, 3))
    horizon = kwargs["planning_horizon"]
    action, state, aux = jax.jit(s.solve)(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
    assert action.shape == (agents, 1)
    assert aux.plan.shape == (agents, horizon, 1)
    # The first action must land near the known optimum (init mean is 0.0, optimum 0.7).
    err0 = abs(0.0 - target)
    err = np.abs(np.asarray(action) - target)
    assert np.all(err < err0), f"{name}: first action {np.asarray(action).ravel()} vs {target}"
    # Strong solvers should get close.
    if name in ("CEM", "CEM-GD", "CMA-ES", "Gradient", "PI2", "RandomSearch"):
        assert np.all(err < 0.2), f"{name}: err {err.ravel()}"


@pytest.mark.parametrize("name", ALL_SOLVERS)
def test_solver_state_roundtrip_and_determinism(name):
    horizon, agents = 5, 1
    bounds = Bounds.of(-1.0, 1.0, dim=2)
    evaluate = quadratic_evaluate(0.3)
    s = make_solver(name, bounds, evaluate, planning_horizon=horizon, num_agents=agents,
                    population=64, max_iterations=2)
    state = s.init(jax.random.PRNGKey(0))
    solve = jax.jit(s.solve)
    obs = jnp.zeros((agents, 3))
    a1, _, _ = solve(state, obs, jnp.asarray(0), jax.random.PRNGKey(7))
    a2, _, _ = solve(state, obs, jnp.asarray(0), jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # reset returns a state of identical structure
    state2 = s.reset(state, jax.random.PRNGKey(1))
    jax.tree_util.tree_map(lambda a, b: None, state, state2)


# --- (b) pendulum swing-up with the true analytical model ----------------------------------

SWINGUP_BUDGET = {
    # steps allowed, minimum final upright quality (cos(theta) at end > threshold)
    "CEM": (80, 0.9),
    "RandomSearch": (120, 0.8),
    "PI2": (80, 0.9),
    # Pendulum bounds are symmetric so the nominal starts at 0 and the control-cost term is
    # weak; same budget as PI2.
    "MPPI": (80, 0.9),
    "PSO": (120, 0.6),
    "SPSA": (200, -0.2),  # SPSA is a weak local optimizer; just require no divergence
    "CMA-ES": (120, 0.8),
    "Gradient": (120, 0.9),  # gradient ascent through the rollout, 64 restarts
    "CEM-GD": (80, 0.9),  # CEM basin search + Adam polish: at least as strong as CEM
}


@pytest.mark.parametrize("name", ALL_SOLVERS)
def test_pendulum_swingup(name):
    steps, threshold = SWINGUP_BUDGET[name]
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
    kwargs = dict(planning_horizon=25, num_agents=1, population=256, max_iterations=5)
    if name in ("CEM", "CEM-GD", "CMA-ES"):
        kwargs["num_elite"] = 25
    if name == "RandomSearch":
        kwargs = dict(planning_horizon=40, num_agents=1, population=2048)
    if name == "Gradient":
        # population = random restarts; more Adam steps replace sampled iterations
        kwargs = dict(planning_horizon=25, num_agents=1, population=64,
                      max_iterations=30, learning_rate=0.2)
    s = make_solver(name, bounds, evaluate, **kwargs)
    key = jax.random.PRNGKey(42)
    state = s.init(key)
    solve = jax.jit(s.solve)
    # start hanging straight down, zero velocity
    obs = jnp.asarray([[-1.0, 0.0, 0.0]], dtype=jnp.float32)
    for t in range(steps):
        key, sub = jax.random.split(key)
        action, state, _ = solve(state, obs, jnp.asarray(t), sub)
        obs = pendulum_dynamics(obs, action)
    cos_th = float(obs[0, 0])
    assert cos_th > threshold, f"{name}: final cos(theta)={cos_th:.3f}"


# --- sep-CMA-ES (diagonal covariance) ------------------------------------------------------


def test_sep_cma_es_improves_quadratic():
    horizon, agents = 8, 2
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = quadratic_evaluate(0.7)
    s = make_solver("CMA-ES", bounds, evaluate, planning_horizon=horizon, num_agents=agents,
                    population=200, num_elite=20, max_iterations=8, diagonal=True)
    state = s.init(jax.random.PRNGKey(0))
    # Diagonal state: no [A, n, n] matrices anywhere.
    assert state.cov.ndim == 2 and state.chol.ndim == 2 and state.inv_sqrt.ndim == 2
    obs = jnp.zeros((agents, 3))
    action, state, aux = jax.jit(s.solve)(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
    err = np.abs(np.asarray(action) - 0.7)
    assert np.all(err < 0.2), err


def test_sep_cma_es_swings_up_pendulum():
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
    s = make_solver("CMA-ES", bounds, evaluate, planning_horizon=25, num_agents=1,
                    population=256, num_elite=25, max_iterations=5, diagonal=True)
    state = s.init(jax.random.PRNGKey(42))
    solve = jax.jit(s.solve)
    obs = jnp.asarray([[-1.0, 0.0, 0.0]])
    key = jax.random.PRNGKey(3)
    for t in range(120):
        key, sub = jax.random.split(key)
        action, state, _ = solve(state, obs, jnp.asarray(t), sub)
        obs = pendulum_dynamics(obs, action)
    assert float(obs[0, 0]) > 0.8, np.asarray(obs)


def test_sep_cma_es_matches_full_on_separable_problem():
    """On an axis-aligned quadratic (separable), sep-CMA should do at least as well as the
    full-covariance solver with the same budget."""
    horizon, agents = 6, 1
    bounds = Bounds.of(-2.0, 2.0, dim=2)
    evaluate = quadratic_evaluate(-0.5)
    kw = dict(planning_horizon=horizon, num_agents=agents, population=150, num_elite=15,
              max_iterations=10)
    obs = jnp.zeros((agents, 3))
    errs = {}
    for diag in (False, True):
        s = make_solver("CMA-ES", bounds, evaluate, diagonal=diag, **kw)
        state = s.init(jax.random.PRNGKey(0))
        action, _, _ = jax.jit(s.solve)(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
        errs[diag] = float(np.abs(np.asarray(action) + 0.5).max())
    assert errs[True] < 0.15, errs


# --- Gradient (first-order) solver ---------------------------------------------------------


def test_gradient_solver_through_learned_mlp():
    """The gradient solver backprops through learned MLP dynamics: an MPCPolicy built on a
    (probabilistic-ensemble) handler acts finitely and improves the plan over restarts."""
    from blackbox_mpc_tpu.core.spaces import BoxSpace
    from blackbox_mpc_tpu.learning import DynamicsHandler
    from blackbox_mpc_tpu.models import LearnedDynamicsConfig
    from blackbox_mpc_tpu.policies import MPCPolicy

    cfg = LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,), ensemble_size=2)
    policy = MPCPolicy(
        action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(config=cfg, seed=0),
        solver_name="Gradient",
        planning_horizon=6,
        population=8,
        max_iterations=5,
        learning_rate=0.2,
        seed=0,
    )
    action, next_obs, pred_reward = policy.act(np.asarray([1.0, 0.0, 0.0], np.float32))
    assert action.shape == (1,) and np.isfinite(action).all()
    assert np.isfinite(pred_reward)


def test_gradient_incumbent_never_regresses():
    """Restart 0 is the incumbent plan: with zero iterations, the returned best plan's
    reward is at least the incumbent's (argmax over restarts includes it)."""
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = quadratic_evaluate(0.0)  # optimum exactly at the init mean (midpoint = 0)
    s = make_solver("Gradient", bounds, evaluate, planning_horizon=5, num_agents=1,
                    population=16, max_iterations=0)
    state = s.init(jax.random.PRNGKey(0))
    action, _, aux = jax.jit(s.solve)(
        state, jnp.zeros((1, 3)), jnp.asarray(0), jax.random.PRNGKey(5)
    )
    # incumbent (the midpoint plan) is optimal here; no random restart can beat it
    np.testing.assert_allclose(np.asarray(action), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux.expected_reward), 0.0, atol=1e-6)


def test_pi2_cma_variance_adaptation_improves_convergence():
    """PI2-CMA (adapt_variance=True) should reach the quadratic optimum at least as closely
    as static-variance PI2 with the same budget (variance shrinks onto the optimum)."""
    horizon, agents = 8, 2
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = quadratic_evaluate(0.7)
    errs = {}
    for adapt in (False, True):
        s = make_solver("PI2", bounds, evaluate, planning_horizon=horizon, num_agents=agents,
                        population=200, max_iterations=10, adapt_variance=adapt)
        state = s.init(jax.random.PRNGKey(0))
        obs = jnp.zeros((agents, 3))
        action, _, _ = jax.jit(s.solve)(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
        errs[adapt] = float(np.abs(np.asarray(action) - 0.7).max())
    assert errs[True] < 0.1, errs
    assert errs[True] <= errs[False] + 0.02, errs


# --- CEM-GD hybrid -------------------------------------------------------------------------


def test_cem_gd_polish_beats_plain_cem_on_quadratic():
    """At an equal CEM budget, the Adam polish must not lose to plain CEM — the incumbent
    blended mean is candidate 0, so CEM-GD's final plan only departs from CEM's when the
    gradient found something strictly better (final argmax re-evaluates every candidate)."""
    horizon, agents = 8, 2
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = quadratic_evaluate(0.7)
    shared = dict(planning_horizon=horizon, num_agents=agents, population=100,
                  max_iterations=3, num_elite=10)
    cem = make_solver("CEM", bounds, evaluate, **shared)
    hybrid = make_solver("CEM-GD", bounds, evaluate, gd_iterations=15,
                         gd_learning_rate=0.05, **shared)
    obs = jnp.zeros((agents, 3))
    key, solve_key = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
    _, _, aux_cem = jax.jit(cem.solve)(cem.init(key), obs, jnp.asarray(0), solve_key)
    _, _, aux_gd = jax.jit(hybrid.solve)(hybrid.init(key), obs, jnp.asarray(0), solve_key)
    reward_cem = float(jnp.sum(evaluate(obs, aux_cem.plan[None])))
    reward_gd = float(jnp.sum(evaluate(obs, aux_gd.plan[None])))
    assert reward_gd >= reward_cem - 1e-6, (reward_gd, reward_cem)
    # the polish should actually close most of the remaining gap to the optimum (reward 0)
    assert reward_gd > 0.5 * reward_cem, (reward_gd, reward_cem)


# --- CMA-ES lazy eigendecomposition --------------------------------------------------------


def test_cma_es_lazy_eigen_quality_and_gap_semantics():
    """eigen_update_every=k refreshes the sampling factors every k iterations; the lazy
    solver must still drive the quadratic to the optimum (stale-by-O(c1+c_mu) factors are
    within CMA's own adaptation noise), and k=1 must reproduce the default exactly."""
    horizon, agents = 8, 2
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = quadratic_evaluate(0.7)
    kw = dict(planning_horizon=horizon, num_agents=agents, population=200,
              num_elite=20, max_iterations=8)
    obs = jnp.zeros((agents, 3))
    key, solve_key = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    def run(**extra):
        s = make_solver("CMA-ES", bounds, evaluate, **kw, **extra)
        action, _, _ = jax.jit(s.solve)(s.init(key), obs, jnp.asarray(0), solve_key)
        return np.asarray(action)

    default = run()
    np.testing.assert_array_equal(run(eigen_update_every=1), default)  # identical program
    for lazy in (run(eigen_update_every=3), run(eigen_update_every=0)):  # 0 = auto gap
        assert np.all(np.abs(lazy - 0.7) < 0.2), lazy


# --- CMA-ES Hansen h_sigma stall indicator ---------------------------------------------------


def test_cma_es_adaptive_h_sigma_converges_and_gates_stall():
    """adaptive_h_sigma=True must (a) still solve the quadratic, and (b) gate the rank-one
    update in a stall scenario: with an injected long sigma path, h = 0, so p_cov must decay
    by exactly its (1-cc) factor with NO y_mean contribution — every coordinate of the
    (constant-vector-seeded) p_cov stays equal and shrinks. The reference hardcodes
    h_sigma = 1.0 (cma_es.py:10) and would imprint the transient path direction into C."""
    horizon, agents = 8, 2
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = quadratic_evaluate(0.7)
    kw = dict(planning_horizon=horizon, num_agents=agents, population=200,
              num_elite=20, max_iterations=8)
    obs = jnp.zeros((agents, 3))

    # (a) convergence is preserved with the indicator on.
    s = make_solver("CMA-ES", bounds, evaluate, adaptive_h_sigma=True, **kw)
    action, _, _ = jax.jit(s.solve)(
        s.init(jax.random.PRNGKey(0)), obs, jnp.asarray(0), jax.random.PRNGKey(1)
    )
    assert np.all(np.abs(np.asarray(action) - 0.7) < 0.2), np.asarray(action)

    # (b) stall gating: a huge p_sigma puts the path far above Hansen's threshold -> h = 0.
    kw_stall = dict(kw, max_iterations=1, persist_across_solves=True)
    for flag, expect_gated in ((True, True), (False, False)):
        s = make_solver("CMA-ES", bounds, evaluate, adaptive_h_sigma=flag, **kw_stall)
        state = s.init(jax.random.PRNGKey(0))
        state = state.replace(
            p_sigma=jnp.full_like(state.p_sigma, 100.0),
            p_cov=jnp.full_like(state.p_cov, 0.5),
        )
        _, new_state, _ = jax.jit(s.solve)(state, obs, jnp.asarray(0), jax.random.PRNGKey(1))
        p_cov = np.asarray(new_state.p_cov)
        spread = p_cov.max() - p_cov.min()
        if expect_gated:
            # pure decay: (1-cc) * 0.5 elementwise — direction (a constant vector) preserved
            assert spread < 1e-6, spread
            assert np.all(p_cov < 0.5) and np.all(p_cov > 0.0), p_cov
        else:
            # constant h_sigma=1.0: the y_mean term varies per coordinate
            assert spread > 1e-4, spread


# --- bounds feasibility (asymmetric spaces) -------------------------------------------------


@pytest.mark.parametrize("name", ALL_SOLVERS)
def test_solver_actions_respect_asymmetric_bounds(name):
    """Every solver's returned action AND full plan must lie inside asymmetric bounds.

    Asymmetric spaces are where the reference's midpoint-biased exploration noise and
    swapped RandomPolicy bounds go wrong (SURVEY.md quirks); the solvers themselves must
    be feasible-by-construction regardless.
    """
    lo, hi = -0.5, 2.0
    bounds = Bounds.of(lo, hi, dim=2)
    # Objective pulls toward a point OUTSIDE the bounds, so any missing clip shows up.
    evaluate = quadratic_evaluate(3.0)
    kwargs = dict(planning_horizon=6, num_agents=2, population=64, max_iterations=4)
    if name in ("CEM", "CEM-GD", "CMA-ES"):
        kwargs["num_elite"] = 8
    if name == "RandomSearch":
        kwargs = dict(planning_horizon=6, num_agents=2, population=512)
    s = make_solver(name, bounds, evaluate, **kwargs)
    state = s.init(jax.random.PRNGKey(0))
    solve = jax.jit(s.solve)
    obs = jnp.zeros((2, 3))
    eps = 1e-5
    for t in range(3):
        action, state, aux = solve(state, obs, jnp.asarray(t), jax.random.PRNGKey(t))
        a, plan = np.asarray(action), np.asarray(aux.plan)
        assert (a >= lo - eps).all() and (a <= hi + eps).all(), f"{name} action {a}"
        assert (plan >= lo - eps).all() and (plan <= hi + eps).all(), f"{name} plan out of bounds"
