"""Regression tests for the second round-2 code-review pass (each was a live bug)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackbox_mpc_tpu.core import Bounds
from blackbox_mpc_tpu.core.spaces import BoxSpace
from blackbox_mpc_tpu.learning import DynamicsHandler
from blackbox_mpc_tpu.models import pendulum_dynamics, pendulum_reward
from blackbox_mpc_tpu.models.dynamics import LearnedDynamicsConfig
from blackbox_mpc_tpu.policies import MPCPolicy
from blackbox_mpc_tpu.rollout import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import make_solver


def test_mbrl_loop_solver_lr_maps_to_cem_gd_field():
    """--solver-lr with CEM-GD must map to gd_learning_rate, not crash the strict-kwargs
    policy build with an unknown 'learning_rate' after the expensive bootstrap."""
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv
    from blackbox_mpc_tpu.workflows.iterative_mpc import learn_dynamics_iteratively_w_mpc

    env = NativePendulumVecEnv(num_envs=1, seed=0, max_episode_steps=5)
    handler, policy = learn_dynamics_iteratively_w_mpc(
        env,
        pendulum_reward,
        solver_name="CEM-GD",
        planning_horizon=4,
        number_of_initial_rollouts=1,
        number_of_rollouts_per_refinement=1,
        number_of_refinement_steps=0,
        rollout_horizon=5,
        dynamics_config=LearnedDynamicsConfig(dim_s=3, dim_u=1, hidden=(16,)),
        epochs=1,
        batch_size=4,
        solver_learning_rate=0.05,
        population=16,
        num_elite=4,
        gd_candidates=2,
        max_iterations=1,
        gd_iterations=1,
    )
    assert policy.solver_name == "CEM-GD"
    # and the value actually landed in the CEM-GD Adam field
    assert policy._config.gd_learning_rate == 0.05


def test_shm_close_with_pending_step_exits_workers_cleanly():
    """close() during an in-flight step must not post the close sentinel while a worker
    is mid-step (its late DONE clobbers the sentinel; the worker then hangs to the join
    timeout and is hard-terminated)."""
    from blackbox_mpc_tpu.envs.shm_vec_env import make_shm_vec_env

    env = make_shm_vec_env("Pendulum-v1", num_envs=2, base_seed=0)
    try:
        env.reset()
        env.step_async(np.zeros((2, 1), np.float32))
    finally:
        procs = list(env._procs)
        env.close()
    for p in procs:
        assert not p.is_alive()
        assert p.exitcode == 0, f"worker hard-terminated (exitcode {p.exitcode})"


def test_backend_auto_routes_only_what_make_fused_cem_accepts():
    """auto must never route a config that make_fused_cem rejects — it would crash at the
    first act(). Round 3: keep_elites/colored noise are in-kernel features (stay fused).
    Round 4: population_decay fuses single-device (per-iteration kernel grids), so it now
    stays fused. Round 5: the SHARDED factory instantiates per-iteration sharded grids
    too, so decay + mesh stays fused as well."""
    from blackbox_mpc_tpu.ops.backend_select import choose_backend
    from blackbox_mpc_tpu.solvers.cem import CEMConfig

    dyn = LearnedDynamicsConfig(dim_s=17, dim_u=6, hidden=(200, 200))
    base = dict(planning_horizon=50, population=8_000_000, num_elite=50)
    common = dict(
        population=8_000_000, num_agents=1, platform="tpu",
        horizon=50, dim_u=6, solver_name="CEM",
    )
    plain = choose_backend(dyn, solver_config=CEMConfig(**base), **common)
    assert plain == "fused_cem"
    kept = choose_backend(
        dyn, solver_config=CEMConfig(**base, keep_elites=5), **common
    )
    assert kept == "fused_cem"
    colored = choose_backend(
        dyn, solver_config=CEMConfig(**base, colored_noise_beta=2.0), **common
    )
    assert colored == "fused_cem"
    decay = choose_backend(
        dyn, solver_config=CEMConfig(**base, population_decay=0.5), **common
    )
    assert decay == "fused_cem"

    import jax
    from blackbox_mpc_tpu.parallel.mesh import make_pop_mesh

    # With a mesh the fused capacity threshold is PER DEVICE, so scale the population by
    # the mesh size to stay beyond-HBM on each shard (8 devices under the test conftest).
    mesh = make_pop_mesh(devices=jax.devices("cpu"))
    n_dev = len(jax.devices("cpu"))
    sharded_kw = {**common, "population": 8_000_000 * n_dev}
    sharded_base = {**base, "population": 8_000_000 * n_dev}
    sharded = choose_backend(
        dyn, mesh=mesh, solver_config=CEMConfig(**sharded_base), **sharded_kw
    )
    assert sharded == "fused_cem"
    sharded_decay = choose_backend(
        dyn, mesh=mesh,
        solver_config=CEMConfig(**sharded_base, population_decay=0.5), **sharded_kw
    )
    assert sharded_decay == "fused_cem"  # r5: decay shards (per-iteration sharded grids)
    # injected-candidate features still have no sharded path — auto must not route them
    sharded_kept = choose_backend(
        dyn, mesh=mesh, solver_config=CEMConfig(**sharded_base, keep_elites=5),
        **sharded_kw
    )
    assert sharded_kept == "xla"


def test_fused_cem_honors_state_dtype_contract():
    """rollout_backend='fused_cem' with dtype=bfloat16: state stored bf16, update math
    upcast to f32 by the with_state_dtype wrapper (same contract as the XLA path)."""
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
        dtype=jnp.bfloat16,
    )
    action, _, pred_reward = policy.act(np.asarray([1.0, 0.0, 0.0], np.float32))
    assert np.isfinite(action).all() and np.isfinite(pred_reward)
    float_dtypes = {
        x.dtype for x in jax.tree.leaves(policy._solver_state)
        if jnp.issubdtype(x.dtype, jnp.floating)
    }
    assert float_dtypes == {jnp.dtype(jnp.bfloat16)}, float_dtypes


def _seeded_policy():
    return MPCPolicy(
        action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
        reward_function=pendulum_reward,
        dynamics_handler=DynamicsHandler(true_model=pendulum_dynamics),
        solver_name="CEM",
        planning_horizon=8,
        num_agents=1,
        population=32,
        num_elite=8,
        max_iterations=2,
        seed=0,
    )


def test_plan_is_prng_transparent():
    """plan() is documented as a read-only query: interleaving it must not change the
    action sequence of a seeded run (it must not consume the policy PRNG stream)."""
    obs = np.asarray([-1.0, 0.0, 0.0], np.float32)
    pa = _seeded_policy()
    a1, _, _ = pa.act(obs, 0)
    a2, _, _ = pa.act(obs, 1)

    pb = _seeded_policy()
    b1, _, _ = pb.act(obs, 0)
    plan, expected = pb.plan(obs, 1)  # read-only query between the acts
    b2, _, _ = pb.act(obs, 1)

    np.testing.assert_array_equal(a1, b1)
    np.testing.assert_array_equal(a2, b2)
    assert plan.shape == (1, 8, 1) and np.isfinite(expected).all()


def test_cem_gd_validates_keep_elites():
    """CEM-GD shares cem_iteration; an out-of-range keep_elites must raise the same
    clear ValueError as CEM instead of an opaque scan carry-shape mismatch."""
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
    with pytest.raises(ValueError, match="keep_elites"):
        make_solver(
            "CEM-GD", bounds, evaluate,
            planning_horizon=4, population=32, num_elite=8, keep_elites=20,
        )


def test_native_pendulum_step_wait_misuse_raises():
    """step_wait without step_async raises the same clean RuntimeError as the other vec
    envs (was: AttributeError on the never-initialized _pending)."""
    from blackbox_mpc_tpu.envs.native_pendulum import NativePendulumVecEnv

    env = NativePendulumVecEnv(num_envs=2)
    with pytest.raises(RuntimeError, match="step_async"):
        env.step_wait()
    env.reset()
    env.step_async(np.zeros((2, 1), np.float32))
    obs, rew, done, infos = env.step_wait()
    assert obs.shape == (2, 3)
    with pytest.raises(RuntimeError, match="step_async"):
        env.step_wait()  # buffer already drained


def test_ts_member_assignment_not_aliased_with_agent_stride():
    """TS member assignment must not collapse to the agent index when num_agents shares a
    factor with ensemble_size (row % E did: with A == E every candidate/particle of agent
    a ran member a — single-model planning per agent)."""
    cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=1, ensemble_size=3, propagation="ts1", probabilistic=True
    )
    from blackbox_mpc_tpu.models import make_learned_dynamics

    init, dyn = make_learned_dynamics(cfg)
    dp = init(jax.random.PRNGKey(0))
    # Reward = sum of the PREDICTED next state, so it fingerprints the member used.
    next_state_reward = lambda s, a, ns: jnp.sum(ns, axis=-1)  # noqa: E731
    evaluate = make_trajectory_evaluator(lambda s, a: dyn(dp, s, a), next_state_reward)
    agents, pop = 3, 12
    initial = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (agents, 1))
    actions = jnp.zeros((pop, agents, 1, 1))  # H=1, identical per candidate
    rewards = np.asarray(evaluate(initial, actions))  # [P, A]
    # Identical states+actions: the reward varies across candidates ONLY through the
    # member assignment. Every agent must see more than one ensemble member.
    for a in range(agents):
        assert len(np.unique(rewards[:, a])) >= 2, (
            f"agent {a} planned with a single ensemble member: {rewards[:, a]}"
        )


def test_ts_member_ids_balanced_and_static():
    from blackbox_mpc_tpu.models.dynamics import ts_member_ids

    ids = ts_member_ids(30, 5)
    assert sorted(np.bincount(ids)) == [6] * 5  # balanced
    np.testing.assert_array_equal(ids, ts_member_ids(30, 5))  # static per (n, E)
    with pytest.raises(ValueError, match="multiple"):
        ts_member_ids(31, 5)


def test_pallas_ts1_matches_xla_member_assignment():
    """The Mosaic ts1 rollout must use the same member assignment as the XLA path."""
    from blackbox_mpc_tpu.ops.pallas_rollout import make_pallas_rollout_evaluator

    cfg = LearnedDynamicsConfig(
        dim_s=3, dim_u=1, ensemble_size=3, propagation="ts1", hidden=(16,)
    )
    from blackbox_mpc_tpu.models import make_learned_dynamics

    init, dyn = make_learned_dynamics(cfg)
    dp = init(jax.random.PRNGKey(0))
    xla_eval = make_trajectory_evaluator(lambda s, a: dyn(dp, s, a), pendulum_reward)
    pallas_eval = make_pallas_rollout_evaluator(cfg, pendulum_reward, tile=8, interpret=True)
    agents, pop, horizon = 3, 8, 4
    initial = jax.random.normal(jax.random.PRNGKey(1), (agents, 3))
    actions = jax.random.uniform(jax.random.PRNGKey(2), (pop, agents, horizon, 1), minval=-1)
    r_xla = np.asarray(xla_eval(initial, actions))
    r_pallas = np.asarray(pallas_eval(dp, initial, actions))
    np.testing.assert_allclose(r_pallas, r_xla, rtol=2e-4, atol=2e-4)


def test_failed_switch_solver_leaves_policy_usable():
    """switch_solver to a plan-less solver with a proposer set must validate before any
    mutation: after the ValueError the previous solver still acts."""
    from blackbox_mpc_tpu.learning.proposer import PolicyProposer, ProposerConfig

    handler = DynamicsHandler(true_model=pendulum_dynamics)
    proposer = PolicyProposer(
        ProposerConfig(dim_s=3, dim_u=1, hidden=(8,)), Bounds.of(-2.0, 2.0, dim=1), seed=0
    )
    policy = MPCPolicy(
        action_space=BoxSpace(low=np.asarray([-2.0]), high=np.asarray([2.0])),
        reward_function=pendulum_reward,
        dynamics_handler=handler,
        solver_name="CEM",
        planning_horizon=6,
        population=32,
        num_elite=4,
        max_iterations=2,
        proposer=proposer,
        seed=0,
    )
    obs = np.asarray([-1.0, 0.0, 0.0], np.float32)
    a_before, _, _ = policy.act(obs, 0)
    with pytest.raises(ValueError, match="plan-carrying"):
        policy.switch_solver("PSO")
    assert policy.solver_name == "CEM"
    a_after, _, _ = policy.act(obs, 1)
    assert np.isfinite(a_after).all()


def test_cem_keep_elites_validated_at_construction():
    """Invalid keep_elites fails at make_solver/policy construction, not first act()."""
    bounds = Bounds.of(-2.0, 2.0, dim=1)
    evaluate = make_trajectory_evaluator(pendulum_dynamics, pendulum_reward)
    with pytest.raises(ValueError, match="keep_elites"):
        make_solver(
            "CEM", bounds, evaluate,
            planning_horizon=4, population=32, num_elite=8, keep_elites=20,
        )


def test_plan_validates_batch_size():
    policy = _seeded_policy()  # num_agents=1
    with pytest.raises(ValueError, match="num_agents"):
        policy.plan(np.zeros((3, 3), np.float32))


def test_pipeline_hit_rate_ignores_unspeculated_steps():
    """The first act of an episode has no speculation in flight — it must not count as a
    miss (with a perfect model, hit_rate should be exactly 1.0)."""
    from blackbox_mpc_tpu.policies.pipeline import SpeculativePipeline

    policy = _seeded_policy()
    pipe = SpeculativePipeline(policy, spec_tol=1e9)  # accept everything
    pipe.reset()
    obs = np.asarray([[-1.0, 0.0, 0.0]], np.float32)
    for t in range(4):
        action, pred_next, pred_reward, hit = pipe.act(obs, t)
        obs = pred_next  # follow the model so speculation always matches
    assert pipe.misses == 0
    assert pipe.hits == 3  # t=0 neither hits nor misses
    assert pipe.hit_rate == 1.0
