"""MPCPolicy: the user-facing facade wiring solver + evaluator + dynamics into ``act()``.

Counterpart of ``MPCPolicy`` (``/root/reference/blackbox_mpc/policies/mpc_policy.py``). The
reference's ``act()`` pays a host->device cast, an eager->graph hop, and a ``.numpy()`` sync per
control step (``mpc_policy.py:149-166``); here the whole step — solve, optional exploration
noise, one-step lookahead — is ONE jit-compiled function taking (solver state, dynamics params,
obs, t, key), so freshly trained dynamics params flow in without recompilation and solver state
stays device-resident between steps.

``switch_solver`` rebuilds only the solver (keeping handler/evaluator), mirroring
``switch_optimizer`` (``mpc_policy.py:181-245``) minus the duplicated if/elif chain — the
registry handles dispatch.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from blackbox_mpc_tpu.core.spaces import BoxSpace, as_box_space
from blackbox_mpc_tpu.core.types import Bounds
from blackbox_mpc_tpu.learning.handler import DynamicsHandler
from blackbox_mpc_tpu.policies.base import ModelBasedPolicy
from blackbox_mpc_tpu.rollout.evaluator import make_trajectory_evaluator
from blackbox_mpc_tpu.solvers import SOLVER_REGISTRY
from blackbox_mpc_tpu.solvers.base import exploration_noise as _exploration_noise
from blackbox_mpc_tpu.solvers.base import with_state_dtype as _with_state_dtype

logger = logging.getLogger(__name__)

__all__ = ["MPCPolicy"]


class MPCPolicy(ModelBasedPolicy):
    def __init__(
        self,
        action_space: BoxSpace,
        reward_function: Callable,
        dynamics_handler: DynamicsHandler,
        solver_name: str = "CEM",
        num_agents: int = 1,
        planning_horizon: int = 50,
        exploration_noise_scale: float = 0.05,
        discount: float = 1.0,
        seed: int = 0,
        metrics_writer=None,
        mesh=None,
        shard_axis: str = "population",
        rollout_backend: str = "xla",
        proposer=None,
        remat_rollout: bool = False,
        action_smoothness_weight: float = 0.0,
        rng_impl: str | None = None,
        **solver_kwargs,
    ):
        """``solver_kwargs`` are forwarded into the solver's config dataclass
        (mirrors ``**optimizer_args`` passthrough, reference mpc_policy.py:20,86).

        ``mesh``: optional ``jax.sharding.Mesh`` with a ``"pop"`` axis — shards the solve
        across chips (see :mod:`blackbox_mpc_tpu.parallel`). ``shard_axis`` picks what is
        sharded: ``"population"`` (candidates; small per-iteration collectives) or
        ``"agents"`` (whole agents per chip; zero collectives — best when
        num_agents >= num_devices).

        ``rollout_backend``: ``"xla"`` (default; measured fastest at every in-HBM shape —
        docs/performance.md regime map), ``"pallas"`` (fused VMEM-resident rollout kernel,
        :mod:`blackbox_mpc_tpu.ops.pallas_rollout`), ``"fused"`` (alias ``"fused_cem"``;
        the generate-in-kernel solver family — CEM, PI2, MPPI, RandomSearch — in
        :mod:`blackbox_mpc_tpu.ops.pallas_cem`: candidates never materialized, for
        beyond-HBM populations), or ``"auto"`` (measured rule in
        :mod:`blackbox_mpc_tpu.ops.backend_select`: XLA, except beyond-HBM populations of
        the fused-family solvers route to the fused path). Kernel backends need learned
        MLP dynamics with mean/ts1 propagation.

        ``proposer``: optional :class:`~blackbox_mpc_tpu.learning.proposer.PolicyProposer`
        (POPLIN-style amortization) — its policy net is unrolled through the posterior-mean
        dynamics each solve and the resulting plan replaces the solver's carried plan, so
        refinement starts from a learned proposal instead of the midpoint. Requires a
        plan-carrying solver (CEM, CEM-GD, CMA-ES, Gradient, PI2, SPSA).

        ``remat_rollout``: checkpoint the horizon-scan body (``jax.checkpoint``) so the
        first-order solvers (Gradient, CEM-GD) differentiate through the rollout storing
        only per-step carries, not every MLP activation — backward memory drops from
        O(H*B*width) to O(H*B*S) for one extra forward pass. Gradients are identical;
        derivative-free solvers are unaffected. Use for big restart clouds / long horizons
        that would otherwise exhaust HBM. XLA backend only (the fused kernels have no VJP).

        ``action_smoothness_weight``: actuation-rate cost ``w * sum ||a_t - a_{t-1}||^2``
        subtracted from every candidate's return before selection (see
        :func:`~blackbox_mpc_tpu.rollout.evaluator.make_trajectory_evaluator`). Works with
        every solver and the XLA/pallas backends (the term is computed on the candidate
        tensor outside the kernel); incompatible with ``fused_cem``, whose candidates are
        never materialized.

        ``rng_impl``: JAX PRNG implementation for the policy's key stream (``None`` =
        the process default, normally threefry2x32). ``"rbg"`` uses the hardware
        random-bit generator: at sampling-heavy shapes this is measured real time — the
        256-agent x 1k-candidate CEM solve drops ~8 % end to end (threefry spends
        ~2.7 ms per iteration generating the 76.8M-element candidate tensor's bits,
        docs/performance.md r4 profile). Trade-off: rbg streams are
        not reproducible across compiler versions/topologies (threefry is), so keep the
        default for golden-reproducibility workflows."""
        self._space = as_box_space(action_space)
        self._bounds = Bounds.from_space(self._space)
        self._reward_fn = reward_function
        self._handler = dynamics_handler
        self._num_agents = num_agents
        self._planning_horizon = planning_horizon
        self._noise_scale = exploration_noise_scale
        self._discount = discount
        self._writer = metrics_writer
        self._mesh = mesh
        self._shard_axis = shard_axis
        if rollout_backend == "fused":
            rollout_backend = "fused_cem"  # preferred alias for the fused solver family
        if rollout_backend not in ("xla", "pallas", "fused_cem", "auto"):
            raise ValueError(
                f"rollout_backend must be 'xla', 'pallas', 'fused' (alias 'fused_cem'), "
                f"or 'auto', got {rollout_backend!r}"
            )
        kernel_backend = rollout_backend in ("pallas", "fused_cem")
        if kernel_backend and dynamics_handler.is_true_model:
            raise ValueError(f"rollout_backend={rollout_backend!r} requires learned MLP dynamics")
        self._stochastic = (
            not dynamics_handler.is_true_model
            and dynamics_handler.config is not None
            and dynamics_handler.config.propagation in ("ts_inf", "mm")
        )
        self._penalized = dynamics_handler.penalized_dynamics_fn is not None
        if kernel_backend and self._penalized:
            raise ValueError(
                f"rollout_backend={rollout_backend!r} does not support "
                "plan_uncertainty_penalty (the kernels roll out penalty-free dynamics); "
                "use the XLA backend"
            )
        if kernel_backend and self._stochastic:
            raise ValueError(
                f"rollout_backend={rollout_backend!r} does not support propagation="
                f"{dynamics_handler.config.propagation!r} "
                "(the fused kernels are deterministic); use the XLA backend"
            )
        if rollout_backend == "pallas" and mesh is not None:
            raise ValueError(
                "rollout_backend='pallas' and mesh= are mutually exclusive (the rollout "
                "kernel is single-chip; shard with the XLA backend, or use "
                "rollout_backend='fused' whose solver family shards over the mesh)"
            )
        if rollout_backend == "fused_cem" and mesh is not None and shard_axis != "population":
            raise ValueError(
                "the sharded fused solvers shard the POPULATION axis by construction; "
                "shard_axis='agents' is an XLA-backend layout choice"
            )
        # "auto" resolves per solver config in _build (needs the population size); the
        # measured decision rule lives in ops/backend_select.py.
        self._requested_backend = rollout_backend
        self._rollout_backend = rollout_backend
        self._rng_impl = rng_impl  # recorded for deploy/export (artifact meta carries it)
        if rng_impl is None:
            self._key = jax.random.PRNGKey(seed)
        else:
            # TYPED key (jax.random.key): the impl rides IN the key, so every split/
            # fold_in/sample downstream (solver sampling included) inherits it —
            # per-policy choice, no global config. (A legacy uint32 PRNGKey would lose
            # the impl tag at the first split.)
            self._key = jax.random.key(seed, impl=rng_impl)
        self._proposer = proposer
        self._remat_rollout = bool(remat_rollout)
        if action_smoothness_weight < 0:
            raise ValueError(
                f"action_smoothness_weight must be >= 0, got {action_smoothness_weight}"
            )
        if action_smoothness_weight > 0 and rollout_backend == "fused_cem":
            raise ValueError(
                "action_smoothness_weight needs the candidate tensor; the fused CEM never "
                "materializes it — use the 'xla' or 'pallas' backend"
            )
        if rollout_backend == "fused_cem" and discount != 1.0:
            raise ValueError(
                "the fused solver kernels sum undiscounted rewards; discount != 1.0 would "
                "be silently ignored — use the 'xla' or 'pallas' backend"
            )
        self._smoothness = float(action_smoothness_weight)
        self._solver_kwargs = dict(solver_kwargs)
        self._act_counter = 0
        self._build(solver_name, strict_kwargs=True)

    # ------------------------------------------------------------------ construction

    def _build(self, solver_name: str, strict_kwargs: bool = False) -> None:
        if solver_name not in SOLVER_REGISTRY:
            raise KeyError(
                f"unknown solver {solver_name!r}; available: {sorted(SOLVER_REGISTRY)}"
            )
        config_cls, factory = SOLVER_REGISTRY[solver_name]
        # At construction, unknown kwargs are errors (catches typos like population_size=).
        # On switch_solver, leftover kwargs from the previous solver family are filtered —
        # switching CEM -> PI2 must not crash on CEM's num_elite.
        valid = set(config_cls.__dataclass_fields__)
        kept = {k: v for k, v in self._solver_kwargs.items() if k in valid}
        dropped = set(self._solver_kwargs) - set(kept)
        if dropped and strict_kwargs:
            raise TypeError(
                f"unknown solver kwargs for {solver_name}: {sorted(dropped)}; "
                f"valid: {sorted(valid)}"
            )
        if dropped:
            logger.info("%s ignores solver kwargs %s", solver_name, sorted(dropped))
        config = config_cls(
            planning_horizon=self._planning_horizon,
            num_agents=self._num_agents,
            **kept,
        )
        if getattr(config, "num_elite", 0) > config.population:
            raise ValueError(
                f"num_elite ({config.num_elite}) must be <= population ({config.population})"
            )
        if self._proposer is not None:
            # Validate BEFORE any self-mutation: a failed switch_solver must leave the
            # previous (working) solver fully in place, not a hybrid broken state.
            # Solvers declare their seedable plan field (Solver.plan_field) — no duck
            # typing on state-field names, so a future solver with a coincidental `mean`
            # cannot be silently corrupted by proposer seeding.
            probe = factory(config, self._bounds, lambda s, a: jnp.zeros(()))
            field = probe.plan_field
            if field is None:
                raise ValueError(
                    f"proposer= requires a plan-carrying solver (one declaring "
                    f"Solver.plan_field: CEM, CEM-GD, CMA-ES, Gradient, PI2, SPSA); "
                    f"{solver_name} declares none"
                )
            plan_size = self._num_agents * self._planning_horizon * self._bounds.dim
            plan_shape = getattr(
                jax.eval_shape(probe.init, jax.random.PRNGKey(0)), field
            )
            if int(np.prod(plan_shape.shape)) != plan_size:
                raise ValueError(
                    f"{solver_name} plan field '{field}' has size "
                    f"{int(np.prod(plan_shape.shape))}, expected A*H*U={plan_size}"
                )
            self._proposer_field = field
        self._solver_name = solver_name
        self._config = config
        if self._requested_backend == "auto":
            from blackbox_mpc_tpu.ops.backend_select import choose_backend

            dyn_cfg = None if self._handler.is_true_model else self._handler.config
            resolved = choose_backend(
                dyn_cfg,
                getattr(config, "population", 0),
                self._num_agents,
                mesh=self._mesh,
                horizon=self._planning_horizon,
                dim_u=self._bounds.dim,
                solver_name=solver_name,
                solver_config=config,
            ) if not (self._stochastic or self._penalized) else "xla"
            if resolved != self._rollout_backend:
                logger.info("rollout_backend auto -> %s", resolved)
            if resolved == "fused_cem":
                # The fused family samples clipped (not resampled-truncated) normals —
                # a silent sampling-distribution change when a population crosses the
                # beyond-HBM threshold; surface it (ops/pallas_cem.py module docstring).
                logger.info(
                    "auto-routing %s onto the fused generate-in-kernel backend: "
                    "candidates are clipped normals (+/-2 sigma), not the XLA path's "
                    "resampled-truncated normals", solver_name,
                )
            if resolved == "fused_cem" and self._smoothness > 0:
                raise ValueError(
                    "rollout_backend='auto' selected the fused CEM (beyond-HBM population) "
                    "but action_smoothness_weight needs the candidate tensor; pick a "
                    "population that fits HBM or drop the smoothness cost"
                )
            if resolved == "fused_cem" and self._discount != 1.0:
                raise ValueError(
                    "rollout_backend='auto' selected the fused solver (beyond-HBM "
                    "population) but the fused kernels sum undiscounted rewards; pick a "
                    "population that fits HBM or set discount=1.0"
                )
            if (resolved == "fused_cem" and self._mesh is not None
                    and self._shard_axis != "population"):
                # same constraint the explicit fused+mesh path enforces in __init__:
                # the sharded fused solvers shard the population axis by construction.
                # Hard error (r5; was a warn-then-degrade-to-XLA): fused was selected
                # because the candidate tensor is beyond per-device HBM, and the XLA
                # sharded evaluator would have to materialize exactly that tensor — a
                # silently-degraded config that OOMs at run time is worse than refusing
                # at construction.
                raise ValueError(
                    f"rollout_backend='auto' selected the fused generate-in-kernel "
                    f"backend (candidate tensor beyond per-device HBM) but "
                    f"shard_axis={self._shard_axis!r} shards the agent axis, which the "
                    f"fused solvers do not support. Use shard_axis='population' to keep "
                    f"the fused path, shrink the population to fit HBM, or pass "
                    f"rollout_backend='xla' explicitly to accept the materialized "
                    f"candidate tensor."
                )
            self._rollout_backend = resolved
        if self._rollout_backend == "fused_cem" and solver_name not in (
            "CEM", "PI2", "MPPI", "RandomSearch", "CMA-ES"
        ):
            raise ValueError(
                "rollout_backend='fused' backs the generate-in-kernel solver family "
                f"(CEM, PI2, MPPI, RandomSearch, CMA-ES with diagonal=True), not "
                f"{solver_name}"
            )
        if self._rollout_backend == "pallas" and solver_name in ("Gradient", "CEM-GD"):
            raise ValueError(
                f"rollout_backend='pallas' cannot back the first-order {solver_name} solver "
                "(the Mosaic rollout kernel has no VJP); use the XLA backend"
            )
        time_major = bool(getattr(config, "time_major", False))
        if time_major and self._rollout_backend != "xla":
            raise ValueError(
                f"time_major=True requires the XLA evaluator — the "
                f"{self._rollout_backend!r} kernel backend's candidate contract is "
                f"[P, A, H, U]"
            )
        bounds = self._bounds
        reward_fn = self._reward_fn
        # Pessimistic planning: roll out the (next_state, disagreement-penalty) variant and
        # let the evaluator subtract the penalty per step. The one-step lookahead report
        # below stays on the unpenalized posterior mean — it predicts the env's reward, not
        # the planner's internal objective.
        penalized = self._penalized
        dynamics_fn = (
            self._handler.penalized_dynamics_fn if penalized else self._handler.dynamics_fn
        )
        mean_dynamics_fn = self._handler.mean_dynamics_fn
        discount = self._discount
        noise_scale = self._noise_scale

        mesh = self._mesh
        pallas_evaluate = None
        fused_cem_factory = None
        # Off-TPU (CPU tests), the Mosaic kernels run in TPU-semantics interpreter mode.
        interpret = jax.default_backend() != "tpu"
        if self._rollout_backend == "pallas":
            from blackbox_mpc_tpu.ops.pallas_rollout import make_pallas_rollout_evaluator

            pallas_evaluate = make_pallas_rollout_evaluator(
                self._handler.config, reward_fn, discount=discount, interpret=interpret
            )
        elif self._rollout_backend == "fused_cem":
            dyn_cfg = self._handler.config
            if mesh is not None:
                # Pod-scale fused family: per-device kernels on the population shard,
                # top-k/softmax over the sharded reward vector (ops/fused_sharded.py).
                from blackbox_mpc_tpu.ops.fused_sharded import (
                    make_sharded_fused_cem,
                    make_sharded_fused_pi2,
                    make_sharded_fused_random_search,
                    make_sharded_fused_sep_cma,
                )

                fused_factory_fn = {
                    "CEM": make_sharded_fused_cem,
                    "PI2": make_sharded_fused_pi2,
                    "MPPI": make_sharded_fused_pi2,
                    "RandomSearch": make_sharded_fused_random_search,
                    "CMA-ES": make_sharded_fused_sep_cma,  # diagonal=True (factory checks)
                }.get(solver_name)
                if fused_factory_fn is None:
                    raise ValueError(
                        f"{solver_name} has no SHARDED fused path yet; use the single-chip "
                        "fused solver (no mesh) or the XLA backend"
                    )
                fused_cem_factory = lambda dp: fused_factory_fn(  # noqa: E731
                    config, bounds, dyn_cfg, dp, reward_fn, mesh, interpret=interpret
                )
            else:
                from blackbox_mpc_tpu.ops.pallas_cem import (
                    make_fused_cem,
                    make_fused_pi2,
                    make_fused_random_search,
                    make_fused_sep_cma,
                )

                fused_factory_fn = {
                    "CEM": make_fused_cem,
                    "PI2": make_fused_pi2,
                    "MPPI": make_fused_pi2,
                    "RandomSearch": make_fused_random_search,
                    "CMA-ES": make_fused_sep_cma,  # requires diagonal=True (factory checks)
                }[solver_name]
                fused_cem_factory = lambda dp: fused_factory_fn(  # noqa: E731
                    config, bounds, dyn_cfg, dp, reward_fn, interpret=interpret
                )

        stochastic = self._stochastic
        num_particles = (
            self._handler.config.num_particles
            if stochastic and self._handler.config is not None else 1
        )

        proposer = self._proposer
        if proposer is not None:
            from blackbox_mpc_tpu.learning.proposer import make_plan_proposal_fn

            propose = make_plan_proposal_fn(
                proposer.config, bounds, mean_dynamics_fn, self._planning_horizon
            )

        def step(solver_state, dynamics_params, proposer_params, obs, t, key,
                 add_noise: bool):
            solve_key, noise_key, rollout_key = jax.random.split(key, 3)
            if proposer is not None:
                # POPLIN-style seeding: the policy-net unroll replaces the carried plan.
                # Reshape covers CMA-ES's flattened [A, H*U] mean; SPSA names it `solution`.
                proposed = propose(proposer_params, dynamics_params, obs)
                field = self._proposer_field
                current = getattr(solver_state, field)
                solver_state = solver_state.replace(
                    **{field: proposed.reshape(current.shape).astype(current.dtype)}
                )
            if fused_cem_factory is not None:
                # Generate-in-kernel CEM: the candidate tensor never exists in HBM
                # (beyond-HBM populations, ops/pallas_cem.py). with_state_dtype keeps the
                # update math f32 when the stored state is bf16 — the registry-built init
                # stores bf16, so the fused solver must honor the same upcast contract.
                solver = _with_state_dtype(fused_cem_factory(dynamics_params), config.dtype)
                action, new_state, aux = solver.solve(solver_state, obs, t, solve_key)
                if add_noise:
                    action = _exploration_noise(noise_key, action, bounds, noise_scale)
                next_obs = mean_dynamics_fn(dynamics_params, obs, action)
                pred_reward = reward_fn(obs, action, next_obs)
                return action, new_state, aux, next_obs, pred_reward
            if pallas_evaluate is not None:
                kernel_evaluate = partial(pallas_evaluate, dynamics_params)
                if self._smoothness > 0:
                    from blackbox_mpc_tpu.rollout.evaluator import action_smoothness_penalty

                    w, disc = self._smoothness, discount
                    evaluate = lambda s0, acts: kernel_evaluate(s0, acts) - (  # noqa: E731
                        action_smoothness_penalty(acts, w, disc)
                    )
                else:
                    evaluate = kernel_evaluate
            elif mesh is not None:
                from blackbox_mpc_tpu.parallel.sharding import make_sharded_evaluator

                evaluate = make_sharded_evaluator(
                    partial(dynamics_fn, dynamics_params), reward_fn, mesh,
                    discount=discount, shard_axis=self._shard_axis,
                    num_particles=num_particles, remat=self._remat_rollout,
                    action_smoothness_weight=self._smoothness,
                    dynamics_returns_penalty=penalized, time_major=time_major,
                )
            else:
                evaluate = make_trajectory_evaluator(
                    partial(dynamics_fn, dynamics_params), reward_fn, discount=discount,
                    num_particles=num_particles, remat=self._remat_rollout,
                    action_smoothness_weight=self._smoothness,
                    dynamics_returns_penalty=penalized, time_major=time_major,
                )
            if stochastic:
                # TS-inf: bind ONE rollout-noise key for the whole solve — every solver
                # iteration scores candidates under the same dynamics-noise draw (common
                # random numbers), so iteration-over-iteration improvement reflects the
                # candidates, not the noise. The solver->evaluator contract is unchanged.
                base_evaluate = evaluate
                evaluate = lambda s, a: base_evaluate(s, a, rollout_key)  # noqa: E731
            solver = factory(config, bounds, evaluate)
            action, new_state, aux = solver.solve(solver_state, obs, t, solve_key)
            if add_noise:
                action = _exploration_noise(noise_key, action, bounds, noise_scale)
            # One-step lookahead, as in the reference optimizer base
            # (optimizer_base.py:91-94): predicted next state + its reward. Uses the
            # posterior-mean dynamics — a [num_agents, S] probe batch need not divide the
            # ensemble, and the report should not be a single noise draw.
            next_obs = mean_dynamics_fn(dynamics_params, obs, action)
            pred_reward = reward_fn(obs, action, next_obs)
            return action, new_state, aux, next_obs, pred_reward

        self._step = jax.jit(step, static_argnames=("add_noise",))
        self._step_fn = step  # raw (unjitted) step, re-staged by deploy/export
        self._solver_factory = factory
        key, init_key = jax.random.split(self._key)
        self._key = key
        # init/reset are cheap pure fns; jit so state lands on device.
        solver = factory(config, bounds, lambda s, a: jnp.zeros(()))
        self._solver_init = jax.jit(solver.init)
        self._solver_reset = jax.jit(solver.reset)
        self._solver_state = self._solver_init(init_key)

    def _proposer_params_arg(self):
        # Threaded as a jit ARGUMENT (device-array closures are pathological on remote
        # frontends); a dummy scalar keeps the step signature stable when no proposer is set.
        return self._proposer.params if self._proposer is not None else np.zeros((), np.float32)

    # ------------------------------------------------------------------ public API

    @property
    def solver_name(self) -> str:
        return self._solver_name

    @property
    def dynamics_handler(self) -> DynamicsHandler:
        return self._handler

    @property
    def proposer(self):
        return self._proposer

    def act(self, observations, t: int = 0, exploration_noise: bool = False):
        """Solves one MPC step.

        Accepts an unbatched ``[S]`` observation (tiled across agents, as the reference does,
        mpc_policy.py:149-152) or a batched ``[num_agents, S]`` array. Returns
        ``(action, predicted_next_obs, predicted_reward)`` matching the reference's ``act``
        contract (mpc_policy.py:124-172), un-batched iff the input was un-batched.
        """
        obs = np.asarray(observations, dtype=np.float32)
        batched = obs.ndim > 1
        if not batched:
            obs = np.tile(obs[None], (self._num_agents, 1))
        if obs.shape[0] != self._num_agents:
            raise ValueError(
                f"observations batch {obs.shape[0]} != num_agents {self._num_agents}"
            )
        self._key, step_key = jax.random.split(self._key)
        action, self._solver_state, aux, next_obs, pred_reward = self._step(
            self._solver_state,
            self._handler.dynamics_params,
            self._proposer_params_arg(),
            jnp.asarray(obs),
            jnp.asarray(t, jnp.int32),
            step_key,
            bool(exploration_noise),
        )
        self._act_counter += 1
        # One batched device->host transfer: on remote/tunneled frontends each separate
        # readback pays a full round-trip, so fetching (action, next_obs, reward) in a single
        # device_get cuts act() latency ~3x.
        action, next_obs, pred_reward = jax.device_get((action, next_obs, pred_reward))
        if self._writer is not None:
            self._writer.scalar(
                "rewards/predicted_reward", float(np.mean(pred_reward)), self._act_counter
            )
        if batched:
            return action, next_obs, pred_reward
        return action[0], next_obs[0], pred_reward[0]

    def plan(self, observations, t: int = 0):
        """Runs a solve and returns the full refined plan [A, H, U] + expected reward [A]."""
        obs = np.asarray(observations, dtype=np.float32)
        if obs.ndim == 1:
            obs = np.tile(obs[None], (self._num_agents, 1))
        if obs.shape[0] != self._num_agents:
            raise ValueError(
                f"observations batch {obs.shape[0]} != num_agents {self._num_agents}"
            )
        # Read-only query: the updated solver state is discarded and the policy PRNG
        # stream is NOT advanced (fold_in derives an out-of-band key), so inspecting the
        # plan neither warm-start-shifts the controller nor perturbs the action sequence
        # of a seeded run.
        step_key = jax.random.fold_in(self._key, 0x504C4E)  # "PLN"
        _, _discarded_state, aux, _, _ = self._step(
            self._solver_state,
            self._handler.dynamics_params,
            self._proposer_params_arg(),
            jnp.asarray(obs),
            jnp.asarray(t, jnp.int32),
            step_key,
            False,
        )
        return np.asarray(aux.plan), np.asarray(aux.expected_reward)

    def reset(self) -> None:
        """Per-episode solver-state reset (reference mpc_policy.py:174-179)."""
        self._key, reset_key = jax.random.split(self._key)
        self._solver_state = self._solver_reset(self._solver_state, reset_key)

    def switch_solver(self, solver_name: str, **solver_kwargs) -> None:
        """Swaps the trajectory solver, keeping dynamics handler and evaluator wiring.

        New kwargs are validated against the target solver; kwargs carried over from the
        previous solver that the target does not understand are dropped (logged)."""
        if solver_kwargs:
            self._solver_kwargs = dict(solver_kwargs)
            self._build(solver_name, strict_kwargs=True)
        else:
            self._build(solver_name)
        logger.info("switched solver to %s", solver_name)
