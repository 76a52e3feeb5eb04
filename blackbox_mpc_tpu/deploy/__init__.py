"""Deployment/serving subsystem: AOT-export MPC policies to standalone artifacts.

- :func:`export_policy_artifact` — serialize an ``MPCPolicy``'s ENTIRE solve step
  (solver iterations + rollouts + noise + lookahead) as StableHLO into one ``.bbmpc``
  file, snapshotting solver state and PRNG stream.
- :class:`ServingPolicy` — load and serve that artifact with zero framework code and
  zero Python re-tracing (``deploy/serving.py`` is self-contained by design).
- :func:`export_dynamics` — the learned model alone with a polymorphic batch dim; the
  analogue of the reference's SavedModel ``[None, S+U]`` signature
  (``/root/reference/blackbox_mpc/dynamics_handlers/system_dynamics_handler.py:213-241``).
"""
from blackbox_mpc_tpu.deploy.export import export_dynamics, export_policy_artifact
from blackbox_mpc_tpu.deploy.serving import ServingPolicy
from blackbox_mpc_tpu.policies.base import ModelBasedPolicy as _ModelBasedPolicy

# Virtual subclass, not inheritance: serving.py must stay importable with ZERO framework
# dependencies (its whole point), but a loaded ServingPolicy honors the ModelBasedPolicy
# contract (act -> (action, predicted_next_obs, predicted_reward), reset), so the rollout
# runner's isinstance branch (workflows/rollouts.py) must treat it as model-based.
_ModelBasedPolicy.register(ServingPolicy)

__all__ = ["export_policy_artifact", "export_dynamics", "ServingPolicy"]
