"""Policy base classes.

Counterparts of ``ModelBasedBasePolicy`` / ``ModelFreeBasePolicy``
(``/root/reference/blackbox_mpc/policies/model_based_base_policy.py``,
``model_free_base_policy.py``) — the type split the rollout runner branches on
(``utils/rollouts.py:88-98``).
"""
from __future__ import annotations

import abc

__all__ = ["Policy", "ModelBasedPolicy", "ModelFreePolicy"]


class Policy(abc.ABC):
    @abc.abstractmethod
    def act(self, observations, t: int, exploration_noise: bool = False):
        """Returns the action(s) for the current observation(s)."""

    def reset(self) -> None:
        """Per-episode reset; default no-op."""


class ModelBasedPolicy(Policy):
    """Policies backed by a dynamics model (can report predicted next state/reward)."""


class ModelFreePolicy(Policy):
    """Policies with no dynamics model (e.g. random exploration)."""
