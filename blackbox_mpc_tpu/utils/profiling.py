"""Profiling hooks: jax.profiler traces around the solve/rollout hot paths.

The reference's only instrumentation is wall-clock around ``policy.act``
(``/root/reference/blackbox_mpc/utils/rollouts.py:92-101``). Here, a context manager captures a
TensorBoard-viewable device trace of any region, and ``profile_policy_solve`` wraps one act()
step — the framework's north-star metric — for kernel-level inspection.
"""
from __future__ import annotations

import contextlib
import logging
from typing import Iterator

logger = logging.getLogger(__name__)

__all__ = ["trace", "profile_policy_solve"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """``with trace("/tmp/trace"):`` — captures a jax.profiler trace of the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("wrote profiler trace to %s (view with TensorBoard)", log_dir)


def profile_policy_solve(policy, observations, log_dir: str, steps: int = 3):
    """Traces ``steps`` act() calls (first call may include compilation)."""
    import numpy as np

    with trace(log_dir):
        for t in range(steps):
            policy.act(np.asarray(observations), t)
    return log_dir
