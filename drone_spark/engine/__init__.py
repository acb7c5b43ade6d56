"""Iterative superstep runtime (driver loop + checkpointed state)."""

from .superstep import RunResult, SuperstepEngine  # noqa: F401
