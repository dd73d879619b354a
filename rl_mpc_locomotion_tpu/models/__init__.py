"""Robot constants and policy networks."""

from . import robots  # noqa: F401
