"""Configs, logging, metrics, profiling, checkpointing."""

from . import checkpoint  # noqa: F401
from . import metrics  # noqa: F401
from . import profiling  # noqa: F401
