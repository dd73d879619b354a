"""Configs, logging, checkpointing."""

from . import checkpoint  # noqa: F401
