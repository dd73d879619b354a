"""JAX physics, terrain, and the RL environment."""

from . import env, physics, terrain  # noqa: F401
