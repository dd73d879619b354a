"""Device-mesh sharding of env batches and training."""

from . import mesh  # noqa: F401
