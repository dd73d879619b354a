"""Device mesh + sharding helpers for scaling the env batch.

The reference has no multi-device story (SURVEY §2b: a serial per-env CPU
loop and an unused horovod flag). Here data parallelism over robots/envs is
first-class: a 1-D 'env' mesh (ICI within a slice), batched state sharded on
the leading axis, gradients reduced with psum inside shard_map.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.array(devices).reshape(-1), (ENV_AXIS,))


def shard_env_batch(mesh: Mesh, tree):
    """Shard a batched pytree along its leading (env) axis."""
    sharding = NamedSharding(mesh, P(ENV_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def psum_grads(grads):
    """Cross-device gradient reduction (inside shard_map)."""
    return jax.lax.pmean(grads, ENV_AXIS)


def shard_map_env(mesh: Mesh, fn: Callable, state_specs, out_specs):
    """Wrap fn(state, ...) with shard_map over the env axis."""
    return jax.shard_map(fn, mesh=mesh, in_specs=state_specs,
                         out_specs=out_specs, check_vma=False)
