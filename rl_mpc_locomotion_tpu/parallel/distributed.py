"""Multi-host runtime: jax.distributed + mesh construction.

The reference declares a multi_gpu/horovod flag it never uses
(cfg/config.yaml:39-40, SURVEY §2b). Here multi-host is real: initialize the
JAX distributed runtime, build a global env mesh across all processes, and
shard the env batch so PPO gradients reduce over ICI within a slice and DCN
across slices (the only cross-host traffic — rollouts are fully on-device).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import ENV_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed. No-ops for single-process runs.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) so pod
    launchers can configure purely via environment.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_env_mesh() -> Mesh:
    """1-D mesh over every device of every process. Within a host/slice the
    env axis rides ICI; across slices it rides DCN — psum/pmean placement
    follows automatically from the sharding."""
    return Mesh(np.array(jax.devices()).reshape(-1), (ENV_AXIS,))


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this process's slice of a global env batch."""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (
        f"global batch {global_batch} must divide process count {n_proc}")
    per = global_batch // n_proc
    return jax.process_index() * per, per
