"""Test configuration: run everything on a virtual 8-device CPU backend so
multi-chip sharding is exercised without TPU hardware.

The environment may pre-import jax with a TPU plugin pinned (sitecustomize),
so env vars are too late — force the platform through jax.config before any
backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the sharded control-step/PPO compiles dominate
# suite wall time; cache hits cut repeat runs from ~15 min to a few minutes
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_cpu")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
