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
