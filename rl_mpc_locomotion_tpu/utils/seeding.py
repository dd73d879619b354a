"""Seeding (RL_Environment/utils/utils.py set_seed equivalent).

JAX is explicit-PRNG: all on-device randomness flows from the
``jax.random.PRNGKey`` held in configs/state, so unlike the reference
(which must seed torch/cuda and flip cudnn into deterministic mode,
utils/utils.py:20-45) the jitted pipeline is deterministic by
construction. What remains host-side: python's ``random``, numpy's global
generator (terrain synthesis, test fixtures), and the hash seed for dict
ordering in any host preprocessing.
"""
from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np

import jax


def set_seed(seed: Optional[int] = None, torch_deterministic: bool = False
             ) -> int:
    """Seed host-side RNGs; returns the seed (random one if None given).

    ``torch_deterministic`` mirrors the reference flag: when torch is
    present (e.g. for TensorBoard comparison scripts) it is seeded and
    pinned to deterministic algorithms too.
    """
    if seed is None:
        seed = int.from_bytes(os.urandom(4), "little")
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    os.environ.setdefault("PYTHONHASHSEED", str(seed))
    if torch_deterministic:
        try:
            import torch
            torch.manual_seed(seed)
            torch.use_deterministic_algorithms(True, warn_only=True)
        except Exception:
            pass
    return seed


def key(seed: int) -> jax.Array:
    """The device-side seed: a PRNG key (threads through configs/state)."""
    return jax.random.PRNGKey(seed)
