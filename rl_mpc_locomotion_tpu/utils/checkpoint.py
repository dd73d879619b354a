"""Orbax checkpointing of (params, optimizer state, lr, rng).

Replaces rsl_rl's torch.save model_<i>.pt flow (legged_config_ppo.py:35-40,
train.py:63-72) including latest-checkpoint discovery
(rsl_rl_utils.get_load_path:49-74).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"model_{step}")


def save_checkpoint(directory: str, step: int, state: Any) -> str:
    import orbax.checkpoint as ocp
    os.makedirs(directory, exist_ok=True)
    path = _ckpt_path(directory, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    """Highest-step model_<i> in directory (get_load_path equivalent)."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("model_"):
            try:
                steps.append(int(name.split("_")[1]))
            except (IndexError, ValueError):
                continue
    if not steps:
        return None
    return _ckpt_path(directory, max(steps))


def restore_checkpoint(path: str, target: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)
