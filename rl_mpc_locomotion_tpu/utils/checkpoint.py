"""Orbax checkpointing of (params, optimizer state, lr, rng) + env state.

Replaces rsl_rl's torch.save model_<i>.pt flow (legged_config_ppo.py:35-40,
train.py:63-72) including latest-checkpoint discovery
(rsl_rl_utils.get_load_path:49-74).

Layout per step: ``model_<i>`` holds the bare TrainState (what deployment /
WeightPolicy loads); the sibling ``model_<i>_env`` holds
``{"env": EnvState batch, "obs": (B, 48), "tick": ()}`` so resume is a TRUE
continuation of the campaign (episodes keep their progress, commands, DR
draws, and per-env RNG streams — SURVEY §5's "params, optimizer, env state,
RNG"). A checkpoint without the sibling (older runs) still resumes, just
with freshly reset episodes.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"model_{step}")


def save_checkpoint(directory: str, step: int, state: Any,
                    env_snapshot: Optional[dict] = None) -> str:
    """Save ``state`` at model_<step>; ``env_snapshot`` (a pytree dict of
    env state / obs / tick) goes to the model_<step>_env sibling."""
    import orbax.checkpoint as ocp
    os.makedirs(directory, exist_ok=True)
    path = _ckpt_path(directory, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    if env_snapshot is not None:
        ckptr.save(path + "_env", env_snapshot, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    """Highest-step model_<i> in directory (get_load_path equivalent)."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("model_") and not name.endswith("_env"):
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
    # orbax/tensorstore requires absolute paths; accept relative ones
    return ckptr.restore(os.path.abspath(path), target)


def restore_env_snapshot(path: str, target: dict) -> Optional[dict]:
    """Restore the model_<i>_env sibling of a TrainState checkpoint.

    ``target`` gives the pytree structure/shapes (a fresh env batch from
    reset). Returns None when the checkpoint predates env snapshots."""
    if not os.path.isdir(path + "_env"):
        return None
    return restore_checkpoint(path + "_env", target)
