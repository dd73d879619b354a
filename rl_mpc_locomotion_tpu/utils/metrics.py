"""Metrics / observability: structured metrics out of jitted steps, onto disk.

The reference has three observability channels (SURVEY §5):
  1. an MPC frame logger that pickles per-solve dicts
     (MPC_Controller/Logger.py:6-27, fed at ConvexMPCLocomotion.py:192-215),
  2. TensorBoard scalars via rsl_rl's OnPolicyRunner (README.md:66),
  3. flag-gated console prints.

Here the jitted control/train steps already *return* structured metric
pytrees (control/locomotion.py metrics dict, rl/train.py per-iter metrics);
this module is the host-side sink:

- ``MetricsWriter``   — JSONL file (always) + TensorBoard scalars (when
                        torch.utils.tensorboard is importable; torch-cpu is
                        in the image) per step.
- ``MPCFrameLogger``  — the Logger.py equivalent: accumulates per-solve MPC
                        frames (com state, desired state, GRFs, loss
                        decomposition, weights, tick) and flushes them to a
                        single ``.npz``; optionally backed by the native
                        wait-free ring buffer (utils/native_runtime.py) so
                        the control thread never touches the filesystem.

Everything degrades gracefully: no tensorboard -> JSONL only; no native
library -> buffered numpy.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Mapping, Optional

import numpy as np

try:  # torch-cpu ships in the image; tensorboard may or may not
    from torch.utils.tensorboard import SummaryWriter as _TBWriter
except Exception:  # pragma: no cover - depends on image contents
    _TBWriter = None


def _scalarize(value) -> Optional[float]:
    """Best-effort conversion of a metric leaf to a float scalar."""
    try:
        arr = np.asarray(value)
    except Exception:
        return None
    if arr.size != 1:
        return None
    return float(arr.reshape(()))


class MetricsWriter:
    """Writes one metrics dict per step to JSONL (+ TensorBoard if present).

    >>> w = MetricsWriter("runs/exp0")
    >>> w.write(10, {"mean_reward": 0.5, "kl": 0.01})
    >>> w.close()
    """

    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 jsonl_name: str = "metrics.jsonl"):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, jsonl_name), "a",
                           buffering=1)
        self._tb = None
        if use_tensorboard and _TBWriter is not None:
            try:
                self._tb = _TBWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    @property
    def has_tensorboard(self) -> bool:
        return self._tb is not None

    def write(self, step: int, metrics: Mapping[str, Any],
              prefix: str = "") -> None:
        row: Dict[str, Any] = {"step": int(step), "ts": time.time()}
        for key, val in metrics.items():
            scalar = _scalarize(val)
            if scalar is None:
                continue
            name = f"{prefix}{key}"
            row[name] = scalar
            if self._tb is not None:
                self._tb.add_scalar(name, scalar, int(step))
        self._jsonl.write(json.dumps(row) + "\n")

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


#: Field layout of one flattened MPC telemetry frame, mirroring the dict the
#: reference logs per solve (ConvexMPCLocomotion.py:192-215): 13 com state,
#: 13 desired state, 12 GRFs, 3 loss terms (state/torque/total), 13 weights,
#: 1 tick = 55 floats.
MPC_FRAME_FIELDS = (
    ("com_state", 13),
    ("desired_state", 13),
    ("grf", 12),
    ("loss", 3),
    ("weights", 13),
    ("tick", 1),
)
MPC_FRAME_SIZE = sum(n for _, n in MPC_FRAME_FIELDS)


def pack_mpc_frame(com_state, desired_state, grf, loss, weights,
                   tick) -> np.ndarray:
    """Flatten one MPC solve's telemetry into a (MPC_FRAME_SIZE,) float32."""
    parts = [np.asarray(com_state, np.float32).reshape(13),
             np.asarray(desired_state, np.float32).reshape(13),
             np.asarray(grf, np.float32).reshape(12),
             np.asarray(loss, np.float32).reshape(3),
             np.asarray(weights, np.float32).reshape(13),
             np.float32(tick).reshape(1)]
    return np.concatenate(parts)


def unpack_mpc_frames(frames: np.ndarray) -> Dict[str, np.ndarray]:
    """(k, MPC_FRAME_SIZE) -> dict of named arrays."""
    frames = np.asarray(frames).reshape(-1, MPC_FRAME_SIZE)
    out = {}
    off = 0
    for name, n in MPC_FRAME_FIELDS:
        out[name] = frames[:, off:off + n]
        off += n
    return out


class MPCFrameLogger:
    """Per-solve MPC telemetry recorder (Logger.py:6-27 equivalent).

    ``log(...)`` takes the arrays the jitted step returned (host-side, after
    ``jax.device_get`` or as numpy); ``flush()`` writes one ``.npz`` with the
    named fields. When the native runtime library is available, frames pass
    through its wait-free ring buffer so logging never blocks the control
    loop; otherwise they buffer in a Python list.
    """

    def __init__(self, log_dir: str = "logs", use_native: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(
            log_dir, f"mpclog_{time.strftime('%Y%m%d_%H%M%S')}")
        self._native = None
        if use_native:
            try:
                from .native_runtime import TelemetryLogger
                native = TelemetryLogger(self._path + ".bin",
                                         frame_size=MPC_FRAME_SIZE)
                if native.available:
                    self._native = native
            except Exception:
                self._native = None
        self._frames: list[np.ndarray] = []

    def log(self, com_state, desired_state, grf, loss, weights,
            tick) -> None:
        frame = pack_mpc_frame(com_state, desired_state, grf, loss, weights,
                               tick)
        if self._native is not None:
            self._native.push(frame)
        else:
            self._frames.append(frame)

    def flush(self) -> str:
        """Write accumulated frames to ``<path>.npz``; returns the path."""
        if self._native is not None:
            self._native.flush()
            self._native.close()
            raw = type(self._native).read(self._path + ".bin")
            frames = raw.reshape(-1, MPC_FRAME_SIZE)
            self._native = None
        else:
            frames = (np.stack(self._frames) if self._frames
                      else np.zeros((0, MPC_FRAME_SIZE), np.float32))
        out = self._path + ".npz"
        np.savez(out, **unpack_mpc_frames(frames))
        return out
