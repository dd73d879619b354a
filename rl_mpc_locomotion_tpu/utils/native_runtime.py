"""ctypes bindings for the native runtime (native/runtime.cc).

- TelemetryLogger: wait-free ring-buffer frame logger, drained off-thread —
  the native replacement for MPC_Controller/Logger.py (which pickled frames
  on the control thread).
- Gamepad: /dev/input/js* reader with the reference's command mapping
  (gamepad_reader.py:61-132): left stick = vx/vy, right stick x = yaw rate,
  LB cycles gait, RB cycles FSM mode, LB+RB = e-stop.

The shared library is built on demand with make; everything degrades
gracefully (pure-Python fallback logger, inert gamepad) when a toolchain or
device is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import pickle
import subprocess
import threading
import time
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librlmpc_runtime.so"))
_lib = None
_lib_lock = threading.Lock()


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.rt_logger_create.restype = ctypes.c_void_p
        lib.rt_logger_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_int]
        lib.rt_logger_push.restype = ctypes.c_int
        lib.rt_logger_push.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int]
        lib.rt_logger_dropped.restype = ctypes.c_uint64
        lib.rt_logger_dropped.argtypes = [ctypes.c_void_p]
        lib.rt_logger_flush.argtypes = [ctypes.c_void_p]
        lib.rt_logger_destroy.argtypes = [ctypes.c_void_p]
        lib.rt_gamepad_open.restype = ctypes.c_void_p
        lib.rt_gamepad_open.argtypes = [ctypes.c_char_p]
        lib.rt_gamepad_connected.restype = ctypes.c_int
        lib.rt_gamepad_connected.argtypes = [ctypes.c_void_p]
        lib.rt_gamepad_state.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_int16),
                                         ctypes.POINTER(ctypes.c_uint8)]
        lib.rt_gamepad_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class TelemetryLogger:
    """Fixed-size float-frame logger. Native ring buffer when available,
    buffered pickle fallback otherwise (Logger.py-compatible spirit)."""

    MAGIC = 0x524C4D43

    def __init__(self, path: str, frame_size: int, capacity: int = 4096,
                 field_names: Optional[list] = None):
        self.path = path
        self.frame_size = frame_size
        self.field_names = field_names
        lib = _load_library()
        self._handle = None
        self._fallback_frames = []
        if lib is not None:
            self._lib = lib
            self._handle = lib.rt_logger_create(path.encode(), frame_size,
                                                capacity)
        if field_names:
            with open(path + ".meta", "w") as f:
                f.write("\n".join(field_names))

    @property
    def available(self) -> bool:
        """True when the native ring buffer is backing this logger."""
        return self._handle is not None

    def push(self, frame: np.ndarray) -> bool:
        frame = np.ascontiguousarray(frame, dtype=np.float32).reshape(-1)
        assert frame.shape[0] == self.frame_size
        if self._handle is not None:
            ptr = frame.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            return bool(self._lib.rt_logger_push(self._handle, ptr,
                                                 self.frame_size))
        self._fallback_frames.append(frame.copy())
        return True

    @property
    def dropped(self) -> int:
        if self._handle is not None:
            return int(self._lib.rt_logger_dropped(self._handle))
        return 0

    def flush(self):
        if self._handle is not None:
            self._lib.rt_logger_flush(self._handle)
        elif self._fallback_frames:
            with open(self.path, "wb") as f:
                pickle.dump(np.stack(self._fallback_frames), f)

    def close(self):
        if self._handle is not None:
            self._lib.rt_logger_destroy(self._handle)
            self._handle = None
        else:
            self.flush()

    @staticmethod
    def read(path: str) -> np.ndarray:
        """Read a native binary log back as (n_frames, frame_size)."""
        with open(path, "rb") as f:
            header = np.fromfile(f, dtype=np.uint32, count=3)
            if len(header) == 3 and header[0] == TelemetryLogger.MAGIC:
                frame_size = int(header[2])
                data = np.fromfile(f, dtype=np.float32)
                n = len(data) // frame_size
                return data[:n * frame_size].reshape(n, frame_size)
        with open(path, "rb") as f:  # pickle fallback
            return pickle.load(f)


# gamepad_reader.py command mapping constants (:84-122)
_MAX_VX, _MAX_VY, _MAX_WZ = 1.0, 0.6, 1.2
_GAITS = [0, 6, 1]          # trot, walk, bound (utils.GaitType values 0/6/1)
_MODES = [2, 1, 0]          # recovery, locomotion, passive


class Gamepad:
    """Gamepad with the reference's stick/button semantics. Inert (zero
    commands, connected=False) when no joystick device exists."""

    def __init__(self, device: str = "/dev/input/js0"):
        lib = _load_library()
        self._lib = lib
        self._handle = None
        self.gait_idx = 0
        self.mode_idx = 0
        self.estop_flagged = False
        self._prev_lb = False
        self._prev_rb = False
        if lib is not None and os.path.exists(device):
            self._handle = lib.rt_gamepad_open(device.encode())
            if not lib.rt_gamepad_connected(self._handle):
                lib.rt_gamepad_close(self._handle)
                self._handle = None
        self._fake = None

    @property
    def connected(self) -> bool:
        return self._handle is not None

    def fake_event(self, mode_idx: Optional[int] = None,
                   estop: bool = False):
        """Force a state change (RL_MPC_Locomotion.py:103-105 uses this to
        trigger recovery on unsafe locomotion)."""
        if mode_idx is not None:
            self.mode_idx = mode_idx % len(_MODES)
        if estop:
            self.estop_flagged = True

    def _raw_state(self):
        axes = (ctypes.c_int16 * 8)()
        buttons = (ctypes.c_uint8 * 16)()
        self._lib.rt_gamepad_state(self._handle, axes, buttons)
        return np.ctypeslib.as_array(axes).copy(), \
            np.ctypeslib.as_array(buttons).copy()

    def get_command(self):
        """(vx, vy, wz) command + handle LB/RB edges. Returns zeros when
        disconnected."""
        if self._handle is None:
            return np.zeros(3, np.float32)
        axes, buttons = self._raw_state()
        lb, rb = bool(buttons[4]), bool(buttons[5])
        if lb and rb:
            self.estop_flagged = True
        else:
            if lb and not self._prev_lb:
                self.gait_idx = (self.gait_idx + 1) % len(_GAITS)
            if rb and not self._prev_rb:
                self.mode_idx = (self.mode_idx + 1) % len(_MODES)
        self._prev_lb, self._prev_rb = lb, rb
        # float before negation: int16 -(-32768) overflows back to -32768
        ax = axes.astype(np.float32) / 32768.0
        vx = -ax[1] * _MAX_VX
        vy = -ax[0] * _MAX_VY
        wz = -ax[3] * _MAX_WZ
        return np.array([vx, vy, wz], np.float32)

    def get_gait(self) -> int:
        return _GAITS[self.gait_idx]

    def get_mode(self) -> int:
        return _MODES[self.mode_idx]

    def close(self):
        if self._handle is not None:
            self._lib.rt_gamepad_close(self._handle)
            self._handle = None
