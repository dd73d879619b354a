"""Native runtime (C++ telemetry logger + gamepad) tests."""
import os
import tempfile
import time

import numpy as np
import pytest

from rl_mpc_locomotion_tpu.utils.native_runtime import (Gamepad,
                                                        TelemetryLogger,
                                                        _load_library)


@pytest.fixture(scope="module")
def native_available():
    return _load_library() is not None


class TestTelemetryLogger:
    def test_roundtrip(self, native_available):
        path = tempfile.mktemp(suffix=".rlmc")
        lg = TelemetryLogger(path, frame_size=16, capacity=256)
        n = 500
        for i in range(n):
            assert lg.push(np.full(16, i, np.float32)) or not native_available
            if i % 100 == 0:
                time.sleep(0.02)  # let the drain thread keep up
        time.sleep(0.05)
        lg.flush()
        lg.close()
        frames = TelemetryLogger.read(path)
        assert frames.shape[1] == 16
        # frames drain in order; values are the push indices
        vals = frames[:, 0]
        assert np.all(np.diff(vals) > 0)
        assert frames.shape[0] + lg.dropped >= n - 256  # bounded loss

    def test_field_names_sidecar(self):
        path = tempfile.mktemp(suffix=".rlmc")
        names = ["com_z", "vx", "fz0"]
        lg = TelemetryLogger(path, frame_size=3, field_names=names)
        lg.push(np.zeros(3, np.float32))
        lg.close()
        with open(path + ".meta") as f:
            assert f.read().split("\n") == names

    def test_python_fallback_when_no_native(self, monkeypatch):
        import rl_mpc_locomotion_tpu.utils.native_runtime as nr
        monkeypatch.setattr(nr, "_load_library", lambda: None)
        path = tempfile.mktemp(suffix=".pkl")
        lg = nr.TelemetryLogger(path, frame_size=4)
        for i in range(10):
            lg.push(np.full(4, i, np.float32))
        lg.close()
        frames = nr.TelemetryLogger.read(path)
        assert frames.shape == (10, 4)


class TestGamepad:
    def test_graceful_without_device(self):
        gp = Gamepad("/dev/input/js_nonexistent")
        assert not gp.connected
        np.testing.assert_allclose(gp.get_command(), 0.0)
        assert gp.get_gait() == 0   # trot
        assert gp.get_mode() == 2   # recovery (initial)
        gp.fake_event(mode_idx=1)
        assert gp.get_mode() == 1   # locomotion
        gp.fake_event(estop=True)
        assert gp.estop_flagged
        gp.close()
