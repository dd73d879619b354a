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


def _js_event(value: int, type_: int, number: int) -> bytes:
    """Linux joystick api struct js_event: u32 time, s16 value, u8 type,
    u8 number (little-endian, 8 bytes)."""
    import struct
    return struct.pack("<IhBB", 0, value, type_, number)


_JS_AXIS, _JS_BUTTON = 0x02, 0x01


class TestGamepadFakeDevice:
    """FD-level tests: feed js_event structs through a FIFO standing in for
    /dev/input/js0 and check the native reader + command mapping."""

    @pytest.fixture()
    def pad(self, tmp_path, native_available):
        if not native_available:
            pytest.skip("native library unavailable")
        fifo = str(tmp_path / "js_fake")
        os.mkfifo(fifo)
        gp = Gamepad(fifo)
        assert gp.connected
        wfd = os.open(fifo, os.O_WRONLY | os.O_NONBLOCK)
        yield gp, wfd
        os.close(wfd)
        gp.close()

    @staticmethod
    def _send(wfd, payload: bytes, settle: float = 0.15):
        os.write(wfd, payload)
        time.sleep(settle)  # let the native reader thread consume

    def test_axis_command_mapping(self, pad):
        gp, wfd = pad
        # left stick forward (axis 1 negative) -> +vx; axis 0 -> vy;
        # right stick x (axis 3) -> yaw rate (gamepad_reader.py:84-122)
        self._send(wfd, _js_event(-16384, _JS_AXIS, 1)
                   + _js_event(-32768, _JS_AXIS, 0)
                   + _js_event(16384, _JS_AXIS, 3))
        vx, vy, wz = gp.get_command()
        assert vx == pytest.approx(0.5, abs=1e-3)      # 0.5 * MAX_VX=1.0
        assert vy == pytest.approx(0.6, abs=1e-3)      # 1.0 * MAX_VY=0.6
        assert wz == pytest.approx(-0.6, abs=1e-3)     # -0.5 * MAX_WZ=1.2

    def test_lb_cycles_gait_rb_cycles_mode(self, pad):
        gp, wfd = pad
        assert gp.get_gait() == 0  # trot
        self._send(wfd, _js_event(1, _JS_BUTTON, 4))   # LB down
        gp.get_command()                               # edge -> next gait
        self._send(wfd, _js_event(0, _JS_BUTTON, 4))   # LB up
        gp.get_command()
        assert gp.get_gait() == 6  # walk
        mode0 = gp.get_mode()
        self._send(wfd, _js_event(1, _JS_BUTTON, 5))   # RB down
        gp.get_command()
        self._send(wfd, _js_event(0, _JS_BUTTON, 5))
        gp.get_command()
        assert gp.get_mode() != mode0
        assert not gp.estop_flagged

    def test_lb_rb_estop(self, pad):
        gp, wfd = pad
        self._send(wfd, _js_event(1, _JS_BUTTON, 4)
                   + _js_event(1, _JS_BUTTON, 5))
        gp.get_command()
        assert gp.estop_flagged


class _StubPad:
    """Minimal Gamepad look-alike for the play-loop update function."""
    estop_flagged = False

    def get_command(self):
        return np.array([0.3, 0.1, -0.2], np.float32)

    def get_gait(self):
        return 6

    def get_mode(self):
        return 1


class TestGamepadTickUpdate:
    def test_returns_commands_gait_mode_estop(self):
        from rl_mpc_locomotion_tpu.cli import gamepad_tick_update
        cmd, gait, mode, estop = gamepad_tick_update(_StubPad())
        np.testing.assert_allclose(cmd, [0.3, 0.1, -0.2], atol=1e-6)
        assert cmd.dtype == np.float32 and cmd.shape == (3,)
        assert (gait, mode, estop) == (6, 1, False)

    def test_estop_latched(self):
        from rl_mpc_locomotion_tpu.cli import gamepad_tick_update
        pad = _StubPad()
        pad.estop_flagged = True
        assert gamepad_tick_update(pad)[3] is True

    def test_real_disconnected_gamepad(self):
        from rl_mpc_locomotion_tpu.cli import gamepad_tick_update
        gp = Gamepad("/dev/input/js_nonexistent")
        cmd, gait, mode, estop = gamepad_tick_update(gp)
        np.testing.assert_allclose(cmd, 0.0)
        assert not estop
        gp.close()


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
