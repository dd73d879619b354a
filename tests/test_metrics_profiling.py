"""Tests for the observability layer: metrics writer, MPC frame logger,
timers (utils/metrics.py, utils/profiling.py — SURVEY §5 equivalents of the
reference's Logger.py + rsl_rl TensorBoard + flag-gated wall timers)."""
import json
import os

import numpy as np
import pytest

from rl_mpc_locomotion_tpu.utils import metrics as metrics_mod
from rl_mpc_locomotion_tpu.utils import profiling as prof_mod


def test_metrics_writer_jsonl(tmp_path):
    d = str(tmp_path / "run0")
    with metrics_mod.MetricsWriter(d, use_tensorboard=False) as w:
        w.write(0, {"mean_reward": 0.5, "kl": np.float32(0.01),
                    "vector": np.zeros(3)})  # non-scalars skipped
        w.write(10, {"mean_reward": 0.75}, prefix="train/")
    lines = [json.loads(line) for line in
             open(os.path.join(d, "metrics.jsonl"))]
    assert lines[0]["step"] == 0
    assert lines[0]["mean_reward"] == pytest.approx(0.5)
    assert lines[0]["kl"] == pytest.approx(0.01, abs=1e-6)
    assert "vector" not in lines[0]
    assert lines[1]["train/mean_reward"] == pytest.approx(0.75)


def test_metrics_writer_tensorboard_optional(tmp_path):
    # must construct regardless of whether tensorboard is importable
    w = metrics_mod.MetricsWriter(str(tmp_path / "tb"), use_tensorboard=True)
    w.write(0, {"a": 1.0})
    w.close()


def test_mpc_frame_roundtrip():
    frame = metrics_mod.pack_mpc_frame(
        com_state=np.arange(13), desired_state=np.arange(13) + 100,
        grf=np.arange(12) + 200, loss=[1.0, 2.0, 3.0],
        weights=np.arange(13) + 300, tick=7)
    assert frame.shape == (metrics_mod.MPC_FRAME_SIZE,)
    out = metrics_mod.unpack_mpc_frames(frame[None])
    np.testing.assert_allclose(out["com_state"][0], np.arange(13))
    np.testing.assert_allclose(out["grf"][0], np.arange(12) + 200)
    np.testing.assert_allclose(out["loss"][0], [1.0, 2.0, 3.0])
    assert out["tick"][0, 0] == 7


def test_mpc_frame_logger_flush(tmp_path):
    logger = metrics_mod.MPCFrameLogger(str(tmp_path), use_native=False)
    for t in range(5):
        logger.log(np.zeros(13), np.ones(13), np.full(12, 2.0),
                   [0.1, 0.2, 0.3], np.zeros(13), t)
    path = logger.flush()
    data = np.load(path)
    assert data["grf"].shape == (5, 12)
    np.testing.assert_allclose(data["tick"][:, 0], np.arange(5))


def test_mpc_frame_logger_native(tmp_path):
    logger = metrics_mod.MPCFrameLogger(str(tmp_path), use_native=True)
    logger.log(np.zeros(13), np.ones(13), np.full(12, 2.0),
               [0.1, 0.2, 0.3], np.zeros(13), 0)
    path = logger.flush()
    data = np.load(path)
    assert data["grf"].shape == (1, 12)


def test_timer_ema_and_stats():
    t = prof_mod.Timer("section", enabled=True)
    for _ in range(3):
        with t:
            pass
    assert t.count == 3
    assert t.mean_ms >= 0.0
    assert "section_ms" in t.stats()

    off = prof_mod.Timer("off", enabled=False)
    with off:
        pass
    assert off.count == 0


def test_timed_registry():
    timers = {}
    with prof_mod.timed(timers, "phase_a"):
        pass
    with prof_mod.timed(timers, "phase_a"):
        pass
    assert timers["phase_a"].count == 2


def test_device_trace_noop():
    with prof_mod.device_trace(None):
        pass  # must be a clean no-op


def test_device_trace_capture(tmp_path):
    import jax
    import jax.numpy as jnp
    with prof_mod.device_trace(str(tmp_path / "trace")):
        jax.block_until_ready(jnp.ones(8) * 2)


def test_train_writes_metrics(tmp_path):
    """train(log_dir=...) produces metrics.jsonl rows."""
    from rl_mpc_locomotion_tpu.control.types import ControlConfig
    from rl_mpc_locomotion_tpu.models import robots
    from rl_mpc_locomotion_tpu.ops.qp import QPConfig
    from rl_mpc_locomotion_tpu.rl import train as train_mod
    from rl_mpc_locomotion_tpu.rl.ppo import PPOConfig
    from rl_mpc_locomotion_tpu.sim.env import EnvConfig

    qp_cfg = QPConfig(iters=3, iters2=0, adaptive_rho=False, polish=False,
                      ruiz_iters=1)
    cfg = train_mod.TrainConfig(
        num_envs=2, max_iterations=1,
        ppo=PPOConfig(num_steps=2, num_minibatches=1, num_epochs=1),
        env=EnvConfig(control=ControlConfig(qp=qp_cfg)))
    params = robots.aliengo_params()
    log_dir = str(tmp_path / "train_logs")
    train_mod.train(params, cfg, log_fn=lambda *_: None, log_dir=log_dir)
    rows = [json.loads(line) for line in
            open(os.path.join(log_dir, "metrics.jsonl"))]
    assert len(rows) >= 1
    assert "train/mean_reward" in rows[0]
