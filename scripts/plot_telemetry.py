"""Plot MPC telemetry logs: the reference's offline loss/tracking analysis
(MPC_Controller/Logger.py pickles consumed per docs/2-development_log.md:141-144)
for this framework's logs.

Input: a ``mpclog_*.npz`` written by utils/metrics.MPCFrameLogger.flush(),
or the raw ``.bin`` native ring-buffer log (utils/native_runtime.
TelemetryLogger format). Output: ``<log>_plots.png`` with
  1. MPC loss decomposition (state / torque / total) per solve,
  2. CoM state vs desired (z, roll/pitch, vx/vy tracking),
  3. step-0 GRF vertical forces per leg.

Usage: python scripts/plot_telemetry.py logs/mpclog_XXXX.npz [out.png]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from rl_mpc_locomotion_tpu.utils.metrics import (MPC_FRAME_SIZE,  # noqa: E402
                                                 unpack_mpc_frames)


def _smooth(trace, window: int = 20):
    """Neumaier moving-average smoothing (the reference declares its
    MovingWindowFilter for exactly this velocity smoothing,
    StateEstimator.py:32-33)."""
    from rl_mpc_locomotion_tpu.ops.filters import smooth
    return np.asarray(smooth(np.asarray(trace, np.float32), window))


def load_frames(path: str) -> dict:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    from rl_mpc_locomotion_tpu.utils.native_runtime import TelemetryLogger
    raw = TelemetryLogger.read(path)
    if raw.ndim == 2 and raw.shape[1] == MPC_FRAME_SIZE:
        # a full MPCFrameLogger frame stream routed through the native log
        return unpack_mpc_frames(raw)
    # generic native log: field names come from the .meta sidecar (the play
    # CLI writes tick/x/y/z/vx/com_z_est/mpc_loss + per-leg GRFs)
    meta = path + ".meta"
    if not os.path.exists(meta):
        raise SystemExit(f"no .meta sidecar for {path}; unknown frame layout")
    with open(meta) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    if len(names) != raw.shape[1]:
        raise SystemExit(f"{meta}: {len(names)} fields but frames have "
                         f"{raw.shape[1]} columns")
    return {"_generic": {n: raw[:, i] for i, n in enumerate(names)}}


def plot_generic(d: dict, out: str) -> int:
    """Panels for the play CLI's native telemetry fields."""
    n = len(d["tick"])
    if n == 0:
        print("empty log")
        return 1
    tick = d["tick"]
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    ax = axes[0, 0]
    ax.plot(tick, d["mpc_loss"])
    ax.set_title("MPC loss (ConvexMPCLocomotion.py:192-215)")
    ax.set_xlabel("control tick")

    ax = axes[0, 1]
    ax.plot(tick, d["z"], label="base z")
    ax.plot(tick, d["com_z_est"], "--", label="com z estimate")
    ax.set_title("height tracking")
    ax.set_xlabel("control tick")
    ax.legend()

    ax = axes[1, 0]
    ax.plot(tick, d["vx"], label="vx", alpha=0.4)
    ax.plot(tick, _smooth(d["vx"]), label="vx (filtered)", lw=2)
    ax.plot(tick, d["x"], label="x")
    ax.set_title("forward progress")
    ax.set_xlabel("control tick")
    ax.legend()

    ax = axes[1, 1]
    for leg, name in enumerate(("FR", "FL", "RR", "RL")):
        key = f"f_{leg}z"
        if key in d:
            ax.plot(tick, d[key], label=f"fz {name}")
    ax.set_title("step-0 GRF vertical forces")
    ax.set_xlabel("control tick")
    ax.set_ylabel("N")
    ax.legend()

    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({n} frames)")
    return 0


def main(argv):
    argv = [a for a in argv if a != "--out"]
    if len(argv) < 2:
        print(__doc__)
        return 2
    path = argv[1]
    out = argv[2] if len(argv) > 2 else os.path.splitext(path)[0] + "_plots.png"
    d = load_frames(path)
    if "_generic" in d:
        return plot_generic(d["_generic"], out)
    n = d["com_state"].shape[0]
    if n == 0:
        print("empty log")
        return 1
    tick = d["tick"][:, 0]
    com, des, grf, loss = d["com_state"], d["desired_state"], d["grf"], d["loss"]

    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    ax = axes[0, 0]
    ax.plot(tick, loss[:, 0], label="state loss")
    ax.plot(tick, loss[:, 1], label="torque loss")
    ax.plot(tick, loss[:, 2], label="total", lw=2)
    ax.set_title("MPC loss decomposition (ConvexMPCLocomotion.py:192-215)")
    ax.set_xlabel("control tick")
    ax.legend()

    # state layout: (rpy 0:3, xyz 3:6, omega 6:9, v 9:12, -g)
    ax = axes[0, 1]
    ax.plot(tick, com[:, 5], label="z")
    ax.plot(tick, des[:, 5], "--", label="z desired")
    ax.plot(tick, com[:, 0], label="roll")
    ax.plot(tick, com[:, 1], label="pitch")
    ax.set_title("CoM height & attitude")
    ax.set_xlabel("control tick")
    ax.legend()

    ax = axes[1, 0]
    ax.plot(tick, com[:, 9], label="vx", alpha=0.4)
    ax.plot(tick, _smooth(com[:, 9]), label="vx (filtered)", lw=2)
    ax.plot(tick, des[:, 9], "--", label="vx desired")
    ax.plot(tick, com[:, 10], label="vy", alpha=0.4)
    ax.plot(tick, des[:, 10], "--", label="vy desired")
    ax.set_title("velocity tracking")
    ax.set_xlabel("control tick")
    ax.legend()

    ax = axes[1, 1]
    for leg, name in enumerate(("FR", "FL", "RR", "RL")):
        ax.plot(tick, grf[:, 3 * leg + 2], label=f"fz {name}")
    ax.set_title("step-0 GRF vertical forces")
    ax.set_xlabel("control tick")
    ax.set_ylabel("N")
    ax.legend()

    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({n} frames)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
