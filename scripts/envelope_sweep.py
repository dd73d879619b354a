"""Velocity-envelope sweep: where does the gait hold across the command box?

The reference demonstrates its envelope interactively — a gamepad drives
vx/vy/yaw across the command range on terrain (test/MPC_terrain_show.py:
112-117, ±2.5 m/s box). Headless equivalent (VERDICT r4 missing #5): pin
every env to one (vx, 0, yaw) command per grid point, run both arms
(trained weight policy vs default MPC weights), and record survival +
velocity-tracking error per point. evaluate() traces the pinned command as
an argument (rl/evaluate.py), so all grid points share one compiled
executable per arm.

Artifacts: artifacts/<name>_envelope/envelope.json + envelope.png
(two single-hue sequential heatmaps: survival, |v_xy - cmd| error).

Usage:
  python scripts/envelope_sweep.py [--ckpt artifacts/aliengo_weight_policy_rough]
                                   [--robot aliengo] [--envs 64] [--steps 500]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

_CACHE = os.path.join(ROOT, ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

VX_GRID = np.linspace(-2.5, 2.5, 9)
YAW_GRID = np.linspace(-2.0, 2.0, 5)


def run(ckpt: str, robot: str, num_envs: int, num_steps: int,
        out_dir: str) -> dict:
    import jax.numpy as jnp

    from rl_mpc_locomotion_tpu.control.types import ControlConfig
    from rl_mpc_locomotion_tpu.control.weight_policy import WeightPolicy
    from rl_mpc_locomotion_tpu.models import robots
    from rl_mpc_locomotion_tpu.ops.qp import production_qp_config
    from rl_mpc_locomotion_tpu.rl import evaluate as eval_mod
    from rl_mpc_locomotion_tpu.sim import terrain
    from rl_mpc_locomotion_tpu.sim.env import EnvConfig

    params = {"aliengo": robots.aliengo_params, "go1": robots.go1_params,
              "a1": robots.a1_params}[robot]()
    qp = production_qp_config()._replace(
        use_pallas=jax.default_backend() == "tpu")
    cfg = EnvConfig(control=ControlConfig(qp=qp, flat_ground=False))
    ter = terrain.random_uniform()
    policy = WeightPolicy(checkpoint=ckpt)

    rows = []
    t0 = time.time()
    for vx in VX_GRID:
        for yaw in YAW_GRID:
            cmd = jnp.array([vx, 0.0, yaw], jnp.float32)
            row = {"command": [float(vx), 0.0, float(yaw)]}
            for arm, pp in (("policy", policy.params), ("default", None)):
                r = eval_mod.evaluate(params, cfg, ter, pp, policy.model,
                                      num_envs=num_envs,
                                      num_steps=num_steps, seed=0,
                                      commands=cmd)
                row[arm] = r
            rows.append(row)
            print(f"vx={vx:+.2f} yaw={yaw:+.2f} "
                  f"policy surv={row['policy']['survival_rate']:.2f} "
                  f"verr={row['policy']['lin_vel_err']:.3f} | "
                  f"default surv={row['default']['survival_rate']:.2f} "
                  f"verr={row['default']['lin_vel_err']:.3f}", flush=True)
    result = {
        "robot": robot, "checkpoint": os.path.relpath(ckpt, ROOT),
        "terrain": "random_uniform", "num_envs": num_envs,
        "num_steps": num_steps, "vx_grid": [float(v) for v in VX_GRID],
        "yaw_grid": [float(v) for v in YAW_GRID], "rows": rows,
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "envelope.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


def plot(result: dict, out_dir: str) -> None:
    """Two single-hue sequential heatmaps (magnitude encodings) as small
    multiples — survival and tracking error are different measures, so
    they get separate panels and colorbars, never one dual encoding."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vx, yaw = result["vx_grid"], result["yaw_grid"]
    nvx, nyaw = len(vx), len(yaw)
    surv = np.zeros((nyaw, nvx))
    verr = np.zeros((nyaw, nvx))
    for i, row in enumerate(result["rows"]):
        iv, iy = divmod(i, nyaw)
        surv[iy, iv] = row["policy"]["survival_rate"]
        verr[iy, iv] = row["policy"]["lin_vel_err"]

    ink, muted = "#1a1a1a", "#666666"
    fig, axes = plt.subplots(1, 2, figsize=(11, 3.6))
    for ax, data, cmap, title, fmt in (
            (axes[0], surv, "Blues", "survival rate (10 s, 64 envs)", "{:.2f}"),
            (axes[1], verr, "Oranges", "|v_xy − cmd| tracking error (m/s)",
             "{:.2f}")):
        im = ax.imshow(data, cmap=cmap, aspect="auto", origin="lower",
                       extent=(vx[0], vx[-1], yaw[0], yaw[-1]),
                       interpolation="nearest")
        ax.set_xlabel("vx command (m/s)", color=muted)
        ax.set_ylabel("yaw-rate command (rad/s)", color=muted)
        ax.set_title(title, color=ink, fontsize=11)
        ax.tick_params(colors=muted, length=0)
        for s in ax.spines.values():
            s.set_visible(False)
        fig.colorbar(im, ax=ax, shrink=0.9).outline.set_visible(False)
    fig.suptitle(f"{result['robot']} weight policy — command envelope "
                 f"(rough terrain)", color=ink, fontsize=12)
    fig.tight_layout()
    path = os.path.join(out_dir, "envelope.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt",
                    default=os.path.join(ROOT, "artifacts",
                                         "aliengo_weight_policy_rough"))
    ap.add_argument("--robot", default="aliengo")
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=500)
    args = ap.parse_args()
    out_dir = os.path.join(ROOT, "artifacts", f"{args.robot}_envelope")
    result = run(args.ckpt, args.robot, args.envs, args.steps, out_dir)
    plot(result, out_dir)


if __name__ == "__main__":
    main()
