"""Plot a training campaign's reward curve + QP solver health.

Usage: python scripts/plot_training.py runs/campaign/metrics.jsonl \
           out.png ["title"]

Two panels: mean reward/step per PPO iteration, and the in-training QP
convergence telemetry (primal-residual p50/p99, log scale) with the
divergence fraction in the subtitle — the margin story for the fixed
40-iteration ADMM budget (ops/qp.production_qp_config).
"""
import json
import sys

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

INK = "#1f2937"
MUTED = "#6b7280"
GRID = "#e5e7eb"
BLUE = "#2563eb"
BLUE_LT = "#93c5fd"


def plot(metrics_path: str, out_path: str, title: str) -> None:
    rows = [json.loads(line) for line in open(metrics_path)]
    it = np.array([r["train/iter"] for r in rows])
    rew = np.array([r["train/mean_reward"] for r in rows])
    has_qp = "train/qp_pri_res_p50" in rows[0]

    n_panels = 2 if has_qp else 1
    fig, axes = plt.subplots(n_panels, 1, figsize=(8, 3.5 * n_panels),
                             sharex=True, squeeze=False,
                             gridspec_kw={"height_ratios": [3, 2][:n_panels]})
    axes = axes[:, 0]
    for ax in axes:
        ax.grid(True, color=GRID, lw=0.8)
        ax.set_axisbelow(True)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(MUTED)
        ax.tick_params(colors=MUTED)

    ax = axes[0]
    ax.plot(it, rew, color=BLUE, lw=2)
    ax.set_title(title, color=INK, fontsize=11, loc="left")
    ax.set_ylabel("mean reward / step", color=INK)
    ax.annotate(f"plateau ≈ {rew[-20:].mean():.4f}", xy=(it[-1], rew[-1]),
                xytext=(-10, 12), textcoords="offset points", ha="right",
                color=INK, fontsize=9)

    if has_qp:
        p50 = np.array([r["train/qp_pri_res_p50"] for r in rows])
        p99 = np.array([r["train/qp_pri_res_p99"] for r in rows])
        div = np.array([r["train/qp_diverged_frac"] for r in rows])
        ax = axes[1]
        ax.plot(it, p99, color=BLUE, lw=2)
        ax.plot(it, p50, color=BLUE_LT, lw=2)
        ax.annotate("p99", xy=(it[-1], p99[-1]), xytext=(4, 0),
                    textcoords="offset points", color=BLUE, fontsize=9)
        ax.annotate("p50", xy=(it[-1], p50[-1]), xytext=(4, 0),
                    textcoords="offset points", color="#60a5fa", fontsize=9)
        ax.set_yscale("log")
        ax.set_ylabel("QP primal residual (rel)", color=INK)
        ax.set_title(
            f"solver health at 40 ADMM iters — diverged fraction mean "
            f"{div.mean() * 100:.2f}%", color=MUTED, fontsize=9, loc="left")
    axes[-1].set_xlabel("PPO iteration", color=INK)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path} ({len(rows)} points, final reward {rew[-1]:.4f})")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    plot(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else "training campaign")
