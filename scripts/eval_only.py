"""Re-run the multi-seed A/B eval (and reward-curve plot / checkpoint
cleanup) for an EXISTING campaign artifact, without retraining.

Used when an eval needs regenerating against new eval code (e.g. the
traced-seed compile sharing) or with more seeds, while the committed
checkpoint stays the source of truth.

Usage: python scripts/eval_only.py aliengo_rough [aliengo_flat ...]
"""
from __future__ import annotations

import os
import shutil
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

from run_campaigns import ART, CAMPAIGNS, eval_campaign, plot_curve  # noqa: E402


def main() -> None:
    for key in sys.argv[1:]:
        c = CAMPAIGNS[key]
        out_dir = os.path.join(ART, c.name)
        assert os.path.isdir(out_dir), out_dir
        eval_campaign(c, out_dir)
        if not os.path.exists(os.path.join(out_dir, "reward_curve.png")):
            plot_curve(out_dir)
        kept = f"model_{c.iterations}"
        for entry in os.listdir(out_dir):
            if entry.startswith("model_") and \
                    entry not in (kept, kept + "_env"):
                shutil.rmtree(os.path.join(out_dir, entry),
                              ignore_errors=True)
        print(f"[eval_only {key}] done -> {out_dir}")


if __name__ == "__main__":
    main()
