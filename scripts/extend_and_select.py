"""Extend a campaign's training and pick the deployment checkpoint by eval.

PPO on these envs does not improve monotonically — the last checkpoint of a
run is often not its best policy (the reference ships model_<last> and
hopes; docs/2-development_log.md:116 reports a single snapshot). This adds
the standard missing step, with a seed split so selection cannot overfit
the report:

1. resume the campaign checkpoint and train ``--extra`` more iterations,
   saving every ``save_interval`` (true continuation: env snapshot + tick
   restore, tests/test_learning.py),
2. A/B-evaluate EVERY candidate checkpoint on SELECTION seeds (0,1,2),
3. pick the winner by (survival-gated win, survival margin, reward margin),
4. re-evaluate ONLY the winner on HELD-OUT seeds (3,4,5) -> eval_ab.json
   (with a ``selection`` block recording the protocol + per-candidate
   selection scores),
5. prune every other checkpoint; the winner becomes model_<best>.

Thanks to the traced-seed eval and the persistent compile cache, each
candidate eval costs runtime only (~seconds) after the first compile.

Usage: python scripts/extend_and_select.py go1_rough --extra 500
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

from run_campaigns import (ART, CAMPAIGNS, ROBOT_PARAMS, env_config,  # noqa: E402
                           make_terrain)


def candidates(out_dir: str):
    steps = sorted(int(n.split("_")[1]) for n in os.listdir(out_dir)
                   if n.startswith("model_") and not n.endswith("_env"))
    return steps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("campaign")
    ap.add_argument("--extra", type=int, default=500)
    ap.add_argument("--sel-seeds", default="0,1,2")
    ap.add_argument("--holdout-seeds", default="3,4,5")
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--last-k", type=int, default=0,
                    help="evaluate only the newest K candidates (0 = all)")
    args = ap.parse_args()

    import jax
    from rl_mpc_locomotion_tpu.control.weight_policy import WeightPolicy
    from rl_mpc_locomotion_tpu.rl import evaluate as eval_mod
    from rl_mpc_locomotion_tpu.rl import train as train_mod
    from rl_mpc_locomotion_tpu.rl.ppo import PPOConfig
    from rl_mpc_locomotion_tpu.sim.env import num_obs

    c = CAMPAIGNS[args.campaign]
    assert c.robot != "mixed", "per-robot campaigns only"
    out_dir = os.path.join(ART, c.name)
    base_step = max(candidates(out_dir))

    # ---- 1. extend (resume = true continuation) ------------------------
    if args.extra > 0:
        ecfg = env_config(c.terrain, c.dr, c.curriculum, robot=c.robot,
                          obs_robot_id=c.obs_robot_id,
                          leg_coupling=c.leg_coupling)
        cfg = train_mod.TrainConfig(num_envs=c.num_envs,
                                    max_iterations=args.extra, seed=c.seed,
                                    ppo=PPOConfig(), env=ecfg)
        params = ROBOT_PARAMS[c.robot]()
        train_mod.train(params, cfg, make_terrain(c.terrain),
                        checkpoint_dir=out_dir, log_dir=out_dir,
                        resume_from=out_dir, max_iterations=args.extra)

    # ---- 2./3. selection over all candidates ---------------------------
    ecfg_eval = env_config(c.terrain, c.dr, curriculum=False, robot=c.robot,
                           obs_robot_id=c.obs_robot_id,
                           leg_coupling=c.leg_coupling)
    params = ROBOT_PARAMS[c.robot]()
    ter = make_terrain(c.terrain)
    sel_seeds = tuple(int(s) for s in args.sel_seeds.split(","))
    hold_seeds = tuple(int(s) for s in args.holdout_seeds.split(","))

    def ab(step, seeds):
        pol = WeightPolicy(checkpoint=os.path.join(out_dir, f"model_{step}"),
                           num_obs=num_obs(ecfg_eval))
        return eval_mod.ab_compare(params, ecfg_eval, ter, pol.params,
                                   pol.model, num_envs=args.envs,
                                   num_steps=args.steps, seeds=seeds)

    cands = candidates(out_dir)
    if args.last_k > 0:
        cands = cands[-args.last_k:]
    scores = []
    for step in cands:
        r = ab(step, sel_seeds)
        p, d = r["policy"], r["default"]
        key = (r["policy_beats_default"],
               p["survival_rate"] - d["survival_rate"],
               p["reward_per_step"] - d["reward_per_step"])
        scores.append((key, step, r))
        print(f"model_{step}: win={r['policy_beats_default']} "
              f"surv {p['survival_rate']:.3f} vs {d['survival_rate']:.3f} "
              f"rew {p['reward_per_step']:.5f} vs {d['reward_per_step']:.5f}",
              flush=True)
    scores.sort(key=lambda t: t[0])
    best_key, best_step, best_sel = scores[-1]

    # ---- 4. held-out report for the winner only ------------------------
    final = ab(best_step, hold_seeds)
    final["selection"] = {
        "protocol": f"best of {len(scores)} checkpoints on seeds "
                    f"{list(sel_seeds)}; reported on held-out seeds "
                    f"{list(hold_seeds)}",
        "base_step": base_step, "chosen_step": best_step,
        "candidates": [
            {"step": s, "win": r["policy_beats_default"],
             "survival": r["policy"]["survival_rate"],
             "survival_default": r["default"]["survival_rate"],
             "reward": r["policy"]["reward_per_step"]}
            for _, s, r in scores],
    }
    with open(os.path.join(out_dir, "eval_ab.json"), "w") as f:
        json.dump(final, f, indent=1)
    p, d = final["policy"], final["default"]
    print(f"[extend_and_select {args.campaign}] chose model_{best_step}: "
          f"held-out win={final['policy_beats_default']} "
          f"surv {p['survival_rate']:.3f} vs {d['survival_rate']:.3f} "
          f"falls {p['falls']:.0f} vs {d['falls']:.0f}", flush=True)

    # ---- 5. prune ------------------------------------------------------
    keep = {f"model_{best_step}", f"model_{best_step}_env"}
    for entry in os.listdir(out_dir):
        if entry.startswith("model_") and entry not in keep:
            shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)


if __name__ == "__main__":
    main()
