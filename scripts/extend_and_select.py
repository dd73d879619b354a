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
    out_dir = os.path.join(ART, c.name)
    base_step = max(candidates(out_dir))

    # ---- 1. extend (resume = true continuation) ------------------------
    if args.extra > 0:
        ecfg = env_config(c.terrain, c.dr, c.curriculum,
                          robot=(None if c.robot == "mixed" else c.robot),
                          obs_robot_id=c.obs_robot_id,
                          leg_coupling=c.leg_coupling)
        cfg = train_mod.TrainConfig(num_envs=c.num_envs,
                                    max_iterations=args.extra, seed=c.seed,
                                    ppo=PPOConfig(), env=ecfg)
        if c.robot == "mixed":
            ids = ([0, 1, 2] * (c.num_envs // 3 + 1))[:c.num_envs]
            params = train_mod.stacked_robot_params(ids)
        else:
            params = ROBOT_PARAMS[c.robot]()
        train_mod.train(params, cfg, make_terrain(c.terrain),
                        checkpoint_dir=out_dir, log_dir=out_dir,
                        resume_from=out_dir, max_iterations=args.extra)

    # ---- 2./3. selection over all candidates ---------------------------
    eval_robots = (["aliengo", "go1", "a1"] if c.robot == "mixed"
                   else [c.robot])
    ter = make_terrain(c.terrain)
    sel_seeds = tuple(int(s) for s in args.sel_seeds.split(","))
    hold_seeds = tuple(int(s) for s in args.holdout_seeds.split(","))

    _default_cache = {}  # (robot, seeds) -> per-seed default-arm runs

    def ab(step, seeds):
        """{robot: ab_compare result} for one checkpoint. The default arm
        is checkpoint-independent — computed once per (robot, seeds)."""
        out = {}
        for robot in eval_robots:
            ecfg = env_config(c.terrain, c.dr, curriculum=False, robot=robot,
                              obs_robot_id=c.obs_robot_id,
                              leg_coupling=c.leg_coupling)
            rparams = ROBOT_PARAMS[robot]()
            key = (robot, seeds)
            if key not in _default_cache:
                _default_cache[key] = [
                    eval_mod.evaluate(rparams, ecfg, ter, None, None,
                                      args.envs, args.steps, s)
                    for s in seeds]
            pol = WeightPolicy(
                checkpoint=os.path.join(out_dir, f"model_{step}"),
                num_obs=num_obs(ecfg))
            out[robot] = eval_mod.ab_compare(
                rparams, ecfg, ter, pol.params, pol.model,
                num_envs=args.envs, num_steps=args.steps, seeds=seeds,
                default_runs=_default_cache[key])
        return out

    def score(res):
        """(#wins, min survival margin, sum reward margin) across robots."""
        wins = sum(r["policy_beats_default"] for r in res.values())
        surv = min(r["policy"]["survival_rate"]
                   - r["default"]["survival_rate"] for r in res.values())
        rew = sum(r["policy"]["reward_per_step"]
                  - r["default"]["reward_per_step"] for r in res.values())
        return (wins, surv, rew)

    cands = candidates(out_dir)
    if args.last_k > 0:
        cands = cands[-args.last_k:]
    scores = []
    for step in cands:
        res = ab(step, sel_seeds)
        scores.append((score(res), step, res))
        for robot, r in res.items():
            p, d = r["policy"], r["default"]
            print(f"model_{step} [{robot}]: win={r['policy_beats_default']} "
                  f"surv {p['survival_rate']:.3f} vs {d['survival_rate']:.3f} "
                  f"rew {p['reward_per_step']:.5f} vs "
                  f"{d['reward_per_step']:.5f}", flush=True)
    scores.sort(key=lambda t: t[0])
    best_key, best_step, best_sel = scores[-1]

    # ---- 4. held-out report for the winner only ------------------------
    final = ab(best_step, hold_seeds)
    selection = {
        "protocol": f"best of {len(scores)} checkpoints on seeds "
                    f"{list(sel_seeds)}; reported on held-out seeds "
                    f"{list(hold_seeds)}; mixed score = (#robot wins, min "
                    f"survival margin, sum reward margin)",
        "base_step": base_step, "chosen_step": best_step,
        "candidates": [
            {"step": s,
             "wins": sum(r["policy_beats_default"] for r in res.values()),
             "survival": {rb: r["policy"]["survival_rate"]
                          for rb, r in res.items()},
             "survival_default": {rb: r["default"]["survival_rate"]
                                  for rb, r in res.items()},
             "reward": {rb: r["policy"]["reward_per_step"]
                        for rb, r in res.items()}}
            for _, s, res in scores],
    }
    for robot, r in final.items():
        r["selection"] = selection
        suffix = f"_{robot}" if c.robot == "mixed" else ""
        with open(os.path.join(out_dir, f"eval_ab{suffix}.json"), "w") as f:
            json.dump(r, f, indent=1)
        p, d = r["policy"], r["default"]
        print(f"[extend_and_select {args.campaign}] model_{best_step} "
              f"[{robot}] held-out win={r['policy_beats_default']} "
              f"surv {p['survival_rate']:.3f} vs {d['survival_rate']:.3f} "
              f"falls {p['falls']:.0f} vs {d['falls']:.0f}", flush=True)

    # ---- 5. prune ------------------------------------------------------
    keep = {f"model_{best_step}", f"model_{best_step}_env"}
    for entry in os.listdir(out_dir):
        if entry.startswith("model_") and entry not in keep:
            shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)


if __name__ == "__main__":
    main()
