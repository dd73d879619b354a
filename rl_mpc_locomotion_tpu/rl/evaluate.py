"""A/B evaluation harness: trained weight policy vs default MPC weights.

The point of the reference's RL layer is that *learned* MPC cost weights
outperform the hand-tuned defaults (test/RL_MPC_show.py:33,73-84 runs the
two controllers side by side; docs/2-development_log.md:116 reports the
trained reward). This module makes that claim measurable: both arms run the
same training env (same reward, same command distribution, same DR draws,
same initial states via a shared seed) and report mean tracking reward and
survival.

Arms:
  policy   actions = deterministic policy mean -> rescale_actions
  default  weights = params.mpc_weights verbatim (bypasses the action box,
           which cannot represent them — see sim/env.step)

Used by ``cli.py eval`` and tests/test_eval_ab.py (CI gate: trained >=
default on the committed checkpoint).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.actor_critic import ActorCritic
from ..models.robots import RobotParams
from ..sim import env as env_mod
from ..sim import terrain as terrain_mod


def evaluate(params: RobotParams, cfg, ter: terrain_mod.Terrain,
             policy_params=None, model: Optional[ActorCritic] = None,
             num_envs: int = 64, num_steps: int = 500, seed: int = 0,
             commands: Optional[jnp.ndarray] = None) -> dict:
    """Run one arm for ``num_steps`` ticks over ``num_envs`` envs.

    policy_params None -> default-weight arm. ``commands`` (3,) pins every
    env to one command (a sweep point); None keeps the env's random
    command draws (the training distribution).

    Returns python floats: reward_per_step, survival_rate (fraction of
    envs that never fell; auto-resets after a fall keep counting), falls,
    lin_vel_err (mean |v_xy - cmd_xy|), episodes.
    """
    if model is None:
        model = ActorCritic(num_actions=env_mod.NUM_ACTIONS)
    ipm = cfg.control.iterations_between_mpc

    # the pinned command, the seed, the ROBOT PARAMS and the POLICY PARAMS
    # are all TRACED arguments, so one compiled program per arm serves
    # every robot (same param shapes), every checkpoint, every seed and
    # every sweep point — closure constants made each (robot, checkpoint)
    # pair a fresh ~3-minute TPU compile, which priced checkpoint
    # selection (scripts/extend_and_select.py) out of reach
    @jax.jit
    def run(pinned_cmd, seed_arg, rparams, pol_params):
        default_w = jnp.asarray(rparams.mpc_weights, jnp.float32)

        def step_batch(state, obs, t):
            gate = ((t + 1) % ipm) == 0
            if policy_params is not None:
                mean, _, _ = model.apply(pol_params, obs)
                return jax.vmap(
                    lambda s, a: env_mod.step(rparams, cfg, ter, s, a,
                                              solve_gate=gate))(state, mean)
            action = jnp.zeros((num_envs, env_mod.NUM_ACTIONS), jnp.float32)
            wb = jnp.broadcast_to(default_w, (num_envs, 13))
            return jax.vmap(
                lambda s, a, w: env_mod.step(rparams, cfg, ter, s, a,
                                             solve_gate=gate, weights=w))(
                state, action, wb)

        keys = jax.random.split(jax.random.PRNGKey(seed_arg), num_envs)
        state = jax.vmap(lambda k: env_mod.reset(rparams, cfg, k))(keys)
        if commands is not None:
            cmd = jnp.broadcast_to(pinned_cmd, (num_envs, 3))
            state = state._replace(commands=cmd)
        obs = jax.vmap(lambda s: env_mod.observations(rparams, cfg, s))(
            state)

        def body(carry, t):
            state, obs, fell = carry
            state, obs, rew, done, info = step_batch(state, obs, t)
            # only true falls count against survival — episode-length
            # timeouts (progress > episode_length) are successes, so an
            # eval longer than the episode length stays meaningful
            fell = fell | info["fall"]
            # command pinning must survive auto-resets (fresh resets draw
            # random commands)
            if commands is not None:
                cmd = jnp.broadcast_to(pinned_cmd, (num_envs, 3))
                state = state._replace(commands=cmd)
            r_bw = jax.vmap(lambda q: _quat_rot(q))(state.phys.quat)
            v_b = jnp.einsum("bij,bj->bi", r_bw, state.phys.v)
            verr = jnp.linalg.norm(v_b[:, :2] - state.commands[:, :2],
                                   axis=-1)
            return (state, obs, fell), (rew, info["fall"], verr)

        fell0 = jnp.zeros(num_envs, bool)
        (state, obs, fell), (rews, falls, verrs) = jax.lax.scan(
            body, (state, obs, fell0), jnp.arange(num_steps))
        return {
            "reward_per_step": jnp.mean(rews),
            "falls": jnp.sum(falls),
            "survival_rate": 1.0 - jnp.mean(fell.astype(jnp.float32)),
            "lin_vel_err": jnp.mean(verrs),
        }

    cmd_arg = (jnp.asarray(commands, jnp.float32) if commands is not None
               else jnp.zeros(3, jnp.float32))
    # the default arm still needs a pytree for the pol_params slot; its
    # graph never reads it, so pass an empty dict (stable cache key)
    out = {k: float(v) for k, v in
           run(cmd_arg, jnp.int32(seed), params,
               policy_params if policy_params is not None else {}).items()}
    out["num_envs"] = num_envs
    out["num_steps"] = num_steps
    return out


def _quat_rot(quat):
    from ..ops import rotations as rot
    return rot.quat_to_rot(quat)


def _mean_ci95(vals):
    """(mean, 95% CI half-width) over independent seed runs (normal
    approximation; with <=5 seeds this understates slightly — the CI is a
    margin indicator, not a hypothesis test)."""
    import math
    n = len(vals)
    m = sum(vals) / n
    if n < 2:
        return m, 0.0
    var = sum((v - m) ** 2 for v in vals) / (n - 1)
    return m, 1.96 * math.sqrt(var / n)


def _aggregate(runs, seeds):
    """Per-seed eval dicts -> means + ci95 under the original keys (legacy
    single-seed consumers keep reading res['policy']['reward_per_step'])."""
    out = {}
    for k in ("reward_per_step", "survival_rate", "falls", "lin_vel_err"):
        m, ci = _mean_ci95([r[k] for r in runs])
        out[k] = m
        out[k + "_ci95"] = ci
    out["num_envs"] = runs[0]["num_envs"]
    out["num_steps"] = runs[0]["num_steps"]
    out["seeds"] = list(seeds)
    out["per_seed"] = runs
    return out


def ab_compare(params: RobotParams, cfg, ter, policy_params,
               model: Optional[ActorCritic] = None, num_envs: int = 64,
               num_steps: int = 500, seed: int = 0,
               command_sweep=None, seeds=None,
               default_runs=None) -> dict:
    """Both arms under identical conditions; optional command sweep and
    multi-seed aggregation.

    seeds: iterable of eval seeds (None = (seed,)). Means +-95% CI are
    reported per arm. Returns {"policy": ..., "default": ...,
    "sweep": [...], "policy_beats_default": bool, "win_criteria": ...}.

    default_runs: per-seed evaluate() results for the default arm, if the
    caller already has them — the default arm does not depend on the
    policy checkpoint, so sweeps over candidate checkpoints (scripts/
    extend_and_select.py) compute it once and halve their eval count.

    The win criterion is reward AND no-regression on survival and falls
    (VERDICT r4 weak #1: a reward-only gate certified a Go1 policy that
    survived 1.6% vs the default's 7.8% as a "win"). A policy that scores
    more reward by falling more is not deployable.
    """
    if seeds is None:
        seeds = (seed,)
    if default_runs is None:
        default_runs = [evaluate(params, cfg, ter, None, model, num_envs,
                                 num_steps, s) for s in seeds]
    res = {
        "policy": _aggregate([evaluate(params, cfg, ter, policy_params,
                                       model, num_envs, num_steps, s)
                              for s in seeds], seeds),
        "default": _aggregate(list(default_runs), seeds),
    }
    if command_sweep is not None:
        rows = []
        for cmd in command_sweep:
            rows.append({
                "command": [float(c) for c in cmd],
                "policy": evaluate(params, cfg, ter, policy_params, model,
                                   num_envs, num_steps, seed, commands=cmd),
                "default": evaluate(params, cfg, ter, None, model,
                                    num_envs, num_steps, seed, commands=cmd),
            })
        res["sweep"] = rows
    p, d = res["policy"], res["default"]
    crit = {
        "reward": p["reward_per_step"] >= d["reward_per_step"],
        # no-regression margins: 1pt survival / 5%+1 falls absorb eval
        # noise without letting a real regression through
        "survival": p["survival_rate"] >= d["survival_rate"] - 0.01,
        "falls": p["falls"] <= d["falls"] * 1.05 + 1.0,
    }
    res["win_criteria"] = crit
    res["policy_beats_default"] = all(crit.values())
    return res
