"""Training driver: vectorized env + PPO, single- or multi-device.

Equivalent of RL_Environment/train.py + rsl_rl's OnPolicyRunner.learn, as a
pair of jitted functions:

- ``make_train_step(...)`` -> one PPO iteration (rollout T steps over B
  vmapped envs + update). With a mesh, the env batch is sharded over the
  'env' axis and gradients are pmean'd over ICI inside shard_map.
- ``train(...)`` -> the outer Python loop with logging + orbax checkpoints.
"""
from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.actor_critic import ActorCritic
from ..models.robots import RobotParams
from ..parallel.mesh import ENV_AXIS
from ..sim import env as env_mod
from ..sim import terrain as terrain_mod
from . import ppo


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_envs: int = 512
    max_iterations: int = 5000
    save_interval: int = 100
    seed: int = 1
    ppo: ppo.PPOConfig = ppo.PPOConfig()
    env: env_mod.EnvConfig = env_mod.EnvConfig()


def is_per_env(params: RobotParams) -> bool:
    """Stacked (B, ...) per-env params vs a single robot's scalars."""
    return jnp.ndim(params.body_mass) == 1


def stacked_robot_params(robot_ids) -> RobotParams:
    """Per-env RobotParams from robot ids (0=Aliengo, 1=Go1, 2=A1) — the
    SURVEY §7 design stance: robot constants are vmappable arrays, so one
    training batch mixes A1+Go1+Aliengo (the reference trains one task
    class per run, tasks/{aliengo,a1,go1}.py)."""
    from ..models import robots
    reg = robots.robot_registry()
    ids = jnp.asarray(robot_ids, jnp.int32)
    return jax.tree.map(lambda x: x[ids], reg)


def make_env_fns(cfg: TrainConfig, ter: terrain_mod.Terrain):
    """Vectorized (reset, step) over the env batch; ``params`` is a
    call-time argument so heterogeneous (stacked per-env) params shard
    with the env axis. The MPC solve gate is a *scalar* derived from the
    global tick so lax.cond skips the QP on non-solve ticks for the whole
    batch."""
    ipm = cfg.env.control.iterations_between_mpc

    def _axes(params):
        return (0 if is_per_env(params) else None)

    def reset_batch(params, rng):
        keys = jax.random.split(rng, cfg.num_envs)
        state = jax.vmap(lambda p, k: env_mod.reset(p, cfg.env, k),
                         in_axes=(_axes(params), 0))(params, keys)
        obs = jax.vmap(lambda p, s: env_mod.observations(p, cfg.env, s),
                       in_axes=(_axes(params), 0))(params, state)
        return state, obs

    def step_batch(params, state, actions, t):
        # every env's counter is t (aligned on reset), so the gate is exact
        gate = ((t + 1) % ipm) == 0
        state, obs, rew, done, info = jax.vmap(
            lambda p, s, a: env_mod.step(p, cfg.env, ter, s, a,
                                         solve_gate=gate),
            in_axes=(_axes(params), 0, 0))(params, state, actions)
        return state, obs, rew, done, info

    return reset_batch, step_batch


def make_train_step(params: RobotParams, cfg: TrainConfig,
                    ter: terrain_mod.Terrain, model: ActorCritic,
                    mesh=None):
    """Returns (step_fn(train_state, env_state, obs, tick), reset_fn(rng)).

    ``params`` may be a single robot's RobotParams or a stacked per-env
    (num_envs, ...) pytree (heterogeneous batch). Internally the params
    are a real input of the jitted step — with a mesh, per-env params
    shard over the env axis alongside the env state (a closure constant
    could not: inside shard_map each shard sees only its slice)."""
    reset_batch, step_batch = make_env_fns(cfg, ter)
    per_env = is_per_env(params)

    def train_step(train_state: ppo.TrainState, env_state, obs, tick,
                   env_params):
        def env_step(es, actions, t):
            return step_batch(env_params, es, actions, tick + t)

        env_state, obs, rng, traj, aux = ppo.rollout(
            model, train_state.params, env_step, env_state, obs,
            train_state.rng, cfg.ppo.num_steps)
        train_state = train_state._replace(rng=rng)
        _, _, last_value = model.apply(train_state.params, obs)

        if mesh is not None:
            grad_reduce = lambda g: jax.lax.pmean(g, ENV_AXIS)
            axis_name = ENV_AXIS
        else:
            grad_reduce = lambda g: g
            axis_name = None
        train_state, metrics = ppo.ppo_update(model, cfg.ppo, train_state,
                                              traj, last_value, grad_reduce,
                                              axis_name=axis_name)
        # QP convergence margin telemetry over the rollout's solve ticks
        # (VERDICT r3 weak #3: watch the 40-iter budget in training, not
        # just at the behavioral-gate tests). Residuals are 0 on non-solve
        # ticks; percentiles are taken over solve ticks only.
        if "qp_pri_res" in aux:
            pri = aux["qp_pri_res"].reshape(-1)
            dua = aux["qp_dua_res"].reshape(-1)
            solved = pri > 0.0
            any_solved = jnp.any(solved)
            nsolve = jnp.maximum(jnp.sum(solved), 1)

            def pctl(v, p):
                # percentile over solve ticks: sort descending with
                # non-solve ticks pushed to the end. Zero solve ticks in
                # the rollout (gated/short-rollout configs) would select
                # a -inf sentinel, which json.dumps would serialize as the
                # non-standard -Infinity token — report 0.0 instead.
                v_sorted = jnp.sort(jnp.where(solved, v, -jnp.inf))[::-1]
                idx = jnp.clip(((1.0 - p) * nsolve).astype(jnp.int32),
                               0, v.shape[0] - 1)
                return jnp.where(any_solved, v_sorted[idx], 0.0)

            metrics = dict(metrics)
            metrics["qp_pri_res_p50"] = pctl(pri, 0.50)
            metrics["qp_pri_res_p99"] = pctl(pri, 0.99)
            metrics["qp_dua_res_p50"] = pctl(dua, 0.50)
            metrics["qp_dua_res_p99"] = pctl(dua, 0.99)
            metrics["qp_diverged_frac"] = (
                jnp.sum(aux["qp_diverged"]) / nsolve)
            if axis_name is not None:
                # report global percentiles' mean across shards (cheap,
                # keeps replication: all shards log the same value)
                for k in ("qp_pri_res_p50", "qp_pri_res_p99",
                          "qp_dua_res_p50", "qp_dua_res_p99",
                          "qp_diverged_frac"):
                    metrics[k] = jax.lax.pmean(metrics[k], axis_name)
        return train_state, env_state, obs, tick + cfg.ppo.num_steps, metrics

    if mesh is None:
        jitted = jax.jit(train_step)
    else:
        # ---- sharded: env batch (and per-env params) split over the mesh
        env_spec = P(ENV_AXIS)
        rep = P()
        p_spec = jax.tree.map(lambda _: env_spec if per_env else rep, params)
        smapped = jax.shard_map(
            train_step, mesh=mesh,
            in_specs=(rep, env_spec, env_spec, rep, p_spec),
            out_specs=(rep, env_spec, env_spec, rep, rep),
            check_vma=False)
        jitted = jax.jit(smapped)

    step_fn = lambda ts, es, obs, tick: jitted(ts, es, obs, tick, params)
    reset_fn = lambda rng: reset_batch(params, rng)
    return step_fn, reset_fn


def resume_train_state(resume_from: str, train_state, log_fn=print):
    """Restore a TrainState from a checkpoint path or run directory.

    Directory without a model_<i> basename -> latest-checkpoint discovery,
    the reference's get_load_path flow (train.py:63-72,
    rsl_rl_utils.py:49-74). Returns (train_state, start_iteration, path)."""
    from ..utils.checkpoint import latest_checkpoint, restore_checkpoint

    path = resume_from
    base = os.path.basename(os.path.normpath(path))
    if not base.startswith("model_"):
        found = latest_checkpoint(path)
        if found is None:
            raise FileNotFoundError(
                f"no model_<i> checkpoints under {path!r}")
        path = found
    train_state = restore_checkpoint(path, train_state)
    start_it = int(os.path.basename(path).split("_")[1])
    log_fn(f"[train] resumed from {path} (iteration {start_it})")
    return train_state, start_it, path


def train(params: RobotParams, cfg: TrainConfig,
          ter: Optional[terrain_mod.Terrain] = None, mesh=None,
          log_fn=print, checkpoint_dir: Optional[str] = None,
          max_iterations: Optional[int] = None,
          log_dir: Optional[str] = None,
          resume_from: Optional[str] = None):
    """Outer training loop (OnPolicyRunner.learn equivalent).

    ``log_dir`` enables the metrics sink (JSONL + TensorBoard scalars via
    utils/metrics.MetricsWriter) — the rsl_rl OnPolicyRunner TensorBoard
    equivalent (SURVEY §5 metrics channel 2). ``resume_from`` restores
    params/optimizer/rng from a checkpoint (path or run dir; latest-run
    discovery like the reference's checkpoint=) and runs ``max_iterations``
    *additional* iterations, numbering continuing from the restored step."""
    if ter is None:
        ter = terrain_mod.flat()
    model = ActorCritic(num_actions=env_mod.NUM_ACTIONS)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_key, env_key = jax.random.split(rng, 3)
    train_state = ppo.init_train_state(init_key, model,
                                       env_mod.num_obs(cfg.env), cfg.ppo)
    start_it = 0
    resume_path = None
    if resume_from:
        train_state, start_it, resume_path = resume_train_state(
            resume_from, train_state, log_fn)
    step_fn, reset_batch = make_train_step(params, cfg, ter, model, mesh)
    env_state, obs = reset_batch(env_key)
    tick = jnp.int32(0)
    if resume_path is not None:
        # true continuation: episodes keep progress/commands/DR draws/RNG
        # streams across the restart (SURVEY §5 checkpoint row). Missing
        # sibling (pre-env-snapshot checkpoint) -> fresh episodes, as before.
        from ..utils.checkpoint import restore_env_snapshot
        snap = restore_env_snapshot(resume_path, {
            "env": env_state, "obs": obs, "tick": tick})
        if snap is not None:
            env_state, obs = snap["env"], snap["obs"]
            tick = jnp.asarray(snap["tick"], jnp.int32)
            log_fn(f"[train] env state restored (tick {int(tick)})")
        else:
            log_fn("[train] no env snapshot in checkpoint — episodes reset")
    if mesh is not None:
        shard = NamedSharding(mesh, P(ENV_AXIS))
        env_state = jax.tree.map(lambda x: jax.device_put(x, shard), env_state)
        obs = jax.device_put(obs, shard)

    iters = max_iterations or cfg.max_iterations
    history = []
    writer = None
    if log_dir:
        from ..utils.metrics import MetricsWriter
        writer = MetricsWriter(log_dir)
    t0 = time.time()
    end_it = start_it + iters
    try:
        for it in range(start_it, end_it):
            train_state, env_state, obs, tick, metrics = step_fn(
                train_state, env_state, obs, tick)
            if it % 10 == 0 or it == end_it - 1:
                m = {k: float(v) for k, v in metrics.items()}
                m["iter"] = it
                m["steps_per_s"] = (cfg.ppo.num_steps * cfg.num_envs
                                    * (it - start_it + 1)
                                    / (time.time() - t0))
                history.append(m)
                if writer is not None:
                    writer.write(it, m, prefix="train/")
                log_fn(f"[train] it={it} reward/step={m['mean_reward']:.4f} "
                       f"kl={m['kl']:.4f} lr={m['lr']:.2e} "
                       f"sps={m['steps_per_s']:.0f}")
            if checkpoint_dir and (it + 1) % cfg.save_interval == 0:
                from ..utils.checkpoint import save_checkpoint
                save_checkpoint(checkpoint_dir, it + 1, train_state,
                                env_snapshot={"env": env_state, "obs": obs,
                                              "tick": tick})
    finally:
        if writer is not None:
            writer.close()
    return train_state, history
