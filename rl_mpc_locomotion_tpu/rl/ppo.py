"""PPO on-device: rollout via lax.scan, GAE, clipped surrogate, adaptive-KL
learning rate — the rsl_rl recipe (extern/rsl_rl OnPolicyRunner/PPO consumed
at train.py:61-84) rebuilt as pure JAX.

Hyperparameters default to tasks/legged_config_ppo.py:10-35:
clip 0.2, value clip, entropy 0.01, 5 epochs x 4 minibatches, gamma 0.99,
lam 0.95, lr 1e-3 adaptive toward KL 0.01, grad-norm 1, T=24 steps/env.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.actor_critic import ActorCritic


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_steps: int = 24
    num_minibatches: int = 4
    num_epochs: int = 5
    clip_param: float = 0.2
    value_loss_coef: float = 1.0
    use_clipped_value_loss: bool = True
    entropy_coef: float = 0.01
    gamma: float = 0.99
    lam: float = 0.95
    learning_rate: float = 1e-3
    schedule: str = "adaptive"        # 'adaptive' | 'fixed'
    desired_kl: float = 0.01
    max_grad_norm: float = 1.0
    lr_min: float = 1e-5
    lr_max: float = 1e-2


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    lr: jnp.ndarray
    rng: jax.Array


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    mean: jnp.ndarray
    log_std: jnp.ndarray


def make_optimizer(cfg: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.scale_by_adam(),
        optax.scale(-1.0),
    )


def init_train_state(rng, model: ActorCritic, obs_dim: int,
                     cfg: PPOConfig) -> TrainState:
    params = model.init(rng, jnp.zeros((1, obs_dim)))
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(params=params, opt_state=opt_state,
                      lr=jnp.float32(cfg.learning_rate), rng=rng)


def gaussian_log_prob(mean, log_std, action):
    var = jnp.exp(2.0 * log_std)
    return jnp.sum(-0.5 * jnp.square(action - mean) / var - log_std
                   - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)


def compute_gae(cfg: PPOConfig, rewards, values, dones, last_value):
    """GAE over a (T, B) rollout; done masks bootstrap (rsl_rl storage)."""
    def body(carry, inp):
        gae, next_value = carry
        reward, value, done = inp
        not_done = 1.0 - done.astype(jnp.float32)
        delta = reward + cfg.gamma * next_value * not_done - value
        gae = delta + cfg.gamma * cfg.lam * not_done * gae
        return (gae, value), gae

    (_, _), advantages = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones), reverse=True)
    returns = advantages + values
    return advantages, returns


def rollout(model: ActorCritic, params, env_step: Callable, env_state,
            obs, rng, num_steps: int):
    """Collect (T, B, ...) transitions with a scanned env.

    env_step(env_state, actions, t) -> (env_state, obs, reward, done, info).
    """
    def body(carry, t):
        env_state, obs, rng = carry
        rng, key = jax.random.split(rng)
        mean, log_std, value = model.apply(params, obs)
        action = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        log_prob = gaussian_log_prob(mean, log_std, action)
        env_state, next_obs, reward, done, info = env_step(env_state,
                                                           action, t)
        tr = Transition(obs=obs, action=action, log_prob=log_prob,
                        value=value, reward=reward, done=done, mean=mean,
                        log_std=log_std)
        # solver-health telemetry rides along when the env exposes it
        # (sim/env.step info); stacked (T, B) for percentile reduction
        aux = {k: info[k] for k in ("qp_pri_res", "qp_dua_res",
                                    "qp_diverged", "fall") if k in info}
        return (env_state, next_obs, rng), (tr, aux)

    (env_state, obs, rng), (traj, aux) = jax.lax.scan(
        body, (env_state, obs, rng), jnp.arange(num_steps))
    return env_state, obs, rng, traj, aux


def ppo_update(model: ActorCritic, cfg: PPOConfig, train: TrainState,
               traj: Transition, last_value,
               grad_reduce: Callable = lambda g: g,
               axis_name: str | None = None):
    """One PPO update over a rollout. grad_reduce hooks in the cross-device
    psum for data-parallel training (parallel/).

    ``axis_name``: when running inside shard_map over a device mesh, the
    mesh axis the env batch is split over. Every *statistic that feeds back
    into parameter updates* must then be reduced over that axis, or shards
    silently diverge while the caller declares the TrainState replicated:
    - the adaptive-lr KL (rsl_rl computes it on the global minibatch; a
      shard-local KL gives each device a different lr after the first
      minibatch with nonzero KL, breaking replication undetected),
    - the advantage mean/std normalization (rsl_rl normalizes globally;
      shard-local normalization is replication-safe because grads are
      pmean'd, but changes the semantics).
    grad_reduce stays a separate hook because optimizers may want psum vs
    pmean; axis_name covers the scalar statistics.
    """
    reduce_mean = ((lambda x: jax.lax.pmean(x, axis_name))
                   if axis_name else (lambda x: x))
    advantages, returns = compute_gae(cfg, traj.reward, traj.value, traj.done,
                                      last_value)
    # global moments: E[x] and E[x^2] are mean-reducible across shards
    adv_mean = reduce_mean(jnp.mean(advantages))
    adv_sq = reduce_mean(jnp.mean(jnp.square(advantages)))
    adv_std = jnp.sqrt(jnp.maximum(adv_sq - jnp.square(adv_mean), 0.0)) + 1e-8
    norm_adv = (advantages - adv_mean) / adv_std

    t, b = traj.reward.shape
    flat = jax.tree.map(lambda x: x.reshape((t * b,) + x.shape[2:]), traj)
    norm_adv = norm_adv.reshape(-1)
    returns_f = returns.reshape(-1)

    opt = make_optimizer(cfg)

    def loss_fn(params, batch, adv, ret):
        mean, log_std, value = model.apply(params, batch.obs)
        log_prob = gaussian_log_prob(mean, log_std, batch.action)
        ratio = jnp.exp(log_prob - batch.log_prob)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_param,
                         1.0 + cfg.clip_param) * adv
        policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        if cfg.use_clipped_value_loss:
            v_clipped = batch.value + jnp.clip(
                value - batch.value, -cfg.clip_param, cfg.clip_param)
            v_loss = jnp.maximum(jnp.square(value - ret),
                                 jnp.square(v_clipped - ret))
            value_loss = jnp.mean(v_loss)
        else:
            value_loss = jnp.mean(jnp.square(value - ret))
        entropy = jnp.mean(gaussian_entropy(log_std))
        # analytic KL(old || new) for the adaptive schedule (rsl_rl ppo.py)
        kl = jnp.mean(jnp.sum(
            log_std - batch.log_std
            + (jnp.exp(2 * batch.log_std)
               + jnp.square(batch.mean - mean)) / (2 * jnp.exp(2 * log_std))
            - 0.5, axis=-1))
        total = (policy_loss + cfg.value_loss_coef * value_loss
                 - cfg.entropy_coef * entropy)
        return total, (policy_loss, value_loss, kl)

    def epoch_body(carry, _):
        train, rng = carry
        rng, perm_key = jax.random.split(rng)
        idx = jax.random.permutation(perm_key, t * b)
        mb = t * b // cfg.num_minibatches

        def mb_body(carry, i):
            train = carry
            sel = jax.lax.dynamic_slice_in_dim(idx, i * mb, mb)
            batch = jax.tree.map(lambda x: x[sel], flat)
            adv, ret = norm_adv[sel], returns_f[sel]
            (loss, (pl, vl, kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(train.params, batch, adv, ret)
            grads = grad_reduce(grads)
            # the lr decision below must be identical on every shard
            kl = reduce_mean(kl)
            if cfg.schedule == "adaptive":
                lr = jnp.where(kl > cfg.desired_kl * 2.0, train.lr / 1.5,
                               jnp.where(kl < cfg.desired_kl / 2.0,
                                         train.lr * 1.5, train.lr))
                lr = jnp.clip(lr, cfg.lr_min, cfg.lr_max)
            else:
                lr = train.lr
            # non-finite guard: a poisoned minibatch (inf advantage, NaN
            # grad) must not corrupt params/optimizer state — skip the
            # update entirely and keep the previous lr. Second containment
            # layer behind sim/env.py's per-env NaN reset.
            grads_ok = jnp.all(jnp.stack(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
            lr = jnp.where(grads_ok, lr, train.lr)
            updates, opt_state = opt.update(grads, train.opt_state,
                                            train.params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(train.params, updates)
            keep = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(grads_ok, n, o), new, old)
            train = train._replace(params=keep(params, train.params),
                                   opt_state=keep(opt_state, train.opt_state),
                                   lr=lr)
            return train, (loss, pl, vl, kl)

        train, stats = jax.lax.scan(mb_body, train,
                                    jnp.arange(cfg.num_minibatches))
        return (train, rng), stats

    (train, rng), stats = jax.lax.scan(
        epoch_body, (train, train.rng), None, length=cfg.num_epochs)
    train = train._replace(rng=rng)
    loss, pl, vl, kl = jax.tree.map(jnp.mean, stats)
    # losses/rewards are shard-local; the caller declares metrics replicated,
    # so reduce them here (kl is already pmean'd inside mb_body)
    metrics = {"loss": reduce_mean(loss), "policy_loss": reduce_mean(pl),
               "value_loss": reduce_mean(vl), "kl": kl,
               "lr": train.lr,
               "mean_reward": reduce_mean(jnp.mean(traj.reward)),
               "mean_value": reduce_mean(jnp.mean(traj.value))}
    return train, metrics
