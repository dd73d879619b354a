"""Actor-critic MLP policy (rsl_rl ActorCritic recipe).

Architecture per tasks/legged_config_ppo.py:4-8: actor & critic MLPs
[512, 256, 128] with ELU, Gaussian policy with state-independent learnable
log-std (init noise 1.0). Built in flax.linen; bf16-friendly but kept f32 by
default (the MLP is tiny; the MXU is busy with the MPC anyway).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    hidden: Sequence[int]
    out_dim: int

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.elu(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class ActorCritic(nn.Module):
    num_actions: int
    hidden: Sequence[int] = (512, 256, 128)
    init_noise_std: float = 1.0

    @nn.compact
    def __call__(self, obs):
        mean = MLP(self.hidden, self.num_actions, name="actor")(obs)
        value = MLP(self.hidden, 1, name="critic")(obs)[..., 0]
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, jnp.log(self.init_noise_std)),
            (self.num_actions,))
        return mean, jnp.broadcast_to(log_std, mean.shape), value
