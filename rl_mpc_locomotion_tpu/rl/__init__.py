"""On-device PPO training."""

from . import ppo, train  # noqa: F401
