"""Domain randomization over physics and robot parameters.

Port of the vec_task.py randomization engine (:449-705) as a *generic*
spec-driven engine: any scalar field of PhysicsConfig (``physics.<field>``)
or RobotParams (``robot.<field>``) can be randomized with a per-property
distribution (gaussian/uniform), operation (additive/scaling), and schedule
(linear ramp / constant delay over GLOBAL env steps — vec_task's
``schedule``/``schedule_steps`` at :478-500). The Isaac version mutates
actor/sim properties through the gym API; here randomization is a pure
function -> dict of per-env draws, so heterogeneous physics vmaps like
everything else and the draw rides in EnvState (stable pytree).

Re-draw scheduling (``frequency``) keys on the GLOBAL step counter
(EnvState.global_tick), mirroring vec_task's rand_freq being a sim-step
count, not an episode-progress count.
"""
from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import jax
import jax.numpy as jnp

from ..models.robots import RobotParams
from .physics import PhysicsConfig


@dataclasses.dataclass(frozen=True)
class RandomizationSpec:
    """One randomized property (vec_task apply_randomizations semantics).

    distribution: 'uniform' | 'gaussian';
    operation: 'additive' | 'scaling'.
    range_: (lo, hi) for uniform, (mean, std) for gaussian.
    schedule: None (always full strength) | 'linear' (noise ramps 0 -> full
    over schedule_steps global env steps) | 'constant' (no noise until
    schedule_steps, full after) — vec_task.py:478-500.
    """
    distribution: str = "uniform"
    operation: str = "scaling"
    range_: tuple = (0.9, 1.1)
    schedule: Optional[str] = None
    schedule_steps: int = 0


# the default spec set reproduces the r2/r3 training campaigns' draws:
# friction/mass/damping/contact-stiffness (common legged-robot DR)
DEFAULT_SPECS = (
    ("physics.friction_mu", RandomizationSpec(range_=(0.6, 1.3))),
    ("robot.body_mass", RandomizationSpec(range_=(0.9, 1.15))),
    ("physics.joint_damping", RandomizationSpec(range_=(0.8, 1.3))),
    ("physics.contact_kn", RandomizationSpec(range_=(0.7, 1.4))),
)


@dataclasses.dataclass(frozen=True)
class DomainRandomization:
    """What to randomize: a tuple of (target, RandomizationSpec), where
    target is 'physics.<PhysicsConfig field>' or 'robot.<RobotParams
    field>'. ``frequency``: re-draw every N *global* env steps (0 = only at
    reset), vec_task's rand_freq."""
    specs: tuple = DEFAULT_SPECS
    frequency: int = 0

    def spec(self, target: str) -> Optional[RandomizationSpec]:
        for t, s in self.specs:
            if t == target:
                return s
        return None


def from_dict(d: Mapping) -> DomainRandomization:
    """Build from a YAML-friendly dict:

    ``{"frequency": 0, "specs": {"physics.friction_mu":
    {"distribution": "uniform", "operation": "scaling",
    "range": [0.6, 1.3], "schedule": "linear", "schedule_steps": 1000}}}``
    """
    specs = []
    for target, sd in (d.get("specs") or {}).items():
        sd = dict(sd or {})
        if "range" in sd:
            sd["range_"] = tuple(sd.pop("range"))
        if "range_" in sd:
            sd["range_"] = tuple(sd["range_"])
        specs.append((target, RandomizationSpec(**sd)))
    return DomainRandomization(
        specs=tuple(specs) if specs else DEFAULT_SPECS,
        frequency=int(d.get("frequency", 0)))


def _nominal(target: str, cfg: PhysicsConfig, params: RobotParams):
    group, field = target.split(".", 1)
    if group == "physics":
        return jnp.asarray(getattr(cfg, field), jnp.float32)
    if group == "robot":
        return jnp.asarray(getattr(params, field), jnp.float32)
    raise ValueError(f"unknown randomization target group '{group}' "
                     f"(want physics.* or robot.*): {target}")


def _draw(rng, spec: RandomizationSpec, value, global_step):
    lo, hi = spec.range_
    if spec.distribution == "gaussian":
        sample = lo + hi * jax.random.normal(rng, jnp.shape(value))
    else:
        sample = jax.random.uniform(rng, jnp.shape(value), minval=lo,
                                    maxval=hi)
    # schedule: interpolate the sample toward the identity element
    # (1 for scaling, 0 for additive) by the ramp factor
    if spec.schedule == "linear" and spec.schedule_steps > 0:
        ramp = jnp.clip(global_step / float(spec.schedule_steps), 0.0, 1.0)
    elif spec.schedule == "constant" and spec.schedule_steps > 0:
        ramp = (global_step >= spec.schedule_steps).astype(jnp.float32)
    else:
        ramp = jnp.float32(1.0)
    if spec.operation == "additive":
        return value + ramp * sample
    return value * (1.0 + ramp * (sample - 1.0))


def identity(cfg: PhysicsConfig, dr: Optional[DomainRandomization] = None,
             params: Optional[RobotParams] = None) -> dict:
    """The no-op draw: nominal values for every spec target (used when DR
    is disabled / for padded shape stability). With dr=None returns {}."""
    if dr is None:
        return {}
    return {t: _nominal(t, cfg, params) for t, _ in dr.specs}


def sample(dr: DomainRandomization, cfg: PhysicsConfig,
           params: RobotParams, rng, global_step=jnp.int32(0)) -> dict:
    """Draw one environment's randomization (vmap for the batch).

    Returns {target: randomized value}; the dict structure is static (from
    dr.specs), so it jits/vmaps and lives in EnvState.
    """
    keys = jax.random.split(rng, max(len(dr.specs), 1))
    out = {}
    for k, (target, spec) in zip(keys, dr.specs):
        out[target] = _draw(k, spec, _nominal(target, cfg, params),
                            global_step)
    return out


def apply_to_config(cfg: PhysicsConfig, draws: dict) -> PhysicsConfig:
    """PhysicsConfig with this env's physics.* draws substituted
    (NamedTuple fields accept traced values)."""
    updates = {t.split(".", 1)[1]: v for t, v in draws.items()
               if t.startswith("physics.")}
    return cfg._replace(**updates) if updates else cfg


def apply_to_params(params: RobotParams, draws: dict) -> RobotParams:
    updates = {t.split(".", 1)[1]: v for t, v in draws.items()
               if t.startswith("robot.")}
    return params._replace(**updates) if updates else params
