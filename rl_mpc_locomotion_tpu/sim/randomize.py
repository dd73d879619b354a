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
    range_correlated: stream-noise targets only ('obs.noise' /
    'action.noise'): the CORRELATED noise component, drawn once per
    (re-)randomization and held fixed — a per-env sensor bias / actuator
    offset — while range_ is redrawn per element per step
    (vec_task.py:546-574 mu_corr/var_corr).
    """
    distribution: str = "uniform"
    operation: str = "scaling"
    range_: tuple = (0.9, 1.1)
    schedule: Optional[str] = None
    schedule_steps: int = 0
    range_correlated: tuple = (0.0, 0.0)


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
        if "range_correlated" in sd:
            sd["range_correlated"] = tuple(sd["range_correlated"])
        specs.append((target, RandomizationSpec(**sd)))
    return DomainRandomization(
        specs=tuple(specs) if specs else DEFAULT_SPECS,
        frequency=int(d.get("frequency", 0)))


# stream-noise targets: noise injected into the action / observation
# streams (the reference wraps both in noise lambdas, vec_task.py:308-310,
# 331-333 — a first-order sim-to-real lever the physics.*/robot.* targets
# don't cover). Dims are the env's (sim/env.NUM_ACTIONS / num_obs(cfg));
# sample() takes them via ``stream_dims`` so this module stays env-agnostic.
STREAM_TARGETS = ("action.noise", "obs.noise")


def _nominal(target: str, cfg: PhysicsConfig, params: RobotParams):
    group, field = target.split(".", 1)
    if group == "physics":
        return jnp.asarray(getattr(cfg, field), jnp.float32)
    if group == "robot":
        return jnp.asarray(getattr(params, field), jnp.float32)
    raise ValueError(f"unknown randomization target group '{group}' "
                     f"(want physics.*, robot.*, obs.noise or action.noise):"
                     f" {target}")


def _ramp(spec: RandomizationSpec, global_step):
    """Schedule factor in [0,1] (vec_task.py:537-543)."""
    if spec.schedule == "linear" and spec.schedule_steps > 0:
        return jnp.clip(global_step / float(spec.schedule_steps), 0.0, 1.0)
    if spec.schedule == "constant" and spec.schedule_steps > 0:
        return (global_step >= spec.schedule_steps).astype(jnp.float32)
    return jnp.float32(1.0)


def _sample_range(rng, spec: RandomizationSpec, range_, shape):
    lo, hi = range_
    if spec.distribution == "gaussian":
        return lo + hi * jax.random.normal(rng, shape)
    return jax.random.uniform(rng, shape, minval=lo, maxval=hi)


def _draw(rng, spec: RandomizationSpec, value, global_step):
    sample = _sample_range(rng, spec, spec.range_, jnp.shape(value))
    # schedule: interpolate the sample toward the identity element
    # (1 for scaling, 0 for additive) by the ramp factor
    ramp = _ramp(spec, global_step)
    if spec.operation == "additive":
        return value + ramp * sample
    return value * (1.0 + ramp * (sample - 1.0))


def apply_stream(spec: RandomizationSpec, corr, value, rng, global_step):
    """Apply stream noise to an action/observation vector.

    ``corr`` is this env's held correlated component (from sample());
    the uncorrelated component is redrawn per element per call — the
    noise-lambda semantics of vec_task.py:564-574.
    """
    eps = _sample_range(rng, spec, spec.range_, jnp.shape(value))
    noise = corr + eps
    ramp = _ramp(spec, global_step)
    if spec.operation == "additive":
        return value + ramp * noise
    return value * (1.0 + ramp * (noise - 1.0))


def identity(cfg: PhysicsConfig, dr: Optional[DomainRandomization] = None,
             params: Optional[RobotParams] = None,
             stream_dims: Optional[Mapping] = None) -> dict:
    """The no-op draw: nominal values for every spec target (used when DR
    is disabled / for padded shape stability). With dr=None returns {}."""
    if dr is None:
        return {}
    out = {}
    for t, _ in dr.specs:
        if t in STREAM_TARGETS:
            dim = (stream_dims or {}).get(t.split(".", 1)[0], 1)
            out[t] = jnp.zeros(dim, jnp.float32)
        else:
            out[t] = _nominal(t, cfg, params)
    return out


def sample(dr: DomainRandomization, cfg: PhysicsConfig,
           params: RobotParams, rng, global_step=jnp.int32(0),
           stream_dims: Optional[Mapping] = None) -> dict:
    """Draw one environment's randomization (vmap for the batch).

    Returns {target: randomized value}; the dict structure is static (from
    dr.specs), so it jits/vmaps and lives in EnvState. Stream targets
    ('obs.noise'/'action.noise') store the held CORRELATED component (a
    (dim,) vector from range_correlated, vec_task.py:546-560);
    ``stream_dims`` maps 'obs'/'action' to their dims.
    """
    keys = jax.random.split(rng, max(len(dr.specs), 1))
    out = {}
    for k, (target, spec) in zip(keys, dr.specs):
        if target in STREAM_TARGETS:
            dim = (stream_dims or {}).get(target.split(".", 1)[0], 1)
            out[target] = _sample_range(k, spec, spec.range_correlated,
                                        (dim,))
        else:
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
