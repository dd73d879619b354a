"""Domain randomization over physics and robot parameters.

Port of the vec_task.py randomization engine (:449-705): per-parameter
gaussian/uniform noise, additive or scaling, applied on a schedule. The
Isaac version mutates actor/sim properties through the gym API; here
randomization is a pure function RobotParams/PhysicsConfig -> randomized
pytrees, drawn per environment, so heterogeneous physics vmaps like
everything else.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.robots import RobotParams
from .physics import PhysicsConfig


@dataclasses.dataclass(frozen=True)
class RandomizationSpec:
    """One randomized parameter (vec_task apply_randomizations semantics).

    distribution: 'uniform' | 'gaussian';
    operation: 'additive' | 'scaling'.
    range_: (lo, hi) for uniform, (mean, std) for gaussian.
    """
    distribution: str = "uniform"
    operation: str = "scaling"
    range_: tuple = (0.9, 1.1)


@dataclasses.dataclass(frozen=True)
class DomainRandomization:
    """What to randomize; None disables a field. Defaults follow common
    legged-robot DR (friction/mass/gains)."""
    friction: Optional[RandomizationSpec] = RandomizationSpec(
        range_=(0.6, 1.3))
    body_mass: Optional[RandomizationSpec] = RandomizationSpec(
        range_=(0.9, 1.15))
    joint_damping: Optional[RandomizationSpec] = RandomizationSpec(
        range_=(0.8, 1.3))
    contact_kn: Optional[RandomizationSpec] = RandomizationSpec(
        range_=(0.7, 1.4))
    # schedule: re-draw every `frequency` env steps (0 = only at reset),
    # mirroring vec_task's rand_freq
    frequency: int = 0


def _draw(rng, spec: RandomizationSpec, value):
    lo, hi = spec.range_
    if spec.distribution == "gaussian":
        sample = lo + hi * jax.random.normal(rng, jnp.shape(value))
    else:
        sample = jax.random.uniform(rng, jnp.shape(value), minval=lo,
                                    maxval=hi)
    if spec.operation == "additive":
        return value + sample
    return value * sample


class RandomizedPhysics(NamedTuple):
    """Per-env randomized physics scalars consumed by sim.physics via
    PhysicsConfig overrides."""
    friction_mu: jnp.ndarray
    joint_damping: jnp.ndarray
    contact_kn: jnp.ndarray
    mass_scale: jnp.ndarray


def identity(cfg: PhysicsConfig) -> RandomizedPhysics:
    """The no-op draw: nominal physics (used when DR is disabled so the
    EnvState pytree keeps a stable shape either way)."""
    return RandomizedPhysics(
        friction_mu=jnp.float32(cfg.friction_mu),
        joint_damping=jnp.float32(cfg.joint_damping),
        contact_kn=jnp.float32(cfg.contact_kn),
        mass_scale=jnp.float32(1.0))


def sample(dr: DomainRandomization, cfg: PhysicsConfig, rng) -> RandomizedPhysics:
    """Draw one environment's randomization (vmap for the batch)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    mu = jnp.float32(cfg.friction_mu)
    damp = jnp.float32(cfg.joint_damping)
    kn = jnp.float32(cfg.contact_kn)
    mass = jnp.float32(1.0)
    if dr.friction is not None:
        mu = _draw(k1, dr.friction, mu)
    if dr.joint_damping is not None:
        damp = _draw(k2, dr.joint_damping, damp)
    if dr.contact_kn is not None:
        kn = _draw(k3, dr.contact_kn, kn)
    if dr.body_mass is not None:
        mass = _draw(k4, dr.body_mass, mass)
    return RandomizedPhysics(friction_mu=mu, joint_damping=damp,
                             contact_kn=kn, mass_scale=mass)


def apply_to_config(cfg: PhysicsConfig, rp: RandomizedPhysics) -> PhysicsConfig:
    """PhysicsConfig with this env's draws substituted (NamedTuple fields
    accept traced values)."""
    return cfg._replace(friction_mu=rp.friction_mu,
                        joint_damping=rp.joint_damping,
                        contact_kn=rp.contact_kn)


def apply_to_params(params: RobotParams, rp: RandomizedPhysics) -> RobotParams:
    return params._replace(body_mass=params.body_mass * rp.mass_scale)
