"""Robot constant pytrees for A1 / Go1 / Aliengo.

The reference holds these in a per-robot Python class
(common/Quadruped.py:12-107). Here they are a NamedTuple of arrays so a
*stacked* registry indexes by a traced robot id — heterogeneous batches
(A1 + Go1 + Aliengo in one vmap) work with zero branching.

Values match the reference exactly, including its deliberately inflated
inertias/masses for stability (Quadruped.py:38-73, dev log
docs/2-development_log.md:74).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ALIENGO = 0
GO1 = 1
A1 = 2

ROBOT_NAMES = {"aliengo": ALIENGO, "go1": GO1, "a1": A1}


class RobotParams(NamedTuple):
    abad_link_length: jnp.ndarray   # ()
    hip_link_length: jnp.ndarray    # ()
    knee_link_length: jnp.ndarray   # ()
    abad_location: jnp.ndarray      # (3,)
    body_mass: jnp.ndarray          # ()
    body_inertia: jnp.ndarray       # (3,3)
    body_height: jnp.ndarray        # ()
    friction_coeff: jnp.ndarray     # () — 0.4 for all robots
    mpc_weights: jnp.ndarray        # (13,) default MPC cost weights
    robot_id: jnp.ndarray = jnp.int32(-1)  # () registry id (-1 = custom);
    # feeds the optional robot-one-hot observation for heterogeneous-batch
    # policies (sim/env.observations, EnvConfig.obs_robot_id)
    art: object = None  # Optional[sim.articulated.ArticulatedParams] —
    # 18-DoF plant model (attach via sim.articulated.with_articulated;
    # None keeps the SRB/coupled point-mass plants)


def _make(abad, hip, knee, abad_loc, mass, inertia_diag, height, weights,
          robot_id):
    return RobotParams(
        abad_link_length=jnp.float32(abad),
        hip_link_length=jnp.float32(hip),
        knee_link_length=jnp.float32(knee),
        abad_location=jnp.array(abad_loc, jnp.float32),
        body_mass=jnp.float32(mass),
        body_inertia=jnp.diag(jnp.array(inertia_diag, jnp.float32)),
        body_height=jnp.float32(height),
        friction_coeff=jnp.float32(0.4),
        mpc_weights=jnp.array(weights, jnp.float32),
        robot_id=jnp.int32(robot_id),
    )


def aliengo_params() -> RobotParams:
    """Quadruped.py:16-36."""
    return _make(0.083, 0.25, 0.25, [0.2399, 0.051, 0.0], 9.041 * 2,
                 [0.033260231, 0.16117211, 0.17460442], 0.35,
                 [1.0, 1.5, 0.0, 0.0, 0.0, 50, 0.0, 0.0, 0.1, 1.0, 1.0, 0.1, 0.0],
                 ALIENGO)


def go1_params() -> RobotParams:
    """Quadruped.py:38-56 (inertia x5, weights x10)."""
    w = [1.0, 1.5, 0.0, 0.0, 0.0, 50, 0.0, 0.0, 0.1, 1.0, 1.0, 0.1, 0.0]
    return _make(0.08, 0.213, 0.213, [0.1881, 0.04675, 0.0], 5.204 * 2,
                 [x * 5 for x in [0.0168128557, 0.063009565, 0.0716547275]],
                 0.26, [x * 10 for x in w], GO1)


def a1_params() -> RobotParams:
    """Quadruped.py:58-73 (mass x3, inertia x10)."""
    return _make(0.08505, 0.2, 0.2, [0.183, 0.047, 0.0], 8.5 * 3,
                 [x * 10 for x in [0.017, 0.057, 0.064]], 0.26,
                 [0.25, 0.25, 10, 2, 2, 50, 0, 0, 0.3, 0.5, 0.5, 0.1, 0],
                 A1)


def robot_registry() -> RobotParams:
    """Stacked (3, ...) params: index 0=Aliengo, 1=Go1, 2=A1."""
    return jax.tree.map(lambda *xs: jnp.stack(xs),
                        aliengo_params(), go1_params(), a1_params())


def select_robot(registry: RobotParams, robot_id) -> RobotParams:
    """Index the stacked registry with a (traced) robot id."""
    return jax.tree.map(lambda x: x[robot_id], registry)
