"""State estimator: frame transforms + terrain (ground-normal/CoM) estimation.

Pure-function port of common/StateEstimator.py. ``update`` consumes the raw
13-dim root state each tick; the terrain estimate functions are called from
inside the locomotion step (mirroring ConvexMPCLocomotion.run:265-268) and
thread the persistent EstimatorState explicitly.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import rotations as rot
from .types import EstimatorState, StateEstimate

UP = jnp.array([0.0, 0.0, 1.0], jnp.float32)


def update(est: EstimatorState, body_state) -> StateEstimate:
    """Per-tick frame transforms. StateEstimator.update (:57-97).

    body_state: (13,) root state [pos(3), quat xyzw(4), linvel(3), angvel(3)]
    (the Isaac root-state layout the reference bridges from,
    StateEstimator.py:58-69). Position xy is *not* consumed — the reference
    keeps result.position[:2] at zero and estimates only z (:40, :109-118).
    """
    quat = jnp.stack([body_state[6], body_state[3], body_state[4], body_state[5]])
    v_world = body_state[7:10]
    omega_world = body_state[10:13]

    r_body = rot.quat_to_rot(quat)          # world -> body
    v_body = r_body @ v_world
    omega_body = r_body @ omega_world
    rpy = rot.quat_to_rpy(quat)

    world_r_yaw = rot.rpy_to_rot(jnp.stack([0.0 * rpy[2], 0.0 * rpy[2], rpy[2]]))
    yaw_r_ground = rot.rot_from_normals(UP, est.ground_normal_yaw)
    ground_r_body = r_body @ world_r_yaw.T @ yaw_r_ground.T
    rpy_body = rot.rot_to_rpy(ground_r_body)

    position = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), est.com_z])
    return StateEstimate(
        position=position, v_world=v_world, omega_world=omega_world,
        quat=quat, r_body=r_body, rpy=rpy, rpy_body=rpy_body, v_body=v_body,
        omega_body=omega_body, ground_normal_yaw=est.ground_normal_yaw,
        ground_normal_world=est.ground_normal_world,
        ground_r_body=ground_r_body)


def update_com_height(est: EstimatorState, ground_r_body, foot_positions):
    """CoM height from stance-feet average. StateEstimator.py:109-118.

    foot_positions: (4,3) body-frame foot positions. Returns the new com_z
    (unchanged when no foot is in contact, as the reference early-returns).
    """
    contacts = est.contact_phase
    n_contact = jnp.sum(contacts)
    fp_ground = foot_positions @ ground_r_body.T
    heights = -fp_ground[:, 2]
    z = jnp.sum(heights * contacts) / jnp.maximum(n_contact, 1e-6)
    return jnp.where(n_contact > 0, z, est.com_z)


def update_ground_estimate(est: EstimatorState, se: StateEstimate,
                           foot_positions) -> EstimatorState:
    """Full terrain update: CoM height, contact history, least-squares plane
    normal. StateEstimator.py:120-144 (IEEE 7354099 method).

    The reference's scipy.linalg.lstsq becomes a pseudo-inverse solve —
    identical result, vmappable.
    """
    com_z = update_com_height(est, se.ground_r_body, foot_positions)

    in_contact = est.contact_phase > 0
    hist = jnp.where(in_contact[:, None], foot_positions,
                     est.foot_contact_history)

    normal = jnp.linalg.pinv(hist) @ jnp.ones(4, hist.dtype)
    norm = jnp.linalg.norm(normal)
    normal = jnp.where(norm > 1e-6, normal / jnp.maximum(norm, 1e-6), UP)
    normal = jnp.where(normal[2] < 0, -normal, normal)

    return est._replace(
        com_z=com_z,
        foot_contact_history=hist,
        ground_normal_yaw=normal,
        ground_normal_world=se.r_body.T @ normal,
    )


def update_flat_ground(est: EstimatorState, se: StateEstimate,
                       foot_positions) -> EstimatorState:
    """flat_ground=True path: only the CoM height is estimated
    (ConvexMPCLocomotion.run:265-266)."""
    com_z = update_com_height(est, se.ground_r_body, foot_positions)
    return est._replace(com_z=com_z)


def init_contact_history(est: EstimatorState, foot_positions,
                         body_height) -> EstimatorState:
    """First-run init: feet assumed at -body_height. StateEstimator.py:99-101."""
    hist = foot_positions.at[:, 2].set(-body_height)
    return est._replace(foot_contact_history=hist)
