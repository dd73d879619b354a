"""On-device quadruped physics: single-rigid-body trunk + torque-driven legs
with penalty ground contact.

Replaces Isaac Gym / PhysX (RL_Environment/sim_utils.py, vec_task.py:298-339)
as the rollout backend so the whole env steps inside one jitted program. The
model is the same abstraction level the controller itself assumes (SRB
dynamics, massless-ish legs): the trunk is a 6-DoF rigid body driven by foot
contact forces and gravity; each of the 12 joints integrates
tau -> qdd against a small reflected inertia, and feet interact with the
terrain through a stiff spring-damper normal force + clamped Coulomb
friction (PhysX-penalty-equivalent; contact_offset/friction defaults from
cfg/task/Aliengo.yaml:93-106).

Everything is a pure function of (PhysicsParams, Terrain, PhysState, tau),
vmappable over envs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.robots import RobotParams
from ..ops import rotations as rot
from ..ops.leg_kinematics import hip_locations, leg_fk_jacobian
from . import terrain as terrain_mod

GRAVITY = 9.81  # sim gravity (cfg/task/Aliengo.yaml:97)


class PhysicsConfig(NamedTuple):
    """Stability budget (semi-implicit Euler, per-substep dt):
    the stiffest mode is the contact spring/damper reflected through the leg
    Jacobian onto the joint inertia: omega = sqrt(kn*J^2/I_j) ~ 140 rad/s and
    lambda = (cn+kt)*J^2/I_j ~ 340 1/s with the values below; both need
    (omega|lambda)*dt < 2 -> dt = 2 ms with margin. Joint damping is
    integrated implicitly so it never constrains dt."""
    dt: float = 0.002            # inner step; 5 substeps per 100 Hz tick
    substeps: int = 5
    joint_inertia: float = 0.08   # reflected rotor+link inertia per joint
    joint_damping: float = 1.0    # implicit
    joint_friction: float = 0.1
    tau_limit: float = 55.0      # reference clips at +-55 Nm (aliengo.py:268)
    contact_kn: float = 15000.0  # normal spring
    contact_cn: float = 150.0    # normal damper
    contact_kt: float = 4000.0   # tangential anchor spring (stiction)
    contact_ct: float = 60.0     # tangential damper
    friction_mu: float = 1.0     # plane staticFriction (Aliengo.yaml:14)
    q_min: float = -3.5
    q_max: float = 3.5


class PhysState(NamedTuple):
    pos: jnp.ndarray       # (3,)
    quat: jnp.ndarray      # (4,) wxyz, body->world orientation
    v: jnp.ndarray         # (3,) world linear velocity
    omega: jnp.ndarray     # (3,) world angular velocity
    q: jnp.ndarray         # (12,)
    qd: jnp.ndarray        # (12,)
    anchor: jnp.ndarray    # (4,2) stick-slip friction anchors (world xy)
    contact: jnp.ndarray   # (4,) bool: foot was in contact last substep


def init_state(params: RobotParams, q0, height: float = 0.4) -> PhysState:
    return PhysState(
        pos=jnp.array([0.0, 0.0, height], jnp.float32),
        quat=jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
        v=jnp.zeros(3, jnp.float32),
        omega=jnp.zeros(3, jnp.float32),
        q=jnp.asarray(q0, jnp.float32),
        qd=jnp.zeros(12, jnp.float32),
        anchor=jnp.zeros((4, 2), jnp.float32),
        contact=jnp.zeros(4, bool),
    )


def foot_positions_world(params: RobotParams, state: PhysState):
    """Foot world positions (4,3) and the pieces needed elsewhere."""
    r_wb = rot.quat_to_rot(state.quat).T  # body->world
    q = state.q.reshape(4, 3)
    p_hip, jac = leg_fk_jacobian(q, params.abad_link_length,
                                 params.hip_link_length,
                                 params.knee_link_length)
    hips = hip_locations(params.abad_location)
    p_body = hips + p_hip
    p_world = state.pos[None, :] + p_body @ r_wb.T
    return p_world, p_body, jac, r_wb


def _contact_force(cfg: PhysicsConfig, ter, p_w, v_w, anchor, was_contact):
    """Stick-slip penalty contact at the feet.

    Normal: spring-damper on penetration. Tangential: a spring to a per-foot
    *anchor point* (true stiction — feet don't creep under sub-limit lateral
    load) plus viscous damping, clamped to the Coulomb cone; on slip the
    anchor is dragged so the spring force sits exactly on the cone
    (PhysX-style penalty stiction).

    Returns (force (4,3), in_contact (4,), new_anchor (4,2)).
    """
    ground = terrain_mod.sample_height(ter, p_w[..., :2])
    pen = ground - p_w[..., 2]
    in_contact = pen > 0.0
    fz = jnp.maximum(cfg.contact_kn * pen - cfg.contact_cn * v_w[..., 2], 0.0)
    fz = jnp.where(in_contact, fz, 0.0)

    xy = p_w[..., :2]
    # (re)set anchor on touchdown or while airborne
    fresh = jnp.logical_or(jnp.logical_not(was_contact),
                           jnp.logical_not(in_contact))
    anchor = jnp.where(fresh[..., None], xy, anchor)

    ft = -cfg.contact_kt * (xy - anchor) - cfg.contact_ct * v_w[..., :2]
    ft_norm = jnp.linalg.norm(ft, axis=-1, keepdims=True)
    ft_max = cfg.friction_mu * fz[..., None]
    over = ft_norm > jnp.maximum(ft_max, 1e-9)
    ft_clamped = jnp.where(over, ft * ft_max / jnp.maximum(ft_norm, 1e-9), ft)
    # slip: drag the anchor so the spring alone would sit on the cone
    anchor_slip = xy + ft_clamped / cfg.contact_kt
    anchor = jnp.where(jnp.logical_and(over, in_contact[..., None]),
                       anchor_slip, anchor)
    ft_final = jnp.where(in_contact[..., None], ft_clamped, 0.0)
    return (jnp.concatenate([ft_final, fz[..., None]], axis=-1), in_contact,
            anchor)


def substep(params: RobotParams, cfg: PhysicsConfig, ter, state: PhysState,
            tau):
    """One physics substep, semi-implicit Euler."""
    dt = cfg.dt
    tau = jnp.clip(tau, -cfg.tau_limit, cfg.tau_limit)

    p_world, p_body, jac, r_wb = foot_positions_world(params, state)
    r_bw = r_wb.T

    # foot world velocities: body motion + joint motion
    qd = state.qd.reshape(4, 3)
    v_joint_body = jnp.einsum('lij,lj->li', jac, qd)
    rel = p_world - state.pos[None, :]
    v_foot = (state.v[None, :] + jnp.cross(state.omega[None, :], rel)
              + v_joint_body @ r_wb.T)

    f_contact, in_contact, anchor = _contact_force(
        cfg, ter, p_world, v_foot, state.anchor, state.contact)  # (4,3)

    # --- trunk dynamics -------------------------------------------------
    mass = params.body_mass
    force = jnp.sum(f_contact, axis=0) + jnp.array(
        [0.0, 0.0, -GRAVITY], jnp.float32) * mass
    torque = jnp.sum(jnp.cross(rel, f_contact), axis=0)
    inertia_w = r_wb @ params.body_inertia @ r_bw
    omega = state.omega + dt * jnp.linalg.solve(
        inertia_w, torque - jnp.cross(state.omega, inertia_w @ state.omega))
    v = state.v + dt * force / mass
    pos = state.pos + dt * v

    # quaternion integration q' = q + dt/2 * omega_quat * q
    ow = jnp.concatenate([jnp.zeros(1, jnp.float32), omega])
    qw, qx, qy, qz = state.quat
    w, x, y, z = ow[0], ow[1], ow[2], ow[3]
    dq = 0.5 * jnp.stack([
        w * qw - x * qx - y * qy - z * qz,
        w * qx + x * qw + y * qz - z * qy,
        w * qy - x * qz + y * qw + z * qx,
        w * qz + x * qy - y * qx + z * qw,
    ])
    quat = state.quat + dt * dq
    quat = quat / jnp.linalg.norm(quat)

    # --- joint dynamics -------------------------------------------------
    # ground force on the foot, expressed in the body frame, pulled back
    # through the leg Jacobian: I_j qdd = tau_motor + J^T f_foot - damping
    f_body = f_contact @ r_wb  # world->body: R_bw f = f @ R_bw^T = f @ r_wb
    tau_contact = jnp.einsum('lji,lj->li', jac, f_body).reshape(12)
    qdd = (tau + tau_contact
           - cfg.joint_friction * jnp.tanh(state.qd * 10.0)) / cfg.joint_inertia
    # implicit viscous joint damping: qd' = (qd + dt*qdd) / (1 + dt*b/I)
    qd_new = (state.qd + dt * qdd) / (
        1.0 + dt * cfg.joint_damping / cfg.joint_inertia)
    q_new = jnp.clip(state.q + dt * qd_new, cfg.q_min, cfg.q_max)

    return PhysState(pos=pos, quat=quat, v=v, omega=omega, q=q_new,
                     qd=qd_new, anchor=anchor,
                     contact=in_contact), f_contact, in_contact


def step(params: RobotParams, cfg: PhysicsConfig, ter, state: PhysState,
         tau):
    """One 100 Hz control-period step = cfg.substeps substeps.

    Returns (new state, last-substep foot contact forces (4,3), contact
    mask (4,)).
    """
    def body(carry, _):
        st, _, _ = carry
        st, fc, ic = substep(params, cfg, ter, st, tau)
        return (st, fc, ic), None

    init = (state, jnp.zeros((4, 3), jnp.float32), jnp.zeros(4, bool))
    (state, fc, ic), _ = jax.lax.scan(body, init, None, length=cfg.substeps)
    return state, fc, ic


def root_state_vector(state: PhysState):
    """(13,) root state in the layout the controller consumes:
    [pos(3), quat xyzw(4), linvel(3), angvel(3)]."""
    return jnp.concatenate([
        state.pos,
        jnp.stack([state.quat[1], state.quat[2], state.quat[3], state.quat[0]]),
        state.v, state.omega])


def body_contact_points(params: RobotParams, state: PhysState):
    """World positions of trunk corners and knees, for collision checks.

    Knee = hip + upper-link endpoint; trunk corners from abad footprint.
    """
    r_wb = rot.quat_to_rot(state.quat).T
    hips = hip_locations(params.abad_location)
    q = state.q.reshape(4, 3)
    # knee position: rotate hip link by abad roll + hip pitch
    s1, c1 = jnp.sin(q[:, 0]), jnp.cos(q[:, 0])
    s2, c2 = jnp.sin(q[:, 1]), jnp.cos(q[:, 1])
    l1 = params.abad_link_length
    l2 = params.hip_link_length
    from ..ops.leg_kinematics import SIDE_SIGN
    dy = l1 * SIDE_SIGN
    knee_body = hips + jnp.stack([
        -l2 * s2, dy * c1 + l2 * c2 * s1, dy * s1 - l2 * c1 * c2], axis=1)
    trunk_corners = hips.at[:, 2].add(-0.05)
    pts_body = jnp.concatenate([trunk_corners, knee_body], axis=0)  # (8,3)
    return state.pos[None, :] + pts_body @ r_wb.T
