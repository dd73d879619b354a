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
    # ---- leg-inertia coupling (off = pure SRB trunk) --------------------
    # Each leg is a composite point mass m_l = leg_mass_frac * body_mass at
    # the fraction leg_com_frac along hip->foot (total mass stays
    # body_mass, so the MPC's total-weight model stays exact); the legs'
    # inertial/gravity reaction couples back into the trunk equations and
    # the joint torques feel the leg weight. See substep() for the
    # momentum-consistent explicit scheme.
    leg_coupling: bool = False
    leg_mass_frac: float = 0.1   # per-leg fraction of total mass
    leg_com_frac: float = 0.35   # leg CoM fraction along hip->foot
    leg_force_limit: float = 3.0  # |f_leg| clamp, multiples of m_l * g
    leg_force_tau: float = 0.03   # trunk-side reaction low-pass (s)
    # ---- articulated 18-DoF plant (third fidelity tier) -----------------
    # True routes substeps to sim.articulated (floating-base Lagrangian
    # over the full URDF link tree); requires RobotParams.art
    # (articulated.with_articulated). Overrides leg_coupling.
    articulated: bool = False


class PhysState(NamedTuple):
    pos: jnp.ndarray       # (3,)
    quat: jnp.ndarray      # (4,) wxyz, body->world orientation
    v: jnp.ndarray         # (3,) world linear velocity
    omega: jnp.ndarray     # (3,) world angular velocity
    q: jnp.ndarray         # (12,)
    qd: jnp.ndarray        # (12,)
    anchor: jnp.ndarray    # (4,2) stick-slip friction anchors (world xy)
    contact: jnp.ndarray   # (4,) bool: foot was in contact last substep
    f_leg: jnp.ndarray     # (4,3) low-passed leg-inertia reaction (world)


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
        f_leg=jnp.zeros((4, 3), jnp.float32),
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
    if cfg.articulated:
        from . import articulated
        return articulated.substep(params, cfg, ter, state, tau)
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
    g_vec = jnp.array([0.0, 0.0, -GRAVITY], jnp.float32)
    force = jnp.sum(f_contact, axis=0) + g_vec * mass
    torque = jnp.sum(jnp.cross(rel, f_contact), axis=0)
    inertia_w = r_wb @ params.body_inertia @ r_bw
    gyro = jnp.cross(state.omega, inertia_w @ state.omega)
    vdot0 = force / mass
    omdot0 = jnp.linalg.solve(inertia_w, torque - gyro)

    # joint-space contact pullback (shared by both branches)
    f_body = f_contact @ r_wb  # world->body: R_bw f = f @ R_bw^T = f @ r_wb
    tau_contact = jnp.einsum('lji,lj->li', jac, f_body).reshape(12)

    if cfg.leg_coupling:
        # ---- leg-inertia coupling (momentum-consistent explicit) --------
        # Composite point mass m_l per leg at p_l = hip + c*(foot - hip)
        # (so J_p = c * J_foot). Scheme (SURVEY §7 stage-6 fidelity step
        # short of a full 18-DoF articulated solver):
        #   1. joints integrate FIRST, loaded by the leg's rigid-ride
        #      inertia/gravity through J_p^T (swing legs sag under their
        #      own weight, centrifugal load flings them out),
        #   2. the trunk then receives each swing leg's reaction as the
        #      EXACT momentum the joints just imparted to the leg mass,
        #      -m_l * c * R * J * (qd_new - qd) / dt, plus the rigid-ride
        #      reaction m_l (g - a_rigid). Using the realized Delta-qd
        #      (not an estimated tau/I) keeps system momentum consistent
        #      by construction. Stance legs couple only through the
        #      rigid-ride term: their foot is pinned and its contact force
        #      already acts on the trunk directly — feeding the 15 kN/m
        #      contact spring back again with a substep delay is the
        #      classic explicit-coupling blowup.
        # Dropped: Jdot*qd and per-link rotational inertia (small at
        # 500 Hz substeps); a_rigid uses the pass-1 (SRB) trunk accels.
        m_leg = cfg.leg_mass_frac * mass
        c = cfg.leg_com_frac
        hips_w_rel = hip_locations(params.abad_location) @ r_wb.T   # (4,3)
        r_p = hips_w_rel + c * (rel - hips_w_rel)                   # (4,3)
        v_rel_w = c * (v_joint_body @ r_wb.T)
        # leg-point acceleration relative to the trunk's LINEAR accel
        # (which is solved for implicitly below via the effective mass):
        a_nov = (jnp.cross(omdot0[None, :], r_p)
                 + jnp.cross(state.omega[None, :],
                             jnp.cross(state.omega[None, :], r_p))
                 + 2.0 * jnp.cross(state.omega[None, :], v_rel_w))
        f_ride = m_leg * (g_vec[None, :] - vdot0[None, :] - a_nov)  # (4,3)

        # joints: rigid-ride inertia + gravity load through J_p^T
        tau_ride = c * jnp.einsum('lji,lj->li', jac,
                                  f_ride @ r_wb).reshape(12)
        qdd_c = (tau + tau_contact + tau_ride - cfg.joint_friction
                 * jnp.tanh(state.qd * 10.0)) / cfg.joint_inertia
        qd_new = (state.qd + dt * qdd_c) / (
            1.0 + dt * cfg.joint_damping / cfg.joint_inertia)
        dqd = (qd_new - state.qd).reshape(4, 3)
        a_joint_w = (c / dt) * jnp.einsum('lij,lj->li', jac, dqd) @ r_wb.T
        swing = (1.0 - in_contact.astype(jnp.float32))[:, None]

        # trunk-side reaction: the SWING legs' realized acceleration
        # momentum pushed back (-m_l a_joint — the servo-whip disturbance
        # the SRB plant lacks), CLAMPED to a physical bound and LOW-PASSED.
        # Zero-mean over a gait cycle by construction, so it cannot bias
        # statics: the trunk equations keep the exact SRB total-mass form
        # (leg weight is already inside body_mass). The rigid-ride /
        # gravity reaction terms stay on the JOINT side only (tau_ride):
        # applied explicitly to the trunk they close a positive-feedback
        # loop with the swing PD and the contact spring and destabilize
        # the integrator (measured: sustained clamp-saturated bias tips
        # the robot); their static trunk-side effect is a CoM shift the
        # MPC absorbs anyway.
        f_raw = -m_leg * a_joint_w * swing
        lim = cfg.leg_force_limit * m_leg * GRAVITY
        f_raw = jnp.clip(f_raw, -lim, lim)
        f_lp = state.f_leg + (dt / cfg.leg_force_tau) * (f_raw - state.f_leg)

        force_t = force + jnp.sum(f_lp, axis=0)
        torque_t = torque + jnp.sum(jnp.cross(r_p, f_lp), axis=0)
        v = state.v + dt * force_t / mass
        omega = state.omega + dt * jnp.linalg.solve(
            inertia_w, torque_t - gyro)
    else:
        f_lp = state.f_leg
        v = state.v + dt * vdot0
        omega = state.omega + dt * omdot0
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
    # ground force on the foot pulled back through the leg Jacobian:
    # I_j qdd = tau_motor + J^T f_foot - damping. (With leg_coupling the
    # joints were already integrated above, with the leg load included.)
    if not cfg.leg_coupling:
        qdd = (tau + tau_contact - cfg.joint_friction
               * jnp.tanh(state.qd * 10.0)) / cfg.joint_inertia
        # implicit viscous joint damping: qd' = (qd+dt*qdd) / (1+dt*b/I)
        qd_new = (state.qd + dt * qdd) / (
            1.0 + dt * cfg.joint_damping / cfg.joint_inertia)
    q_new = jnp.clip(state.q + dt * qd_new, cfg.q_min, cfg.q_max)

    return PhysState(pos=pos, quat=quat, v=v, omega=omega, q=q_new,
                     qd=qd_new, anchor=anchor,
                     contact=in_contact, f_leg=f_lp), f_contact, in_contact


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
