"""Articulated 18-DoF quadruped dynamics (floating trunk + 4x3 revolute
joints) — the third physics-fidelity tier (SURVEY §7 stage 6; the
reference's plant is PhysX full articulated dynamics,
RL_Environment/sim_utils.py:16-43, vec_task.py:317-319).

Formulation (TPU-first: one dense 18x18 solve per substep, fully
vmappable, no per-joint recursion in the hot path):

The configuration space is SE(3) x R^12. With generalized velocity
u = (v_body, omega_body, qd) expressed in the TRUNK frame, the kinetic
energy is T = 1/2 u^T H(q) u where H depends ONLY on the joint angles q —
all link geometry lives in the trunk frame and body inertias are constant
in their link frames. The equations of motion are then the
Euler-Poincare / Hamel form for a trivially-trivialized SE(3) x shape
system:

    H(q) du = Q - Hdot(q, qd) u - ad*_u (H u) + [0, 0, dT/dq]

where the co-adjoint correction acts on the base rows only
(ad*_(v,w)(p_lin, p_ang) = (w x p_lin, w x p_ang + v x p_lin)) and the
joint rows carry the standard Lagrange dT/dq term. Energy consistency:
u . ad*_u(Hu) = 0 identically and qd . dT/dq = 1/2 u^T Hdot u, so with
Q = 0 total energy is exactly conserved by the continuous equations
(tests/test_articulated.py pins this on the integrator to ~1%).

H(q) is assembled from closed-form geometric Jacobians (13 bodies:
trunk + 4 legs x {hip, thigh, calf}); Hdot u and dT/dq come from
jax.jvp / jax.grad through the same assembly — exact, no finite
differences, no hand-derived Coriolis tensors.

Link masses/inertias/joint frames are parsed from the vendored Unitree
URDFs (assets/{a1,go1,aliengo}.urdf) with fixed-joint children (rotors,
foot) merged into their parents via the parallel-axis theorem — the same
composite-body reduction Isaac Gym applies when
collapse_fixed_joints=True (sim_utils.py:52).

Contact uses the same stick-slip penalty model as the point-mass plant
(sim.physics._contact_force) applied at the feet through their full
3x18 Jacobians.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.robots import RobotParams
from ..ops import rotations as rot
from . import terrain as terrain_mod

NU = 18  # v(3) + omega(3) + qd(12)


class ArticulatedParams(NamedTuple):
    """Per-robot articulated model, trunk-frame joint chains.

    Leg order matches the controller's (FL, FR, RL, RR — utils.py
    SIDE_SIGN [+1,-1,+1,-1]); link order per leg: hip(abad), thigh,
    calf.
    """
    trunk_mass: jnp.ndarray      # ()
    trunk_com: jnp.ndarray       # (3,) in trunk frame
    trunk_inertia: jnp.ndarray   # (3,3) about trunk COM
    joint_origin: jnp.ndarray    # (4,3,3) joint j origin in parent frame
    joint_axis: jnp.ndarray      # (4,3,3) joint j axis in its own frame
    link_mass: jnp.ndarray       # (4,3)
    link_com: jnp.ndarray        # (4,3,3) COM in link frame
    link_inertia: jnp.ndarray    # (4,3,3,3) about COM, link frame
    foot_offset: jnp.ndarray     # (4,3) foot point in calf frame
    armature: jnp.ndarray        # () reflected rotor inertia per joint


# ---------------------------------------------------------------------------
# URDF -> ArticulatedParams
# ---------------------------------------------------------------------------

def _parse_inertial(link_el):
    import numpy as np
    i = link_el.find("inertial")
    if i is None:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    m = float(i.find("mass").get("value"))
    o = i.find("origin")
    com = (np.array([float(v) for v in o.get("xyz").split()])
           if o is not None and o.get("xyz") else np.zeros(3))
    a = i.find("inertia").attrib
    ine = np.array([
        [float(a["ixx"]), float(a.get("ixy", 0)), float(a.get("ixz", 0))],
        [float(a.get("ixy", 0)), float(a["iyy"]), float(a.get("iyz", 0))],
        [float(a.get("ixz", 0)), float(a.get("iyz", 0)), float(a["izz"])],
    ])
    return m, com, ine


def _merge_fixed(parent, child, child_origin):
    """Merge a fixed-joint child body into its parent (composite body):
    combined mass, COM, and inertia about the combined COM (parallel
    axis; URDF fixed joints here have identity rpy)."""
    import numpy as np
    m1, c1, i1 = parent
    m2, c2_local, i2 = child
    c2 = child_origin + c2_local
    m = m1 + m2
    if m == 0:
        return parent
    c = (m1 * c1 + m2 * c2) / m

    def shift(i_mat, mm, d):
        return i_mat + mm * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

    return m, c, shift(i1, m1, c1 - c) + shift(i2, m2, c2 - c)


def params_from_urdf(path: str, armature: float = 0.05
                     ) -> ArticulatedParams:
    """Build the articulated model from a vendored Unitree URDF.

    Rotor links (``*_rotor``) and the foot link are merged into their
    fixed-joint parents; the physical rotor gearing shows up instead as
    the ``armature`` reflected inertia on each joint — the standard sim
    treatment (PhysX armature; reference sim_utils asset options).
    """
    import numpy as np
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    links = {l.get("name"): _parse_inertial(l) for l in root.iter("link")
             if l.get("name")}
    joints = {}
    for j in root.iter("joint"):
        n = j.get("name")
        if n is None or j.get("type") is None:
            continue
        o = j.find("origin")
        xyz = (np.array([float(v) for v in o.get("xyz").split()])
               if o is not None and o.get("xyz") else np.zeros(3))
        a = j.find("axis")
        axis = (np.array([float(v) for v in a.get("xyz").split()])
                if a is not None else np.array([1.0, 0, 0]))
        joints[n] = {"type": j.get("type"), "origin": xyz, "axis": axis,
                     "parent": j.find("parent").get("link"),
                     "child": j.find("child").get("link")}

    # merge fixed-joint children bottom-up (rotors, feet): child links
    # that parent nothing are leaves and merge first
    merged = dict(links)
    fixed = [j for j in joints.values() if j["type"] == "fixed"]
    parents = {j["parent"] for j in joints.values()}
    fixed.sort(key=lambda j: 0 if j["child"] not in parents else 1)
    for j in fixed:
        if j["child"] not in merged or j["parent"] not in merged:
            continue
        merged[j["parent"]] = _merge_fixed(
            merged[j["parent"]], merged[j["child"]], j["origin"])

    legs = ["FL", "FR", "RL", "RR"]  # controller leg order: SIDE_SIGN
    # = [+1,-1,+1,-1] puts the LEFT legs at even indices
    # (ops/leg_kinematics.hip_locations; verified FK-identical to the
    # controller chain to ~4 mm, the URDF-vs-tuned link-length delta)
    jo = np.zeros((4, 3, 3))
    ja = np.zeros((4, 3, 3))
    lm = np.zeros((4, 3))
    lc = np.zeros((4, 3, 3))
    li = np.zeros((4, 3, 3, 3))
    foot = np.zeros((4, 3))
    for k, leg in enumerate(legs):
        chain = [f"{leg}_hip_joint", f"{leg}_thigh_joint",
                 f"{leg}_calf_joint"]
        for i, jn in enumerate(chain):
            j = joints[jn]
            jo[k, i] = j["origin"]
            ja[k, i] = j["axis"]
            m, c, ine = merged[j["child"]]
            lm[k, i] = m
            lc[k, i] = c
            li[k, i] = ine
        foot[k] = joints[f"{leg}_foot_fixed"]["origin"]

    tm, tc, ti = merged["trunk"]
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return ArticulatedParams(
        trunk_mass=f32(tm), trunk_com=f32(tc), trunk_inertia=f32(ti),
        joint_origin=f32(jo), joint_axis=f32(ja), link_mass=f32(lm),
        link_com=f32(lc), link_inertia=f32(li), foot_offset=f32(foot),
        armature=f32(armature))


_ASSET_FILES = {"aliengo": "aliengo.urdf", "go1": "go1.urdf",
                "a1": "a1.urdf"}
_CACHE: dict = {}


def for_robot(name: str, armature: float = 0.05) -> ArticulatedParams:
    """Cached ArticulatedParams from the vendored asset for a registry
    robot name ('aliengo' | 'go1' | 'a1')."""
    import os
    key = (name, armature)
    if key not in _CACHE:
        asset_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "assets")
        _CACHE[key] = params_from_urdf(
            os.path.join(asset_dir, _ASSET_FILES[name]), armature)
    return _CACHE[key]


def with_articulated(params: RobotParams, name: str,
                     armature: float = 0.05,
                     srb_match: bool = True) -> RobotParams:
    """RobotParams with the articulated model attached (RobotParams.art).

    ``srb_match=True`` also replaces the controller's SRB model constants
    (body_mass / body_inertia) with the articulated model's composite
    values at the stand pose (srb_equivalent): the reference's tuned
    constants describe an 18.1 kg Aliengo while the URDF plant weighs
    24.9 kg — an MPC that underestimates the robot's weight by 27%
    commands too little stance force and the plant collapses (the
    reference got away with it because PhysX + its inflated z-weight
    feedback absorbed the offset; our penalty contacts do not)."""
    art = for_robot(name, armature)
    params = params._replace(art=art)
    if srb_match:
        import numpy as np
        q_stand = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)
        m_tot, i_com, _ = srb_equivalent(art, q_stand)
        params = params._replace(
            body_mass=jnp.float32(m_tot),
            body_inertia=jnp.asarray(np.asarray(i_com), jnp.float32))
    return params


def srb_equivalent(art: ArticulatedParams, q):
    """Composite-rigid-body reduction of the articulated model at pose q:
    (total mass, inertia about the composite COM, COM offset in trunk
    frame) — the exact SRB the MPC's model assumes (mpc_osqp.cc's
    mass/inertia inputs)."""
    kin = leg_kinematics(art, q)
    masses = [art.trunk_mass] + [art.link_mass[leg, i]
                                 for leg in range(4) for i in range(3)]
    coms = [art.trunk_com] + [kin["com"][leg, i]
                              for leg in range(4) for i in range(3)]
    eye3 = jnp.eye(3, dtype=jnp.float32)
    inertias = [art.trunk_inertia]
    for leg in range(4):
        for i in range(3):
            r = kin["R"][leg, i]
            inertias.append(r @ art.link_inertia[leg, i] @ r.T)
    m_tot = sum(masses)
    com = sum(m * c for m, c in zip(masses, coms)) / m_tot
    i_com = sum(
        ine + m * (jnp.dot(c - com, c - com) * eye3
                   - jnp.outer(c - com, c - com))
        for m, c, ine in zip(masses, coms, inertias))
    return m_tot, i_com, com


# ---------------------------------------------------------------------------
# kinematics + mass matrix (trunk frame)
# ---------------------------------------------------------------------------

def _axis_rot(axis, angle):
    """Rotation about an arbitrary unit axis (Rodrigues)."""
    k = axis / jnp.linalg.norm(axis)
    kx = jnp.stack([jnp.stack([0.0 * k[0], -k[2], k[1]]),
                    jnp.stack([k[2], 0.0 * k[0], -k[0]]),
                    jnp.stack([-k[1], k[0], 0.0 * k[0]])])
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=kx.dtype) + s * kx + (1.0 - c) * (kx @ kx)


def leg_kinematics(art: ArticulatedParams, q):
    """Per-leg chains in the trunk frame. q (12,) in (leg, joint) order.

    Returns dict with per-link frame rotations R (4,3,3,3), joint
    positions o (4,3,3), joint axes a (4,3,3) (trunk frame), link COM
    positions com (4,3,3), and foot positions (4,3).
    """
    qr = q.reshape(4, 3)

    def one_leg(jo, ax, qleg, com_l, foot_off):
        r0 = _axis_rot(ax[0], qleg[0])
        o0 = jo[0]
        a0 = ax[0]                       # axis in trunk frame (joint 0)
        o1 = o0 + r0 @ jo[1]
        a1 = r0 @ ax[1]
        r1 = r0 @ _axis_rot(ax[1], qleg[1])
        o2 = o1 + r1 @ jo[2]
        a2 = r1 @ ax[2]
        r2 = r1 @ _axis_rot(ax[2], qleg[2])
        rs = jnp.stack([r0, r1, r2])
        os_ = jnp.stack([o0, o1, o2])
        as_ = jnp.stack([a0, a1, a2])
        coms = os_ + jnp.einsum("lij,lj->li", rs, com_l)
        foot = o2 + r2 @ foot_off
        return rs, os_, as_, coms, foot

    rs, os_, as_, coms, foot = jax.vmap(one_leg)(
        art.joint_origin, art.joint_axis, qr, art.link_com,
        art.foot_offset)
    return {"R": rs, "o": os_, "a": as_, "com": coms, "foot": foot}


def _skew(v):
    z = 0.0 * v[0]
    return jnp.stack([jnp.stack([z, -v[2], v[1]]),
                      jnp.stack([v[2], z, -v[0]]),
                      jnp.stack([-v[1], v[0], z])])


def point_jacobian(kin, leg: int, upto: int, p):
    """3x18 linear-velocity Jacobian (trunk frame) of point p attached to
    link ``upto`` of ``leg``: v_p = Jv @ u, u = (v_b, omega_b, qd)."""
    dt_ = p.dtype
    cols = jnp.zeros((3, 12), dt_)
    for j in range(upto + 1):
        col = jnp.cross(kin["a"][leg, j], p - kin["o"][leg, j])
        cols = cols.at[:, leg * 3 + j].set(col)
    return jnp.concatenate(
        [jnp.eye(3, dtype=dt_), -_skew(p), cols], axis=1)


def mass_matrix(art: ArticulatedParams, q):
    """H(q) (18,18): trunk-frame composite over 13 bodies + armature."""
    kin = leg_kinematics(art, q)
    dt_ = q.dtype
    eye3 = jnp.eye(3, dtype=dt_)

    # trunk block
    jv = jnp.concatenate([eye3, -_skew(art.trunk_com.astype(dt_)),
                          jnp.zeros((3, 12), dt_)], axis=1)
    jw = jnp.concatenate([jnp.zeros((3, 3), dt_), eye3,
                          jnp.zeros((3, 12), dt_)], axis=1)
    h = (art.trunk_mass * jv.T @ jv
         + jw.T @ art.trunk_inertia @ jw)

    for leg in range(4):
        for i in range(3):
            p = kin["com"][leg, i]
            jv = point_jacobian(kin, leg, i, p)
            # angular jacobian of link i
            wcols = jnp.zeros((3, 12), dt_)
            for j in range(i + 1):
                wcols = wcols.at[:, leg * 3 + j].set(kin["a"][leg, j])
            jw = jnp.concatenate(
                [jnp.zeros((3, 3), dt_),
                 eye3, wcols], axis=1)
            r = kin["R"][leg, i]
            iw = r @ art.link_inertia[leg, i] @ r.T
            h = h + art.link_mass[leg, i] * jv.T @ jv + jw.T @ iw @ jw
    # reflected rotor inertia on the joint diagonal
    arm = jnp.concatenate([jnp.zeros(6, dt_),
                           jnp.full(12, art.armature, dt_)])
    return h + jnp.diag(arm)


def _kinetic(art, q, u):
    return 0.5 * u @ mass_matrix(art, q) @ u


def dynamics_rhs(art: ArticulatedParams, q, u, q_forces):
    """H du/dt = rhs; returns (H, rhs) for the Euler-Poincare equations.

    q_forces (18,): generalized applied forces in trunk frame (gravity,
    contacts, motor torques), EXCLUDING the bias terms computed here.
    """
    h_mat = mass_matrix(art, q)
    hu = h_mat @ u
    qd = u[6:]
    _, hdot_u = jax.jvp(lambda qq: mass_matrix(art, qq) @ u, (q,), (qd,))
    dtdq = jax.grad(_kinetic, argnums=1)(art, q, u)
    v, w = u[0:3], u[3:6]
    bias = jnp.concatenate([
        jnp.cross(w, hu[0:3]),
        jnp.cross(w, hu[3:6]) + jnp.cross(v, hu[0:3]),
        jnp.zeros(12, u.dtype)])
    rhs = q_forces - hdot_u - bias + jnp.concatenate(
        [jnp.zeros(6, u.dtype), dtdq])
    return h_mat, rhs


# ---------------------------------------------------------------------------
# substep (plugs into sim.physics.step via PhysicsConfig.articulated)
# ---------------------------------------------------------------------------

def substep(params: RobotParams, cfg, ter, state, tau):
    """One articulated substep, semi-implicit Euler with implicit joint
    damping: (H + dt D) u_new = H u + dt (Q + bias terms).

    Same signature/returns as physics.substep.
    """
    from . import physics  # shared contact model / state type

    art: ArticulatedParams = params.art
    assert art is not None, "RobotParams.art missing - use with_articulated"
    dt = cfg.dt
    tau = jnp.clip(tau, -cfg.tau_limit, cfg.tau_limit)

    r_wb = rot.quat_to_rot(state.quat).T    # body->world
    r_bw = r_wb.T
    kin = leg_kinematics(art, state.q)

    u = jnp.concatenate([r_bw @ state.v, r_bw @ state.omega, state.qd])

    # ---- contacts at the feet (world-frame penalty, shared model) ------
    foot_b = kin["foot"]                                  # (4,3) trunk
    foot_w = state.pos[None, :] + foot_b @ r_wb.T
    jv_feet = jnp.stack([point_jacobian(kin, leg, 2, foot_b[leg])
                         for leg in range(4)])            # (4,3,18)
    v_foot_b = jnp.einsum("lij,j->li", jv_feet, u)
    v_foot_w = v_foot_b @ r_wb.T
    f_contact, in_contact, anchor = physics._contact_force(
        cfg, ter, foot_w, v_foot_w, state.anchor, state.contact)
    f_b = f_contact @ r_wb                                # world->body

    # ---- generalized forces -------------------------------------------
    g_b = r_bw @ jnp.array([0.0, 0.0, -physics.GRAVITY], jnp.float32)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    jv_trunk = jnp.concatenate([eye3, -_skew(art.trunk_com),
                                jnp.zeros((3, 12), jnp.float32)], axis=1)
    q_forces = art.trunk_mass * (jv_trunk.T @ g_b)
    for leg in range(4):
        for i in range(3):
            jv = point_jacobian(kin, leg, i, kin["com"][leg, i])
            q_forces = q_forces + art.link_mass[leg, i] * (jv.T @ g_b)
        q_forces = q_forces + jv_feet[leg].T @ f_b[leg]
    tau_j = tau - cfg.joint_friction * jnp.tanh(state.qd * 10.0)
    q_forces = q_forces + jnp.concatenate(
        [jnp.zeros(6, jnp.float32), tau_j])

    # ---- solve + integrate --------------------------------------------
    h_mat, rhs = dynamics_rhs(art, state.q, u, q_forces)
    d_diag = jnp.concatenate([jnp.zeros(6, jnp.float32),
                              jnp.full(12, cfg.joint_damping, jnp.float32)])
    lhs = h_mat + dt * jnp.diag(d_diag)
    # rhs already holds Q - bias; damping enters implicitly on the left.
    # Solve for the INCREMENT, not u_new: (H + dtD)(u + du) = Hu + dt rhs
    # => du = (H + dtD)^-1 dt (rhs - D u). In f32, solving for u_new
    # directly injects a cond(H)*eps relative error on the FULL |u| every
    # substep (H spans trunk mass ~12 kg to link inertias ~3e-4 kg m^2);
    # on the increment the same relative error scales with dt and
    # vanishes under refinement (momentum-conservation test caught this).
    du = jnp.linalg.solve(lhs, dt * (rhs - d_diag * u))
    u_new = u + du

    # quat first (with the old-frame omega; O(dt^2) indifferent) ...
    w_w0 = r_wb @ u_new[3:6]
    ow = jnp.concatenate([jnp.zeros(1, jnp.float32), w_w0])
    qw, qx, qy, qz = state.quat
    w0, x, y, z = ow[0], ow[1], ow[2], ow[3]
    dq = 0.5 * jnp.stack([
        w0 * qw - x * qx - y * qy - z * qz,
        w0 * qx + x * qw + y * qz - z * qy,
        w0 * qy - x * qz + y * qw + z * qx,
        w0 * qz + x * qy - y * qx + z * qw,
    ])
    quat = state.quat + dt * dq
    quat = quat / jnp.linalg.norm(quat)

    # ... then world velocities with the NEW orientation: the
    # Euler-Poincare derivative is intrinsic to the rotating frame, so
    # u_new's components live in the frame at t+dt. Converting with the
    # OLD R drops the frame-rotation part — a systematic (dt-independent
    # over a fixed horizon) momentum leak of exactly -M int(omega x v) dt
    # that the free-fall momentum test caught.
    r_wb_new = rot.quat_to_rot(quat).T
    v_w = r_wb_new @ u_new[0:3]
    w_w = r_wb_new @ u_new[3:6]
    pos = state.pos + dt * v_w

    qd_new = u_new[6:]
    q_new = jnp.clip(state.q + dt * qd_new, cfg.q_min, cfg.q_max)

    new_state = state._replace(pos=pos, quat=quat, v=v_w, omega=w_w,
                               q=q_new, qd=qd_new, anchor=anchor,
                               contact=in_contact)
    return new_state, f_contact, in_contact
