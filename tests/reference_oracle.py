"""NumPy float64 oracle of the reference Min-mode control tick.

A deliberately *scalar, loop-based* reimplementation of the reference
semantics (RobotRunnerMin.run -> LegController/StateEstimator/
ConvexMPCLocomotion.run -> mpc_osqp.cc), with the QP solved exactly by
scipy. Used to validate the vectorized f32 JAX stack trace-by-trace.

Covers the flat-ground path (Parameters.flat_ground=True) and the
non-flat path: contact-history plane-fit ground normal (StateEstimator.py:
120-144) feeding the slope-aware gravity column (mpc_osqp.cc:299-322).
"""
from __future__ import annotations

import numpy as np
from scipy.linalg import expm
from scipy.optimize import LinearConstraint, minimize
from scipy.spatial.transform import Rotation

SIDE_SIGN = [1, -1, 1, -1]
GRAVITY = 9.8


class OracleRobot:
    def __init__(self):
        # Aliengo (Quadruped.py:16-36)
        self.abad = 0.083
        self.hip = 0.25
        self.knee = 0.25
        self.abad_loc = np.array([0.2399, 0.051, 0.0])
        self.mass = 9.041 * 2
        self.inertia = np.diag([0.033260231, 0.16117211, 0.17460442])
        self.height = 0.35
        self.mu = 0.4
        self.weights = np.array([1.0, 1.5, 0.0, 0.0, 0.0, 50, 0.0, 0.0, 0.1,
                                 1.0, 1.0, 0.1, 0.0])

    def hip_location(self, leg):
        ax, ay, az = self.abad_loc
        return np.array([ax if leg < 2 else -ax,
                         ay if leg % 2 == 0 else -ay, az])


def leg_fk(robot, q, leg):
    dy = robot.abad * SIDE_SIGN[leg]
    dz1, dz2 = -robot.hip, -robot.knee
    s1, s2, s3 = np.sin(q)
    c1, c2, c3 = np.cos(q)
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    p = np.array([dz2 * s23 + dz1 * s2,
                  dy * c1 - dz1 * c2 * s1 - dz2 * s1 * c23,
                  dy * s1 + dz1 * c1 * c2 + dz2 * c1 * c23])
    J = np.array([
        [0.0, dz2 * c23 + dz1 * c2, dz2 * c23],
        [-dy * s1 - dz2 * c1 * c23 - dz1 * c1 * c2,
         dz2 * s1 * s23 + dz1 * s1 * s2, dz2 * s1 * s23],
        [-dz2 * s1 * c23 + dy * c1 - dz1 * c2 * s1,
         -dz2 * c1 * s23 - dz1 * c1 * s2, -dz2 * c1 * s23]])
    return p, J


def quat_to_rot_ref(q_wxyz):
    """orientation_tools.quat_to_rot: world->body transform."""
    w, x, y, z = q_wxyz
    return Rotation.from_quat([x, y, z, w]).as_matrix().T


def quat_to_rpy_ref(q_wxyz):
    w, x, y, z = q_wxyz
    as_ = min(-2 * (x * z - w * y), 0.99999)
    return np.array([
        np.arctan2(2 * (y * z + w * x), w * w - x * x - y * y + z * z),
        np.arcsin(as_),
        np.arctan2(2 * (x * y + w * z), w * w + x * x - y * y - z * z)])


def rot_z_coord(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])


def rot_from_normals_np(world_normal, ground_normal):
    """Normal-alignment rotation — matches ops/rotations.rot_from_normals
    (normalized Rodrigues axis; the documented deviation from the
    reference's unnormalized orientation_tools.py:89-95)."""
    axis = np.cross(world_normal, ground_normal)
    norm = np.linalg.norm(axis)
    axis = axis / max(norm, 1e-8)
    theta = np.arccos(np.clip(np.dot(world_normal, ground_normal), -1, 1))
    c, s = np.cos(theta), np.sin(theta)
    v = 1.0 - c
    k = axis
    m = np.array([
        [k[0] * k[0] * v + c, k[0] * k[1] * v - k[2] * s,
         k[0] * k[2] * v + k[1] * s],
        [k[0] * k[1] * v + k[2] * s, k[1] * k[1] * v + c,
         k[1] * k[2] * v - k[0] * s],
        [k[0] * k[2] * v - k[1] * s, k[1] * k[2] * v + k[0] * s,
         k[2] * k[2] * v + c]])
    return m.T  # coordinate-transform convention


def cubic_bezier(y0, yf, x):
    return y0 + (x ** 3 + 3 * x ** 2 * (1 - x)) * (yf - y0)


def cubic_bezier_d1(y0, yf, x):
    return 6 * x * (1 - x) * (yf - y0)


class OracleGait:
    """OffsetDurationGait for trot (ConvexMPCLocomotion.py:30-32)."""

    def __init__(self, n=10, offsets=(0, 5, 5, 0), durations=(5, 5, 5, 5)):
        self.n = n
        self.offsets = np.array(offsets, float)
        self.durations = np.array(durations, float)

    def set_iterations(self, ipm, counter):
        self.iteration = (counter / ipm) % self.n
        self.phase = (counter % (ipm * self.n)) / (ipm * self.n)

    def contact_state(self):
        out = np.zeros(4)
        for i in range(4):
            p = self.phase - self.offsets[i] / self.n
            if p < 0:
                p += 1
            d = self.durations[i] / self.n
            out[i] = 0.0 if p > d else p / d
        return out

    def swing_state(self):
        out = np.zeros(4)
        for i in range(4):
            so = (self.offsets[i] + self.durations[i]) / self.n
            if so > 1:
                so -= 1
            sd = 1 - self.durations[i] / self.n
            p = self.phase - so
            if p < 0:
                p += 1
            out[i] = 0.0 if (p > sd or sd == 0) else p / sd
        return out

    def mpc_table(self):
        t = np.zeros((self.n, 4))
        for i in range(self.n):
            it = (i + self.iteration + 1) % self.n
            for j in range(4):
                p = it - self.offsets[j]
                if p < 0:
                    p += self.n
                t[i, j] = 1.0 if p < self.durations[j] else 0.0
        return t

    def swing_time(self, dt_mpc):
        return dt_mpc * (self.n - self.durations[0])

    def stance_time(self, dt_mpc):
        return dt_mpc * self.durations[0]


def solve_qp_scipy(P, q, C, lb, ub, mask=None):
    """Exact solve; swing variables/rows eliminated first (the qpOASES
    reduction, mpc_osqp.cc:832-904) so trust-constr never sees the
    degenerate 0=0 equality rows."""
    n = P.shape[0]
    if mask is not None:
        keep = mask > 0.5
        rows = np.repeat(keep.reshape(-1, 3)[:, 0], 5)
        Pr, qr = P[np.ix_(keep, keep)], q[keep]
        Cr, lbr, ubr = C[np.ix_(rows, keep)], lb[rows], ub[rows]
    else:
        keep = np.ones(n, bool)
        Pr, qr, Cr, lbr, ubr = P, q, C, lb, ub
    res = minimize(lambda x: 0.5 * x @ Pr @ x + qr @ x, np.zeros(Pr.shape[0]),
                   jac=lambda x: Pr @ x + qr, hess=lambda x: Pr,
                   method="trust-constr",
                   constraints=[LinearConstraint(Cr, lbr, ubr)],
                   options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 3000})
    x = np.zeros(n)
    x[keep] = res.x
    return x


class OracleController:
    """Min-mode controller, flat ground; gait defaults to trot.

    ``gait``: optional (offsets, durations) in MPC segments — the
    ConvexMPCLocomotion.py:30-56 tables (e.g. bound (5,5,0,0)/(4,4,4,4),
    walk (0,3,5,8)/(5,5,5,5))."""

    def __init__(self, dt=0.01, ipm=2, horizon=10, alpha=1e-5, gait=None,
                 flat_ground=True):
        self.robot = OracleRobot()
        self.dt, self.ipm, self.h, self.alpha = dt, ipm, horizon, alpha
        self.dt_mpc = dt * ipm
        self.gait = OracleGait() if gait is None else OracleGait(
            offsets=gait[0], durations=gait[1])
        self.flat_ground = flat_ground
        # non-flat state (StateEstimator.py:99-144 equivalents)
        self.ground_normal_yaw = np.array([0.0, 0.0, 1.0])
        self.foot_contact_history = np.zeros((4, 3))
        self.counter = 0
        self.first_run = True
        self.first_swing = [True] * 4
        self.swing_remaining = np.zeros(4)
        self.p0 = np.zeros((4, 3))
        self.pf = np.zeros((4, 3))
        self.f_ff = np.zeros((4, 3))
        self.swing_p = np.zeros((4, 3))
        self.swing_v = np.zeros((4, 3))
        self.contact_phase = np.zeros(4)
        self.com_z = self.robot.height

    # --- state estimator (flat ground) --------------------------------
    def estimate(self, body_state):
        quat = np.array([body_state[6], body_state[3], body_state[4],
                         body_state[5]])  # wxyz
        r_body = quat_to_rot_ref(quat)
        v_world = body_state[7:10]
        omega_world = body_state[10:13]
        rpy = quat_to_rpy_ref(quat)
        # ground_R_body = rBody @ world_R_yaw.T @ yaw_R_ground.T; on flat
        # ground the normal stays [0,0,1] so yaw_R_ground = I
        world_r_yaw = rot_z_coord(rpy[2])  # rpy_to_rot([0,0,yaw])
        yaw_r_ground = rot_from_normals_np(np.array([0.0, 0.0, 1.0]),
                                           self.ground_normal_yaw)
        ground_r_body = r_body @ world_r_yaw.T @ yaw_r_ground.T
        rpy_body = quat_to_rpy_ref(rot_to_quat_ref(ground_r_body))
        return dict(quat=quat, r_body=r_body, v_world=v_world,
                    omega_world=omega_world, v_body=r_body @ v_world,
                    omega_body=r_body @ omega_world, rpy=rpy,
                    rpy_body=rpy_body, ground_r_body=ground_r_body,
                    # snapshot: the solve uses the PRE-update normal (the
                    # StateEstimate is built before update_ground_estimate)
                    normal=self.ground_normal_yaw.copy())

    def run(self, dof_q, dof_qd, body_state, commands):
        robot = self.robot
        # LegController.updateData
        leg_p, leg_v, leg_J = [], [], []
        for leg in range(4):
            p, J = leg_fk(robot, dof_q[3 * leg:3 * leg + 3], leg)
            leg_p.append(p)
            leg_J.append(J)
            leg_v.append(J @ dof_qd[3 * leg:3 * leg + 3])
        leg_p, leg_v = np.array(leg_p), np.array(leg_v)

        se = self.estimate(body_state)
        position = np.array([0.0, 0.0, self.com_z])

        # --- ConvexMPCLocomotion.run ---
        self.gait.set_iterations(self.ipm, self.counter)
        foot_positions = np.array([robot.hip_location(i) + leg_p[i]
                                   for i in range(4)])
        p_foot = foot_positions + position

        if self.first_run:
            self.first_run = False
            for i in range(4):
                self.p0[i] = p_foot[i]
                self.pf[i] = p_foot[i]
            self.foot_contact_history = foot_positions.copy()
            self.foot_contact_history[:, 2] = -self.robot.height

        # CoM height update (StateEstimator.py:109-118)
        if self.contact_phase.sum() > 0:
            fp_ground = foot_positions @ se["ground_r_body"].T
            heights = -fp_ground[:, 2]
            self.com_z = (heights * self.contact_phase).sum() / \
                self.contact_phase.sum()
        if not self.flat_ground:
            # contact history + least-squares plane normal
            # (StateEstimator.py:120-144; effective from the NEXT tick)
            for i in range(4):
                if self.contact_phase[i] > 0:
                    self.foot_contact_history[i] = foot_positions[i]
            normal = np.linalg.pinv(self.foot_contact_history) @ np.ones(4)
            nn = np.linalg.norm(normal)
            normal = normal / nn if nn > 1e-6 else np.array([0.0, 0.0, 1.0])
            if normal[2] < 0:
                normal = -normal
            self.ground_normal_yaw = normal
        position = np.array([0.0, 0.0, self.com_z])

        swing_time = self.gait.swing_time(self.dt_mpc)
        stance_time = self.gait.stance_time(self.dt_mpc)
        v_des = np.array([commands[0], commands[1], 0.0])
        swing_height = robot.height / 3

        for i in range(4):
            if self.first_swing[i]:
                self.swing_remaining[i] = swing_time
            else:
                self.swing_remaining[i] -= self.dt
            offset = np.array([0, SIDE_SIGN[i] * robot.abad, 0])
            p_robot = robot.hip_location(i) + offset
            p_yaw = rot_z_coord(-commands[2] * stance_time / 2) @ p_robot
            pf = position + p_yaw + v_des * self.swing_remaining[i]
            vx, vy = se["v_body"][0], se["v_body"][1]
            pfx = vx * 0.5 * stance_time + 0.03 * (vx - v_des[0]) + \
                0.5 * position[2] / 9.81 * (vy * commands[2])
            pfy = vy * 0.5 * stance_time * self.dt_mpc + \
                0.03 * (vy - v_des[1]) + \
                0.5 * position[2] / 9.81 * (-vx * commands[2])
            pf[0] += np.clip(pfx, -0.3, 0.3)
            pf[1] += np.clip(pfy, -0.3, 0.3)
            pf[2] = -0.003
            self.pf[i] = pf

        self.counter += 1
        contact_states = self.gait.contact_state()
        swing_states = self.gait.swing_state()
        mpc_tbl = self.gait.mpc_table()

        if self.counter % self.ipm == 0:
            self.f_ff = self._solve_mpc(se, position, foot_positions,
                                        mpc_tbl, commands)

        cmds = []
        se_contact = np.zeros(4)
        for foot in range(4):
            cmd = dict(tau_ff=np.zeros(3), force_ff=np.zeros(3),
                       q_des=np.zeros(3), qd_des=np.zeros(3),
                       p_des=np.zeros(3), v_des=np.zeros(3),
                       kp_cart=np.zeros((3, 3)), kd_cart=np.zeros((3, 3)),
                       kp_joint=np.zeros((3, 3)), kd_joint=np.zeros((3, 3)))
            if swing_states[foot] > 0:
                if self.first_swing[foot]:
                    self.first_swing[foot] = False
                    self.p0[foot] = p_foot[foot]
                phase = swing_states[foot]
                st = swing_time
                p = cubic_bezier(self.p0[foot], self.pf[foot], phase)
                v = cubic_bezier_d1(self.p0[foot], self.pf[foot], phase) / st
                z0, zf = self.p0[foot][2], self.pf[foot][2]
                zm = z0 + swing_height
                if phase < 0.5:
                    p[2] = cubic_bezier(z0, zm, phase * 2)
                    v[2] = cubic_bezier_d1(z0, zm, phase * 2) * 2 / st
                else:
                    p[2] = cubic_bezier(zm, zf, phase * 2 - 1)
                    v[2] = cubic_bezier_d1(zm, zf, phase * 2 - 1) * 2 / st
                self.swing_p[foot], self.swing_v[foot] = p, v
                cmd["p_des"] = p - position - self.robot.hip_location(foot)
                cmd["v_des"] = v - se["v_body"]
                cmd["kp_cart"] = np.diag([700.0, 700.0, 150.0])
                cmd["kd_cart"] = np.diag([7.0, 7.0, 7.0])
            else:
                self.first_swing[foot] = True
                cmd["p_des"] = (self.swing_p[foot] - position
                                - self.robot.hip_location(foot))
                cmd["v_des"] = self.swing_v[foot] - se["v_body"]
                cmd["kd_cart"] = np.diag([7.0, 7.0, 7.0])
                cmd["force_ff"] = self.f_ff[foot]
                cmd["kd_joint"] = np.eye(3) * 0.2
                se_contact[foot] = contact_states[foot]
            cmds.append(cmd)
        self.contact_phase = se_contact

        # LegController.updateCommand
        torques = np.zeros(12)
        for leg in range(4):
            c = cmds[leg]
            foot_force = (c["force_ff"]
                          + c["kp_cart"] @ (c["p_des"] - leg_p[leg])
                          + c["kd_cart"] @ (c["v_des"] - leg_v[leg]))
            tau = c["tau_ff"] + leg_J[leg].T @ foot_force
            tau += c["kp_joint"] @ (c["q_des"] - dof_q[3 * leg:3 * leg + 3])
            tau += c["kd_joint"] @ (c["qd_des"] - dof_qd[3 * leg:3 * leg + 3])
            torques[3 * leg:3 * leg + 3] = tau
        return torques

    def _solve_mpc(self, se, position, foot_positions, mpc_tbl, commands):
        robot = self.robot
        h = self.h
        rpy = se["rpy_body"]
        x0 = np.concatenate([rpy, position, se["omega_body"], se["v_body"],
                             [-GRAVITY]])
        xd = np.zeros(h * 13)
        for i in range(h):
            t = self.dt_mpc * (i + 1)
            xd[i * 13 + 2] = rpy[2] + t * commands[2]
            xd[i * 13 + 3] = position[0] + t * commands[0]
            xd[i * 13 + 4] = position[1] + t * commands[1]
            xd[i * 13 + 5] = robot.height
            xd[i * 13 + 8] = commands[2]
            xd[i * 13 + 9] = commands[0]
            xd[i * 13 + 10] = commands[1]
            xd[i * 13 + 12] = -GRAVITY

        # A matrix; slope-aware gravity column (mpc_osqp.cc:299-322) —
        # flat ground pins the normal at [0,0,1]
        gravity_vec = (np.array([0.0, 0.0, 1.0]) if self.flat_ground
                       else se["normal"])
        a = np.zeros((13, 13))
        cy, sy = np.cos(rpy[2]), np.sin(rpy[2])
        cp, tp = np.cos(rpy[1]), np.tan(rpy[1])
        a[0:3, 6:9] = np.array([[cy / cp, sy / cp, 0], [-sy, cy, 0],
                                [cy * tp, sy * tp, 1]])
        a[3, 9] = a[4, 10] = a[5, 11] = 1
        a[9:12, 12] = gravity_vec

        # foot world: Rx Ry Rz (active), mpc_osqp.cc:606-617
        r_feet = (Rotation.from_euler("x", rpy[0]) *
                  Rotation.from_euler("y", rpy[1]) *
                  Rotation.from_euler("z", rpy[2])).as_matrix()
        foot_world = foot_positions @ r_feet.T

        rot_zyx = (Rotation.from_euler("z", rpy[2]) *
                   Rotation.from_euler("y", rpy[1]) *
                   Rotation.from_euler("x", rpy[0])).as_matrix()
        inv_inertia_world = rot_zyx @ np.linalg.inv(robot.inertia) @ rot_zyx.T

        b = np.zeros((13, 12))
        for i in range(4):
            r = foot_world[i]
            skew = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]],
                             [-r[1], r[0], 0]])
            b[6:9, 3 * i:3 * i + 3] = inv_inertia_world @ skew
            b[9, 3 * i] = b[10, 3 * i + 1] = b[11, 3 * i + 2] = 1 / robot.mass

        ab = np.zeros((25, 25))
        ab[:13, :13] = a * self.dt_mpc
        ab[:13, 13:] = b * self.dt_mpc
        e = expm(ab)
        a_exp, b_exp = e[:13, :13], e[:13, 13:]

        a_qp = np.zeros((13 * h, 13))
        a_qp[:13] = a_exp
        for i in range(1, h - 1):  # reference bug: last block stays zero
            a_qp[13 * i:13 * (i + 1)] = a_exp @ a_qp[13 * (i - 1):13 * i]
        anb = [b_exp]
        for i in range(1, h):
            anb.append(a_exp @ anb[-1])
        b_qp = np.zeros((13 * h, 12 * h))
        for i in range(h):
            b_qp[13 * i:13 * (i + 1), 12 * i:12 * (i + 1)] = b_exp
            for j in range(i):
                b_qp[13 * i:13 * (i + 1), 12 * j:12 * (j + 1)] = anb[i - j]

        qw = np.diag(np.tile(robot.weights, h))
        P = 2 * b_qp.T @ qw @ b_qp + self.alpha * np.eye(12 * h)
        q = 2 * b_qp.T @ qw @ (a_qp @ x0 - xd)

        g = np.array([[-1, 0, robot.mu], [1, 0, robot.mu], [0, -1, robot.mu],
                      [0, 1, robot.mu], [0, 0, 1.0]])
        C = np.kron(np.eye(4 * h), g)
        lb = np.zeros(20 * h)
        ub = np.zeros(20 * h)
        fzmax = robot.mass * GRAVITY * 10
        fzmin = robot.mass * GRAVITY * 0.1
        for i in range(h):
            for j in range(4):
                r = (i * 4 + j) * 5
                c = mpc_tbl[i, j]
                lb[r + 4] = fzmin * c
                ub[r:r + 4] = (robot.mu + 1) * fzmax * c
                ub[r + 4] = fzmax * c

        # variable elimination equivalent: mask swing vars
        mask = np.repeat(mpc_tbl.reshape(-1), 3)
        Pm = P * np.outer(mask, mask) + np.diag(1 - mask)
        qm = q * mask
        x = solve_qp_scipy(Pm, qm, C, lb, ub, mask)
        return -x[:12].reshape(4, 3)


PASSIVE, LOCOMOTION, RECOVERY_STAND = 0, 1, 2
STAND_UP, FOLD_LEGS, ROLL_OVER = 0, 1, 2

FOLD_JPOS = np.array([[0.0, 1.4, -2.7], [-0.0, 1.4, -2.7],
                      [0.0, 1.4, -2.7], [-0.0, 1.4, -2.7]])
STAND_JPOS = np.array([[0.0, 0.8, -1.6]] * 4)
ROLL_JPOS = np.array([[1.3, 3.1, -2.77], [0.0, 1.6, -2.77],
                      [1.3, 3.1, -2.77], [0.0, 1.6, -2.77]])


class OracleFSM:
    """Scalar oracle of the FSM-mode tick (ControlFSM.runFSM :78-138 +
    FSM_State_{Passive,RecoveryStand,Locomotion}), mirroring the reference
    semantics the vectorized control/fsm.py implements: the 2-tick
    NORMAL -> TRANSITIONING protocol (transition ticks emit zero torque),
    jointPDControl states, the 3-phase recovery ramps with their
    interpolation quirks, and the fabs-of-bool safety checks."""

    def __init__(self, dt=0.01, initial=RECOVERY_STAND):
        self.dt = dt
        self.robot = OracleRobot()
        self.loco = OracleController(dt=dt)
        self.state = initial
        # start TRANSITIONING into the initial state: the first tick runs
        # its onEnter and emits zero commands (control/types.init_fsm_state)
        self.op_mode = 1
        self.next_state = initial
        self.passive_iter = 0
        self.unsafe = False
        # recovery-stand fields
        self.rc_flag = STAND_UP
        self.rc_state_iter = 0
        self.rc_motion_start = 0
        self.rc_initial = np.zeros((4, 3))
        s = dt * 100.0
        self.it = dict(fold_ramp=int(45 / s), fold_settle=int(75 / s),
                       standup_ramp=int(30 / s), standup_settle=int(30 / s),
                       rollover_ramp=int(13 / s), rollover_settle=int(15 / s))

    # ---- helpers -------------------------------------------------------
    def _legs(self, dof_q, dof_qd):
        ps, vs, js = [], [], []
        for leg in range(4):
            p, J = leg_fk(self.robot, dof_q[3 * leg:3 * leg + 3], leg)
            ps.append(p)
            js.append(J)
            vs.append(J @ dof_qd[3 * leg:3 * leg + 3])
        return np.array(ps), np.array(vs), js

    def _safe(self, body_state, leg_p):
        quat = np.array([body_state[6], body_state[3], body_state[4],
                         body_state[5]])
        rpy = quat_to_rpy_ref(quat)
        max_rp = np.deg2rad(40.0)
        roll_bad = rpy[0] > max_rp               # fabs-of-bool quirk
        pitch_bad = abs(rpy[1]) > max_rp
        leg_above_hip = np.any(leg_p[:, 2] > 0)
        leg_y_bad = np.any(leg_p[:, 1] > 0.18)   # fabs-of-bool quirk
        return not (roll_bad or pitch_bad or leg_above_hip or leg_y_bad)

    def _upside_down(self, body_state):
        quat = np.array([body_state[6], body_state[3], body_state[4],
                         body_state[5]])
        return quat_to_rot_ref(quat)[2, 2] < 0

    def _joint_pd_tau(self, q_des, dof_q, dof_qd, kp=80.0, kd=1.0):
        tau = np.zeros(12)
        for leg in range(4):
            tau[3 * leg:3 * leg + 3] = (
                kp * (q_des[leg] - dof_q[3 * leg:3 * leg + 3])
                - kd * dof_qd[3 * leg:3 * leg + 3])
        return tau

    def _recovery_tau(self, body_state, dof_q, dof_qd):
        it = self.it
        curr = self.rc_state_iter - self.rc_motion_start
        upside = self._upside_down(body_state)

        def interp(max_iter, fin):
            b = np.clip(curr / max_iter, 0.0, 1.0)
            return (1.0 - b) * self.rc_initial + b * fin

        if self.rc_flag == STAND_UP:
            refold = curr > int(it["standup_ramp"] * 0.7) and upside
            if refold:
                tau = np.zeros(12)  # fall-through tick emits nothing
                self.rc_flag = FOLD_LEGS
                self.rc_initial = dof_q.reshape(4, 3).copy()
                self.rc_motion_start = self.rc_state_iter + 1
            else:
                tau = self._joint_pd_tau(interp(it["standup_ramp"],
                                                STAND_JPOS), dof_q, dof_qd)
        elif self.rc_flag == FOLD_LEGS:
            # interpolation uses rollover_ramp (reference quirk :211)
            tau = self._joint_pd_tau(interp(it["rollover_ramp"], FOLD_JPOS),
                                     dof_q, dof_qd)
            if curr >= it["fold_ramp"] + it["fold_settle"]:
                self.rc_flag = ROLL_OVER if upside else STAND_UP
                self.rc_initial = FOLD_JPOS.copy()
                self.rc_motion_start = self.rc_state_iter + 1
        else:  # ROLL_OVER
            tau = self._joint_pd_tau(interp(it["rollover_ramp"], ROLL_JPOS),
                                     dof_q, dof_qd)
            if curr > it["rollover_ramp"] + it["rollover_settle"]:
                self.rc_flag = FOLD_LEGS
                self.rc_initial = ROLL_JPOS.copy()
                self.rc_motion_start = self.rc_state_iter + 1
        self.rc_state_iter += 1
        return tau

    def _recovery_on_enter(self, body_state, dof_q):
        upside = self._upside_down(body_state)
        h = self.loco.com_z
        stand_ok = 0.2 < h < 0.45
        self.rc_flag = STAND_UP if (not upside and stand_ok) else FOLD_LEGS
        self.rc_state_iter = 0
        self.rc_motion_start = 0
        self.rc_initial = dof_q.reshape(4, 3).copy()

    # ---- one tick ------------------------------------------------------
    def run(self, dof_q, dof_qd, body_state, commands, control_mode):
        leg_p, leg_v, _ = self._legs(dof_q, dof_qd)
        cur = self.state

        if self.op_mode == 0:  # NORMAL: checkTransition
            safe = self._safe(body_state, leg_p)
            if cur == PASSIVE:
                req = RECOVERY_STAND if control_mode == RECOVERY_STAND \
                    else PASSIVE
            elif cur == LOCOMOTION:
                req = control_mode if safe else RECOVERY_STAND
                if not safe:
                    self.unsafe = True
            else:
                req = control_mode
            if req != cur:
                self.op_mode = 1
                self.next_state = req
                return np.zeros(12)  # detection tick: nothing runs
            # run current state
            if cur == LOCOMOTION:
                return self.loco.run(dof_q, dof_qd, body_state, commands)
            if cur == RECOVERY_STAND:
                return self._recovery_tau(body_state, dof_q, dof_qd)
            tau = np.zeros(12)
            if self.passive_iter < 10:
                tau = self._joint_pd_tau(
                    np.tile([0.0, 0.01, 0.01], (4, 1)), dof_q, dof_qd)
            self.passive_iter += 1
            return tau

        # TRANSITIONING tick: onExit/onEnter, switch, nothing runs
        if self.next_state == LOCOMOTION:
            self.loco = OracleController(dt=self.dt)   # cMPC.initialize
        elif self.next_state == RECOVERY_STAND:
            self._recovery_on_enter(body_state, dof_q)
        else:
            self.passive_iter = 0
        self.state = self.next_state
        self.op_mode = 0
        return np.zeros(12)


def rot_to_quat_ref(rot):
    """orientation_tools.rot_to_quat."""
    r = rot.T
    tr = np.trace(r)
    q = np.zeros(4)
    if tr > 0:
        S = np.sqrt(tr + 1.0) * 2
        q[:] = [0.25 * S, (r[2, 1] - r[1, 2]) / S, (r[0, 2] - r[2, 0]) / S,
                (r[1, 0] - r[0, 1]) / S]
    elif r[0, 0] > r[1, 1] and r[0, 0] > r[2, 2]:
        S = np.sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2
        q[:] = [(r[2, 1] - r[1, 2]) / S, 0.25 * S, (r[0, 1] + r[1, 0]) / S,
                (r[0, 2] + r[2, 0]) / S]
    elif r[1, 1] > r[2, 2]:
        S = np.sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2
        q[:] = [(r[0, 2] - r[2, 0]) / S, (r[0, 1] + r[1, 0]) / S, 0.25 * S,
                (r[1, 2] + r[2, 1]) / S]
    else:
        S = np.sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2
        q[:] = [(r[1, 0] - r[0, 1]) / S, (r[0, 2] + r[2, 0]) / S,
                (r[1, 2] + r[2, 1]) / S, 0.25 * S]
    return q
