"""Convex-MPC locomotion planner as a pure jittable step function.

Port of convex_MPC/ConvexMPCLocomotion.py (+ the native solver invocation,
mpc_osqp.cc:578-948) re-designed TPU-first:

- all mutable planner state lives in ``LocomotionState`` (a pytree),
- the per-leg Python loops are vectorized over the 4-leg axis,
- the MPC solve is gated by ``lax.cond`` on a *scalar* schedule flag so that
  under vmap the expensive QP only runs on solve ticks (per-robot counters
  additionally mask the update),
- the QP itself is the batched ADMM in ops.qp.

Statement ordering follows ConvexMPCLocomotion.run (:222-378) exactly,
including its quirks that matter for trace parity:
- pFoot is computed with the *previous* tick's CoM height, while foot
  placement uses the height updated this tick (:248-268 vs :295),
- the y foot-placement feedback has an extra dtMPC factor (:302 vs :298),
- the desired z velocity is zero and z position held (:656,646),
- stance legs reuse the last computed swing-trajectory sample (:354-355).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.robots import RobotParams
from ..ops import bezier, gait
from ..ops import qp as qp_mod
from ..ops import rotations as rot
from ..ops import srb_dynamics as srb
from ..ops.leg_kinematics import SIDE_SIGN, hip_locations
from . import state_estimator
from .types import (ControlConfig, EstimatorState, LegCommands, LegData,
                    LocomotionState, StateEstimate, zero_leg_commands)

# Cartesian swing gains, ConvexMPCLocomotion.py:82-85
KP_SWING = jnp.diag(jnp.array([700.0, 700.0, 150.0], jnp.float32))
KD_SWING = jnp.diag(jnp.array([7.0, 7.0, 7.0], jnp.float32))


class LocoStepResult(NamedTuple):
    loco: LocomotionState
    est: EstimatorState
    commands: LegCommands
    metrics: dict


def _solve_mpc(params: RobotParams, cfg: ControlConfig, se: StateEstimate,
               com_z, foot_positions, mpc_table, weights, commands,
               qp_state: qp_mod.QPState):
    """One dense MPC solve. ConvexMPCLocomotion.solveDenseMPC (:128-215) +
    mpc_osqp.cc ComputeContactForces (:578-948)."""
    horizon = cfg.horizon
    if cfg.flat_ground:
        gravity_vec = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    else:
        gravity_vec = se.ground_normal_yaw

    com_rpy = se.rpy_body
    com_position = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), com_z])
    com_omega = se.omega_body
    com_vel = se.v_body

    desired_position = jnp.stack([0.0 * com_z, 0.0 * com_z, params.body_height])
    desired_velocity = jnp.stack([commands[0], commands[1], jnp.float32(0.0)])
    desired_rpy = jnp.zeros(3, jnp.float32)
    desired_omega = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), commands[2]])

    # Foot positions rotated to world by Rx(r)Ry(p)Rz(y) — the (nonstandard)
    # order the native solver uses for feet (mpc_osqp.cc:606-617), distinct
    # from ConvertRpyToRot's Rz Ry Rx used for the inertia (:283-291,669).
    r_feet = (rot.rot_x(com_rpy[0]).T @ rot.rot_y(com_rpy[1]).T
              @ rot.rot_z(com_rpy[2]).T)
    foot_world = foot_positions @ r_feet.T

    rotation = rot.rpy_to_rot(com_rpy).T  # active Rz Ry Rx
    inv_inertia = jnp.linalg.inv(params.body_inertia)
    inv_inertia_world = rotation @ inv_inertia @ rotation.T

    a_mat = srb.build_a_mat(com_rpy, gravity_vec)
    b_mat = srb.build_b_mat(1.0 / params.body_mass, inv_inertia_world,
                            foot_world)
    a_exp, b_exp = srb.discretize_exact(a_mat, b_mat, cfg.dt_mpc)
    # chain-form condensation: B_qp is never materialized; the Hessian is
    # built from the A^k B chain inside the fused Pallas kernel (or by
    # hessian_from_chain on the XLA path) — equals the dense condense +
    # build_qp_cost to f32 precision (srb.condense_chain docstring)
    a_qp, s_chain = srb.condense_chain(a_exp, b_exp, horizon)

    x0 = srb.build_state_vec(com_rpy, com_position, com_omega, com_vel)
    x_des = srb.build_desired_states(com_rpy, com_position, desired_position,
                                     desired_velocity, desired_rpy,
                                     desired_omega, cfg.dt_mpc, horizon)
    q_vec = srb.gradient_from_chain(s_chain, a_qp, x0, x_des, weights,
                                    horizon)

    mu = params.friction_coeff
    lb, ub = srb.constraint_bounds(mpc_table, params.body_mass, mu, horizon)
    # swing-variable mask (mask_swing_variables) is applied inside solve_qp
    # — fused into the Pallas kernel on the batched path
    mask = jnp.repeat(mpc_table.reshape(-1), 3)
    c_blocks = jnp.tile(srb.friction_cone_block(mu)[None],
                        (horizon * 4, 1, 1))

    # receding-horizon warm-start shift: this solve's horizon is the
    # previous one advanced by one gait segment (ops/qp.shift_warm_start)
    qp_state = qp_mod.shift_warm_start(qp_state, horizon)
    x, new_qp_state, diag = qp_mod.solve_qp_chain(
        s_chain, q_vec, weights, cfg.alpha, c_blocks, lb, ub, qp_state,
        cfg.qp, mask=mask, horizon=horizon)
    # sign flip: solver variable is GRF on the body; f_ff is foot-on-ground
    # (mpc_osqp.cc:789-790, 940-942)
    f_ff = -x[:12].reshape(4, 3)

    # MPC loss decomposition for telemetry (ConvexMPCLocomotion.py:192-215
    # incl. its omega-vs-linear-velocity pairing in the third term)
    state_loss = (jnp.dot(com_rpy - desired_rpy, weights[0:3])
                  + jnp.dot(com_position - desired_position, weights[3:6])
                  + jnp.dot(com_omega - desired_velocity, weights[6:9])
                  + jnp.dot(com_vel - desired_velocity, weights[9:12]))
    torque_loss = cfg.alpha * jnp.sum(-x[:12])
    diag = dict(diag)
    diag["mpc_loss"] = state_loss + torque_loss
    return f_ff, new_qp_state, diag


def step(params: RobotParams, cfg: ControlConfig, loco: LocomotionState,
         est: EstimatorState, se: StateEstimate, leg_data: LegData,
         commands, weights, gait_id,
         solve_gate: Optional[jnp.ndarray] = None):
    """One 100 Hz locomotion tick. ConvexMPCLocomotion.run (:222-378).

    Args:
      commands: (3,) [vx_des, vy_des, yaw_rate_des].
      weights: (13,) MPC weights (robot default or policy output + [0]).
      gait_id: () int32 gait selector.
      solve_gate: optional *scalar* bool marking ticks on which the QP may
        run (keep it unbatched under vmap so lax.cond stays a true branch).
        None = solve whenever the per-robot counter says so.
    Returns:
      (new_loco, new_est, LegCommands, metrics)
    """
    with jax.default_matmul_precision("float32"):
        return _step_impl(params, cfg, loco, est, se, leg_data, commands,
                          weights, gait_id, solve_gate)


def _step_impl(params: RobotParams, cfg: ControlConfig, loco: LocomotionState,
               est: EstimatorState, se: StateEstimate, leg_data: LegData,
               commands, weights, gait_id,
               solve_gate: Optional[jnp.ndarray] = None):
    offsets, durations = gait.gait_params(gait_id)
    ipm = cfg.iterations_between_mpc
    dt_mpc = cfg.dt_mpc

    iteration, phase = gait.gait_iteration_phase(loco.iteration_counter, ipm)

    hips = hip_locations(params.abad_location)
    foot_positions = hips + leg_data.p                      # (4,3) body frame
    p_foot = foot_positions + se.position[None, :]          # uses OLD com_z

    # --- first-run initialization (:257-263, StateEstimator.py:99-101) ---
    first = loco.first_run
    est = est._replace(foot_contact_history=jnp.where(
        first, foot_positions.at[:, 2].set(-params.body_height),
        est.foot_contact_history))
    p0 = jnp.where(first, p_foot, loco.p0)
    pf = jnp.where(first, p_foot, loco.pf)

    # --- terrain / CoM estimate (:265-268) ---
    if cfg.flat_ground:
        est = state_estimator.update_flat_ground(est, se, foot_positions)
    else:
        est = state_estimator.update_ground_estimate(est, se, foot_positions)
    position = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), est.com_z])

    # --- swing timing and foot placement (:271-311) ---
    swing_times = gait.swing_time(durations, dt_mpc)        # (4,)
    stance_times = gait.stance_time(durations, dt_mpc)      # (4,)
    swing_remaining = jnp.where(loco.first_swing, swing_times,
                                loco.swing_time_remaining - cfg.dt)

    v_des_robot = jnp.stack([commands[0], commands[1], jnp.float32(0.0)])
    swing_height = params.body_height / 3.0                  # :287

    offset_y = SIDE_SIGN * params.abad_link_length
    p_robot = hips + jnp.stack([jnp.zeros(4), offset_y, jnp.zeros(4)], axis=1)
    # per-leg yaw correction Rz(-yaw_rate * stance/2) (:292-293)
    yaw_corr = jax.vmap(lambda st, p: rot.rot_z(-commands[2] * st / 2.0) @ p)(
        stance_times, p_robot)
    pf_new = position[None, :] + yaw_corr + v_des_robot[None, :] * \
        swing_remaining[:, None]

    p_rel_max = 0.3
    vx, vy = se.v_body[0], se.v_body[1]
    pfx_rel = vx * (0.5 + cfg.bonus_swing) * stance_times + \
        0.03 * (vx - v_des_robot[0]) + \
        (0.5 * position[2] / 9.81) * (vy * commands[2])
    # NOTE: reference multiplies the y term by an extra dtMPC (:302)
    pfy_rel = vy * 0.5 * stance_times * dt_mpc + \
        0.03 * (vy - v_des_robot[1]) + \
        (0.5 * position[2] / 9.81) * (-vx * commands[2])
    pfx_rel = jnp.clip(pfx_rel, -p_rel_max, p_rel_max)
    pfy_rel = jnp.clip(pfy_rel, -p_rel_max, p_rel_max)
    pf_new = pf_new.at[:, 0].add(pfx_rel)
    pf_new = pf_new.at[:, 1].add(pfy_rel)
    pf_new = pf_new.at[:, 2].set(-0.003)                     # :310
    pf = pf_new

    # --- counter increment + gait tables (:314-319) ---
    counter_new = loco.iteration_counter + 1
    contact_states = gait.contact_state(phase, offsets, durations)
    swing_states = gait.swing_state(phase, offsets, durations)
    mpc_tbl = gait.mpc_table(iteration, offsets, durations)   # (h, 4)

    # --- MPC solve every iterations_between_mpc ticks (:217-220) ---
    want_solve = (counter_new % ipm) == 0
    gate = want_solve if solve_gate is None else jnp.logical_and(
        solve_gate, want_solve)

    def do_solve(operand):
        est_, qp_state = operand
        return _solve_mpc(params, cfg, se, est_.com_z, foot_positions,
                          mpc_tbl, weights, commands, qp_state)

    def skip_solve(operand):
        _, qp_state = operand
        return loco.f_ff, qp_state, {
            "primal_violation": jnp.float32(0.0),
            "pri_res": jnp.float32(0.0),
            "dua_res": jnp.float32(0.0),
            "mpc_loss": jnp.float32(0.0)}

    f_ff, qp_state, qp_diag = jax.lax.cond(
        gate if solve_gate is None else solve_gate,
        do_solve, skip_solve, (est, loco.qp_state))

    # divergence fallback: a solve whose worst constraint violation exceeds
    # the tolerance holds the previous forces and cold-starts the next solve
    # (the reference's unhandled empty-vector case, mpc_osqp.cc:791-794).
    # The deferred-rho memory is RETAINED through the fallback: resetting
    # rho_mult to 1.0 re-triggered the very stall (A1's rho far from 1)
    # that caused the divergence, producing divergence bursts (r4 A1
    # campaign telemetry: qp_diverged_frac 2.6%).
    diverged = qp_diag["primal_violation"] > cfg.qp_divergence_tol
    f_ff = jnp.where(diverged, loco.f_ff, f_ff)
    cold = qp_mod.init_qp_state(cfg.horizon * 12, cfg.horizon * 20)
    cold = cold._replace(rho_mult=qp_state.rho_mult)
    qp_state = jax.tree.map(
        lambda c, cur: jnp.where(diverged, c, cur), cold, qp_state)

    if solve_gate is not None:
        # scalar gate ran the solve; per-robot counters mask the commit
        f_ff = jnp.where(want_solve, f_ff, loco.f_ff)
        qp_state = jax.tree.map(
            lambda new, old: jnp.where(want_solve, new, old),
            qp_state, loco.qp_state)

    # --- per-leg swing/stance command writing (:324-378) ---
    in_swing = swing_states > 0
    start_swing = jnp.logical_and(in_swing, loco.first_swing)
    p0 = jnp.where(start_swing[:, None], p_foot, p0)

    swing_p, swing_v, _ = jax.vmap(bezier.swing_trajectory,
                                   in_axes=(0, 0, None, 0, 0))(
        p0, pf, swing_height, swing_states, swing_times)
    # stance legs reuse the last computed sample (:354-355)
    p_des_foot = jnp.where(in_swing[:, None], swing_p, loco.swing_memory[0])
    v_des_foot = jnp.where(in_swing[:, None], swing_v, loco.swing_memory[1])
    new_swing_memory = jnp.stack([p_des_foot, v_des_foot])

    p_des_leg = p_des_foot - position[None, :] - hips
    v_des_leg = v_des_foot - se.v_body[None, :]

    kp_cart = jnp.where(in_swing[:, None, None], KP_SWING[None], 0.0)
    kd_cart = jnp.broadcast_to(KD_SWING[None], (4, 3, 3))
    force_ff = jnp.where(in_swing[:, None], 0.0, f_ff)
    kd_joint = jnp.where(in_swing[:, None, None], 0.0,
                         jnp.eye(3, dtype=jnp.float32)[None] * 0.2)

    cmds = zero_leg_commands()._replace(
        p_des=p_des_leg, v_des=v_des_leg, kp_cart=kp_cart, kd_cart=kd_cart,
        force_ff=force_ff, kd_joint=kd_joint)

    # swing legs have consumed their first-swing init; stance legs re-arm
    # (:330-331, :353)
    first_swing_new = jnp.logical_not(in_swing)
    se_contact = jnp.where(in_swing, 0.0, contact_states)
    est = est._replace(contact_phase=se_contact)

    new_loco = LocomotionState(
        iteration_counter=counter_new,
        first_run=jnp.bool_(False),
        first_swing=first_swing_new,
        swing_time_remaining=swing_remaining,
        p0=p0, pf=pf, f_ff=f_ff, swing_memory=new_swing_memory,
        qp_state=qp_state)

    metrics = {
        "contact_states": contact_states,
        "swing_states": swing_states,
        "f_ff": f_ff,
        "com_z": est.com_z,
        "qp_primal_violation": qp_diag["primal_violation"],
        "qp_diverged": diverged,
        # per-solve OSQP relative residuals (0 on non-solve ticks) — the
        # convergence-margin telemetry for the fixed 40-iteration budget
        "qp_pri_res": qp_diag["pri_res"],
        "qp_dua_res": qp_diag["dua_res"],
        "mpc_loss": qp_diag["mpc_loss"],
    }
    return new_loco, est, cmds, metrics
