"""Control FSM as data: int state + transition protocol, fully vectorized.

Port of FSM_states/ControlFSM.py (:78-138), FSM_State_Passive,
FSM_State_RecoveryStand and FSM_State_Locomotion's safety gate, with the
class-per-state design replaced by int state arrays and masked updates — the
vmap-able equivalent.

Internal state ids: 0 = PASSIVE, 1 = LOCOMOTION, 2 = RECOVERY_STAND
(reference enum values 0/4/6, utils.py:26-30).

Protocol parity (ControlFSM.runFSM): a commanded transition takes two
zero-command ticks — the detection tick (mode -> TRANSITIONING, no run) and
the transitioning tick (onExit/onEnter, no run); the new state runs from the
third tick. All reference transition() implementations complete immediately,
so the transition itself is not stretched further.

Known reference quirks reproduced (FSM_State_Locomotion.locomotionSafe,
:104-136): the roll check and the leg-y check apply fabs to a *boolean*
(``fabs(rpy[0]>deg2rad(40))``), so only the positive direction triggers; we
match that so closed-loop traces agree.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.robots import RobotParams
from . import locomotion
from .types import (ControlConfig, ControlState, FSMStateData, LegCommands,
                    LegData, StateEstimate, init_estimator_state,
                    init_locomotion_state, zero_leg_commands)

PASSIVE, LOCOMOTION, RECOVERY_STAND = 0, 1, 2
STAND_UP, FOLD_LEGS, ROLL_OVER = 0, 1, 2
MODE_NORMAL, MODE_TRANSITIONING = 0, 1

# Recovery-stand targets (FSM_State_RecoveryStand.py:36-60)
FOLD_JPOS = jnp.array([[0.0, 1.4, -2.7], [-0.0, 1.4, -2.7],
                       [0.0, 1.4, -2.7], [-0.0, 1.4, -2.7]], jnp.float32)
STAND_JPOS = jnp.array([[0.0, 0.8, -1.6]] * 4, jnp.float32)
ROLL_JPOS = jnp.array([[1.3, 3.1, -2.77], [0.0, 1.6, -2.77],
                       [1.3, 3.1, -2.77], [0.0, 1.6, -2.77]], jnp.float32)

KP_JOINT_DEFAULT = 80.0  # FSM_State.jointPDControl (:55-57)
KD_JOINT_DEFAULT = 1.0
MAX_ROLL_PITCH_RAD = 40.0 * jnp.pi / 180.0


def _ramp_iters(cfg: ControlConfig):
    """Iteration counts scale with controller dt (RecoveryStand :34-54)."""
    s = cfg.dt * 100.0
    return dict(
        fold_ramp=int(45 / s), fold_settle=int(75 / s),
        standup_ramp=int(30 / s), standup_settle=int(30 / s),
        rollover_ramp=int(13 / s), rollover_settle=int(15 / s),
    )


def _joint_pd_commands(q_des) -> LegCommands:
    """jointPDControl with default gains for all legs (FSM_State.py:46-66)."""
    eye = jnp.eye(3, dtype=jnp.float32)[None]
    return zero_leg_commands()._replace(
        q_des=q_des,
        kp_joint=jnp.broadcast_to(eye * KP_JOINT_DEFAULT, (4, 3, 3)),
        kd_joint=jnp.broadcast_to(eye * KD_JOINT_DEFAULT, (4, 3, 3)),
    )


def locomotion_safe(cfg: ControlConfig, se: StateEstimate,
                    leg_data: LegData):
    """Safety predicate (FSM_State_Locomotion.locomotionSafe :104-136)."""
    if not cfg.check_safety:
        return jnp.bool_(True)
    roll_bad = se.rpy[0] > MAX_ROLL_PITCH_RAD          # fabs-of-bool quirk
    pitch_bad = jnp.abs(se.rpy[1]) > MAX_ROLL_PITCH_RAD
    leg_above_hip = jnp.any(leg_data.p[:, 2] > 0)
    leg_y_bad = jnp.any(leg_data.p[:, 1] > 0.18)       # fabs-of-bool quirk
    return jnp.logical_not(roll_bad | pitch_bad | leg_above_hip | leg_y_bad)


def _upside_down(se: StateEstimate):
    """rBody[2,2] < 0 (FSM_State_RecoveryStand.py:162-166)."""
    return se.r_body[2, 2] < 0


def _recovery_commands(cfg: ControlConfig, fsm: FSMStateData,
                       leg_data: LegData, se: StateEstimate):
    """One RecoveryStand tick: (LegCommands, new fsm fields)."""
    it = _ramp_iters(cfg)
    curr = fsm.rc_state_iter - fsm.rc_motion_start
    upside = _upside_down(se)

    def interp(max_iter, fin):
        b = jnp.clip(curr.astype(jnp.float32) / max_iter, 0.0, 1.0)
        return (1.0 - b) * fsm.rc_initial_jpos + b * fin

    # --- StandUp (:185-207); body height check uses the *constant* param,
    # so something_wrong reduces to upside-down (reference quirk, :186-189)
    su_wrong = upside
    su_refold = jnp.logical_and(curr > int(it["standup_ramp"] * 0.7), su_wrong)
    su_cmds = _joint_pd_commands(interp(it["standup_ramp"], STAND_JPOS))

    # --- FoldLegs (:209-223); note interpolation uses rollover_ramp_iter
    # (reference quirk, :211) while completion checks fold_ramp + fold_settle
    fl_done = curr >= (it["fold_ramp"] + it["fold_settle"])
    fl_cmds = _joint_pd_commands(interp(it["rollover_ramp"], FOLD_JPOS))

    # --- RollOver (:225-235)
    ro_done = curr > (it["rollover_ramp"] + it["rollover_settle"])
    ro_cmds = _joint_pd_commands(interp(it["rollover_ramp"], ROLL_JPOS))

    is_su = fsm.rc_flag == STAND_UP
    is_fl = fsm.rc_flag == FOLD_LEGS
    is_ro = fsm.rc_flag == ROLL_OVER

    cmds = jax.tree.map(
        lambda a, b, c: jnp.where(is_su, a, jnp.where(is_fl, b, c)),
        su_cmds, fl_cmds, ro_cmds)
    # the StandUp->refold tick emits no commands (reference falls through)
    cmds = jax.tree.map(
        lambda x: jnp.where(jnp.logical_and(is_su, su_refold),
                            jnp.zeros_like(x), x), cmds)

    switch = (is_su & su_refold) | (is_fl & fl_done) | (is_ro & ro_done)
    new_flag = jnp.where(
        is_su & su_refold, FOLD_LEGS,
        jnp.where(is_fl & fl_done, jnp.where(upside, ROLL_OVER, STAND_UP),
                  jnp.where(is_ro & ro_done, FOLD_LEGS, fsm.rc_flag)))
    new_initial = jnp.where(
        (is_su & su_refold)[..., None, None], leg_data.q,
        jnp.where((is_fl & fl_done)[..., None, None], FOLD_JPOS,
                  jnp.where((is_ro & ro_done)[..., None, None], ROLL_JPOS,
                            fsm.rc_initial_jpos)))
    new_motion_start = jnp.where(switch, fsm.rc_state_iter + 1,
                                 fsm.rc_motion_start)
    new_fsm = fsm._replace(rc_flag=jnp.int32(new_flag),
                           rc_initial_jpos=new_initial,
                           rc_motion_start=jnp.int32(new_motion_start),
                           rc_state_iter=fsm.rc_state_iter + 1)
    return cmds, new_fsm


def _recovery_on_enter(fsm: FSMStateData, leg_data: LegData,
                       se: StateEstimate) -> FSMStateData:
    """RecoveryStand.onEnter (:65-92)."""
    upside = _upside_down(se)
    h = se.position[2]
    stand_ok = jnp.logical_and(h > 0.2, h < 0.45)
    flag = jnp.where(jnp.logical_and(jnp.logical_not(upside), stand_ok),
                     STAND_UP, FOLD_LEGS)
    return fsm._replace(rc_flag=jnp.int32(flag),
                        rc_state_iter=jnp.int32(0),
                        rc_motion_start=jnp.int32(0),
                        rc_initial_jpos=leg_data.q)


def _passive_commands(passive_iter) -> LegCommands:
    """FSM_State_Passive.run (:32-45): small joint PD for the first 10 ticks,
    then fully zero."""
    q_des = jnp.broadcast_to(jnp.array([0.0, 0.01, 0.01], jnp.float32),
                             (4, 3))
    cmds = _joint_pd_commands(q_des)
    active = passive_iter < 10
    return jax.tree.map(lambda x: jnp.where(active, x, jnp.zeros_like(x)),
                        cmds)


def fsm_step(params: RobotParams, cfg: ControlConfig, state: ControlState,
             se: StateEstimate, leg_data: LegData, commands, weights,
             gait_id, control_mode, passive_iter,
             solve_gate: Optional[jnp.ndarray] = None):
    """One FSM-mode control tick.

    Args:
      control_mode: () int32 requested state {0 passive, 1 locomotion,
        2 recovery} — the Parameters.control_mode equivalent, now an input.
      passive_iter: () int32 tick count within passive state (caller-held).
    Returns:
      (new ControlState, LegCommands, new passive_iter, metrics)
    """
    fsm = state.fsm
    cur = fsm.state
    normal = fsm.op_mode == MODE_NORMAL

    # ---- checkTransition for each state -------------------------------
    safe = locomotion_safe(cfg, se, leg_data)
    # PASSIVE can go to RECOVERY only (FSM_State_Passive.py:63-74)
    req_passive = jnp.where(control_mode == RECOVERY_STAND, RECOVERY_STAND,
                            PASSIVE)
    # LOCOMOTION: any request honored when safe; unsafe forces RECOVERY
    req_loco = jnp.where(safe, control_mode, RECOVERY_STAND)
    unsafe_trigger = jnp.logical_and(cur == LOCOMOTION, jnp.logical_not(safe))
    # RECOVERY: any request honored (FSM_State_RecoveryStand.py:114-139)
    req_rec = control_mode
    req = jnp.where(cur == PASSIVE, req_passive,
                    jnp.where(cur == LOCOMOTION, req_loco, req_rec))

    transition_detected = jnp.logical_and(normal, req != cur)
    run_tick = jnp.logical_and(normal, jnp.logical_not(transition_detected))

    # ---- run the three states (masked) --------------------------------
    run_loco = jnp.logical_and(run_tick, cur == LOCOMOTION)
    new_loco, new_est, loco_cmds, metrics = locomotion.step(
        params, cfg, state.loco, state.est, se, leg_data, commands, weights,
        gait_id, solve_gate)

    rec_cmds, rec_fsm = _recovery_commands(cfg, fsm, leg_data, se)
    pas_cmds = _passive_commands(passive_iter)

    run_rec = jnp.logical_and(run_tick, cur == RECOVERY_STAND)
    run_pas = jnp.logical_and(run_tick, cur == PASSIVE)

    cmds = jax.tree.map(
        lambda lo, re, pa: jnp.where(
            run_loco, lo, jnp.where(run_rec, re, jnp.where(run_pas, pa, 0.0))),
        loco_cmds, rec_cmds, pas_cmds)

    # commit state only for the state that actually ran
    loco_state = jax.tree.map(
        lambda new, old: jnp.where(run_loco, new, old), new_loco, state.loco)
    est_state = jax.tree.map(
        lambda new, old: jnp.where(run_loco, new, old), new_est, state.est)
    fsm = jax.tree.map(
        lambda new, old: jnp.where(run_rec, new, old), rec_fsm, fsm)
    passive_iter = jnp.where(run_pas, passive_iter + 1, passive_iter)

    # ---- transition protocol ------------------------------------------
    transitioning = fsm.op_mode == MODE_TRANSITIONING
    # transitioning tick: complete switch + onEnter of the new state
    enter_state = fsm.next_state
    enter_loco = jnp.logical_and(transitioning, enter_state == LOCOMOTION)
    enter_rec = jnp.logical_and(transitioning, enter_state == RECOVERY_STAND)

    # Locomotion.onEnter: cMPC.initialize + estimator reset
    # (FSM_State_Locomotion.py:32-42)
    loco_reset = init_locomotion_state(cfg.horizon)
    est_reset = init_estimator_state(params.body_height)
    loco_state = jax.tree.map(
        lambda new, old: jnp.where(enter_loco, new, old), loco_reset,
        loco_state)
    est_state = jax.tree.map(
        lambda new, old: jnp.where(enter_loco, new, old), est_reset,
        est_state)
    rec_entered = _recovery_on_enter(fsm, leg_data, se)
    fsm = jax.tree.map(
        lambda new, old: jnp.where(enter_rec, new, old), rec_entered, fsm)
    passive_iter = jnp.where(
        jnp.logical_and(transitioning, enter_state == PASSIVE), 0,
        passive_iter)

    new_state_id = jnp.where(transitioning, enter_state, cur)
    new_mode = jnp.where(transitioning, MODE_NORMAL,
                         jnp.where(transition_detected, MODE_TRANSITIONING,
                                   fsm.op_mode))
    new_next = jnp.where(transition_detected, req, fsm.next_state)

    fsm = fsm._replace(
        state=jnp.int32(new_state_id),
        op_mode=jnp.int32(new_mode),
        next_state=jnp.int32(new_next),
        locomotion_unsafe=jnp.logical_or(fsm.locomotion_unsafe,
                                         unsafe_trigger))

    new_control_state = ControlState(est=est_state, loco=loco_state, fsm=fsm)
    metrics = dict(metrics)
    metrics["fsm_state"] = new_state_id
    metrics["locomotion_unsafe"] = fsm.locomotion_unsafe
    return new_control_state, cmds, passive_iter, metrics
