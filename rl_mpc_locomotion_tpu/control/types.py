"""Control-stack state pytrees and static configuration.

The reference scatters runtime state across mutable objects
(ConvexMPCLocomotion, StateEstimator, FootSwingTrajectory, FSM classes) and a
process-global Parameters class. Here *all* per-robot state is one
``ControlState`` pytree batched over an env axis, and configuration is a
hashable static dataclass — the shape that vmap/pjit want.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..ops.qp import QPConfig, QPState, init_qp_state

NUM_LEGS = 4
HORIZON = 10


@dataclasses.dataclass(frozen=True)
class ControlConfig:
    """Static controller configuration (Parameters.py equivalents)."""
    dt: float = 0.01                     # Parameters.controller_dt
    iterations_between_mpc: int = 2      # int(27/(1000*dt)), FSM_State_Locomotion.py:20-21
    horizon: int = HORIZON
    flat_ground: bool = True             # Parameters.flat_ground
    alpha: float = 1e-5                  # Parameters.cmpc_alpha
    bonus_swing: float = 0.0             # Parameters.cmpc_bonus_swing
    qp: QPConfig = QPConfig()
    check_safety: bool = True            # Parameters.FSM_check_safety
    # QP divergence fallback: when the solve's worst constraint violation
    # (Newtons) exceeds this, hold the previous f_ff and cold-start the next
    # solve. The reference returns an empty vector on OSQP non-convergence
    # (mpc_osqp.cc:791-794) which its caller never handles (would throw at
    # ConvexMPCLocomotion.py:186-187); this is the SURVEY §5 fallback.
    qp_divergence_tol: float = 1.0

    @property
    def dt_mpc(self) -> float:
        return self.dt * self.iterations_between_mpc


class StateEstimate(NamedTuple):
    """Per-tick estimator output (StateEstimator.StateEstimate equivalent)."""
    position: jnp.ndarray        # (3,) — x,y always 0 in bridge mode, z estimated
    v_world: jnp.ndarray         # (3,)
    omega_world: jnp.ndarray     # (3,)
    quat: jnp.ndarray            # (4,) wxyz
    r_body: jnp.ndarray          # (3,3) world->body
    rpy: jnp.ndarray             # (3,) body in world
    rpy_body: jnp.ndarray        # (3,) body in yaw-aligned ground frame
    v_body: jnp.ndarray          # (3,)
    omega_body: jnp.ndarray      # (3,)
    ground_normal_yaw: jnp.ndarray    # (3,)
    ground_normal_world: jnp.ndarray  # (3,)
    ground_r_body: jnp.ndarray   # (3,3)


class EstimatorState(NamedTuple):
    """Persistent estimator state (carried across ticks)."""
    contact_phase: jnp.ndarray         # (4,)
    foot_contact_history: jnp.ndarray  # (4,3)
    ground_normal_yaw: jnp.ndarray     # (3,)
    ground_normal_world: jnp.ndarray   # (3,)
    com_z: jnp.ndarray                 # () estimated body height


class LocomotionState(NamedTuple):
    """ConvexMPCLocomotion mutable state as data."""
    iteration_counter: jnp.ndarray     # () int32
    first_run: jnp.ndarray             # () bool
    first_swing: jnp.ndarray           # (4,) bool
    swing_time_remaining: jnp.ndarray  # (4,)
    p0: jnp.ndarray                    # (4,3) swing start (world frame, pFoot)
    pf: jnp.ndarray                    # (4,3) swing target
    f_ff: jnp.ndarray                  # (4,3) MPC feed-forward GRFs
    swing_memory: jnp.ndarray          # (2,4,3) last swing-trajectory (p, v)
    qp_state: QPState                  # ADMM warm start


class LegCommands(NamedTuple):
    """Per-leg command batch (LegControllerCommand as arrays)."""
    tau_ff: jnp.ndarray     # (4,3)
    force_ff: jnp.ndarray   # (4,3)
    q_des: jnp.ndarray      # (4,3)
    qd_des: jnp.ndarray     # (4,3)
    p_des: jnp.ndarray      # (4,3)
    v_des: jnp.ndarray      # (4,3)
    kp_cart: jnp.ndarray    # (4,3,3)
    kd_cart: jnp.ndarray    # (4,3,3)
    kp_joint: jnp.ndarray   # (4,3,3)
    kd_joint: jnp.ndarray   # (4,3,3)


class LegData(NamedTuple):
    """Per-leg measured state (LegControllerData as arrays)."""
    q: jnp.ndarray   # (4,3)
    qd: jnp.ndarray  # (4,3)
    p: jnp.ndarray   # (4,3)
    v: jnp.ndarray   # (4,3)
    J: jnp.ndarray   # (4,3,3)


class FSMStateData(NamedTuple):
    """Finite-state machine as data (ControlFSM + RecoveryStand sub-FSM)."""
    state: jnp.ndarray              # () int32: 0 passive, 1 locomotion, 2 recovery
    op_mode: jnp.ndarray            # () int32: 0 normal, 1 transitioning
    next_state: jnp.ndarray         # () int32
    rc_flag: jnp.ndarray            # () int32: 0 standup, 1 foldlegs, 2 rollover
    rc_state_iter: jnp.ndarray      # () int32
    rc_motion_start: jnp.ndarray    # () int32
    rc_initial_jpos: jnp.ndarray    # (4,3)
    locomotion_unsafe: jnp.ndarray  # () bool (Parameters.locomotionUnsafe)


class ControlState(NamedTuple):
    est: EstimatorState
    loco: LocomotionState
    fsm: FSMStateData


def zero_leg_commands() -> LegCommands:
    z3 = jnp.zeros((NUM_LEGS, 3), jnp.float32)
    z33 = jnp.zeros((NUM_LEGS, 3, 3), jnp.float32)
    return LegCommands(tau_ff=z3, force_ff=z3, q_des=z3, qd_des=z3, p_des=z3,
                       v_des=z3, kp_cart=z33, kd_cart=z33, kp_joint=z33,
                       kd_joint=z33)


def init_estimator_state(body_height) -> EstimatorState:
    return EstimatorState(
        contact_phase=jnp.zeros(NUM_LEGS, jnp.float32),
        foot_contact_history=jnp.zeros((NUM_LEGS, 3), jnp.float32),
        ground_normal_yaw=jnp.array([0.0, 0.0, 1.0], jnp.float32),
        ground_normal_world=jnp.array([0.0, 0.0, 1.0], jnp.float32),
        com_z=jnp.asarray(body_height, jnp.float32),
    )


def init_locomotion_state(horizon: int = HORIZON) -> LocomotionState:
    return LocomotionState(
        iteration_counter=jnp.int32(0),
        first_run=jnp.bool_(True),
        first_swing=jnp.ones(NUM_LEGS, bool),
        swing_time_remaining=jnp.zeros(NUM_LEGS, jnp.float32),
        p0=jnp.zeros((NUM_LEGS, 3), jnp.float32),
        pf=jnp.zeros((NUM_LEGS, 3), jnp.float32),
        f_ff=jnp.zeros((NUM_LEGS, 3), jnp.float32),
        swing_memory=jnp.zeros((2, NUM_LEGS, 3), jnp.float32),
        qp_state=init_qp_state(horizon * 12, horizon * 20),
    )


def init_fsm_state(initial: int = 2) -> FSMStateData:
    """Default initial state RECOVERY_STAND (Parameters.py:41).

    Starts in TRANSITIONING with next_state=initial so the first tick runs
    the state's onEnter (ControlFSM.initialize calls onEnter eagerly,
    ControlFSM.py:61-76; here it costs one zero-command tick)."""
    return FSMStateData(
        state=jnp.int32(initial),
        op_mode=jnp.int32(1),
        next_state=jnp.int32(initial),
        rc_flag=jnp.int32(1),
        rc_state_iter=jnp.int32(0),
        rc_motion_start=jnp.int32(0),
        rc_initial_jpos=jnp.zeros((NUM_LEGS, 3), jnp.float32),
        locomotion_unsafe=jnp.bool_(False),
    )


def init_control_state(body_height, horizon: int = HORIZON,
                       fsm_initial: int = 2) -> ControlState:
    return ControlState(est=init_estimator_state(body_height),
                        loco=init_locomotion_state(horizon),
                        fsm=init_fsm_state(fsm_initial))
