"""Robot runners: the controller <-> simulator facade.

Same three-array contract as the reference
(robot_runner/RobotRunnerMin.py:54-75): run(dof_states, body_state, commands)
-> 12 joint torques — but as pure functions of (params, cfg, state) that jit,
vmap over robots, and shard over meshes.

- ``min_step``: MPC only, no FSM (RobotRunnerMin).
- ``fsm_step``: full state machine (RobotRunnerFSM) — control/fsm.py.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..models.robots import RobotParams
from . import leg_controller, locomotion, state_estimator
from .types import (ControlConfig, ControlState, init_control_state)


def init_state(params: RobotParams, cfg: ControlConfig,
               fsm_initial: int = 2) -> ControlState:
    return init_control_state(params.body_height, cfg.horizon, fsm_initial)


def min_step(params: RobotParams, cfg: ControlConfig, state: ControlState,
             dof_q, dof_qd, body_state, commands,
             mpc_weights: Optional[jnp.ndarray] = None,
             gait_id=0, solve_gate: Optional[jnp.ndarray] = None):
    """One 100 Hz Min-mode control tick.

    Args:
      dof_q, dof_qd: (12,) joint positions / velocities.
      body_state: (13,) [pos(3), quat xyzw(4), linvel(3), angvel(3)].
      commands: (3,) [vx_des, vy_des, yaw_rate].
      mpc_weights: optional (13,) MPC weights (policy path); None = robot
        defaults (DesiredStateCommand / solveDenseMPC :132-135).
      gait_id: () int32.
      solve_gate: optional scalar bool — see locomotion.step.
    Returns:
      (new_state, torques (12,), metrics dict)
    """
    weights = params.mpc_weights if mpc_weights is None else mpc_weights

    leg_data = leg_controller.update_data(params, dof_q, dof_qd)
    se = state_estimator.update(state.est, body_state)
    new_loco, new_est, cmds, metrics = locomotion.step(
        params, cfg, state.loco, state.est, se, leg_data, commands, weights,
        jnp.asarray(gait_id, jnp.int32), solve_gate)
    torques = leg_controller.compute_torques(cmds, leg_data)
    new_state = state._replace(est=new_est, loco=new_loco)
    return new_state, torques, metrics


def fsm_step(params: RobotParams, cfg: ControlConfig, state: ControlState,
             passive_iter, dof_q, dof_qd, body_state, commands,
             mpc_weights: Optional[jnp.ndarray] = None,
             gait_id=0, control_mode=1,
             solve_gate: Optional[jnp.ndarray] = None):
    """One 100 Hz FSM-mode control tick (RobotRunnerFSM.run :46-70).

    Returns (new_state, torques, new_passive_iter, metrics)."""
    from . import fsm as fsm_mod

    weights = params.mpc_weights if mpc_weights is None else mpc_weights
    leg_data = leg_controller.update_data(params, dof_q, dof_qd)
    se = state_estimator.update(state.est, body_state)
    new_state, cmds, passive_iter, metrics = fsm_mod.fsm_step(
        params, cfg, state, se, leg_data, commands, weights,
        jnp.asarray(gait_id, jnp.int32), jnp.asarray(control_mode, jnp.int32),
        passive_iter, solve_gate)
    torques = leg_controller.compute_torques(cmds, leg_data)
    return new_state, torques, passive_iter, metrics
