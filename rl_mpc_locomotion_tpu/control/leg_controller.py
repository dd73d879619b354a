"""Leg controller: joint-state ingestion and torque mapping, vectorized.

Port of common/LegController.py with the per-leg loop replaced by one
batched computation over the 4-leg axis:
  tau = tau_ff + J^T (f_ff + Kp_c (pDes - p) + Kd_c (vDes - v))
        + Kp_j (qDes - q) + Kd_j (qdDes - qd)          (LegController.py:108-132)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.robots import RobotParams
from ..ops.leg_kinematics import leg_fk_jacobian
from .types import LegCommands, LegData


def update_data(params: RobotParams, dof_q, dof_qd) -> LegData:
    """Build LegData from 12-dim joint pos/vel. LegController.py:89-106."""
    q = dof_q.reshape(4, 3)
    qd = dof_qd.reshape(4, 3)
    p, J = leg_fk_jacobian(q, params.abad_link_length, params.hip_link_length,
                           params.knee_link_length)
    v = jnp.einsum('lij,lj->li', J, qd)
    return LegData(q=q, qd=qd, p=p, v=v, J=J)


def compute_torques(cmds: LegCommands, data: LegData) -> jnp.ndarray:
    """(12,) joint torques. LegController.updateCommand (:108-132)."""
    foot_force = (cmds.force_ff
                  + jnp.einsum('lij,lj->li', cmds.kp_cart, cmds.p_des - data.p)
                  + jnp.einsum('lij,lj->li', cmds.kd_cart, cmds.v_des - data.v))
    tau = cmds.tau_ff + jnp.einsum('lji,lj->li', data.J, foot_force)
    tau = tau + jnp.einsum('lij,lj->li', cmds.kp_joint, cmds.q_des - data.q)
    tau = tau + jnp.einsum('lij,lj->li', cmds.kd_joint, cmds.qd_des - data.qd)
    return tau.reshape(12)
