"""Analytic 3-DoF leg forward kinematics and Jacobian, batched over legs.

Same kinematic chain as LegController.computeLegJacobianAndPosition
(common/LegController.py:135-171): abad roll about x, hip/knee pitch, with
link lengths (abad, hip, knee) and side sign +1 for left legs (0, 2), -1 for
right legs (1, 3) (utils.py:7 SIDE_SIGN).

All functions are pure jnp, shaped so one call handles all four legs; vmap
over a leading robot axis gives the batched version.
"""
from __future__ import annotations

import jax.numpy as jnp

SIDE_SIGN = jnp.array([1.0, -1.0, 1.0, -1.0], dtype=jnp.float32)


def leg_fk_jacobian(q, abad_len, hip_len, knee_len):
    """FK position and Jacobian for all 4 legs.

    Args:
      q: (4, 3) joint angles [abad, hip, knee] per leg.
      abad_len, hip_len, knee_len: scalars.
    Returns:
      p: (4, 3) foot position in the hip frame.
      J: (4, 3, 3) Jacobian dp/dq.
    """
    dy = abad_len * SIDE_SIGN          # (4,)
    dz1 = -hip_len
    dz2 = -knee_len

    s1, s2, s3 = jnp.sin(q[:, 0]), jnp.sin(q[:, 1]), jnp.sin(q[:, 2])
    c1, c2, c3 = jnp.cos(q[:, 0]), jnp.cos(q[:, 1]), jnp.cos(q[:, 2])
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3

    px = dz2 * s23 + dz1 * s2
    py = dy * c1 - dz1 * c2 * s1 - dz2 * s1 * c23
    pz = dy * s1 + dz1 * c1 * c2 + dz2 * c1 * c23
    p = jnp.stack([px, py, pz], axis=-1)

    j00 = jnp.zeros_like(s1)
    j10 = -dy * s1 - dz2 * c1 * c23 - dz1 * c1 * c2
    j20 = -dz2 * s1 * c23 + dy * c1 - dz1 * c2 * s1
    j01 = dz2 * c23 + dz1 * c2
    j11 = dz2 * s1 * s23 + dz1 * s1 * s2
    j21 = -dz2 * c1 * s23 - dz1 * c1 * s2
    j02 = dz2 * c23
    j12 = dz2 * s1 * s23
    j22 = -dz2 * c1 * s23

    J = jnp.stack([
        jnp.stack([j00, j01, j02], axis=-1),
        jnp.stack([j10, j11, j12], axis=-1),
        jnp.stack([j20, j21, j22], axis=-1),
    ], axis=-2)  # (4, 3, 3)
    return p, J


def hip_locations(abad_location):
    """(4,3) hip locations in the body frame from the front-left abad offset.

    Sign pattern per Quadruped.getHipLocation (common/Quadruped.py:96-107):
    legs ordered FR-ish convention [0: +x +y, 1: +x -y, 2: -x +y, 3: -x -y].
    """
    ax, ay, az = abad_location[0], abad_location[1], abad_location[2]
    xs = jnp.stack([ax, ax, -ax, -ax])
    ys = jnp.stack([ay, -ay, ay, -ay])
    zs = jnp.stack([az, az, az, az])
    return jnp.stack([xs, ys, zs], axis=-1)
