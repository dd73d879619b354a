"""3D orientation math as pure jnp functions.

Semantics follow the reference stack's conventions
(/root/reference/MPC_Controller/math_utils/orientation_tools.py) so that the
control loop is trace-comparable, but everything here is float32, jittable and
vmappable (no Python branching on data).

Conventions:
- Quaternions are (w, x, y, z) arrays of shape (4,).
- ``quat_to_rot(q)`` returns the *coordinate transform into the body frame*
  (world->body), matching orientation_tools.py:135-151 (which builds the
  body->world matrix and returns its transpose).
- ``rot_*`` coordinate rotations transform a vector INTO a frame rotated by
  +theta (i.e. they are R(-theta) as an active rotation), matching
  orientation_tools.py:20-36.
"""
from __future__ import annotations

import jax.numpy as jnp


def rot_x(theta):
    """Coordinate rotation about X. orientation_tools.py:29-30."""
    s, c = jnp.sin(theta), jnp.cos(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([o, z, z]),
        jnp.stack([z, c, s]),
        jnp.stack([z, -s, c]),
    ])


def rot_y(theta):
    """Coordinate rotation about Y. orientation_tools.py:31-32."""
    s, c = jnp.sin(theta), jnp.cos(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, z, -s]),
        jnp.stack([z, o, z]),
        jnp.stack([s, z, c]),
    ])


def rot_z(theta):
    """Coordinate rotation about Z. orientation_tools.py:33-34."""
    s, c = jnp.sin(theta), jnp.cos(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, s, z]),
        jnp.stack([-s, c, z]),
        jnp.stack([z, z, o]),
    ])


def skew(v):
    """Skew-symmetric cross-product matrix of v=(a,b,c). mpc_osqp.cc:293-297."""
    a, b, c = v[0], v[1], v[2]
    z = jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([z, -c, b]),
        jnp.stack([c, z, -a]),
        jnp.stack([-b, a, z]),
    ])


def quat_to_rot(q):
    """Quaternion (w,x,y,z) -> world->body coordinate transform (3,3).

    Matches orientation_tools.py:135-151 (returns R.T of the active matrix).
    """
    e0, e1, e2, e3 = q[0], q[1], q[2], q[3]
    r = jnp.stack([
        1 - 2 * (e2 * e2 + e3 * e3), 2 * (e1 * e2 - e0 * e3), 2 * (e1 * e3 + e0 * e2),
        2 * (e1 * e2 + e0 * e3), 1 - 2 * (e1 * e1 + e3 * e3), 2 * (e2 * e3 - e0 * e1),
        2 * (e1 * e3 - e0 * e2), 2 * (e2 * e3 + e0 * e1), 1 - 2 * (e1 * e1 + e2 * e2),
    ]).reshape(3, 3)
    return r.T


def rot_body_to_world(q):
    """Quaternion (w,x,y,z) -> body->world rotation matrix (3,3)."""
    return quat_to_rot(q).T


def quat_to_rpy(q):
    """Quaternion (w,x,y,z) -> (roll, pitch, yaw), orientation_tools.py:120-133."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    as_ = jnp.minimum(-2.0 * (x * z - w * y), 0.99999)
    as_ = jnp.maximum(as_, -0.99999)
    roll = jnp.arctan2(2.0 * (y * z + w * x), w * w - x * x - y * y + z * z)
    pitch = jnp.arcsin(as_)
    yaw = jnp.arctan2(2.0 * (x * y + w * z), w * w + x * x - y * y - z * z)
    return jnp.stack([roll, pitch, yaw])


def rpy_to_rot(rpy):
    """RPY -> world->frame coordinate transform. orientation_tools.py:153-160."""
    return rot_x(rpy[0]) @ rot_y(rpy[1]) @ rot_z(rpy[2])


def rpy_to_quat(rpy):
    """RPY -> quaternion (w,x,y,z). orientation_tools.py:75-87."""
    cy, sy = jnp.cos(rpy[2] * 0.5), jnp.sin(rpy[2] * 0.5)
    cp, sp = jnp.cos(rpy[1] * 0.5), jnp.sin(rpy[1] * 0.5)
    cr, sr = jnp.cos(rpy[0] * 0.5), jnp.sin(rpy[0] * 0.5)
    return jnp.stack([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ])


def rot_to_quat(rot):
    """Coordinate-transform matrix -> quaternion (w,x,y,z).

    Branch-free form of orientation_tools.py:162-197: compute all four Shepperd
    candidates and select by the same priority (trace, r00, r11, r22). The
    sqrt arguments are clamped so the unselected branches never produce NaN.
    """
    r = rot.T  # active rotation (body->world), as the reference does
    tr = r[0, 0] + r[1, 1] + r[2, 2]

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0,
                    (r[2, 1] - r[1, 2]) / s0,
                    (r[0, 2] - r[2, 0]) / s0,
                    (r[1, 0] - r[0, 1]) / s0])

    s1 = safe_sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2.0
    q1 = jnp.stack([(r[2, 1] - r[1, 2]) / s1,
                    0.25 * s1,
                    (r[0, 1] + r[1, 0]) / s1,
                    (r[0, 2] + r[2, 0]) / s1])

    s2 = safe_sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2.0
    q2 = jnp.stack([(r[0, 2] - r[2, 0]) / s2,
                    (r[0, 1] + r[1, 0]) / s2,
                    0.25 * s2,
                    (r[1, 2] + r[2, 1]) / s2])

    s3 = safe_sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2.0
    q3 = jnp.stack([(r[1, 0] - r[0, 1]) / s3,
                    (r[0, 2] + r[2, 0]) / s3,
                    (r[1, 2] + r[2, 1]) / s3,
                    0.25 * s3])

    use0 = tr > 0.0
    use1 = jnp.logical_and(r[0, 0] > r[1, 1], r[0, 0] > r[2, 2])
    use2 = r[1, 1] > r[2, 2]
    q = jnp.where(use0, q0, jnp.where(use1, q1, jnp.where(use2, q2, q3)))
    return q


def rot_to_rpy(rot):
    """Coordinate-transform matrix -> RPY. orientation_tools.py:199-200."""
    return quat_to_rpy(rot_to_quat(rot))


def axis_angle_to_rot(axis, theta):
    """Rodrigues rotation (returned as coordinate transform, i.e. transposed).

    Matches the *intent* of orientation_tools.py:97-108. Note: the reference
    has a typo in its [2,2] entry (`k[1]*k[1]` instead of `k[2]*k[2]`,
    orientation_tools.py:105); we implement the correct formula. For the
    near-identity rotations this is used for (ground-normal alignment), the
    numerical difference is O(theta^2 * |k1^2-k2^2|) and below test tolerance.
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    v = 1.0 - c
    k = axis
    row0 = jnp.stack([k[0] * k[0] * v + c, k[0] * k[1] * v - k[2] * s, k[0] * k[2] * v + k[1] * s])
    row1 = jnp.stack([k[0] * k[1] * v + k[2] * s, k[1] * k[1] * v + c, k[1] * k[2] * v - k[0] * s])
    row2 = jnp.stack([k[0] * k[2] * v - k[1] * s, k[1] * k[2] * v + k[0] * s, k[2] * k[2] * v + c])
    return jnp.stack([row0, row1, row2]).T


def rot_from_normals(world_normal, ground_normal):
    """Rotation aligning two plane normals. orientation_tools.py:89-95.

    The reference feeds the *unnormalized* cross product into Rodrigues
    (|axis| = sin(theta), an O(theta^2) error); we normalize, which is exact
    and coincides with the reference to first order for the near-vertical
    normals this is used on.
    """
    axis = jnp.cross(world_normal, ground_normal)
    norm = jnp.linalg.norm(axis)
    axis = axis / jnp.maximum(norm, 1e-8)
    cosang = jnp.clip(jnp.dot(world_normal, ground_normal), -1.0, 1.0)
    theta = jnp.arccos(cosang)
    return axis_angle_to_rot(axis, theta)


def quat_rotate_inverse(q, v):
    """Rotate world vector v into the frame of quaternion q=(w,x,y,z).

    Equivalent to quat_to_rot(q) @ v; provided for obs/reward parity with the
    torch_jit_utils helper used by the reference env (tasks/aliengo.py:376-380).
    """
    return quat_to_rot(q) @ v
