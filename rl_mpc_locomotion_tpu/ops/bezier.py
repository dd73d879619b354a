"""Cubic Bezier interpolation and foot swing trajectories.

Replaces the stateful FootSwingTrajectory class
(common/FootSwingTrajectory.py, math_utils/interplation.py) with pure
functions of (p0, pf, height, phase, swing_time); the swing endpoints live in
the batched control state instead of per-leg Python objects.
"""
from __future__ import annotations

import jax.numpy as jnp


def cubic_bezier(y0, yf, x):
    """Cubic Bezier from y0 to yf at x in [0,1]. interplation.py:4-11."""
    bez = x * x * x + 3.0 * (x * x * (1.0 - x))
    return y0 + bez * (yf - y0)


def cubic_bezier_d1(y0, yf, x):
    """First derivative wrt x. interplation.py:13-20."""
    return 6.0 * x * (1.0 - x) * (yf - y0)


def cubic_bezier_d2(y0, yf, x):
    """Second derivative wrt x. interplation.py:22-27."""
    return (6.0 - 12.0 * x) * (yf - y0)


def swing_trajectory(p0, pf, height, phase, swing_time):
    """Foot swing position/velocity/acceleration at `phase` of a swing.

    xy follow a single cubic Bezier p0->pf; z uses two chained Beziers (lift
    to p0.z+height over the first half, land to pf.z over the second half),
    matching FootSwingTrajectory.computeSwingTrajectoryBezier (:54-70) but
    branch-free (both halves evaluated, selected with where).

    Args:
      p0, pf: (..., 3) swing start / target positions.
      height: scalar or (...,) apex height above p0.z.
      phase: scalar or (...,) in [0, 1].
      swing_time: scalar or (...,) seconds.
    Returns:
      (p, v, a) each shaped like p0.
    """
    st = jnp.maximum(swing_time, 1e-6)
    p = cubic_bezier(p0, pf, phase)
    v = cubic_bezier_d1(p0, pf, phase) / st
    a = cubic_bezier_d2(p0, pf, phase) / (st * st)

    z0, zf = p0[..., 2], pf[..., 2]
    zmid = z0 + height

    x1 = jnp.clip(phase * 2.0, 0.0, 1.0)
    zp1 = cubic_bezier(z0, zmid, x1)
    zv1 = cubic_bezier_d1(z0, zmid, x1) * 2.0 / st
    za1 = cubic_bezier_d2(z0, zmid, x1) * 4.0 / (st * st)

    x2 = jnp.clip(phase * 2.0 - 1.0, 0.0, 1.0)
    zp2 = cubic_bezier(zmid, zf, x2)
    zv2 = cubic_bezier_d1(zmid, zf, x2) * 2.0 / st
    za2 = cubic_bezier_d2(zmid, zf, x2) * 4.0 / (st * st)

    first_half = phase < 0.5
    zp = jnp.where(first_half, zp1, zp2)
    zv = jnp.where(first_half, zv1, zv2)
    za = jnp.where(first_half, za1, za2)

    p = p.at[..., 2].set(zp)
    v = v.at[..., 2].set(zv)
    a = a.at[..., 2].set(za)
    return p, v, a
