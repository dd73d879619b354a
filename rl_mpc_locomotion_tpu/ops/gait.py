"""Gait phase arithmetic, vectorized.

The reference implements ``OffsetDurationGait`` as a stateful per-robot object
with Python loops over legs (convex_MPC/Gait.py:3-93). Here each gait is a row
of static offset/duration tables and the phase math is branch-free jnp over all
four legs at once, so it vmaps over robots and indexes gaits with a traced id.

All gaits use 10 MPC segments (ConvexMPCLocomotion.py:27).
Gait ids match Parameters.cmpc_gait / ConvexMPCLocomotion.run (:225-241):
0=trot, 1=bound, 2=pronk, 3=pace, 4=stand->trot(default), 5=gallop, 6=walk,
7=trot-run.
"""
from __future__ import annotations

import jax.numpy as jnp

N_SEGMENTS = 10
NUM_LEGS = 4

# offsets / durations in MPC segments (ConvexMPCLocomotion.py:30-56).
# Row 4 duplicates trot: gait number 4 falls through to the trotting default
# in the reference's if-chain (ConvexMPCLocomotion.py:229-241).
GAIT_OFFSETS = jnp.array([
    [0, 5, 5, 0],   # 0 trotting
    [5, 5, 0, 0],   # 1 bounding
    [0, 0, 0, 0],   # 2 pronking
    [5, 0, 5, 0],   # 3 pacing
    [0, 5, 5, 0],   # 4 (stand) -> trot default
    [0, 2, 7, 9],   # 5 galloping
    [0, 3, 5, 8],   # 6 walking
    [0, 5, 5, 0],   # 7 trot running
], dtype=jnp.float32)

GAIT_DURATIONS = jnp.array([
    [5, 5, 5, 5],   # 0 trotting
    [4, 4, 4, 4],   # 1 bounding
    [4, 4, 4, 4],   # 2 pronking
    [5, 5, 5, 5],   # 3 pacing
    [5, 5, 5, 5],   # 4 -> trot default
    [4, 4, 4, 4],   # 5 galloping
    [5, 5, 5, 5],   # 6 walking
    [4, 4, 4, 4],   # 7 trot running
], dtype=jnp.float32)

NUM_GAITS = GAIT_OFFSETS.shape[0]


def gait_params(gait_id):
    """Select (offsets, durations) in segments for a traced gait id."""
    gid = jnp.clip(gait_id, 0, NUM_GAITS - 1)
    return GAIT_OFFSETS[gid], GAIT_DURATIONS[gid]


def gait_iteration_phase(iteration_counter, iterations_per_mpc, n_segments=N_SEGMENTS):
    """(segment index float, phase in *segment units* [0, n)). Gait.py:26-28.

    The reference keeps phase in [0,1); we keep it in segment units so that
    with the default iterations_per_mpc=2 every value is an exact multiple of
    0.5 — no float knife-edges at stance/swing boundaries (the reference's
    [0,1) phase hits non-representable values like 0.9 and its branch
    behaviour then depends on rounding). All downstream comparisons and
    ratios are scale-invariant, so results agree with the reference to 1e-6.
    """
    counter = iteration_counter.astype(jnp.float32)
    ipm = jnp.asarray(iterations_per_mpc, jnp.float32)
    phase_seg = (counter % (ipm * n_segments)) / ipm
    iteration = phase_seg  # == (counter / ipm) % n_segments
    return iteration, phase_seg


def contact_state(phase_seg, offsets, durations, n_segments=N_SEGMENTS):
    """Per-leg stance progress in [0,1]; 0 when the leg is in swing.

    Gait.py:30-43 with the leg loop vectorized and phase in segment units.
    """
    progress = phase_seg - offsets
    progress = jnp.where(progress < 0, progress + n_segments, progress)
    in_stance = progress <= durations
    return jnp.where(in_stance, progress / durations, 0.0)


def swing_state(phase_seg, offsets, durations, n_segments=N_SEGMENTS):
    """Per-leg swing progress in [0,1]; 0 when the leg is in stance.

    Gait.py:45-67 vectorized; full-stance legs (swing duration 0) return 0.
    """
    swing_offset = offsets + durations
    swing_offset = jnp.where(swing_offset > n_segments,
                             swing_offset - n_segments, swing_offset)
    swing_duration = n_segments - durations
    progress = phase_seg - swing_offset
    progress = jnp.where(progress < 0, progress + n_segments, progress)
    in_swing = jnp.logical_and(progress <= swing_duration, swing_duration > 0.0)
    return jnp.where(in_swing, progress / jnp.maximum(swing_duration, 1e-9), 0.0)


def mpc_table(iteration, offsets, durations, n_segments=N_SEGMENTS):
    """(n_segments, 4) contact table for the MPC horizon. Gait.py:69-84.

    ``iteration`` is the float segment index from gait_iteration_phase; the
    reference uses float arithmetic here too (integer division by
    iterations_per_mpc is float in Python), so rows switch exactly when the
    float segment boundary is crossed.
    """
    seg = jnp.arange(n_segments, dtype=jnp.float32)[:, None]  # (h, 1)
    it = (seg + iteration + 1.0) % n_segments
    progress = it - offsets[None, :]
    progress = jnp.where(progress < 0, progress + n_segments, progress)
    return (progress < durations[None, :]).astype(jnp.float32)


def swing_time(durations, dt_mpc, n_segments=N_SEGMENTS):
    """Per-leg swing duration in seconds.

    NOTE: the reference uses leg 0's stance duration for every leg
    (Gait.py:22-23,89-93: `self.__swing = nSegment - durations[0]`); we
    reproduce that so swing timing matches.
    """
    return dt_mpc * (n_segments - durations[0]) * jnp.ones(NUM_LEGS, jnp.float32)


def stance_time(durations, dt_mpc, n_segments=N_SEGMENTS):
    """Per-leg stance duration in seconds (reference: leg 0's duration)."""
    return dt_mpc * durations[0] * jnp.ones(NUM_LEGS, jnp.float32)
