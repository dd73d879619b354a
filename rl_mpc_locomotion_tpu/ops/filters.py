"""Streaming filters.

MovingWindowFilter ports math_utils/moving_window_filter.py (a Neumaier-
compensated moving average; the reference declares it for ground-normal and
velocity smoothing, StateEstimator.py:32-33) as a pure function over a
filter-state pytree so it vmaps and lives inside jitted loops.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MovingWindowState(NamedTuple):
    buffer: jnp.ndarray      # (window, ...) ring buffer
    index: jnp.ndarray       # () int32 next write slot
    count: jnp.ndarray       # () int32 valid entries
    sum: jnp.ndarray         # (...) running sum
    correction: jnp.ndarray  # (...) Neumaier compensation


def init_moving_window(window: int, shape=()) -> MovingWindowState:
    return MovingWindowState(
        buffer=jnp.zeros((window,) + shape, jnp.float32),
        index=jnp.int32(0),
        count=jnp.int32(0),
        sum=jnp.zeros(shape, jnp.float32),
        correction=jnp.zeros(shape, jnp.float32),
    )


def _neumaier_add(total, correction, value):
    """Compensated add (moving_window_filter.py:24-41)."""
    new_total = total + value
    big = jnp.abs(total) >= jnp.abs(value)
    correction = correction + jnp.where(
        big, (total - new_total) + value, (value - new_total) + total)
    return new_total, correction


def moving_window_update(state: MovingWindowState, value):
    """Push a sample; returns (new_state, current average)."""
    window = state.buffer.shape[0]
    oldest = state.buffer[state.index]
    full = state.count >= window
    total, corr = _neumaier_add(state.sum, state.correction,
                                jnp.where(full, -oldest, 0.0 * oldest))
    total, corr = _neumaier_add(total, corr, value)
    buffer = state.buffer.at[state.index].set(value)
    count = jnp.minimum(state.count + 1, window)
    new_state = MovingWindowState(
        buffer=buffer,
        index=(state.index + 1) % window,
        count=count,
        sum=total,
        correction=corr,
    )
    avg = (total + corr) / count.astype(jnp.float32)
    return new_state, avg


def smooth(values, window: int):
    """Filter a whole trace: (T, ...) samples -> (T, ...) moving averages.

    The offline batch form of the filter — used for the velocity/height
    smoothing the reference declared the filter for (StateEstimator.py:32-33)
    when plotting telemetry (scripts/plot_telemetry.py)."""
    import jax

    values = jnp.asarray(values, jnp.float32)
    state = init_moving_window(window, values.shape[1:])
    _, out = jax.lax.scan(moving_window_update, state, values)
    return out
