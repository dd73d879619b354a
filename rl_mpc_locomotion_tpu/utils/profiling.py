"""Tracing / profiling: flag-gated wall timers + jax.profiler traces.

The reference's profiling is ad-hoc wall timers gated by Parameters flags
(`cmpc_print_update_time` around the MPC solve, ConvexMPCLocomotion.py:137,
189-190; policy inference timing, WeightPolicy.py:98-102). SURVEY §5 calls
for keeping those lightweight timers and adding proper device-side traces.

- ``Timer``        — named EMA wall timer; ``enabled=False`` compiles to a
                     no-op so it can stay on the hot loop permanently.
- ``timed``        — context manager flavour of the same.
- ``device_trace`` — context manager wrapping ``jax.profiler.trace`` (view
                     with TensorBoard's profile plugin or xprof); safe no-op
                     when profiling is unavailable.
- ``annotate``     — ``jax.profiler.TraceAnnotation`` passthrough for
                     labelling host-side phases inside a trace.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class Timer:
    """Exponential-moving-average wall timer for hot-loop sections.

    >>> t = Timer("mpc_solve", enabled=True, print_every=100)
    >>> with t:
    ...     solve()
    >>> t.mean_ms
    """

    def __init__(self, name: str, enabled: bool = True, ema: float = 0.95,
                 print_every: int = 0):
        self.name = name
        self.enabled = enabled
        self.ema = ema
        self.print_every = print_every
        self.mean_ms = 0.0
        self.last_ms = 0.0
        self.count = 0
        self._t0 = 0.0

    def __enter__(self):
        if self.enabled:
            self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if not self.enabled:
            return
        self.last_ms = (time.perf_counter() - self._t0) * 1e3
        self.mean_ms = (self.ema * self.mean_ms
                        + (1.0 - self.ema) * self.last_ms
                        if self.count else self.last_ms)
        self.count += 1
        if self.print_every and self.count % self.print_every == 0:
            print(f"[timer] {self.name}: last={self.last_ms:.3f} ms "
                  f"ema={self.mean_ms:.3f} ms n={self.count}")

    def stats(self) -> Dict[str, float]:
        return {f"{self.name}_ms": self.mean_ms,
                f"{self.name}_last_ms": self.last_ms}


@contextlib.contextmanager
def timed(timers: Dict[str, Timer], name: str, enabled: bool = True):
    """Registry-based timing: creates/updates ``timers[name]``."""
    timer = timers.get(name)
    if timer is None:
        timer = timers[name] = Timer(name, enabled=enabled)
    with timer:
        yield timer


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture a device profile into ``log_dir`` (no-op if None/unavailable).

    Inspect with: ``tensorboard --logdir <log_dir>`` (profile plugin) or the
    xprof UI. First call inside the context should be the already-compiled
    hot section — compilation noise swamps short traces.
    """
    if not log_dir:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Label a host-side phase inside an active device trace."""
    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        return contextlib.nullcontext()
