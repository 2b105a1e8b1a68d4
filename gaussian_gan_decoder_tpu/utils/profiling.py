"""Tracing / profiling helpers.

TPU-native replacement for the reference's profiling hooks (SURVEY §5):
torch.autograd record_function scopes (training_loop.py:260-304,
misc.profiled_function) and CUDA event timing (training_loop.py:212-215)
become jax.profiler traces + named scopes + forced-sync stopwatches.
"""
from __future__ import annotations

import contextlib
import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def profiled_function(fn):
    """Name the fn's ops in profiler traces (ref misc.profiled_function:102)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)

    return wrapper


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase timing with forced device sync (the CUDA-event
    analog; see PERFORMANCE.md on why sync must be a host transfer)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.tree.map(
                lambda x: float(jnp.sum(x)) if hasattr(x, "dtype") else x, sync_value
            )
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}
