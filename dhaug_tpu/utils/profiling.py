"""Tracing / profiling helpers (SURVEY.md §5 plan).

The reference's only timing is wall-clock AverageMeters in progress bars
(model_fk_gan_train.py:239-240,493-499).  Here:

  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-viewable trace of device + host activity;
  * :class:`StepTimer` — per-phase wall/device timing with true-sync
    fencing, aggregated like AverageMeter;
  * :func:`timed` — one-shot fenced timing of a callable.

Fencing: ``jax.block_until_ready`` is NOT a reliable fence under this
environment's tunneled TPU runtime — it can return before remote execution
finishes (CLAUDE.md); the only true sync is fetching data to the host.
:func:`fence` therefore pulls one scalar element of (the first array leaf
of) its argument across the wire, which is what every benchmark in this
repo does.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable

import jax
import numpy as np


def fence(out) -> None:
    """True device sync: fetch one element of the first jax.Array found in
    ``out`` (block_until_ready alone is unreliable here — see module doc)."""
    for leaf in jax.tree.leaves(out):
        if isinstance(leaf, jax.Array):
            np.asarray(jax.numpy.ravel(leaf)[0])   # host fetch = real fence
            return
    # no array leaves: nothing asynchronous to wait for


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (view with TensorBoard's
    profile plugin or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 1, **kwargs):
    """(result, seconds_per_call) with a true device fence before and after."""
    out = fn(*args, **kwargs)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    fence(out)
    return out, (time.perf_counter() - t0) / iters


class StepTimer:
    """Accumulates fenced per-phase timings: ``with timer("gan"): ...``.
    Pass ``fence=<device output>`` to include the device work in the
    measurement (a scalar of it is fetched at phase exit)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._phase = None
        self._t0 = 0.0

    @contextlib.contextmanager
    def __call__(self, phase: str, fence_out=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence_out is not None:
                fence(fence_out)
            dt = time.perf_counter() - t0
            self.totals[phase] += dt
            self.counts[phase] += 1

    def summary(self) -> dict:
        return {p: {"total_s": self.totals[p], "count": self.counts[p],
                    "mean_s": self.totals[p] / max(self.counts[p], 1)}
                for p in self.totals}

    def report(self) -> str:
        return " | ".join(
            f"{p}: {v['mean_s'] * 1000:.1f} ms x{v['count']}"
            for p, v in self.summary().items())
