"""Small shared utilities: backend detection, stage timing, throughput.

The reference's observability is wall-clock prints per batch
(associate_kmers.cpp:127-146); here every driver reports stage durations and
k-mers/s through a StageTimer, and kernels auto-select the Pallas path on
TPU backends.
"""
from __future__ import annotations

import sys
import time


def on_tpu() -> bool:
    import jax
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def pick_kernel(use_pallas) -> str:
    """'auto' -> pallas on TPU, xla elsewhere; bools force."""
    if use_pallas == "auto":
        return "pallas" if on_tpu() else "xla"
    return "pallas" if use_pallas else "xla"


def drain(handle) -> None:
    """Backpressure point of the bounded dispatch pipelines: force the
    device queue to have COMPLETED `handle` (an output of the step a few
    batches back) before returning, releasing every older batch's
    host/transfer buffers.

    jax.block_until_ready is not enough on remote-relay backends (it
    under-waits — bench.py works around the same by fetching a host
    scalar per window), so this fetches ONE element to the host: an
    in-order device queue cannot serve the fetch before finishing every
    earlier step. Co-located, the scalar D2H costs microseconds. For
    multi-process global arrays the fetch targets the process-LOCAL
    shard (a global fetch would need a collective)."""
    import numpy as np
    shards = getattr(handle, "addressable_shards", None)
    if shards is not None:
        handle = shards[0].data
    if handle.ndim:
        handle = handle.ravel()[:1]
    np.asarray(handle)


class StageTimer:
    """Accumulates per-stage wall time + item counts; prints to stderr."""

    def __init__(self, name: str, unit: str = "items", quiet: bool = False):
        self.name = name
        self.unit = unit
        self.quiet = quiet
        self.t0 = time.perf_counter()
        self.items = 0
        self._last_report = self.t0

    def add(self, n: int) -> None:
        self.items += n
        now = time.perf_counter()
        if not self.quiet and now - self._last_report > 10.0:
            self._last_report = now
            rate = self.items / max(now - self.t0, 1e-9)
            print(f"[{self.name}] {self.items:,} {self.unit} "
                  f"({rate:,.0f}/s)", file=sys.stderr, flush=True)

    def done(self) -> float:
        dt = time.perf_counter() - self.t0
        if not self.quiet:
            rate = self.items / max(dt, 1e-9)
            print(f"[{self.name}] done: {self.items:,} {self.unit} in "
                  f"{dt:.1f}s ({rate:,.0f}/s)", file=sys.stderr, flush=True)
        return dt


class profile_trace:
    """Context manager around jax.profiler.trace: writes a TensorBoard-
    loadable device trace (the reference's only profiling was wall-clock
    prints; SURVEY.md §5)."""

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        import jax
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        import jax
        jax.profiler.stop_trace()
