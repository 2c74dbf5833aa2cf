"""Profiling and throughput accounting.

The reference ships no tracing beyond a commented-out decorator
(reference utils/CompressFramework.py:159) and tqdm bars; SURVEY.md §5 calls
for jax.profiler traces plus coords/s/chip counters (the BASELINE.json
metric).  This module provides both.

Benchmarking caveat (learned on this pod): the remote TPU runtime memoizes
repeated identical dispatches, so only scan-serialized, fresh-input timings
are trustworthy — `throughput` therefore requires the step loop to already
live on device (lax.scan) and times ONE dispatch.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class ThroughputMeter:
    """coords/s (/chip) accounting for training / decode loops.

    Usage:
        meter = ThroughputMeter(n_chips=len(jax.devices()))
        with meter.measure(coords=n_steps * batch):
            out = run_segment(...)          # one on-device scan
            jax.block_until_ready(out)
        meter.coords_per_sec, meter.coords_per_sec_per_chip
    """
    n_chips: int = 1
    total_coords: int = 0
    total_seconds: float = 0.0
    segments: int = 0

    @contextlib.contextmanager
    def measure(self, coords: int):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.total_coords += int(coords)
        self.total_seconds += dt
        self.segments += 1

    @property
    def coords_per_sec(self) -> float:
        return self.total_coords / max(self.total_seconds, 1e-12)

    @property
    def coords_per_sec_per_chip(self) -> float:
        return self.coords_per_sec / max(self.n_chips, 1)

    def report(self) -> Dict[str, float]:
        return {
            "coords_per_sec": self.coords_per_sec,
            "coords_per_sec_per_chip": self.coords_per_sec_per_chip,
            "segments": self.segments,
            "seconds": self.total_seconds,
        }
