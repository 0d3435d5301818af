"""Tracing / profiling utilities (SURVEY.md §5.1: the reference had only
ad-hoc wall-time logging, bare_candidates.py:97-112, and qiskit pass
timings). Here: structured phase timers with the same per-phase log format,
plus JAX device-profiler capture."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

logger = logging.getLogger("slam_tpu.profile")


class PhaseTimer:
    """Accumulating phase timer; log format mirrors the reference's
    'TIMING: haar: ..., cnot: ..., swap: ...' lines."""

    def __init__(self, name: str = ""):
        self.name = name
        self.phases: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, label: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[label] = self.phases.get(label, 0.0) + dt
            self.counts[label] = self.counts.get(label, 0) + 1

    def log(self, level=logging.INFO):
        parts = ", ".join(f"{k}: {v:.3f}" for k, v in self.phases.items())
        logger.log(level, "TIMING%s: %s", f" [{self.name}]" if self.name else "", parts)

    def summary(self) -> Dict[str, float]:
        return dict(self.phases)


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/slam_tpu_trace"):
    """Capture a JAX/XLA device profile (view with tensorboard or xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, level=logging.INFO):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.log(level, "%s: %.3fs", label, time.perf_counter() - t0)
