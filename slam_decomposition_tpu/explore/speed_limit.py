"""Hardware speed-limit functions (SLFs) over the (conversion, gain) plane.

An SLF maps a conversion amplitude gc to the maximum simultaneous gain
amplitude gg the hardware sustains. Re-costing a gate against an SLF:
intersect its gc:gg ray with the frontier and inversely rescale duration
(reference snail_death_gate.py:108-158, SpeedLimitedGate).

SLF choices (duraton_scaling.py:30-56):
  * linear   — no rescaling (the bare pi/2-normalized cost)
  * mid      — offset circle centered (-c, -c), c = pi/4, through (pi/2, 0)
  * squared  — quarter circle of radius pi/2
  * hardware — measured SNAIL-pump frontier spline; knots distilled from
    the reference's measured dataset (Q1_11.07mA...processed.json — data
    asset, SURVEY.md §2.7) by scripts/distill_speed_limit.py
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Callable, Optional

import numpy as np

from slam_decomposition_tpu.models.gates import Gate, conversion_gain_gate

HALF_PI = np.pi / 2


def mid_sl(x):
    """Offset circle with intercepts at pi/2 (duraton_scaling.py:32-38)."""
    c = np.pi / 4
    return 0.5 * (
        -2 * c + np.sqrt(4 * c**2 - 8 * c * x + 4 * c * np.pi - 4 * x**2 + np.pi**2)
    )


def squared_sl(x):
    """Quarter circle (duraton_scaling.py:40-41)."""
    return np.sqrt(np.maximum(HALF_PI**2 - x**2, 0.0))


_HW_KNOTS_PATH = pathlib.Path(__file__).parent.parent / "data" / "snail_speed_limit.json"
_hw_spline = None


def hardware_sl(x):
    """Measured SNAIL frontier, cubic-spline interpolated over distilled
    knots (snail_death_gate.py:96-99)."""
    global _hw_spline
    if _hw_spline is None:
        from scipy.interpolate import UnivariateSpline

        d = json.loads(_HW_KNOTS_PATH.read_text())
        _hw_spline = UnivariateSpline(d["x"], d["y"], s=d.get("s", 0.001))
    return _hw_spline(x)


SLFS = {"linear": None, "bare": None, "mid": mid_sl, "squared": squared_sl, "hardware": hardware_sl}


def speed_limited_cost(
    gc: float, gg: float, t: float, slf: Callable[[float], float]
) -> float:
    """Duration of (gc, gg, t) when rescaled onto the SLF frontier: find the
    frontier point along the gc:gg ray, inversely scale time
    (snail_death_gate.py:124-158; closed-form ray intersection replaces the
    reference's tolerance-bumping argwhere scan)."""
    if gc == 0 and gg == 0:
        raise ValueError("null gate has no speed-limited cost")
    if gc == 0:
        scaled_gg = float(slf(0.0))
        scale = scaled_gg / gg
    else:
        # largest frontier intersection of the gg:gc ray, found with an
        # escalating tolerance band (matches the reference's intersection
        # semantics on noisy measured splines, snail_death_gate.py:139-144)
        ratio = gg / gc
        xs = np.linspace(0.0, HALF_PI, 800)
        diff = np.abs(ratio * xs - np.asarray(slf(xs)))
        tol = 0.001
        while not np.any(diff < tol):
            tol += 0.001
        idx = int(np.max(np.where(diff < tol)[0]))
        scaled_gc = xs[idx]
        scale = scaled_gc / gc
    return t / scale


def speed_limited_gate(g: Gate, slf_name: str = "hardware") -> Gate:
    """SpeedLimitedGate analog: same unitary, duration re-costed by the SLF
    (snail_death_gate.py:108-122)."""
    import dataclasses as dc

    p1, p2, gc, gg, t = g.params
    slf = SLFS[slf_name]
    if slf is None:
        return g
    dur = speed_limited_cost(gc, gg, t, slf)
    return dc.replace(g, duration_override=dur)
