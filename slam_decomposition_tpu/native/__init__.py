"""Native (C++) exact-rational polytope kernels with ctypes bindings.

Builds on first use (g++ -O2 -shared); every call falls back to the pure
Python Fractions implementation on overflow or build failure, so the
framework works without a toolchain — the native path accelerates the
coverage-construction sweep ~100x.
"""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess
from fractions import Fraction
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_HERE = pathlib.Path(__file__).parent
_SO = _HERE / "libslam_polytope.so"
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _SO.exists() or _SO.stat().st_mtime < (_HERE / "polytope_core.cpp").stat().st_mtime:
            subprocess.run(
                [
                    "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
                    str(_HERE / "polytope_core.cpp"), "-o", str(_SO),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.slam_lp_max.restype = ctypes.c_int
        lib.slam_reduce.restype = ctypes.c_int
        _lib = lib
    except (subprocess.CalledProcessError, OSError) as e:
        logger.warning("native polytope build failed (%s); using Python fallback", e)
        _build_failed = True
    return _lib


def _pack(rows: Sequence[Sequence[Fraction]], width: int) -> np.ndarray:
    out = np.empty((max(len(rows), 1), width, 2), dtype=np.int64)
    for i, r in enumerate(rows):
        for j, x in enumerate(r):
            f = Fraction(x)
            if abs(f.numerator) > 2**62 or f.denominator > 2**62:
                raise OverflowError
            out[i, j, 0] = f.numerator
            out[i, j, 1] = f.denominator
    return out


def lp_max_native(
    objective, ineqs, eqs
) -> Optional[Tuple[str, Optional[Fraction]]]:
    """Native exact LP; None -> caller should use the Python path."""
    lib = _get_lib()
    if lib is None:
        return None
    n = len(objective)
    try:
        I = _pack(ineqs, n + 1)
        E = _pack(eqs, n + 1)
        O = _pack([list(objective)], n)
    except OverflowError:
        return None
    num = ctypes.c_int64()
    den = ctypes.c_int64()
    st = lib.slam_lp_max(
        I.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(ineqs),
        E.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(eqs),
        O.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        ctypes.byref(num), ctypes.byref(den),
    )
    if st == 0:
        return "optimal", Fraction(num.value, den.value)
    if st == 1:
        return "unbounded", None
    if st == 2:
        return "infeasible", None
    return None  # overflow fallback


def reduce_native(ineqs, eqs, n_vars: int):
    """Native reduce: returns (keep_mask, eq_mask, empty) or None."""
    lib = _get_lib()
    if lib is None:
        return None
    try:
        I = _pack(ineqs, n_vars + 1)
        E = _pack(eqs, n_vars + 1)
    except OverflowError:
        return None
    keep = np.zeros(max(len(ineqs), 1), dtype=np.uint8)
    eqf = np.zeros(max(len(ineqs), 1), dtype=np.uint8)
    st = lib.slam_reduce(
        I.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(ineqs),
        E.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(eqs),
        n_vars, keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        eqf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if st == 0:
        return keep[: len(ineqs)].astype(bool), eqf[: len(ineqs)].astype(bool), False
    if st == 1:
        return keep[: len(ineqs)].astype(bool), eqf[: len(ineqs)].astype(bool), True
    return None
