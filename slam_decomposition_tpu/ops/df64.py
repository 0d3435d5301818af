"""Double-single ("df64") arithmetic: ~2^-48 precision from f32 pairs.

TPU has no f64 ALUs — XLA emulates f64 at ~140x the f32 cost per lane on
our chain workload (docs/profile_solver.md). The classic alternative
(Dekker 1971; Bailey's dsfun/CUDA df64) represents a value as an unevaluated
sum hi + lo of two f32 and uses error-free transforms for the arithmetic.
Verified on this chip: two_sum and Dekker two_prod residuals are BIT-EXACT
against f64 inside Pallas kernels (the VPU is IEEE f32 without forced FMA
contraction), so these routines deliver ~44-48 bits of effective mantissa —
enough to drive synthesis residuals to ~1e-13, far below the 1e-10
certification bar (certification itself stays in true f64 on the host path).

All functions are pure jnp on (hi, lo) tuples of same-shape f32 arrays and
lower cleanly in Pallas kernels (no scalar transcendentals, no scatter).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

DF = Tuple[jnp.ndarray, jnp.ndarray]  # (hi, lo), both f32

_SPLIT = np.float32(4097.0)  # 2^12 + 1 (f32 has a 24-bit mantissa)


def const(x: float) -> Tuple[np.float32, np.float32]:
    """Split a python/f64 constant into an (hi, lo) f32 pair."""
    hi = np.float32(x)
    lo = np.float32(x - np.float64(hi))
    return hi, lo


def from_f64(x) -> DF:
    """Host-side split of an f64 array (jnp ops; not for kernel use)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(x: DF):
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def lift(hi) -> DF:
    return hi, jnp.zeros_like(hi)


def two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def two_prod(a, b):
    p = a * b
    t = _SPLIT * a
    ah = t - (t - a)
    al = a - ah
    t = _SPLIT * b
    bh = t - (t - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def add(x: DF, y: DF) -> DF:
    s, e = two_sum(x[0], y[0])
    return quick_two_sum(s, e + (x[1] + y[1]))


def sub(x: DF, y: DF) -> DF:
    return add(x, (-y[0], -y[1]))


def neg(x: DF) -> DF:
    return (-x[0], -x[1])


def mul(x: DF, y: DF) -> DF:
    p, e = two_prod(x[0], y[0])
    return quick_two_sum(p, e + (x[0] * y[1] + x[1] * y[0]))


def scale_exact(x: DF, s) -> DF:
    """Multiply by an exactly-representable power-of-two scalar."""
    return (x[0] * s, x[1] * s)


def div(x: DF, y: DF) -> DF:
    q1 = x[0] / y[0]
    r = sub(x, mul((q1, jnp.zeros_like(q1)), y))
    q2 = (r[0] + r[1]) / y[0]
    return quick_two_sum(q1, q2)


def sqrt(x: DF) -> DF:
    """df64 square root (x >= 0): f32 seed + one exact-residual correction."""
    s = jnp.sqrt(jnp.maximum(x[0], 0.0))
    sd = (s, jnp.zeros_like(s))
    diff = sub(x, mul(sd, sd))
    e = (diff[0] + diff[1]) / jnp.maximum(2.0 * s, jnp.float32(1e-30))
    return quick_two_sum(s, e)


# ---------------------------------------------------------------------------
# sin / cos to df64 precision.
#
# Cody-Waite range reduction by pi/2 (k exact in f32 for |x| < ~2^11), then
# Taylor series on |r| <= pi/4 evaluated in df64 Horner form. Term counts
# chosen for < 2^-48 relative truncation error at pi/4.
# ---------------------------------------------------------------------------

_PIO2 = const(np.pi / 2)
# third pi/2 word: bits below the df64 constant (Cody-Waite 3-word
# reduction — without it the k*pi/2 error is k * 2^-49 ~ 1e-13 absolute)
_PIO2_T = np.float32(
    np.pi / 2 - np.float64(_PIO2[0]) - np.float64(_PIO2[1])
)
_TWO_OVER_PI = np.float32(2.0 / np.pi)
import math as _math

# 1/(2k+1)! for sin: r - r^3/3! + r^5/5! - ... up to r^17
_SIN_COEFS = [
    const(((-1.0) ** k) / float(_math.factorial(2 * k + 1))) for k in range(1, 9)
]
# 1/(2k)! for cos: 1 - r^2/2! + r^4/4! - ... up to r^18
_COS_COEFS = [
    const(((-1.0) ** k) / float(_math.factorial(2 * k))) for k in range(1, 10)
]


def _poly_sin(r: DF) -> DF:
    r2 = mul(r, r)
    acc = (
        jnp.full_like(r[0], _SIN_COEFS[-1][0]),
        jnp.full_like(r[0], _SIN_COEFS[-1][1]),
    )
    for c in reversed(_SIN_COEFS[:-1]):
        acc = add(mul(acc, r2), (jnp.full_like(r[0], c[0]), jnp.full_like(r[0], c[1])))
    # sin = r + r * r2 * acc
    return add(r, mul(r, mul(r2, acc)))


def _poly_cos(r: DF) -> DF:
    r2 = mul(r, r)
    acc = (
        jnp.full_like(r[0], _COS_COEFS[-1][0]),
        jnp.full_like(r[0], _COS_COEFS[-1][1]),
    )
    for c in reversed(_COS_COEFS[:-1]):
        acc = add(mul(acc, r2), (jnp.full_like(r[0], c[0]), jnp.full_like(r[0], c[1])))
    one = (jnp.ones_like(r[0]), jnp.zeros_like(r[0]))
    return add(one, mul(r2, acc))


def sincos(x: DF) -> Tuple[DF, DF]:
    """(sin x, cos x) to ~2^-47; valid for |x| < ~2000 (k exact in f32)."""
    k = jnp.round(x[0] * _TWO_OVER_PI)
    kd = (k, jnp.zeros_like(k))
    r = sub(x, mul(kd, (jnp.full_like(k, _PIO2[0]), jnp.full_like(k, _PIO2[1]))))
    r = sub(r, lift(k * _PIO2_T))
    s, c = _poly_sin(r), _poly_cos(r)
    q = k.astype(jnp.int32) & 3
    is0, is1, is2 = q == 0, q == 1, q == 2

    def pick(a, b, c_, d):
        hi = jnp.where(is0, a[0], jnp.where(is1, b[0], jnp.where(is2, c_[0], d[0])))
        lo = jnp.where(is0, a[1], jnp.where(is1, b[1], jnp.where(is2, c_[1], d[1])))
        return hi, lo

    sin_out = pick(s, c, neg(s), neg(c))
    cos_out = pick(c, neg(s), neg(c), s)
    return sin_out, cos_out


# ---------------------------------------------------------------------------
# complex df64 helpers: value = (re_hi, re_lo, im_hi, im_lo) as ((re),(im))
# of DF pairs
# ---------------------------------------------------------------------------


def cmul(a, b):
    """(a_re, a_im) x (b_re, b_im), each a DF pair."""
    (ar, ai), (br, bi) = a, b
    re = sub(mul(ar, br), mul(ai, bi))
    im = add(mul(ar, bi), mul(ai, br))
    return re, im


def cadd(a, b):
    return add(a[0], b[0]), add(a[1], b[1])
