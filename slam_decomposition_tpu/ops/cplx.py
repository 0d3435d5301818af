"""Complex matrices as (real, imag) array pairs.

TPU has no complex128 support, and complex64 cannot certify 1e-10 losses.
Carrying complex values as a pytree pair ``(re, im)`` of real arrays gives a
single code path that runs in f32 or f64 on TPU, is trivially vmappable, and
differentiates as plain real arithmetic (no holomorphic subtleties).

Shapes are unconstrained: every op broadcasts / batches like the underlying
jnp op. A "cmat" is a tuple ``(re, im)`` with identical shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

CMat = Tuple[jnp.ndarray, jnp.ndarray]


def cmat(re, im=None) -> CMat:
    re = jnp.asarray(re)
    if im is None:
        im = jnp.zeros_like(re)
    return (re, jnp.asarray(im))


def from_numpy(a, dtype=jnp.float64) -> CMat:
    import numpy as np

    a = np.asarray(a)
    return (jnp.asarray(a.real, dtype=dtype), jnp.asarray(a.imag, dtype=dtype))


def to_numpy(a: CMat):
    import numpy as np

    return np.asarray(a[0]) + 1j * np.asarray(a[1])


def add(a: CMat, b: CMat) -> CMat:
    return (a[0] + b[0], a[1] + b[1])


def sub(a: CMat, b: CMat) -> CMat:
    return (a[0] - b[0], a[1] - b[1])


def neg(a: CMat) -> CMat:
    return (-a[0], -a[1])


def scale(a: CMat, s) -> CMat:
    """Multiply by a real scalar/array."""
    return (a[0] * s, a[1] * s)


def cscale(a: CMat, s: CMat) -> CMat:
    """Multiply elementwise by a complex scalar/array pair."""
    return (a[0] * s[0] - a[1] * s[1], a[0] * s[1] + a[1] * s[0])


def mul(a: CMat, b: CMat) -> CMat:
    """Elementwise complex product."""
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def conj(a: CMat) -> CMat:
    return (a[0], -a[1])


def transpose(a: CMat) -> CMat:
    return (jnp.swapaxes(a[0], -1, -2), jnp.swapaxes(a[1], -1, -2))


def dagger(a: CMat) -> CMat:
    return (jnp.swapaxes(a[0], -1, -2), -jnp.swapaxes(a[1], -1, -2))


def matmul(a: CMat, b: CMat) -> CMat:
    """Complex matmul via 4 real matmuls (3M Karatsuba not worth it at 4x4)."""
    ar, ai = a
    br, bi = b
    return (ar @ br - ai @ bi, ar @ bi + ai @ br)


def matvec(a: CMat, v: CMat) -> CMat:
    ar, ai = a
    vr, vi = v
    re = jnp.einsum("...ij,...j->...i", ar, vr) - jnp.einsum("...ij,...j->...i", ai, vi)
    im = jnp.einsum("...ij,...j->...i", ar, vi) + jnp.einsum("...ij,...j->...i", ai, vr)
    return (re, im)


def trace(a: CMat) -> CMat:
    return (
        jnp.trace(a[0], axis1=-2, axis2=-1),
        jnp.trace(a[1], axis1=-2, axis2=-1),
    )


def abs2(a: CMat) -> jnp.ndarray:
    return a[0] * a[0] + a[1] * a[1]


def cabs(a: CMat) -> jnp.ndarray:
    return jnp.sqrt(abs2(a))


def angle(a: CMat) -> jnp.ndarray:
    return jnp.arctan2(a[1], a[0])


def expi(theta) -> CMat:
    """e^{i theta} for real theta."""
    return (jnp.cos(theta), jnp.sin(theta))


def kron(a: CMat, b: CMat) -> CMat:
    """Kronecker product; supports leading batch dims on both operands."""
    ar, ai = a
    br, bi = b

    def _k(x, y):
        # batched kron: (..., m, n) x (..., p, q) -> (..., m*p, n*q)
        m, n = x.shape[-2], x.shape[-1]
        p, q = y.shape[-2], y.shape[-1]
        out = x[..., :, None, :, None] * y[..., None, :, None, :]
        return out.reshape(*out.shape[:-4], m * p, n * q)

    return (_k(ar, br) - _k(ai, bi), _k(ar, bi) + _k(ai, br))


def eye(n: int, dtype=jnp.float64) -> CMat:
    return (jnp.eye(n, dtype=dtype), jnp.zeros((n, n), dtype=dtype))


def zeros(shape, dtype=jnp.float64) -> CMat:
    return (jnp.zeros(shape, dtype=dtype), jnp.zeros(shape, dtype=dtype))


def stack(mats, axis=0) -> CMat:
    return (
        jnp.stack([m[0] for m in mats], axis=axis),
        jnp.stack([m[1] for m in mats], axis=axis),
    )


def astype(a: CMat, dtype) -> CMat:
    return (a[0].astype(dtype), a[1].astype(dtype))


def frobenius_dist(a: CMat, b: CMat) -> jnp.ndarray:
    d = sub(a, b)
    return jnp.sqrt(jnp.sum(abs2(d), axis=(-2, -1)))


def det4(a: CMat) -> CMat:
    """Determinant of a (batched) 4x4 complex matrix by cofactor expansion
    over 2x2 minors (Laplace along first two rows). Branch-free, jit-safe."""
    ar, ai = a

    def minor2(r0, r1, c0, c1):
        re = (
            ar[..., r0, c0] * ar[..., r1, c1]
            - ai[..., r0, c0] * ai[..., r1, c1]
            - (ar[..., r0, c1] * ar[..., r1, c0] - ai[..., r0, c1] * ai[..., r1, c0])
        )
        im = (
            ar[..., r0, c0] * ai[..., r1, c1]
            + ai[..., r0, c0] * ar[..., r1, c1]
            - (ar[..., r0, c1] * ai[..., r1, c0] + ai[..., r0, c1] * ar[..., r1, c0])
        )
        return (re, im)

    # det = sum over column pairs (c0<c1) of sign * M_top(c0,c1) * M_bot(rest)
    import itertools

    cols = [0, 1, 2, 3]
    total_r = 0.0
    total_i = 0.0
    for (c0, c1) in itertools.combinations(cols, 2):
        rest = [c for c in cols if c not in (c0, c1)]
        # permutation sign of (c0, c1, rest[0], rest[1])
        perm = (c0, c1, rest[0], rest[1])
        inv = sum(
            1
            for x in range(4)
            for y in range(x + 1, 4)
            if perm[x] > perm[y]
        )
        sign = -1.0 if inv % 2 else 1.0
        top = minor2(0, 1, c0, c1)
        bot = minor2(2, 3, rest[0], rest[1])
        prod = mul(top, bot)
        total_r = total_r + sign * prod[0]
        total_i = total_i + sign * prod[1]
    return (total_r, total_i)


def det2(a: CMat) -> CMat:
    ar, ai = a
    re = (
        ar[..., 0, 0] * ar[..., 1, 1]
        - ai[..., 0, 0] * ai[..., 1, 1]
        - (ar[..., 0, 1] * ar[..., 1, 0] - ai[..., 0, 1] * ai[..., 1, 0])
    )
    im = (
        ar[..., 0, 0] * ai[..., 1, 1]
        + ai[..., 0, 0] * ar[..., 1, 1]
        - (ar[..., 0, 1] * ai[..., 1, 0] + ai[..., 0, 1] * ar[..., 1, 0])
    )
    return (re, im)
