"""Matrix exponentials for small (4x4 / 8x8) complex matrices.

``expm_skew(H, t)`` computes expm(-i t H) for Hermitian H. Two routes:

  * ``expm_taylor`` — scaling-and-squaring with a fixed-order Taylor/Horner
    core. Branch-free, smooth everywhere (safe to differentiate through even
    at spectral degeneracies — the eigh route is not), 18 small matmuls.
    This is the hot-path choice for Hamiltonian/smush templates where the
    optimizer needs d expm / d params (reference computed qutip ``.expm()``
    per objective eval with finite-difference gradients,
    hamiltonian.py:33, optimizer.py:270).
  * ``expm_eigh`` — Jacobi eigh route; useful when eigenphases are wanted.

Norm bound: all Hamiltonians here have coefficient magnitudes <= ~pi, so
with SQUARINGS=7 the scaled norm is < 0.2 and a 12-term Taylor reaches
<1e-16 relative error in f64.
"""

from __future__ import annotations

import jax.numpy as jnp

from slam_decomposition_tpu.ops import cplx
from slam_decomposition_tpu.ops.eig import eigh_hermitian

_ORDER = 12
_SQUARINGS = 7


def expm_taylor(A: cplx.CMat) -> cplx.CMat:
    """expm(A) for a general small complex matrix pair A (fixed scaling)."""
    n = A[0].shape[-1]
    s = 2.0 ** (-_SQUARINGS)
    As = cplx.scale(A, s)
    eye = cplx.eye(n, dtype=A[0].dtype)
    eye = (jnp.broadcast_to(eye[0], A[0].shape), jnp.broadcast_to(eye[1], A[1].shape))
    # Horner: P = I + As/1 (I + As/2 (I + ... ))
    P = eye
    for k in range(_ORDER, 0, -1):
        P = cplx.add(eye, cplx.scale(cplx.matmul(As, P), 1.0 / k))
    for _ in range(_SQUARINGS):
        P = cplx.matmul(P, P)
    return P


def expm_skew(H: cplx.CMat, t=1.0) -> cplx.CMat:
    """expm(-i t H) for Hermitian H (the universal propagator form)."""
    A = cplx.scale((H[1], cplx.neg(H)[0]), 1.0)  # -iH = (Im(H), -Re(H))
    A = (H[1] * 1.0, -H[0] * 1.0)
    if not jnp.isscalar(t):
        t = jnp.asarray(t)
        A = (A[0] * t, A[1] * t)
    else:
        A = (A[0] * t, A[1] * t)
    return expm_taylor(A)


def expm_eigh(H: cplx.CMat, t=1.0) -> cplx.CMat:
    """expm(-i t H) via Hermitian eigendecomposition."""
    w, V = eigh_hermitian(H)
    ph = cplx.expi(-t * w)  # (..., n)
    # V diag(ph) V^dagger
    Vd = cplx.dagger(V)
    D_V = (
        ph[0][..., :, None] * Vd[0] - ph[1][..., :, None] * Vd[1],
        ph[0][..., :, None] * Vd[1] + ph[1][..., :, None] * Vd[0],
    )
    return cplx.matmul(V, D_V)
