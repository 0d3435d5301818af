"""Weyl-chamber and Makhlin local-invariant math, batched and jit-safe.

Replaces the reference's dependency on the ``weylchamber`` package
(c1c2c3 / g1g2g3 / canonical_gate / J_T_LI — see reference
src/slam/cost_function.py:7) and the eigendecomposition internals of
qiskit's two-qubit synthesis (reference weyl_decompose.py:207-330).

Math conventions (derived and unit-tested, see tests/test_weyl.py):

  * magic basis B = (1/sqrt2)[[1,0,0,i],[0,i,1,0],[0,i,-1,0],[1,0,0,-i]]
  * B^dag XX B = diag(1,1,-1,-1); YY -> diag(-1,1,-1,1); ZZ -> diag(1,-1,-1,1)
  * for U = k1 . CAN(t) . k2 in SU(4), with CAN(t) = expm(i(tx XX + ty YY
    + tz ZZ)), the matrix m = M^T M (M = B^dag U B) has eigenphases
    2 (v_k . t) with v in {(1,-1,1),(1,1,-1),(-1,-1,-1),(-1,1,1)}.
  * chamber coordinates (c1,c2,c3) = t / (pi/2), canonicalized to
    {c1 >= c2 >= c3 >= 0, c1 + c2 <= 1} (weylchamber convention: interior
    points with c1 > 1/2 are NOT folded; CNOT=(1/2,0,0), iSwap=(1/2,1/2,0),
    SWAP=(1/2,1/2,1/2), B=(1/2,1/4,0)).

All eigenphase extraction goes through deterministic joint Jacobi
diagonalization of the commuting real/imaginary parts of m — no randomized
retries (contrast reference weyl_decompose.py:249-257).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from slam_decomposition_tpu.ops import cplx
from slam_decomposition_tpu.ops.eig import joint_diag

_SQ2 = 1.0 / np.sqrt(2.0)
# magic basis as (re, im) numpy constants
MAGIC_RE = np.array(
    [[_SQ2, 0, 0, 0], [0, 0, _SQ2, 0], [0, 0, -_SQ2, 0], [_SQ2, 0, 0, 0]]
)
MAGIC_IM = np.array(
    [[0, 0, 0, _SQ2], [0, _SQ2, 0, 0], [0, _SQ2, 0, 0], [0, 0, 0, -_SQ2]]
)

# sign vectors: eigenphase_k = 2 * (V_SIGNS[k] . t)
V_SIGNS = np.array([[1, -1, 1], [1, 1, -1], [-1, -1, -1], [-1, 1, 1]])


def _magic(dtype):
    return (jnp.asarray(MAGIC_RE, dtype=dtype), jnp.asarray(MAGIC_IM, dtype=dtype))


def to_magic(U: cplx.CMat) -> cplx.CMat:
    """B^dag U B."""
    B = _magic(U[0].dtype)
    return cplx.matmul(cplx.dagger(B), cplx.matmul(U, B))


def from_magic(M: cplx.CMat) -> cplx.CMat:
    B = _magic(M[0].dtype)
    return cplx.matmul(B, cplx.matmul(M, cplx.dagger(B)))


def su4_normalize(U: cplx.CMat):
    """Scale U(4) -> SU(4) via det^{-1/4} (principal branch).

    Returns (U_s, global_phase) with U = e^{i phase} U_s.
    """
    det = cplx.det4(U)
    phase = jnp.arctan2(det[1], det[0]) / 4.0
    # magnitude correction (numerical): |det|^{-1/4}
    mag = (det[0] ** 2 + det[1] ** 2) ** (-0.125)
    ph = cplx.expi(-phase)
    sc = ((ph[0] * mag)[..., None, None], (ph[1] * mag)[..., None, None])
    Us = cplx.cscale(U, sc)
    return Us, phase


def gamma_eigenphases(U: cplx.CMat) -> jnp.ndarray:
    """Eigenphases (4, unsorted, in (-pi, pi]) of m = M^T M for U in U(4)."""
    Us, _ = su4_normalize(U)
    M = to_magic(Us)
    m = cplx.matmul(cplx.transpose(M), M)
    x, y, _ = joint_diag(m[0], m[1])
    # m is unitary symmetric: eigenvalue_k = x_k + i y_k on the unit circle
    return jnp.arctan2(y, x)


def _canonicalize_c(c: jnp.ndarray) -> jnp.ndarray:
    """Map coordinate triples (units of pi/2, any real values) into the Weyl
    chamber {c1 >= c2 >= c3 >= 0, c1 + c2 <= 1}. Branch-free."""
    c = jnp.mod(c, 1.0)
    for _ in range(3):
        c = -jnp.sort(-c, axis=-1)  # descending
        cond = (c[..., 0] + c[..., 1]) > 1.0
        folded = jnp.stack(
            [1.0 - c[..., 1], 1.0 - c[..., 0], c[..., 2]], axis=-1
        )
        folded = jnp.mod(folded, 1.0)
        c = jnp.where(cond[..., None], folded, c)
    c = -jnp.sort(-c, axis=-1)
    # on the c3=0 plane, (c1,c2,0) ~ (1-c1,c2,0): canonicalize to the left
    # side (deterministic; the reference's weylchamber dependency leaves the
    # side arbitrary, forcing manual folds at bare_candidates.py:56-58)
    tol = jnp.asarray(1e-7, dtype=c.dtype)
    boundary = (c[..., 2] < tol) & (c[..., 0] > 0.5)
    folded = jnp.stack([1.0 - c[..., 0], c[..., 1], c[..., 2]], axis=-1)
    c = jnp.where(boundary[..., None], folded, c)
    return -jnp.sort(-c, axis=-1)


def c1c2c3(U: cplx.CMat) -> jnp.ndarray:
    """Weyl chamber coordinates, weylchamber-package units/convention.

    Works on a single (4,4) pair or any leading batch dims; returns (..., 3).
    """
    # _phases_to_c re-lifts the 4th phase so the sum is exactly 0 (any lift
    # difference is a lattice translation absorbed by canonicalization);
    # (v_k + v_3)/2 pairs are signed unit vectors, so ctil = W t for a signed
    # permutation W — which always carries an odd number of sign flips (an
    # improper Weyl element mapping to the mirror class). _phases_to_c
    # negates to restore the proper class, then canonicalizes.
    return _phases_to_c(gamma_eigenphases(U))


def g1g2g3(U: cplx.CMat) -> jnp.ndarray:
    """Makhlin invariants (g1, g2, g3). Identity=(1,0,3), CNOT=(0,0,1),
    iSwap=(0,0,-1), SWAP=(-1,0,-3)."""
    Us, _ = su4_normalize(U)
    M = to_magic(Us)
    m = cplx.matmul(cplx.transpose(M), M)
    tr = cplx.trace(m)
    tr2 = cplx.trace(cplx.matmul(m, m))
    g12 = cplx.mul(tr, tr)
    g1 = g12[0] / 16.0
    g2 = g12[1] / 16.0
    g3 = (g12[0] - tr2[0]) / 4.0
    return jnp.stack([g1, g2, g3], axis=-1)


def canonical_gate(c: jnp.ndarray, dtype=jnp.float64) -> cplx.CMat:
    """CAN((pi/2) c) = expm(i (pi/2)(c1 XX + c2 YY + c3 ZZ)).

    Built directly from the diagonal form in the magic basis — no expm.
    Accepts (..., 3); returns (..., 4, 4) pair.
    """
    c = jnp.asarray(c, dtype=dtype)
    v = jnp.asarray(V_SIGNS, dtype=dtype)  # (4, 3)
    mu = (np.pi / 2.0) * jnp.einsum("kj,...j->...k", v, c)  # (..., 4)
    ph = cplx.expi(mu)
    B = _magic(dtype)
    # B diag(ph) B^dag
    Bd = cplx.dagger(B)
    D_Bd = (
        ph[0][..., :, None] * Bd[0] - ph[1][..., :, None] * Bd[1],
        ph[0][..., :, None] * Bd[1] + ph[1][..., :, None] * Bd[0],
    )
    return cplx.matmul(B, D_Bd)


def monodromy_coords(U: cplx.CMat) -> jnp.ndarray:
    """Monodromy (alcove) coordinates of gamma(U): a with eigenvalues of m
    equal to e^{2 pi i a_k}, a1>=a2>=a3>=a4, sum(a)=0, a1-a4<=1.

    Because U is physical only up to phase, gamma is defined up to sign; the
    two candidate classes are a and shift(a + 1/2). Returns (..., 2, 4): both
    alcove representatives (they coincide for self-mirror gates).
    Reference counterpart: monodromy.coordinates.unitary_to_monodromy_coordinate
    (used at polytope_wrap.py:47).
    """
    th = gamma_eigenphases(U)
    return _phases_to_reps(th)


def monodromy_coords_mixed(U: cplx.CMat) -> jnp.ndarray:
    """monodromy_coords with a TPU-friendly mixed-precision eigensolve.

    f64 on TPU is software-emulated (~140x); the full-f64 joint Jacobi is
    what forces the CPU pin in coverage.monodromy_reps_float. Here only the
    tiny fixed-cost pieces stay f64 (magic-basis products, and a Rayleigh
    refinement at the end); the iterative Jacobi sweeps run in f32. The
    Rayleigh quotient of an eigenvector with O(eps32) error has O(eps32^2)
    eigenVALUE error — including for clustered spectra, where the value
    lies within the (zero-width) cluster plus quadratic leakage — so the
    refined phases are accurate to ~1e-12, far inside the 1e-8 membership
    tolerance. Verified against the f64 path on Haar + degenerate gates.
    """
    return _phases_to_reps(gamma_eigenphases_mixed(U))


def gamma_eigenphases_mixed(U: cplx.CMat) -> jnp.ndarray:
    """gamma_eigenphases with the f32-Jacobi + f64-Rayleigh eigensolve
    (see monodromy_coords_mixed for the precision argument)."""
    Us, _ = su4_normalize(U)
    M = to_magic(Us)
    m = cplx.matmul(cplx.transpose(M), M)  # unitary symmetric, f64
    X64, Y64 = m
    _, _, V32 = joint_diag(
        X64.astype(jnp.float32), Y64.astype(jnp.float32)
    )
    V = V32.astype(X64.dtype)
    vv = jnp.sum(V * V, axis=-2)  # (..., 4) column norms^2
    lx = jnp.einsum("...ik,...ij,...jk->...k", V, X64, V) / vv
    ly = jnp.einsum("...ik,...ij,...jk->...k", V, Y64, V) / vv
    return jnp.arctan2(ly, lx)


def _phases_to_c(th: jnp.ndarray) -> jnp.ndarray:
    """Eigenphases -> canonical Weyl-chamber c1c2c3 (the tail of c1c2c3)."""
    t3 = -(th[..., 0] + th[..., 1] + th[..., 2])
    ctil = jnp.stack(
        [
            (th[..., 0] + t3) / 4.0,
            (th[..., 1] + t3) / 4.0,
            (th[..., 2] + t3) / 4.0,
        ],
        axis=-1,
    )
    return _canonicalize_c(-ctil / (np.pi / 2.0))


def c1c2c3_mixed(U: cplx.CMat) -> jnp.ndarray:
    """c1c2c3 with the TPU-friendly mixed-precision eigensolve — same
    routing role for Weyl coordinates that monodromy_coords_mixed plays for
    alcove coordinates (transpile passes ride this on-device)."""
    return _phases_to_c(gamma_eigenphases_mixed(U))


def _phases_to_reps(th: jnp.ndarray) -> jnp.ndarray:
    a = th / (2.0 * np.pi)

    def reduce_alcove(a):
        # sort desc; enforce sum == 0 by integer shifts on sorted entries
        a = -jnp.sort(-a, axis=-1)
        s = jnp.round(jnp.sum(a, axis=-1)).astype(a.dtype)
        # subtract 1 from the largest s entries (s in {-2..2}); do it one at
        # a time, branch-free
        for _ in range(2):
            need_down = s > 0.5
            a0 = a[..., 0] - jnp.where(need_down, 1.0, 0.0)
            a = jnp.concatenate([a0[..., None], a[..., 1:]], axis=-1)
            s = s - jnp.where(need_down, 1.0, 0.0)
            a = -jnp.sort(-a, axis=-1)
            need_up = s < -0.5
            a3 = a[..., 3] + jnp.where(need_up, 1.0, 0.0)
            a = jnp.concatenate([a[..., :3], a3[..., None]], axis=-1)
            s = s + jnp.where(need_up, 1.0, 0.0)
            a = -jnp.sort(-a, axis=-1)
        return a

    a1 = reduce_alcove(a)
    a2 = reduce_alcove(a + 0.5)
    return jnp.stack([a1, a2], axis=-2)


def positive_canonical_to_monodromy(c: jnp.ndarray) -> jnp.ndarray:
    """Chamber coords (pi/2 units, (...,3)) -> one monodromy representative
    (...,4). Mirrors monodromy.coordinates.positive_canonical_to_monodromy_
    coordinate (used at parallel_drive_volume.py:318)."""
    x, y, z = c[..., 0] / 2.0, c[..., 1] / 2.0, c[..., 2] / 2.0
    a = jnp.stack([x + y - z, x - y + z, -x + y + z, -x - y - z], axis=-1)
    a = -jnp.sort(-a, axis=-1)
    # alcove: if a1 - a4 > 1 ... (points from the chamber always satisfy it)
    return a
