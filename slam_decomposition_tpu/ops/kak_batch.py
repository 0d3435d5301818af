"""Batched, branch-free analytic sqrt(iSwap) synthesis on device.

The host-side deterministic KAK + 2/3-application synthesis
(transpile/kak.py, replacing reference weyl_decompose.py:207-449) emits an
EXACT decomposition per target — but one target at a time, in Python.
This module re-derives that pipeline as a fixed-shape jax program that
vmaps over targets, producing the ansatz parameter vector (the u3-layer
layout of models/templates.build_ansatz) directly:

    U  ~locally~  L_k SQiSW ... L_1 SQiSW L_0        (k = 2 or 3)

Design points (all forced by jit):
  * joint diagonalization of (Re m, Im m) by a FIXED number of Jacobi
    sweeps (the host uses the same Cardoso iteration with a convergence
    check; 12 sweeps reach f32 roundoff);
  * Weyl-chamber canonicalization as masked select moves (host
    kak.py:158-186 branches);
  * the interleaving quartic (kak.py:262-376) solved by Durand-Kerner
    iteration — all four roots at once, branch-free — with the two z=0
    boundary branches always computed and the winner chosen by exact
    Makhlin-invariant residual screening;
  * the 3-application split's variant search (kak.py:452-491) evaluated
    over all 48 tracked variants with a masked first-valid select.

Accuracy target is NOT the 1e-10 certification: this is the *warm start*
for the double-single LM polish kernel (ops/pallas_chain.make_polish_chain),
whose convergence basin is ~1e-4 in square-cost (== ~1e-2 in parameter
error, since cost is quadratic at the optimum). An all-f32 synthesis lands
1e-6..1e-9 typically and well inside the basin even at quartic double
roots; the few escapees are rescued by the variational solver (bench.py's
rescue rounds). The reference has no counterpart — its analytic route
(weyl_decompose.py) feeds qiskit circuits serially.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from slam_decomposition_tpu.ops.eig import joint_diag
from slam_decomposition_tpu.ops.weyl import MAGIC_IM, MAGIC_RE

PI = np.pi
PI2 = np.pi / 2
PI4 = np.pi / 4
PI8 = np.pi / 8

_B_NP = MAGIC_RE + 1j * MAGIC_IM
# CAN(t) = B diag(exp(i V_ROWS @ t)) B^dag (kak.py:41-55)
_V_ROWS_NP = np.array(
    [[1, -1, 1], [1, 1, -1], [-1, -1, -1], [-1, 1, 1]], dtype=float
)
_PAULI_NP = {
    0: np.array([[0, 1], [1, 0]], dtype=complex),
    1: np.array([[0, -1j], [1j, 0]], dtype=complex),
    2: np.diag([1.0 + 0j, -1.0]),
}

def _cdtype(dtype):
    return jnp.complex64 if dtype == jnp.float32 else jnp.complex128


def _consts(dtype):
    c = _cdtype(dtype)
    B = jnp.asarray(_B_NP, c)
    V = jnp.asarray(_V_ROWS_NP, dtype)
    P = [jnp.asarray(_PAULI_NP[i], c) for i in range(3)]
    return B, V, P


def can_matrix_c(t, dtype):
    """CAN(t) as a complex (4,4), t shape (3,)."""
    B, V, _ = _consts(dtype)
    ph = jnp.exp(1j * (V @ t).astype(_cdtype(dtype)))
    return (B * ph[None, :]) @ B.conj().T


def sqiswap_c(dtype):
    return can_matrix_c(jnp.asarray([PI8, PI8, 0.0], dtype), dtype)


# --------------------------------------------------------------- KAK core


def _split_product(K):
    """K = e^{i phase} kron(l, r) -> (l, r) in SU(2), phase dropped
    (costs are phase-invariant). Closed form via the rank-1 rearrangement
    R = vec(l) vec(r)^T (kak.py:83-94 uses an SVD; the dominant-row
    extraction below is exact for product gates and branch-free)."""
    R = K.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3).reshape(4, 4)
    norms = jnp.sum(jnp.abs(R) ** 2, axis=1)
    i0 = jnp.argmax(norms)
    rvec = R[i0]
    lvec = R @ rvec.conj() / jnp.maximum(norms[i0], jnp.finfo(norms.dtype).tiny)
    l = lvec.reshape(2, 2)
    r = rvec.reshape(2, 2)
    l = l / jnp.sqrt(l[0, 0] * l[1, 1] - l[0, 1] * l[1, 0])
    r = r / jnp.sqrt(r[0, 0] * r[1, 1] - r[0, 1] * r[1, 0])
    return l, r


# ---------------------------------------------- tracked canonical moves
# State: (t (3,), l1, r1, l2, r2) — U ~ (l1 ox r1) CAN(t) (l2 ox r2) up to
# a global phase (never tracked; every dropped factor is scalar).


def _mask_mat(c, A, B):
    return jnp.where(c, A, B)


def _shift(state, i, k, P):
    """t[i] += k*pi/2, folding (P_i ox P_i)^k into the right locals
    (kak.py:118-133; the (-i)^k scalar is dropped)."""
    t, l1, r1, l2, r2 = state
    t = t.at[i].add(k * PI2)
    m = jnp.mod(k, 2.0) > 0.5
    l2 = _mask_mat(m, P[i] @ l2, l2)
    r2 = _mask_mat(m, P[i] @ r2, r2)
    return (t, l1, r1, l2, r2)


def _swap(state, i, j, P, cond=None):
    """Swap t[i], t[j] via R_k(pi/2) ox R_k(pi/2) (kak.py:135-146),
    masked by cond."""
    t, l1, r1, l2, r2 = state
    k = 3 - i - j
    c4 = jnp.asarray(np.cos(PI4), t.dtype)
    R = c4 * jnp.eye(2, dtype=P[k].dtype) - 1j * c4 * P[k]
    Rd = R.conj().T
    tn = t.at[i].set(t[j]).at[j].set(t[i])
    if cond is None:
        return (tn, l1 @ Rd, r1 @ Rd, R @ l2, R @ r2)
    c = cond
    return (
        jnp.where(c, tn, t),
        _mask_mat(c, l1 @ Rd, l1),
        _mask_mat(c, r1 @ Rd, r1),
        _mask_mat(c, R @ l2, l2),
        _mask_mat(c, R @ r2, r2),
    )


def _pair_flip(state, i, j, P, cond=None):
    """Negate t[i], t[j] via P_k ox I on both sides (kak.py:148-156)."""
    t, l1, r1, l2, r2 = state
    k = 3 - i - j
    tn = t.at[i].set(-t[i]).at[j].set(-t[j])
    if cond is None:
        return (tn, l1 @ P[k], r1, P[k] @ l2, r2)
    c = cond
    return (
        jnp.where(c, tn, t),
        _mask_mat(c, l1 @ P[k], l1),
        r1,
        _mask_mat(c, P[k] @ l2, l2),
        r2,
    )


def _shift_floor_all(state, P, cond=None):
    for i in range(3):
        t = state[0]
        k = -jnp.floor(t[i] / PI2)
        if cond is not None:
            k = jnp.where(cond, k, 0.0)
        state = _shift(state, i, k, P)
    return state


def _canonicalize(state, P):
    """Drive t into the chamber pi/4 >= t0 >= t1 >= |t2| with tracked
    locals — masked-select version of kak.py:158-186."""
    state = _shift_floor_all(state, P)
    for _ in range(4):  # host loops at most this many times in practice
        # descending 3-sort network
        t = state[0]
        state = _swap(state, 0, 1, P, cond=t[1] > t[0])
        t = state[0]
        state = _swap(state, 0, 2, P, cond=t[2] > t[0])
        t = state[0]
        state = _swap(state, 1, 2, P, cond=t[2] > t[1])
        t = state[0]
        c = t[0] + t[1] > PI2
        state = _pair_flip(state, 0, 1, P, cond=c)
        state = _shift(state, 0, jnp.where(c, 1.0, 0.0), P)
        state = _shift(state, 1, jnp.where(c, 1.0, 0.0), P)
        state = _swap(state, 0, 1, P, cond=c)
        state = _shift_floor_all(state, P, cond=c)
    t = state[0]
    c = t[0] > PI4
    state = _pair_flip(state, 0, 2, P, cond=c)
    state = _shift(state, 0, jnp.where(c, 1.0, 0.0), P)
    t = state[0]
    state = _swap(state, 1, 2, P, cond=t[2] > t[1])
    # pi/4-face sign fix (kak.py:183-185)
    t = state[0]
    c = (jnp.abs(t[0] - PI4) < 1e-6) & (t[2] < 0)
    state = _pair_flip(state, 0, 2, P, cond=c)
    state = _shift(state, 0, jnp.where(c, 1.0, 0.0), P)
    return state


def _kak_state(U, dtype):
    """Phase-free tracked KAK of one complex (4,4): returns canonical
    (t, l1, r1, l2, r2) — jax transcription of kak.py:204-228."""
    B, V, P = _consts(dtype)
    det = jnp.linalg.det(U)
    # principal inverse 4th root of the (unit-modulus) determinant
    Us = U * jnp.exp(-1j * jnp.angle(det) / 4) / jnp.abs(det) ** 0.25
    M = B.conj().T @ Us @ B
    m = M.T @ M
    # Cardoso joint Jacobi (kak.py:58-81 role), shared with the coords
    # path — ops/eig.joint_diag is the one maintained pivot iteration
    x, y, Pv = joint_diag(m.real.astype(dtype), m.imag.astype(dtype))
    s = jnp.sign(jnp.linalg.det(Pv))
    Pv = Pv.at[:, -1].multiply(s)
    theta = jnp.arctan2(y, x)
    d = -theta / 2.0
    n = jnp.round(jnp.sum(d) / PI)
    d = d.at[0].add(-PI * n)
    Pc = Pv.astype(_cdtype(dtype))
    K1 = B @ (M @ Pc @ jnp.diag(jnp.exp(1j * d.astype(_cdtype(dtype))))) @ B.conj().T
    K2 = B @ Pc.T @ B.conj().T
    t = -(V.T @ d) / 4.0
    l1, r1 = _split_product(K1)
    l2, r2 = _split_product(K2)
    return _canonicalize((t, l1, r1, l2, r2), P)


# ----------------------------------------------- interleaving rotations


def _makhlin_c(U, dtype, assume_su: bool = False):
    """(Re g1g2, Im g1g2, g3) from traces (kak.py:250-259).

    ``assume_su``: skip the det-phase normalization for matrices known to
    have det == 1 analytically (CAN(t) has det exp(i*sum(V_ROWS @ t)) = 1
    since V_ROWS columns sum to 0; Rz/Rx/their krons are det-1; so every
    matrix in the interleave residual qualifies). This matters on TPU:
    jnp.linalg.det lowers to a batched LU custom call whose JVP (LU +
    triangular solves) dominated the analytic-init runtime — 13.0 s of the
    13.3 s/10k was the GN polish differentiating through det."""
    B, _, _ = _consts(dtype)
    Us = U
    if not assume_su:
        det = jnp.linalg.det(U)
        Us = U * jnp.exp(-1j * jnp.angle(det) / 4) / jnp.abs(det) ** 0.25
    M = B.conj().T @ Us @ B
    m = M.T @ M
    tr = jnp.trace(m)
    g12 = tr * tr / 16.0
    g3 = (tr * tr - jnp.trace(m @ m)) / 4.0
    return jnp.stack([g12.real, g12.imag, g3.real])


def _solve3(A, b):
    """Closed-form 3x3 solve via the adjugate (Cramer), branch-free.

    jnp.linalg.solve's batched LU is a sequential pivoting custom call on
    TPU — hundreds of them inside the GN polish loops were the analytic
    init's bottleneck. The normal equations here are damped SPD (lam >=
    1e-6 on the diagonal), so the adjugate form is well-conditioned in f32."""
    a, bb, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    co00 = e * i - f * h
    co01 = f * g - d * i
    co02 = d * h - e * g
    det = a * co00 + bb * co01 + c * co02
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    x0 = co00 * b[0] + (c * h - bb * i) * b[1] + (bb * f - c * e) * b[2]
    x1 = co01 * b[0] + (a * i - c * g) * b[1] + (c * d - a * f) * b[2]
    x2 = co02 * b[0] + (bb * g - a * h) * b[1] + (a * e - bb * d) * b[2]
    return jnp.stack([x0, x1, x2]) / det


def _rz_c(t, c):
    e = jnp.exp(-1j * t.astype(c) / 2)
    return jnp.diag(jnp.stack([e, 1.0 / e]))


def _rx_c(t, c):
    ch, sh = jnp.cos(t / 2), jnp.sin(t / 2)
    row0 = jnp.stack([ch.astype(c), -1j * sh.astype(c)])
    row1 = jnp.stack([-1j * sh.astype(c), ch.astype(c)])
    return jnp.stack([row0, row1])


def _durand_kerner(coeffs, iters: int = 48, cdtype=jnp.complex64):
    """All four roots of a quartic (monic-normalized internally),
    branch-free. coeffs: (5,) real, highest power first."""
    c = coeffs.astype(cdtype)
    c = c / c[0]

    def poly(z):
        return (((z + c[1]) * z + c[2]) * z + c[3]) * z + c[4]

    # standard DK init: powers of a non-real ratio, scaled by a root bound
    bound = 1.0 + jnp.max(jnp.abs(c[1:]))
    w = jnp.asarray(0.4 + 0.9j, cdtype)
    z = bound * w ** jnp.arange(1, 5)

    def body(_, z):
        out = []
        for i in range(4):
            prod = jnp.asarray(1.0 + 0j, cdtype)
            for j in range(4):
                if j != i:
                    prod = prod * (z[i] - z[j])
            prod = jnp.where(
                jnp.abs(prod) < 1e-12, jnp.asarray(1e-12, prod.dtype), prod
            )
            out.append(z[i] - poly(z[i]) / prod)
        return jnp.stack(out)

    return jax.lax.fori_loop(0, iters, body, z)


def _interleave_angles(t, dtype):
    """(alpha, beta, gamma) with SQiSW (C1 ox C2) SQiSW ~ CAN(t) for t in
    the 2-application region — branch-free version of kak.py:262-376:
    Durand-Kerner on the quartic in q, the two z=0 boundary branches always
    included, winner by Makhlin residual against CAN(t)."""
    x, y, z = t[0], t[1], t[2]
    # quartic arithmetic in the working real dtype: f32 on the device path
    # (the polish kernel rescues ~1e-6 inits), true f64 on the CPU rescue
    # path where the f32 root separation is structurally insufficient
    # (near-identity classes — docs/device_transpile.md "Fallback anatomy")
    f32 = dtype
    K1 = (jnp.cos(2 * x) * jnp.cos(2 * y) * jnp.cos(2 * z)).astype(f32)
    K2 = (jnp.sin(2 * x) * jnp.sin(2 * y) * jnp.sin(2 * z)).astype(f32)
    K3 = (jnp.cos(4 * x) * jnp.cos(4 * y) * jnp.cos(4 * z)).astype(f32)
    coeffs = jnp.stack(
        [
            jnp.asarray(0.25, f32),
            -2 * (K1 + 1),
            2 + 2 * K3 + 6 * K2 * K2 - 4 * K1 * K1,
            8 * K2 * K2 * (K1 - 1),
            4 * K2**4,
        ]
    )
    roots = _durand_kerner(coeffs, cdtype=_cdtype(dtype))
    dcoeffs = coeffs[:-1] * jnp.asarray([4.0, 3.0, 2.0, 1.0], f32)

    def newton(q):
        for _ in range(2):
            f = jnp.polyval(coeffs, q)
            df = jnp.polyval(dcoeffs, q)
            q = q - f / jnp.where(jnp.abs(df) < 1e-20, 1e-20, df)
        return q

    sgn = jnp.where(z >= 0, 1.0, -1.0).astype(f32)

    cands = []  # list of (u, v, s2, sgn) candidate tuples

    def push(u, v, s2, sg):
        cands.append(jnp.stack([u, v, s2, sg]))
        cands.append(jnp.stack([v, u, s2, sg]))

    for i in range(4):
        q = newton(roots[i].real)
        p = 4 * K1 + 4 * K2 * K2 / jnp.where(jnp.abs(q) < 1e-18, 1e-18, q)
        S = (p - q) / 2.0
        Pr = (p + q) / 2.0 - 1.0
        rr = jnp.sqrt(jnp.maximum(S * S / 4.0 - Pr, 0.0))
        s2 = 4 * K1 / jnp.where(jnp.abs(p) < 1e-18, 1e-18, p)
        push(S / 2 + rr, S / 2 - rr, s2, sgn)
    # z = 0 boundary branches (kak.py:308-327), always evaluated: the
    # quartic path degenerates there and residual screening arbitrates
    v0 = 1 - 2 * jnp.abs(jnp.cos(2 * x) - jnp.cos(2 * y)).astype(f32)
    push(
        jnp.asarray(1.0, f32),
        v0,
        2 * K1 / jnp.maximum(1 + v0, 1e-12),
        jnp.asarray(1.0, f32),
    )
    one_m_K3 = (
        2 * jnp.sin(2 * x) ** 2
        + jnp.cos(4 * x) * 2 * jnp.sin(2 * y) ** 2
        + jnp.cos(4 * x) * jnp.cos(4 * y) * 2 * jnp.sin(2 * z) ** 2
    ).astype(f32)
    push(
        -1 + jnp.sqrt(jnp.maximum(2 * one_m_K3, 0.0)),
        jnp.asarray(-1.0, f32),
        jnp.asarray(0.0, f32),
        jnp.asarray(1.0, f32),
    )
    C = jnp.stack(cands)  # (12, 4)

    u = jnp.clip(C[:, 0], -1.0, 1.0)
    v = jnp.clip(C[:, 1], -1.0, 1.0)
    s2 = jnp.clip(C[:, 2], 0.0, 1.0)
    a = jnp.arccos(u)
    b = jnp.arccos(v)
    g = jnp.arctan2(jnp.sqrt(s2), C[:, 3] * jnp.sqrt(1.0 - s2))

    cd = _cdtype(dtype)
    SQ = sqiswap_c(dtype)
    target = _makhlin_c(can_matrix_c(t.astype(dtype), dtype), dtype, assume_su=True)

    def resid_vec(abg):
        aa, bb, gg = abg[0], abg[1], abg[2]
        C1 = _rz_c(gg, cd) @ _rx_c(aa, cd) @ _rz_c(gg, cd)
        C2 = _rx_c(bb, cd)
        V = SQ @ jnp.kron(C1, C2) @ SQ
        return _makhlin_c(V, dtype, assume_su=True) - target

    def residual(abg):
        return jnp.max(jnp.abs(resid_vec(abg)))

    def gn_polish(abg, iters):
        """Damped Gauss-Newton on the 3 invariant residuals (the batched
        counterpart of kak.py:379-410): f32 Durand-Kerner cannot resolve
        multiplicity-2 quartic roots on the |z| = x - y region boundary
        (Newton is linear there and the f32 polyval noise floor dominates),
        so every candidate is polished before screening. ANY residual zero
        is a valid interleave: _two_app_layers re-KAKs V and composes
        correction locals, so the polish may move a candidate to a
        different solution branch without harm. Convergence is only
        *linear* along the singular direction of merged roots, hence the
        generous iteration budget on the screened winner."""

        def step(_, p):
            r = resid_vec(p)
            J = jax.jacfwd(resid_vec)(p)
            JtJ = J.T @ J
            g = J.T @ r
            damps = jnp.asarray([1e-6, 1e-3, 1e-1], dtype)
            eye3 = jnp.eye(3, dtype=dtype)

            def try_damp(lm):
                d = _solve3(JtJ + lm * eye3, -g)
                c = p + d
                return c, residual(c)

            cands_p, cands_r = jax.vmap(try_damp)(damps)
            allp = jnp.concatenate([cands_p, p[None]], axis=0)
            allr = jnp.concatenate([cands_r, residual(p)[None]], axis=0)
            return allp[jnp.argmin(allr)]

        return jax.lax.fori_loop(0, iters, step, abg)

    abg = jnp.stack([a.astype(dtype), b.astype(dtype), g.astype(dtype)], axis=1)
    abg = jax.vmap(lambda p: gn_polish(p, 8))(abg)
    res = jax.vmap(residual)(abg)
    best = jnp.argmin(res)
    return gn_polish(abg[best], 24)


# ------------------------------------------------------------ synthesis


def _u3_angles(W):
    """(theta, phi, lam) with su2.u3(theta, phi, lam) == W up to a global
    phase, for any unitary 2x2 (qiskit convention; ops/su2.py:11).

    Degenerate-robust: after SU(2) normalization W = [[a, -b*],[b, a*]],
    phi = ang(W11)+ang(W10) and lam = ang(W11)-ang(W10). At theta ~ 0 the
    garbage angle of the noise-level off-diagonal cancels out of phi+lam
    (the only combination that survives), and at theta ~ pi the garbage
    diagonal angle cancels out of phi-lam — unlike the naive
    per-entry-minus-ang(W00) extraction, which emits an arbitrarily wrong
    diagonal phase at theta ~ 0 (seen: z~0 targets whose C1 = Rz(2g))."""
    det = W[0, 0] * W[1, 1] - W[0, 1] * W[1, 0]
    W = W * jnp.exp(-0.5j * jnp.angle(det)) / jnp.sqrt(jnp.abs(det))
    theta = 2.0 * jnp.arctan2(jnp.abs(W[1, 0]), jnp.abs(W[0, 0]))
    a11 = jnp.angle(W[1, 1])
    a10 = jnp.angle(W[1, 0])
    return jnp.stack([theta, a11 + a10, a11 - a10])


def _layers_to_params(layers):
    """(n_layers, 2, 2, 2) complex [l, r] per layer, first-applied order ->
    flat x matching build_ansatz's layout (layer-major, qubit-major)."""
    out = []
    for L in layers:
        out.append(_u3_angles(L[0]))
        out.append(_u3_angles(L[1]))
    return jnp.concatenate(out)


def _two_app_layers(t, l1, r1, l2, r2, dtype):
    """Layers for U ~ (l1 ox r1) CAN(t) (l2 ox r2), t in the 2-region
    (kak.py:504-520): CAN(t) = vf1^dag [SQ (C1 ox C2) SQ] vf2^dag."""
    cd = _cdtype(dtype)
    abg = _interleave_angles(t, dtype)
    C1 = _rz_c(abg[2], cd) @ _rx_c(abg[0], cd) @ _rz_c(abg[2], cd)
    C2 = _rx_c(abg[1], cd)
    SQ = sqiswap_c(dtype)
    V = SQ @ jnp.kron(C1, C2) @ SQ
    _, vl1, vr1, vl2, vr2 = _kak_state(V, dtype)
    L0 = jnp.stack([vl2.conj().T @ l2, vr2.conj().T @ r2])
    L1 = jnp.stack([C1, C2])
    L2 = jnp.stack([l1 @ vl1.conj().T, r1 @ vr1.conj().T])
    return jnp.stack([L0, L1, L2])


# 48 static split variants (kak.py:458-474): 6 perms x 4 flips x 2 shifts
_VARIANTS = []
for _perm in (
    (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)
):
    for _flip in (None, (0, 1), (0, 2), (1, 2)):
        for _extra in (0, -1):
            _VARIANTS.append((_perm, _flip, _extra))


def _region_violation(t):
    """0 where t is inside the 2-application region |t2| <= t0 - t1 of the
    canonical chamber (kak.py:234-238); positive outside."""
    v = jnp.maximum(t[0] - PI4, 0.0)
    v = jnp.maximum(v, t[1] - t[0])
    v = jnp.maximum(v, jnp.abs(t[2]) - t[1])
    v = jnp.maximum(v, jnp.abs(t[2]) - (t[0] - t[1]))
    return v


def _three_app_layers(t, l1, r1, l2, r2, dtype):
    """Layers for canonical t OUTSIDE the 2-region: split one SQiSW via
    CAN(s) = CAN(s - (pi/8, pi/8, 0)) SQiSW over the 48 tracked variants,
    first-valid select (kak.py:452-491 + 539-549)."""
    cd = _cdtype(dtype)
    _, _, P = _consts(dtype)
    eye = jnp.eye(2, dtype=cd)
    shift_vec = jnp.asarray([PI8, PI8, 0.0], dtype)

    var_states = []
    for perm, flip, extra in _VARIANTS:
        st = (t, eye, eye, eye, eye)
        cur = list(perm)
        if cur[0] != 0:
            j = cur.index(0)
            st = _swap(st, 0, j, P)
            cur[0], cur[j] = cur[j], cur[0]
        if cur[1] != 1:
            st = _swap(st, 1, 2, P)
        if flip is not None:
            st = _pair_flip(st, flip[0], flip[1], P)
        if extra:
            st = _shift(st, 2, jnp.asarray(float(extra), dtype), P)
        inner = _canonicalize(
            (st[0] - shift_vec, eye, eye, eye, eye), P
        )
        var_states.append((st, inner))

    viol = jnp.stack([_region_violation(inn[0]) for _, inn in var_states])
    idx = jnp.argmin(
        jnp.where(viol <= 1e-6, jnp.arange(len(_VARIANTS), dtype=viol.dtype), 1e9)
        + viol
    )

    def pick(field_list):
        return jnp.stack(field_list)[idx]

    var_l1 = pick([st[1] for st, _ in var_states])
    var_r1 = pick([st[2] for st, _ in var_states])
    var_l2 = pick([st[3] for st, _ in var_states])
    var_r2 = pick([st[4] for st, _ in var_states])
    in_t = pick([inn[0] for _, inn in var_states])
    in_l1 = pick([inn[1] for _, inn in var_states])
    in_r1 = pick([inn[2] for _, inn in var_states])
    in_l2 = pick([inn[3] for _, inn in var_states])
    in_r2 = pick([inn[4] for _, inn in var_states])

    two = _two_app_layers(
        in_t,
        var_l1 @ in_l1,
        var_r1 @ in_r1,
        in_l2,
        in_r2,
        dtype,
    )
    # U = (l1) CAN(t) (l2); CAN(t) = (var1 . inner1) CAN(t'') (inner2) SQ (var2)
    L0 = jnp.stack([var_l2 @ l2, var_r2 @ r2])
    L1 = two[0]
    L2 = two[1]
    L3 = jnp.stack([l1 @ two[2][0], r1 @ two[2][1]])
    return jnp.stack([L0, L1, L2, L3])


def _synth_one(t_re, t_im, k: int, dtype):
    U = (t_re + 1j * t_im).astype(_cdtype(dtype))
    t, l1, r1, l2, r2 = _kak_state(U, dtype)
    if k == 2:
        layers = _two_app_layers(t, l1, r1, l2, r2, dtype)
    elif k == 3:
        layers = _three_app_layers(t, l1, r1, l2, r2, dtype)
    else:
        raise ValueError(f"analytic init supports k in (2, 3), got {k}")
    return _layers_to_params(layers)


def make_analytic_init(k: int, dtype=jnp.float32):
    """Build fn(t_re, t_im) -> x of shape (B, 6*(k+1)): batched analytic
    warm start in build_ansatz's parameter layout for the k-application
    sqrt(iSwap) template. Targets must be in the k-application class
    (monodromy_ks_batch); out-of-class rows produce an out-of-basin x the
    caller's rescue path re-solves variationally."""

    @jax.jit
    def init(t_re, t_im):
        def one(a, b):
            return _synth_one(a.astype(dtype), b.astype(dtype), k, dtype)

        # full-f32 matmuls: the TPU default (bf16-pass matmul) destroys the
        # root separation of the interleave quartic at degenerate classes —
        # exact-SWAP lanes went NaN and near-identity lanes left the polish
        # basin on TPU while the identical f32 program was fine on CPU
        with jax.default_matmul_precision("float32"):
            return jax.vmap(one)(t_re, t_im)

    return init
