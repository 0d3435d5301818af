"""Deterministic KAK (Cartan) decomposition and analytic sqrt(iSwap)
synthesis.

Replaces the reference's randomized-retry KAK (weyl_decompose.py:207-330,
"FIXME: this randomized algorithm is horrendous") with Cardoso joint
diagonalization, an exact phase-lift, and explicit tracked Weyl moves.

Key conventions (derived in ops/weyl.py): in the magic basis, CAN(t) =
expm(i (tx XX + ty YY + tz ZZ)) is diag(e^{i V_k . t}) — and since the V_k
rows span the zero-sum subspace, ANY zero-sum phase vector is exactly some
CAN(t): no eigenvalue-slot matching is ever needed.

The sqrt(iSwap) 2-application region and interleaving rotations follow
Huang et al. (arXiv:2105.06074; reference weyl_decompose.py:343-410). The
3-application canonicalization is derived fresh: one SQiSW splits off
EXACTLY via CAN(t) = CAN(t - (pi/8, pi/8, 0)) . SQiSW (commuting
generators), searching tracked Weyl variants until the remainder lies in
the 2-application region. (The reference's own canonicalize,
weyl_decompose.py:412-449, does not satisfy its composition identity — it
was only ever used for gate counting.)
"""

from __future__ import annotations

import cmath
import itertools
from typing import List, Tuple

import numpy as np

from slam_decomposition_tpu.ops.weyl import MAGIC_IM, MAGIC_RE

_B = MAGIC_RE + 1j * MAGIC_IM
PI = np.pi
PI2 = np.pi / 2
PI4 = np.pi / 4
PI8 = np.pi / 8

_PAULI = {
    0: np.array([[0, 1], [1, 0]], dtype=complex),
    1: np.array([[0, -1j], [1j, 0]]),
    2: np.diag([1.0 + 0j, -1.0]),
}
_I2 = np.eye(2, dtype=complex)
_V_ROWS = np.array([[1, -1, 1], [1, 1, -1], [-1, -1, -1], [-1, 1, 1]], dtype=float)


def can_matrix(a, b, c):
    """CAN(a,b,c) = expm(i(a XX + b YY + c ZZ)) via the magic-diagonal form."""
    t = np.array([a, b, c], dtype=float)
    ph = np.exp(1j * (_V_ROWS @ t))
    return _B @ np.diag(ph) @ _B.conj().T


SQISWAP_M = can_matrix(PI8, PI8, 0)


def _joint_diag_np(X: np.ndarray, Y: np.ndarray, sweeps: int = 16):
    n = X.shape[0]
    V = np.eye(n)
    X = X.copy()
    Y = Y.copy()
    for _ in range(sweeps):
        for p in range(n):
            for q in range(p + 1, n):
                ux, vx = X[p, q], 0.5 * (X[p, p] - X[q, q])
                uy, vy = Y[p, q], 0.5 * (Y[p, p] - Y[q, q])
                num = 2.0 * (ux * vx + uy * vy)
                den = vx * vx + vy * vy - ux * ux - uy * uy
                th = 0.25 * np.arctan2(num, den)
                c, s = np.cos(th), np.sin(th)
                G = np.eye(n)
                G[p, p] = c
                G[p, q] = s
                G[q, p] = -s
                G[q, q] = c
                X = G @ X @ G.T
                Y = G @ Y @ G.T
                V = V @ G.T
    return np.diagonal(X), np.diagonal(Y), V


def decompose_product_gate(K: np.ndarray):
    """Split a product gate: K = e^{i phase} kron(l, r), l, r in SU(2)."""
    R = K.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3).reshape(4, 4)
    u, s, vh = np.linalg.svd(R)
    l = u[:, 0].reshape(2, 2) * np.sqrt(2)
    r = vh[0].reshape(2, 2) * np.sqrt(2)
    l = l / np.sqrt(np.linalg.det(l) + 0j)
    r = r / np.sqrt(np.linalg.det(r) + 0j)
    rec = np.kron(l, r)
    idx = np.unravel_index(np.argmax(np.abs(rec)), rec.shape)
    phase = cmath.phase(K[idx] / rec[idx])
    return l, r, phase


class CanForm:
    """Tracked form  U = e^{i phase} (l1 ox r1) CAN(t) (l2 ox r2)  with all
    Weyl-chamber moves as explicit exact local identities."""

    def __init__(self, t, l1=None, r1=None, l2=None, r2=None, phase=0.0):
        self.t = np.array(t, dtype=float)
        self.l1 = _I2.copy() if l1 is None else l1
        self.r1 = _I2.copy() if r1 is None else r1
        self.l2 = _I2.copy() if l2 is None else l2
        self.r2 = _I2.copy() if r2 is None else r2
        self.phase = phase

    def matrix(self):
        return (
            np.exp(1j * self.phase)
            * np.kron(self.l1, self.r1)
            @ can_matrix(*self.t)
            @ np.kron(self.l2, self.r2)
        )

    # -- exact moves ---------------------------------------------------
    def shift(self, i: int, k: int):
        """t[i] += k*pi/2; CAN(t_old) = CAN(t_new) (-i P_i ox P_i)^k."""
        if k == 0:
            return self
        self.t[i] += k * PI2
        P = _PAULI[i]
        # fold (-i P ox P)^k into the right locals: (P^k into each side,
        # scalar (-i)^k * (sign from P^2=I) into phase)
        kk = k % 4
        for _ in range(kk):
            self.l2 = P @ self.l2
            self.r2 = P @ self.r2
            self.phase -= PI2  # factor (-i)
        # P^2 = I contributes nothing further; (-i)^k handled above;
        # note (P ox P)^2 = I so matrix part cycles with period 2
        return self

    def swap(self, i: int, j: int):
        """Swap axes i,j of t via L = R_k(pi/2) ox R_k(pi/2)."""
        k = 3 - i - j
        P = _PAULI[k]
        R = np.cos(PI4) * _I2 - 1j * np.sin(PI4) * P
        Rd = R.conj().T
        self.l1 = self.l1 @ Rd
        self.r1 = self.r1 @ Rd
        self.l2 = R @ self.l2
        self.r2 = R @ self.r2
        self.t[[i, j]] = self.t[[j, i]]
        return self

    def pair_flip(self, i: int, j: int):
        """Negate t[i], t[j] via P_k ox I on both sides."""
        k = 3 - i - j
        P = _PAULI[k]
        self.l1 = self.l1 @ P
        self.l2 = P @ self.l2
        self.t[i] = -self.t[i]
        self.t[j] = -self.t[j]
        return self

    def canonicalize(self):
        """Drive t into the chamber pi/4 >= t0 >= t1 >= |t2|."""
        for i in range(3):
            self.shift(i, -int(np.floor(self.t[i] / PI2)))
        for _ in range(6):
            order = np.argsort(-self.t)
            if order[0] != 0:
                self.swap(0, int(order[0]))
            if self.t[1] < self.t[2]:
                self.swap(1, 2)
            if self.t[0] + self.t[1] > PI2 + 1e-14:
                self.pair_flip(0, 1)
                self.shift(0, 1)
                self.shift(1, 1)
                self.swap(0, 1)
                for i in range(3):
                    self.shift(i, -int(np.floor(self.t[i] / PI2)))
            else:
                break
        if self.t[0] > PI4 + 1e-14:
            self.pair_flip(0, 2)
            self.shift(0, 1)
            if self.t[1] < self.t[2]:
                self.swap(1, 2)
        # on the t0 = pi/4 face, (pi/4, b, c) ~ (pi/4, b, -c): fix c >= 0
        if abs(self.t[0] - PI4) < 1e-9 and self.t[2] < 0:
            self.pair_flip(0, 2)
            self.shift(0, 1)
        return self


def kak(U: np.ndarray):
    """U(4) -> (phase, (a,b,c), K1l, K1r, K2l, K2r) with
    U = e^{i phase} (K1l ox K1r) CAN(a,b,c) (K2l ox K2r),
    pi/4 >= a >= b >= |c|."""
    form = kak_form(U)
    return (
        form.phase,
        (float(form.t[0]), float(form.t[1]), float(form.t[2])),
        form.l1,
        form.r1,
        form.l2,
        form.r2,
    )


def kak_form(U: np.ndarray) -> CanForm:
    U = np.asarray(U, dtype=complex)
    det = np.linalg.det(U)
    Us = U * det ** (-0.25)
    phase = cmath.phase(det) / 4

    M = _B.conj().T @ Us @ _B
    m = M.T @ M
    x, y, P = _joint_diag_np(m.real, m.imag)
    if np.linalg.det(P) < 0:
        P = P.copy()
        P[:, -1] = -P[:, -1]
    theta = np.arctan2(y, x)
    d = -theta / 2.0
    n = int(round(d.sum() / PI))
    d[0] -= PI * n  # exact lift: sum(d)=0, e^{2id}=e^{-i theta}

    K1 = _B @ (M @ P @ np.diag(np.exp(1j * d))) @ _B.conj().T
    K2 = _B @ P.T @ _B.conj().T
    t = -(_V_ROWS.T @ d) / 4.0
    l1, r1, p1 = decompose_product_gate(K1)
    l2, r2, p2 = decompose_product_gate(K2)
    form = CanForm(t, l1, r1, l2, r2, phase + p1 + p2)
    form.canonicalize()
    return form


# ------------------------------------------------- sqrt(iSwap) synthesis


def _in_2region(t, tol=1e-12) -> bool:
    return (
        PI4 + tol >= t[0] >= t[1] - tol >= abs(t[2]) - tol
        and abs(t[2]) <= t[0] - t[1] + tol
    )


def _rz(t):
    return np.diag([np.exp(-1j * t / 2), np.exp(1j * t / 2)])


def _rx(t):
    c, s = np.cos(t / 2), np.sin(t / 2)
    return np.array([[c, -1j * s], [-1j * s, c]])


def _makhlin(U: np.ndarray):
    """Makhlin invariants (g1, g2, g3) — fast trace closed form."""
    det = np.linalg.det(U)
    Us = U * det ** (-0.25)
    M = _B.conj().T @ Us @ _B
    m = M.T @ M
    tr = np.trace(m)
    g12 = tr * tr / 16.0
    g3 = (tr * tr - np.trace(m @ m)) / 4.0
    return np.array([g12.real, g12.imag, g3.real])


def _seed_angles(x, y, z):
    """Huang-et-al-style closed-form seed (arXiv:2105.06074 eq. 7 shape;
    reference weyl_decompose.py:389-410). Used only to initialize the exact
    Newton solve below — the transcribed closed form alone does not
    reproduce targets in this convention."""
    Cv = (
        np.sin(x + y - z) * np.sin(x - y + z) * np.sin(-x - y - z) * np.sin(-x + y + z)
    )
    Cv = max(Cv, 0.0)
    alpha = np.arccos(
        np.clip(np.cos(2 * x) - np.cos(2 * y) + np.cos(2 * z) + 2 * np.sqrt(Cv), -1, 1)
    )
    beta = np.arccos(
        np.clip(np.cos(2 * x) - np.cos(2 * y) + np.cos(2 * z) - 2 * np.sqrt(Cv), -1, 1)
    )
    num = 4 * (np.cos(x) ** 2) * (np.cos(z) ** 2) * (np.cos(y) ** 2)
    den = num + np.cos(2 * x) + np.cos(2 * y) * np.cos(2 * z)
    sz = np.sign(z) if z != 0 else 1.0
    gamma = np.arccos(np.clip(sz * np.sqrt(abs(num / den)) if den != 0 else 0.0, -1, 1))
    return alpha, beta, gamma


def interleaving_rotations(x, y, z):
    """(C1, C2) with SQiSW (C1 ox C2) SQiSW locally equivalent to
    CAN(x,y,z), for (x,y,z) in the 2-application region |z| <= x - y.

    The 1Q ansatz C1 = Rz(g) Rx(a) Rz(g), C2 = Rx(b) is Huang et al.'s
    (arXiv:2105.06074); the three angles are solved exactly by matching
    Makhlin invariants (3 smooth equations in 3 unknowns, damped Newton
    with multi-start) — immune to the formula-convention pitfalls of the
    reference transcription (weyl_decompose.py:389-410).
    """
    target = _makhlin(can_matrix(x, y, z))

    def make(p):
        a, b, g = p
        return SQISWAP_M @ np.kron(_rz(g) @ _rx(a) @ _rz(g), _rx(b)) @ SQISWAP_M

    def resid(p):
        return _makhlin(make(p)) - target

    from scipy.optimize import least_squares

    seeds = [np.array(_seed_angles(x, y, z))]
    rng = np.random.default_rng(12345)
    for _ in range(24):
        seeds.append(rng.uniform(0, PI, 3))
    best = None
    for s in seeds:
        sol = least_squares(resid, s, xtol=1e-15, ftol=1e-15, gtol=1e-15)
        if best is None or sol.cost < best.cost:
            best = sol
        if best.cost < 1e-24:
            break
    if best.cost > 1e-16:
        raise RuntimeError(
            f"interleaving solve failed for t=({x},{y},{z}): cost {best.cost}"
        )
    a, b, g = best.x
    return _rz(g) @ _rx(a) @ _rz(g), _rx(b)


def split_one_sqiswap(t) -> Tuple[CanForm, np.ndarray]:
    """Find a tracked form with CAN(t) = e^{i ph} (l1 ox r1) CAN(t'')
    (l2 ox r2) SQiSW (l3 ox r3), t'' in the 2-application region.

    Uses CAN(s) = CAN(s - (pi/8, pi/8, 0)) SQiSW exactly, over tracked Weyl
    variants of t until the remainder canonicalizes into the region."""
    for perm in itertools.permutations(range(3)):
        for flip in [None, (0, 1), (0, 2), (1, 2)]:
            for extra_shift in (0, -1):
                form = CanForm(t)
                # apply permutation as a sequence of swaps
                cur = list(perm)
                if cur[0] != 0:
                    j = cur.index(0)
                    form.swap(0, j)
                    cur[0], cur[j] = cur[j], cur[0]
                if cur[1] != 1:
                    form.swap(1, 2)
                    cur[1], cur[2] = cur[2], cur[1]
                if flip is not None:
                    form.pair_flip(*flip)
                if extra_shift:
                    form.shift(2, extra_shift)
                # split: CAN(tv) = CAN(tv - s) SQiSW
                inner = CanForm(form.t - np.array([PI8, PI8, 0.0]))
                inner.canonicalize()
                if _in_2region(inner.t):
                    # CAN(t) = ph_form (f.l1) [ CAN(form.t) ] (f.l2)
                    #        = ... (f.1) [ e^{i ph_i}(i.1) CAN(t'') (i.2) SQ ] (f.2)
                    out = CanForm(
                        inner.t,
                        form.l1 @ inner.l1,
                        form.r1 @ inner.r1,
                        inner.l2,
                        inner.r2,
                        form.phase + inner.phase,
                    )
                    tail = np.kron(form.l2, form.r2)
                    return out, tail
    raise RuntimeError(f"no sqiswap split found for t={t}")


def sqiswap_decompose(U: np.ndarray):
    """Decompose U(4) into 2 or 3 SQiSW + interleaved 1Q layers.

    Returns (steps, n) with steps a first-applied-first list of
    ("sqiswap", None) / ("1q", (l, r)) / ("phase", phi) entries.
    Reference counterpart: riswapWeylDecomp (weyl_decompose.py:343-387).
    """
    form = kak_form(U)
    t = form.t

    def two_app(t2):
        """Steps realizing CAN(t2) as e^{i ph} locals SQ (C) SQ locals."""
        C1, C2 = interleaving_rotations(*t2)
        V = SQISWAP_M @ np.kron(C1, C2) @ SQISWAP_M
        vf = kak_form(V)
        # V = e^{i vp} (v1) CAN(t2') (v2); t2' == t2 by construction
        # => CAN(t2) = e^{-i vp} (v1)^dag V (v2)^dag
        pre = (vf.l2.conj().T, vf.r2.conj().T)  # applied first
        post = (vf.l1.conj().T, vf.r1.conj().T)
        return [
            ("1q", pre),
            ("sqiswap", None),
            ("1q", (C1, C2)),
            ("sqiswap", None),
            ("1q", post),
            ("phase", -vf.phase),
        ], vf.t

    steps: List = [("phase", form.phase)]
    if np.abs(t).max() < 1e-8:
        # local gate: no sqiswaps needed
        steps += [("1q", (form.l2, form.r2)), ("1q", (form.l1, form.r1))]
        return _merge_1q(steps), 0
    if np.abs(t - np.array([PI8, PI8, 0.0])).max() < 1e-9:
        # exactly the sqiswap class: single application
        steps += [("1q", (form.l2, form.r2)), ("sqiswap", None),
                  ("1q", (form.l1, form.r1))]
        return _merge_1q(steps), 1
    if _in_2region(t):
        inner, t_chk = two_app(t)
        steps += [("1q", (form.l2, form.r2))]
        steps += inner
        steps += [("1q", (form.l1, form.r1))]
        n = 2
    else:
        split, tail = split_one_sqiswap(t)
        tl, tr, tp = decompose_product_gate(tail)
        inner, t_chk = two_app(split.t)
        # U = ph (f1) CAN(t) (f2)
        #   = ph (f1) [ sp (s1) CAN(t'') (s2) SQ (tail) ] (f2)
        steps += [("phase", split.phase + tp)]
        steps += [("1q", (tl @ form.l2, tr @ form.r2))]
        steps += [("sqiswap", None)]
        steps += [("1q", (split.l2, split.r2))]
        steps += inner
        steps += [("1q", (form.l1 @ split.l1, form.r1 @ split.r1))]
        n = 3
    steps = _merge_1q(steps)
    # certify: the emitted steps must reproduce U to high fidelity (the
    # coordinate-space asserts are too twitchy at chamber boundaries where
    # Makhlin -> coordinate sensitivity blows up)
    V = steps_to_matrix(steps)
    infid = 1 - abs(np.trace(V.conj().T @ U)) / 4
    # near-identity classes have a flat invariant landscape; a 1e-8-level
    # residual there is still far beyond hardware-relevant fidelity
    if infid > 1e-7:
        raise RuntimeError(f"sqiswap synthesis infidelity {infid:.2e} for t={t}")
    return steps, n


def _merge_1q(steps):
    """Fuse adjacent 1q layers and fold phases."""
    out = []
    phase = 0.0
    for kind, payload in steps:
        if kind == "phase":
            phase += payload
        elif kind == "1q":
            if out and out[-1][0] == "1q":
                l0, r0 = out[-1][1]
                out[-1] = ("1q", (payload[0] @ l0, payload[1] @ r0))
            else:
                out.append(("1q", payload))
        else:
            out.append((kind, payload))
    out.append(("phase", phase))
    return out


def steps_to_matrix(steps):
    U = np.eye(4, dtype=complex)
    for kind, payload in steps:
        if kind == "sqiswap":
            U = SQISWAP_M @ U
        elif kind == "1q":
            l, r = payload
            U = np.kron(l, r) @ U
        else:
            U = np.exp(1j * payload) * U
    return U


def steps_to_circuit(steps, qubits=(0, 1), circ=None):
    """Emit steps into a transpile.ir.Circuit."""
    from slam_decomposition_tpu.transpile.ir import Circuit

    if circ is None:
        circ = Circuit(max(qubits) + 1)
    for kind, payload in steps:
        if kind == "sqiswap":
            circ.append("riswap", qubits, params=(0.5,), duration=0.5)
        elif kind == "1q":
            l, r = payload
            circ.unitary(l, (qubits[0],), name="u1q")
            circ.unitary(r, (qubits[1],), name="u1q")
    return circ
