"""Analytic CX-basis synthesis: any U(4) from 0-3 CNOTs + 1Q layers.

Role of qiskit's TwoQubitBasisDecomposer fallback in the reference
(weyl_decompose.py:480). Counts: 0 for local, 1 for the CX class, 2 for
c3 = 0 classes, 3 otherwise. Middle-layer angles are solved by the same
Makhlin-Newton technique as the sqiswap path (transpile/kak.py).
"""

from __future__ import annotations

import numpy as np

from slam_decomposition_tpu.transpile.kak import (
    PI4,
    _makhlin,
    _rz,
    _rx,
    can_matrix,
    decompose_product_gate,
    kak_form,
)

_CX = np.array(
    [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex
)  # control qubit 0
_CXR = np.array(
    [[1, 0, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0], [0, 1, 0, 0]], dtype=complex
)  # control qubit 1


def _ry(t):
    c, s = np.cos(t / 2), np.sin(t / 2)
    return np.array([[c, -s], [s, c]])


def _solve_middle(make, n_angles, target_t, seed=0):
    from scipy.optimize import least_squares

    target = _makhlin(can_matrix(*target_t))

    def resid(p):
        return _makhlin(make(p)) - target

    rng = np.random.default_rng(seed)
    best = None
    for trial in range(40):
        x0 = rng.uniform(0, np.pi, n_angles)
        sol = least_squares(resid, x0, xtol=1e-15, ftol=1e-15, gtol=1e-15)
        if best is None or sol.cost < best.cost:
            best = sol
        if best.cost < 1e-24:
            break
    if best.cost > 1e-16:
        raise RuntimeError(f"cx middle-layer solve failed for {target_t}")
    return best.x


def cx_decompose(U: np.ndarray):
    """Returns (steps, n_cx) with steps first-applied-first:
    ("cx", None) / ("1q", (l, r))."""
    form = kak_form(U)
    t = form.t
    steps = []

    def finish(V_class):
        """Close the sandwich: V_class has the same class as CAN(t); emit
        corrected outer locals."""
        vf = kak_form(V_class[0])
        pre = (vf.l2.conj().T, vf.r2.conj().T)
        post = (vf.l1.conj().T, vf.r1.conj().T)
        inner = [("1q", pre)] + V_class[1] + [("1q", post)]
        out = [("1q", (form.l2, form.r2))] + inner + [("1q", (form.l1, form.r1))]
        return out

    if np.abs(t).max() < 1e-9:
        steps = [("1q", (form.l2, form.r2)), ("1q", (form.l1, form.r1))]
        return _merge(steps), 0
    if np.abs(t - np.array([PI4, 0, 0])).max() < 1e-9:
        V = (_CX, [("cx", None)])
        return _merge(finish(V)), 1
    if abs(t[2]) < 1e-9:
        # full middle 1Q layer (2 angles cannot span the whole c3=0 sheet)
        def mid2(p):
            return (_rz(p[0]) @ _ry(p[1]) @ _rz(p[2]), _rz(p[3]) @ _ry(p[4]) @ _rz(p[5]))

        def make2(p):
            l, r = mid2(p)
            return _CX @ np.kron(l, r) @ _CX

        p = _solve_middle(make2, 6, t)
        V = (
            make2(p),
            [("cx", None), ("1q", mid2(p)), ("cx", None)],
        )
        return _merge(finish(V)), 2

    # Vatan-Williams alternating-direction sandwich:
    # CX(1->0) (Rz ox Ry) CX(0->1) (I ox Ry) CX(1->0)
    def make3(p):
        return (
            _CXR
            @ np.kron(_rz(p[0]), _ry(p[1]))
            @ _CX
            @ np.kron(np.eye(2), _ry(p[2]))
            @ _CXR
        )

    p = _solve_middle(make3, 3, t)
    V = (
        make3(p),
        [
            ("cxr", None),
            ("1q", (np.eye(2), _ry(p[2]))),
            ("cx", None),
            ("1q", (_rz(p[0]), _ry(p[1]))),
            ("cxr", None),
        ],
    )
    return _merge(finish(V)), 3


def _merge(steps):
    out = []
    for kind, payload in steps:
        if kind == "1q" and out and out[-1][0] == "1q":
            l0, r0 = out[-1][1]
            out[-1] = ("1q", (payload[0] @ l0, payload[1] @ r0))
        else:
            out.append((kind, payload))
    return out


def cx_steps_to_matrix(steps):
    U = np.eye(4, dtype=complex)
    for kind, payload in steps:
        if kind == "cx":
            U = _CX @ U
        elif kind == "cxr":
            U = _CXR @ U
        else:
            l, r = payload
            U = np.kron(l, r) @ U
    return U


def cx_decompose_to_circuit(U: np.ndarray, duration_1q: float = 0.0):
    from slam_decomposition_tpu.transpile.ir import Circuit

    steps, _ = cx_decompose(U)
    sub = Circuit(2)
    for kind, payload in steps:
        if kind == "cx":
            sub.append("cx", (0, 1), duration=1.0)
        elif kind == "cxr":
            sub.append("cx", (1, 0), duration=1.0)
        else:
            sub.unitary(payload[0], (0,), name="u1q", duration=duration_1q)
            sub.unitary(payload[1], (1,), name="u1q", duration=duration_1q)
    return sub
