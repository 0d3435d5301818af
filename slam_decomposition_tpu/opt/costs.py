"""Cost functions, 0 = perfect. All differentiable (exact autodiff gradients
replace the reference's finite differences through scipy BFGS).

Reference: src/slam/cost_function.py — every class there has a counterpart
here (file:line cited per function).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from slam_decomposition_tpu.ops import cplx, weyl


def _tr_overlap(U: cplx.CMat, V: cplx.CMat):
    """tr(V^dag U) as a complex pair; d = dimension."""
    P = cplx.matmul(cplx.dagger(V), U)
    return cplx.trace(P), U[0].shape[-1]


def basic_cost(U, V):
    """1 - |tr(V^dag U)|/d (cost_function.py:140-145)."""
    tr, d = _tr_overlap(U, V)
    return 1.0 - jnp.sqrt(cplx.abs2(tr) + 1e-300) / d


def basic_cost_inverse(U, V):
    """|tr|/d without the 1- (cost_function.py:133-137)."""
    tr, d = _tr_overlap(U, V)
    return jnp.sqrt(cplx.abs2(tr) + 1e-300) / d


def square_cost(U, V):
    """1 - (|tr|^2 + d) / (d(d+1)) — the average-gate-infidelity form
    (cost_function.py:169-173). Smooth at the optimum (no sqrt cusp)."""
    tr, d = _tr_overlap(U, V)
    return 1.0 - (cplx.abs2(tr) + d) / (d * (d + 1.0))


def weyl_euclidean_cost(U, V):
    """||c(U) - c(V)||_2 in Weyl coordinates (cost_function.py:199-206)."""
    cu = weyl.c1c2c3(U)
    cv = weyl.c1c2c3(V)
    return jnp.sqrt(jnp.sum((cu - cv) ** 2, axis=-1) + 1e-300)


def makhlin_euclidean_cost(U, V):
    """||g(U) - g(V)||_2 (cost_function.py:209-216). Differentiable without
    any eigendecomposition (pure traces)."""
    gu = weyl.g1g2g3(U)
    gv = weyl.g1g2g3(V)
    return jnp.sqrt(jnp.sum((gu - gv) ** 2, axis=-1) + 1e-300)


def makhlin_functional_cost(U, V):
    """Squared Makhlin distance — the smooth local-invariant functional
    (J_T_LI analog, cost_function.py:219-221)."""
    gu = weyl.g1g2g3(U)
    gv = weyl.g1g2g3(V)
    return jnp.sum((gu - gv) ** 2, axis=-1)


def basic_reduced_cost(U, V):
    """BasicCost between canonical gates of both operands
    (cost_function.py:176-182)."""
    cu = weyl.canonical_gate(weyl.c1c2c3(U), dtype=U[0].dtype)
    cv = weyl.canonical_gate(weyl.c1c2c3(V), dtype=U[0].dtype)
    return basic_cost(cu, cv)


def square_reduced_cost(U, V):
    """SquareCost between canonical gates (cost_function.py:185-189)."""
    cu = weyl.canonical_gate(weyl.c1c2c3(U), dtype=U[0].dtype)
    cv = weyl.canonical_gate(weyl.c1c2c3(V), dtype=U[0].dtype)
    return square_cost(cu, cv)


def square_reduced_bell_cost(U, V):
    """SquareCost in the Bell (magic) basis (cost_function.py:192-196).
    Note: conjugation by a fixed unitary leaves |tr| unchanged, so this is
    numerically identical to square_cost — kept for API parity."""
    return square_cost(weyl.to_magic(U), weyl.to_magic(V))


def line_segment_distance(U, seg_a, seg_b):
    """Distance from c(U) to the segment [seg_a, seg_b] in Weyl space
    (cost_function.py:18-31 — reference uses unclamped line distance; we
    keep that exact behavior)."""
    c = weyl.c1c2c3(U)
    a = jnp.asarray(seg_a, dtype=c.dtype)
    b = jnp.asarray(seg_b, dtype=c.dtype)
    d = b - a
    cr = jnp.cross(jnp.broadcast_to(d, c.shape), a - c)
    return jnp.sqrt(jnp.sum(cr * cr, axis=-1) + 1e-300) / jnp.sqrt(jnp.sum(d * d))


def b_to_sqswap_segment():
    """The B <-> sqrt(SWAP) segment (BsqSwapCost, cost_function.py:34-42)."""
    return np.array([0.5, 0.25, 0.0]), np.array([0.75, 0.25, 0.25])


def unitary_power(U: cplx.CMat, s) -> cplx.CMat:
    """Fractional power U^s = V diag(e^{i s theta}) V^dag via the joint
    Jacobi unitary eigendecomposition (ops/eig.py)."""
    from slam_decomposition_tpu.ops.eig import eig_unitary

    theta, V = eig_unitary(U)
    ph = cplx.expi(s * theta)
    Vd = cplx.dagger(V)
    DVd = (
        ph[0][..., :, None] * Vd[0] - ph[1][..., :, None] * Vd[1],
        ph[0][..., :, None] * Vd[1] + ph[1][..., :, None] * Vd[0],
    )
    return cplx.matmul(V, DVd)


def continuous_cost(U, V, timesteps: int = 2):
    """Fit the whole continuous evolution, not just the endpoint: sum of
    BasicCost over fractional powers U^s vs V^s at s = j/timesteps,
    j = 1..timesteps (ContinuousUnitaryCostFunction,
    cost_function.py:148-166)."""
    total = 0.0
    for j in range(1, timesteps + 1):
        s = j / timesteps
        total = total + basic_cost(unitary_power(U, s), unitary_power(V, s))
    return total


# ------------------------------------------------------------- 3Q monotones


def _w_state(dtype):
    v = np.zeros(8)
    v[0b100] = v[0b010] = v[0b001] = 1 / np.sqrt(3)
    return (jnp.asarray(v, dtype=dtype), jnp.zeros(8, dtype=dtype))


def _ghz_state(dtype):
    v = np.zeros(8)
    v[0] = v[7] = 1 / np.sqrt(2)
    return (jnp.asarray(v, dtype=dtype), jnp.zeros(8, dtype=dtype))


def _partial_trace_single(rho: cplx.CMat, keep_qubit_out: int):
    """rho is (8,8) for 3 qubits (big-endian); trace out one qubit, keeping
    the other two -> (4,4)."""
    r = rho[0].reshape(2, 2, 2, 2, 2, 2)
    i = rho[1].reshape(2, 2, 2, 2, 2, 2)
    q = keep_qubit_out
    axes = [0, 1, 2]
    others = [a for a in axes if a != q]
    # trace over qubit q: contract axis q (bra) with axis q+3 (ket)
    rr = jnp.trace(jnp.moveaxis(r, (q, q + 3), (0, 3)), axis1=0, axis2=3)
    ii = jnp.trace(jnp.moveaxis(i, (q, q + 3), (0, 3)), axis1=0, axis2=3)
    del others
    return (rr.reshape(4, 4), ii.reshape(4, 4))


def _entropy(rho: cplx.CMat):
    from slam_decomposition_tpu.ops.eig import eigh_hermitian

    w, _ = eigh_hermitian(rho)
    w = jnp.clip(w, 1e-12, 1.0)
    return -jnp.sum(w * jnp.log2(w), axis=-1)


def mutual_information_cost(U: cplx.CMat, state: str = "w", square: bool = False):
    """Sum of bipartite mutual informations of U|prep> over the three cuts
    (MutualInformation / MutualInformationSquare, cost_function.py:68-99).
    Minimizing undoes the entanglement of the prepared W/GHZ state."""
    dtype = U[0].dtype
    psi = _w_state(dtype) if state == "w" else _ghz_state(dtype)
    out = cplx.matvec(U, psi)
    # full density matrix
    rho = (
        out[0][:, None] * out[0][None, :] + out[1][:, None] * out[1][None, :],
        out[1][:, None] * out[0][None, :] - out[0][:, None] * out[1][None, :],
    )
    total = 0.0
    for q in range(3):
        rho2 = _partial_trace_single(rho, q)  # two qubits kept
        # single-qubit reductions of rho2
        r = rho2[0].reshape(2, 2, 2, 2)
        i = rho2[1].reshape(2, 2, 2, 2)
        rhoA = (jnp.trace(r, axis1=1, axis2=3), jnp.trace(i, axis1=1, axis2=3))
        rhoB = (jnp.trace(r, axis1=0, axis2=2), jnp.trace(i, axis1=0, axis2=2))
        mi = _entropy(rhoA) + _entropy(rhoB) - _entropy(rho2)
        total = total + (mi * mi if square else mi)
    return total


COSTS = {
    "basic": basic_cost,
    "basic_inverse": basic_cost_inverse,
    "square": square_cost,
    "weyl_euclidean": weyl_euclidean_cost,
    "makhlin_euclidean": makhlin_euclidean_cost,
    "makhlin_functional": makhlin_functional_cost,
    "basic_reduced": basic_reduced_cost,
    "square_reduced": square_reduced_cost,
    "square_reduced_bell": square_reduced_bell_cost,
}
