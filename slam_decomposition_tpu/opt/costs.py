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
    rho = _rho_of(U, state)
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


def _rho_of(U: cplx.CMat, state: str):
    """Density matrix of U|prep> for the 3Q W/GHZ prep states."""
    dtype = U[0].dtype
    psi = _w_state(dtype) if state == "w" else _ghz_state(dtype)
    out = cplx.matvec(U, psi)
    return (
        out[0][:, None] * out[0][None, :] + out[1][:, None] * out[1][None, :],
        out[1][:, None] * out[0][None, :] - out[0][:, None] * out[1][None, :],
    )


def _partial_transpose(rho: cplx.CMat, q: int):
    """Partial transpose over qubit q of a 3Q (8,8) density matrix: swap
    that qubit's bra and ket indices (a pure index permutation, so the
    re/im parts permute identically)."""

    def pt(part):
        t = part.reshape(2, 2, 2, 2, 2, 2)
        return jnp.swapaxes(t, q, q + 3).reshape(8, 8)

    return pt(rho[0]), pt(rho[1])


def _reduced_1q(rho: cplx.CMat, q: int):
    """Single-qubit reduced state: trace out the two qubits != q."""
    others = [a for a in range(3) if a != q]

    def red(part):
        t = part.reshape(2, 2, 2, 2, 2, 2)
        for a in sorted(others, reverse=True):
            t = jnp.trace(t, axis1=a, axis2=a + t.ndim // 2)
        return t

    return red(rho[0]), red(rho[1])


def negativity_cost(U: cplx.CMat, state: str = "w"):
    """Sum over the three 1|2 cuts of the negativity
    N = (||rho^{T_q}||_1 - 1)/2 of U|prep>.

    The reference DECLARED this monotone but never implemented it
    (cost_function.py:102-104 returns the bare statevector); here it is
    real and differentiable (Hermitian eigendecomposition of the partial
    transpose). Zero iff the output state is PPT across every cut — for
    pure states, iff it is a product state on each cut.
    """
    from slam_decomposition_tpu.ops.eig import eigh_hermitian

    rho = _rho_of(U, state)
    total = 0.0
    for q in range(3):
        w, _ = eigh_hermitian(_partial_transpose(rho, q))
        total = total + (jnp.sum(jnp.abs(w)) - 1.0) / 2.0
    return total


def entropy_of_entanglement_cost(U: cplx.CMat, state: str = "w"):
    """Sum over the three 1|2 cuts of the entropy of entanglement
    S(rho_q) of the pure output state (reference stub
    cost_function.py:112-114, never implemented)."""
    rho = _rho_of(U, state)
    total = 0.0
    for q in range(3):
        total = total + _entropy(_reduced_1q(rho, q))
    return total


_YY = np.array(
    [[0, 0, 0, -1], [0, 0, 1, 0], [0, 1, 0, 0], [-1, 0, 0, 0]], dtype=float
)


def _concurrence_2q(rho2: cplx.CMat):
    """Wootters concurrence of a 2Q mixed state, Hermitian-only linear
    algebra: lambda_i = sqrt(eig(sqrt(rho) rho~ sqrt(rho))) with
    rho~ = (YoY) rho* (YoY); C = max(0, l1 - l2 - l3 - l4)."""
    from slam_decomposition_tpu.ops.eig import eigh_hermitian

    yy = (jnp.asarray(_YY, dtype=rho2[0].dtype), jnp.zeros_like(rho2[0]))
    rho_t = cplx.matmul(yy, cplx.matmul(cplx.conj(rho2), yy))
    w, V = eigh_hermitian(rho2)
    s = jnp.sqrt(jnp.clip(w, 0.0, None))
    sq = (V[0] * s[None, :], V[1] * s[None, :])  # V diag(s)
    sqrt_rho = cplx.matmul(sq, cplx.dagger(V))
    M = cplx.matmul(sqrt_rho, cplx.matmul(rho_t, sqrt_rho))
    lam2, _ = eigh_hermitian(M)
    lam = jnp.sqrt(jnp.clip(lam2, 0.0, None))  # ascending
    return jnp.clip(lam[3] - lam[2] - lam[1] - lam[0], 0.0, None)


def _binary_entropy(x):
    x = jnp.clip(x, 1e-12, 1 - 1e-12)
    return -x * jnp.log2(x) - (1 - x) * jnp.log2(1 - x)


def entanglement_of_formation_cost(U: cplx.CMat, state: str = "w"):
    """Sum of pairwise entanglement of formation over the three 2Q reduced
    states of U|prep> (Wootters closed form EoF = h((1+sqrt(1-C^2))/2)).

    Reference stub cost_function.py:106-110, never implemented. Note the
    known physics: pairwise EoF vanishes on GHZ (its entanglement is
    purely tripartite) — use the W prep state for a disentangling cost.
    """
    rho = _rho_of(U, state)
    total = 0.0
    for q in range(3):
        rho2 = _partial_trace_single(rho, q)
        C = _concurrence_2q(rho2)
        total = total + _binary_entropy((1 + jnp.sqrt(1 - C * C)) / 2) * (
            C > 1e-12
        )
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

# 3Q entanglement-monotone costs on W/GHZ prep states (reference
# cost_function.py:68-114; negativity/formation/entropy were dead stubs
# there — all real here)
COSTS_3Q = {
    "mutual_information": mutual_information_cost,
    "mutual_information_square": lambda U, state="w": mutual_information_cost(
        U, state, square=True
    ),
    "negativity": negativity_cost,
    "entanglement_of_formation": entanglement_of_formation_cost,
    "entropy_of_entanglement": entropy_of_entanglement_cost,
}
