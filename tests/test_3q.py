"""3-qubit capability tests: circulator Hamiltonian synthesis, fixed 3Q
gates, entanglement-monotone costs, 3Q templates (SURVEY §2 L1/L2/L7 rows).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.models import hamiltonians as ham
from slam_decomposition_tpu.models.templates import (
    build_ansatz,
    hamiltonian_ansatz,
)
from slam_decomposition_tpu.opt import costs
from slam_decomposition_tpu.ops import cplx


def test_vswap_is_circulator_gate():
    """VSWAP's published circulator parameters reproduce its matrix
    (custom_gates.py:141-150)."""
    v = G.vswap()
    U = v.to_numpy()
    assert U.shape == (8, 8)
    np.testing.assert_allclose(U @ U.conj().T, np.eye(8), atol=1e-12)
    assert abs(v.cost() - (2 * np.pi / (4 / np.sqrt(2))) / (np.pi / 2)) < 1e-9


def test_fixed_3q_gates_unitary():
    for g in [G.CPARITY_SWAP, G.MARGOLUS, G.CCZ, G.CCIX, G.CISWAP, G.PERES]:
        U = g.to_numpy()
        np.testing.assert_allclose(U @ U.conj().T, np.eye(8), atol=1e-12)


def test_circulator_hamiltonian_synthesis():
    """Recover VSWAP by optimizing circulator Hamiltonian parameters — the
    reference's HamiltonianTemplate flow (basis.py:24-48 + hamiltonian.py:244)."""
    from slam_decomposition_tpu.opt.optimizer import TemplateOptimizer

    target = G.vswap().to_numpy()

    def u_fn(p1, p2, p3, g1, g2, g3, t):
        return ham.circulator_u(p1, p2, p3, g1, g2, g3, t=t)

    ansatz = hamiltonian_ansatz(
        u_fn, 7,
        lower=np.array([-np.pi, -np.pi, -np.pi, 0, 0, 0, 0.5]),
        upper=np.array([np.pi, np.pi, np.pi, 1.5, 1.5, 1.5, 1.5]),
        n_qubits=3,
    )
    opt = TemplateOptimizer(
        ansatz, objective="square", training_restarts=12,
        override_fail=True, max_iters=300,
    )
    res = opt.approximate_target_U(target)
    assert res.loss[0] < 1e-8, res.loss


def test_mutual_information_cost():
    """W-state mutual information: positive for identity (state stays
    entangled), ~zero after a disentangling unitary
    (cost_function.py:68-99)."""
    eye8 = cplx.from_numpy(np.eye(8))
    mi = float(costs.mutual_information_cost(eye8, state="w"))
    assert mi > 1.0  # W state has substantial pairwise MI
    # build the inverse of the W-prep circuit: prep |000> -> |W>; applying
    # prep^dag disentangles, driving the monotone to 0
    from slam_decomposition_tpu.transpile.ir import Circuit

    prep = Circuit(3)
    prep.ry(2 * np.arccos(1 / np.sqrt(3)), 0)
    # controlled-H on (0 -> 1), then cx(1,2), cx(0,1), x(0)
    ch = np.eye(4, dtype=complex)
    H = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    ch[2:, 2:] = H
    prep.unitary(ch, (0, 1), name="ch")
    prep.cx(1, 2)
    prep.cx(0, 1)
    prep.x(0)
    Uprep = prep.to_matrix()
    w = Uprep[:, 0]
    expect = np.zeros(8)
    expect[[1, 2, 4]] = 1 / 3
    np.testing.assert_allclose(np.abs(w) ** 2, expect, atol=1e-9)
    mi0 = float(
        costs.mutual_information_cost(cplx.from_numpy(Uprep.conj().T), state="w")
    )
    assert mi0 < 1e-9


def test_3q_circuit_template_embedding():
    """2Q basis gates embedded on 3Q edges compose correctly
    (CircuitTemplate edge_params role, basis.py:69-73)."""
    ansatz = build_ansatz(
        [G.CNOT, G.CNOT], edges=[(0, 1), (1, 2)], n_qubits=3,
    )
    x = np.zeros(ansatz.n_params)
    U = cplx.to_numpy(ansatz.eval_fn(jnp.asarray(x)))
    # with all-zero 1q params (u3(0,0,0)=I): U = CX_12 CX_01
    from slam_decomposition_tpu.transpile.ir import Circuit

    ref = Circuit(3)
    ref.cx(0, 1)
    ref.cx(1, 2)
    np.testing.assert_allclose(U, ref.to_matrix(), atol=1e-12)


def test_ghz_mutual_information_state():
    eye8 = cplx.from_numpy(np.eye(8))
    mi = float(costs.mutual_information_cost(eye8, state="ghz"))
    assert mi > 1.0


# ------------------------- implemented entanglement monotones (ref stubs)


def _np_negativity_sum(psi):
    """Independent numpy check: sum over the 3 cuts of
    (||rho^{T_q}||_1 - 1)/2."""
    rho = np.outer(psi, psi.conj())
    total = 0.0
    for q in range(3):
        t = rho.reshape((2,) * 6)
        pt = np.swapaxes(t, q, q + 3).reshape(8, 8)
        total += (np.abs(np.linalg.eigvalsh(pt)).sum() - 1) / 2
    return total


def test_negativity_known_values():
    eye8 = cplx.from_numpy(np.eye(8))
    # GHZ: N = 1/2 per cut -> 1.5 total; W: sqrt(2)/3 per cut
    n_ghz = float(costs.negativity_cost(eye8, state="ghz"))
    assert abs(n_ghz - 1.5) < 1e-7
    n_w = float(costs.negativity_cost(eye8, state="w"))
    assert abs(n_w - 3 * np.sqrt(2) / 3) < 1e-7


def test_negativity_matches_numpy_on_random_unitary():
    rng = np.random.default_rng(5)
    z = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    U, _ = np.linalg.qr(z)
    w = np.zeros(8, dtype=complex)
    w[[1, 2, 4]] = 1 / np.sqrt(3)
    got = float(costs.negativity_cost(cplx.from_numpy(U), state="w"))
    expect = _np_negativity_sum(U @ w)
    assert abs(got - expect) < 1e-8


def test_entropy_of_entanglement_known_values():
    eye8 = cplx.from_numpy(np.eye(8))
    # GHZ: every 1q reduction is maximally mixed -> S = 1 per cut
    s_ghz = float(costs.entropy_of_entanglement_cost(eye8, state="ghz"))
    assert abs(s_ghz - 3.0) < 1e-6
    # W: 1q reduction diag(2/3, 1/3) -> h(1/3) per cut
    h13 = -(2 / 3) * np.log2(2 / 3) - (1 / 3) * np.log2(1 / 3)
    s_w = float(costs.entropy_of_entanglement_cost(eye8, state="w"))
    assert abs(s_w - 3 * h13) < 1e-6


def test_entanglement_of_formation_known_values():
    eye8 = cplx.from_numpy(np.eye(8))
    # W: pairwise concurrence 2/3 -> EoF = h((1+sqrt(5)/3)/2) per pair
    x = (1 + np.sqrt(1 - 4 / 9)) / 2
    h = -x * np.log2(x) - (1 - x) * np.log2(1 - x)
    e_w = float(costs.entanglement_of_formation_cost(eye8, state="w"))
    assert abs(e_w - 3 * h) < 1e-6
    # GHZ: pairwise reduced states are separable -> EoF = 0 (known physics)
    e_ghz = float(costs.entanglement_of_formation_cost(eye8, state="ghz"))
    assert e_ghz < 1e-6


def test_monotones_vanish_when_disentangled():
    """All three implemented monotones hit 0 after undoing the W prep."""
    from slam_decomposition_tpu.transpile.ir import Circuit

    prep = Circuit(3)
    prep.ry(2 * np.arccos(1 / np.sqrt(3)), 0)
    ch = np.eye(4, dtype=complex)
    H = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    ch[2:, 2:] = H
    prep.unitary(ch, (0, 1), name="ch")
    prep.cx(1, 2)
    prep.cx(0, 1)
    prep.x(0)
    Udag = cplx.from_numpy(prep.to_matrix().conj().T)
    assert float(costs.negativity_cost(Udag, state="w")) < 1e-7
    assert float(costs.entropy_of_entanglement_cost(Udag, state="w")) < 1e-6
    assert float(costs.entanglement_of_formation_cost(Udag, state="w")) < 1e-6
