"""Transpile-layer tests: IR, consolidation, KAK, analytic synthesis,
duration analysis, pass managers."""

import numpy as np
import pytest
from scipy.stats import unitary_group

from slam_decomposition_tpu.transpile import library
from slam_decomposition_tpu.transpile.consolidate import (
    consolidate_2q_blocks,
    consolidated_circuit,
)
from slam_decomposition_tpu.transpile.cx_decompose import (
    cx_decompose,
    cx_steps_to_matrix,
)
from slam_decomposition_tpu.transpile.ir import Circuit, embed, unroll_3q_or_more
from slam_decomposition_tpu.transpile.kak import (
    can_matrix,
    kak_form,
    sqiswap_decompose,
    steps_to_matrix,
)
from slam_decomposition_tpu.transpile.passes import (
    duration_analysis,
    pass_manager_basic,
)


def test_ir_matrix_ghz():
    c = library.ghz(3)
    U = c.to_matrix()
    psi = U[:, 0]
    np.testing.assert_allclose(np.abs(psi) ** 2, [0.5, 0, 0, 0, 0, 0, 0, 0.5], atol=1e-12)


def test_unroll_ccx():
    c = Circuit(3)
    c.append("ccx", (0, 1, 2))
    u = unroll_3q_or_more(c)
    assert all(op.n_qubits <= 2 for op in u.ops)
    ccx = np.eye(8)[:, [0, 1, 2, 3, 4, 5, 7, 6]]
    got = u.to_matrix()
    tr = np.trace(got.conj().T @ ccx)
    assert 1 - abs(tr) / 8 < 1e-12


def test_consolidation_preserves_unitary():
    c = library.vqe_linear(3, seed=5)
    blocks = consolidate_2q_blocks(c)
    assert all(b.unitary.shape == (4, 4) for b in blocks)
    cc = consolidated_circuit(c)
    U1, U2 = c.to_matrix(), cc.to_matrix()
    tr = np.trace(U1.conj().T @ U2)
    assert 1 - abs(tr) / 8 < 1e-10


def test_kak_reconstruction():
    rng = np.random.default_rng(3)
    for _ in range(10):
        U = unitary_group.rvs(4, random_state=rng)
        f = kak_form(U)
        assert np.abs(f.matrix() - U).max() < 1e-12
        t = f.t
        assert np.pi / 4 + 1e-9 >= t[0] >= t[1] >= abs(t[2]) - 1e-9


def test_sqiswap_decompose_counts_and_fidelity():
    rng = np.random.default_rng(4)
    counts = {2: 0, 3: 0}
    for _ in range(20):
        U = unitary_group.rvs(4, random_state=rng)
        steps, n = sqiswap_decompose(U)
        V = steps_to_matrix(steps)
        assert 1 - abs(np.trace(V.conj().T @ U)) / 4 < 1e-12
        counts[n] += 1
    assert counts[2] > counts[3]  # ~79/21 Haar split


def test_cx_decompose_counts():
    from slam_decomposition_tpu.models import gates as G

    for U, expect in [
        (G.CNOT.to_numpy(), 1),
        (G.ISWAP.to_numpy(), 2),
        (G.SWAP.to_numpy(), 3),
        (np.eye(4, dtype=complex), 0),
    ]:
        steps, n = cx_decompose(U)
        V = cx_steps_to_matrix(steps)
        assert n == expect
        assert 1 - abs(np.trace(V.conj().T @ U)) / 4 < 1e-10


def test_duration_analysis_critical_path():
    c = Circuit(3)
    c.append("cx", (0, 1))          # dur 1
    c.append("cx", (1, 2))          # dur 1, serial after first
    c.append("u", (0,), params=(1, 2, 3))  # parallel with second cx
    d = duration_analysis(c, duration_1q=0.25)
    assert d["duration"] == 2.0
    assert d["gate_counts"]["cx"] == 2


def test_pass_manager_basic_sqiswap_qft():
    c = library.qft(3)
    out, metrics = pass_manager_basic(c, gate="sqiswap", duration_1q=0.25)
    assert metrics["gate_counts"].get("riswap", 0) >= 3
    # unitary preserved up to per-block phases: compare block count
    U1, U2 = c.to_matrix(), out.to_matrix()
    tr = abs(np.trace(U1.conj().T @ U2)) / 8
    assert tr > 1 - 1e-9


def test_pass_manager_basic_cx_ghz():
    c = library.ghz(3)
    out, metrics = pass_manager_basic(c, gate="cx", duration_1q=0.0)
    assert metrics["gate_counts"].get("cx", 0) == 2  # each GHZ cx is 1 cx block
    U1, U2 = c.to_matrix(), out.to_matrix()
    assert abs(np.trace(U1.conj().T @ U2)) / 8 > 1 - 1e-9


@pytest.mark.parametrize("name", ["QFT", "GHZ", "QAOA", "VQE(Linear)", "HLF"])
def test_suite_generators(name):
    fn = library.BENCHMARK_CIRCUITS[name]
    c = fn(4) if name != "QAOA" else fn(4, seed=1)
    assert c.n_qubits == 4
    assert len(c.ops) > 0
    assert all(op.n_qubits <= 2 for op in c.ops)


def test_adder_and_multiplier_shapes():
    a = library.adder(6)
    assert all(op.n_qubits <= 2 for op in a.ops)
    m = library.multiplier(4)
    assert all(op.n_qubits <= 2 for op in m.ops)


def test_adder_correctness():
    """1-bit CDKM adder: |a=1,b=1> -> b=0 with carry out in a's msb region."""
    c = library.adder(4)  # n=1: a[0], b[1], cin=2, spare q3
    U = c.to_matrix()
    # basis index: q0=a=1, q1=b=1, q2=cin=0, q3=0 -> idx 0b1100 = 12
    out = U[:, 0b1100]
    idx = int(np.argmax(np.abs(out)))
    # expect sum bit in b (q1): 1+1 = 10b: b gets 0, a keeps 1, carry q? ->
    # CDKM: b <- a+b mod 2 = 0; a holds carry chain
    bits = [(idx >> (3 - q)) & 1 for q in range(4)]
    assert bits[1] == 0  # sum bit
