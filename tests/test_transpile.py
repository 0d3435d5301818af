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


def test_sqiswap_closed_form_boundary_classes():
    """The closed-form interleaving solve (no iterative optimizer) must
    certify at 1e-10 on every chamber boundary class, including the tiny
    controlled-phases QFT-16 emits (pi/2^15) and region-edge double roots."""
    import numpy as np

    from slam_decomposition_tpu.transpile.kak import (
        can_matrix, sqiswap_decompose, steps_to_matrix)

    cases = {
        "CNOT": (np.pi / 4, 0, 0), "ISWAP": (np.pi / 4, np.pi / 4, 0),
        "SWAP": (np.pi / 4, np.pi / 4, np.pi / 4),
        "B": (np.pi / 4, np.pi / 8, 0), "sqiswap": (np.pi / 8, np.pi / 8, 0),
        "near-id-qft": (np.pi / 2 ** 15, 0, 0),
        "region-edge": (0.5, 0.25, 0.25),
        "corner": (np.pi / 4, np.pi / 4, -np.pi / 4),
        "xwall": (np.pi / 4, 0.3, 0.1), "xy-diag": (0.3, 0.3, 0.0),
    }
    for name, t in cases.items():
        U = can_matrix(*t)
        steps, n = sqiswap_decompose(U)
        V = steps_to_matrix(steps)
        infid = 1 - abs(np.trace(V.conj().T @ U)) / 4
        assert infid <= 1e-10, (name, infid)
        assert n <= 3


def test_cx_closed_form_counts_and_fidelity():
    import numpy as np

    from slam_decomposition_tpu.transpile.cx_decompose import (
        cx_decompose, cx_steps_to_matrix)
    from slam_decomposition_tpu.transpile.kak import can_matrix
    from slam_decomposition_tpu.opt.samplers import haar_sample

    for U, expect_n in [
        (can_matrix(np.pi / 4, 0, 0), 1),
        (can_matrix(0.5, 0.2, 0.0), 2),
        (can_matrix(0.5, 0.3, -0.2), 3),
    ]:
        steps, n = cx_decompose(U)
        V = cx_steps_to_matrix(steps)
        assert n == expect_n
        assert 1 - abs(np.trace(V.conj().T @ U)) / 4 <= 1e-10
    for U in haar_sample(20, seed=3):
        steps, n = cx_decompose(U)
        V = cx_steps_to_matrix(steps)
        assert n == 3
        assert 1 - abs(np.trace(V.conj().T @ U)) / 4 <= 1e-10


def test_router_legalizes_onto_grid():
    """SABRE-lite routing: every 2Q op lands on a coupling edge, the
    circuit's unitary semantics are preserved modulo the tracked
    permutation (checked per-op count), and a linear chain routes with
    zero swaps via the snake layout."""
    from slam_decomposition_tpu.transpile import library
    from slam_decomposition_tpu.transpile.route import grid_coupling, route

    edges = grid_coupling(4, 4)
    eset = {tuple(sorted(e)) for e in edges}
    lin = library.vqe_linear(16, seed=0)
    routed = route(lin, edges, seed=0, rows_cols=(4, 4))
    assert all(
        tuple(sorted(op.qubits)) in eset for op in routed.ops if op.n_qubits == 2
    )
    n2 = sum(1 for op in lin.ops if op.n_qubits == 2)
    assert sum(1 for op in routed.ops if op.n_qubits == 2) == n2  # 0 swaps

    qft = library.qft(8)
    routed = route(qft, edges[:], seed=1, rows_cols=(4, 4))
    assert all(
        tuple(sorted(op.qubits)) in eset for op in routed.ops if op.n_qubits == 2
    )
    # all original ops present (QFT itself ends in swaps, so compare
    # non-swap multisets and require the router only ADDED swaps)
    from collections import Counter
    orig = Counter(op.name for op in qft.ops if op.name != "swap")
    got = Counter(op.name for op in routed.ops if op.name != "swap")
    assert orig == got
    n_swaps_orig = sum(1 for op in qft.ops if op.name == "swap")
    n_swaps_routed = sum(1 for op in routed.ops if op.name == "swap")
    assert n_swaps_routed >= n_swaps_orig


def test_fidelity_faithful_substitution():
    """fit_1q=True makes substitution passes unitary-preserving: the
    winner path via batched template fits (exact coverage guarantee), the
    parallel-drive path via class-fitted smush pulses + exact KAK sandwich
    locals + LM polish. The reference leaves random placeholders forever
    (speed_limit_pass.py:311-313)."""
    import numpy as np

    from slam_decomposition_tpu.transpile import library
    from slam_decomposition_tpu.transpile.ir import Circuit
    from slam_decomposition_tpu.transpile.passes import (
        pass_manager_optimized_sqiswap, pass_manager_slam)

    def gdist(A, B):
        return 1 - abs(np.trace(B.conj().T @ A)) / A.shape[0]

    ghz = library.ghz(3)
    ladder = Circuit(3)
    ladder.cp(0.7, 0, 1); ladder.cp(1.1, 1, 2); ladder.cp(0.3, 0, 1)

    for circ in (ghz, ladder):
        U = circ.to_matrix()
        out, _ = pass_manager_slam(circ, duration_1q=0.25, fit_1q=True)
        assert gdist(out.to_matrix(), U) < 1e-9
        out, _ = pass_manager_optimized_sqiswap(circ, duration_1q=0.25, fit_1q=True)
        assert gdist(out.to_matrix(), U) < 5e-9

    # without the flag, substitution is duration-only (placeholders)
    out, _ = pass_manager_slam(ghz, duration_1q=0.25)
    assert gdist(out.to_matrix(), ghz.to_matrix()) > 1e-3


def test_fidelity_faithful_substitution_swap_blocks():
    """SWAP-class blocks defeat the time-optimal [1.0, 0.5] driven plan
    (an interior instantaneous local layer is physically required — see
    models/trajectory.improved_swap); the pass must rescue them through
    the exact 3-segment fallback and stay unitary-preserving."""
    import numpy as np

    from slam_decomposition_tpu.transpile.ir import Circuit
    from slam_decomposition_tpu.transpile.passes import (
        pass_manager_optimized_sqiswap,
    )

    c = Circuit(3)
    c.cx(0, 1)
    c.swap(1, 2)
    c.cx(0, 1)
    U = c.to_matrix()
    out, _ = pass_manager_optimized_sqiswap(c, duration_1q=0.25, fit_1q=True)
    V = out.to_matrix()
    assert 1 - abs(np.trace(V.conj().T @ U)) / U.shape[0] < 1e-9


def test_commutation_aware_routing_preserves_unitary():
    """Routing may reorder commuting gates (cp cascades, shared-control
    cx); the routed circuit must still equal the original modulo the
    initial/final layout permutations. Checked exactly on QFT-4 routed
    onto a 2x2 grid (16-dim statevector algebra)."""
    import numpy as np

    from slam_decomposition_tpu.transpile import library
    from slam_decomposition_tpu.transpile.route import grid_coupling, route

    for seed in range(3):
        qft = library.qft(4)
        routed, init, final = route(
            qft, grid_coupling(2, 2), seed=seed, rows_cols=(2, 2),
            return_layouts=True,
        )
        U_log = qft.to_matrix()
        U_phys = routed.to_matrix()

        def perm_matrix(layout):
            # maps logical amplitude index -> physical amplitude index
            n = len(layout)
            P = np.zeros((2**n, 2**n))
            for idx in range(2**n):
                bits = [(idx >> (n - 1 - q)) & 1 for q in range(n)]
                pbits = [0] * n
                for q in range(n):
                    pbits[layout[q]] = bits[q]
                pidx = sum(b << (n - 1 - i) for i, b in enumerate(pbits))
                P[pidx, idx] = 1.0
            return P

        Pi = perm_matrix(init)
        Pf = perm_matrix(final)
        # |phys_out> = U_phys Pi |logical_in>; expected Pf U_log |logical_in>
        # (up to global phase — checked elementwise, then by the trace)
        assert np.abs(np.abs(U_phys @ Pi) - np.abs(Pf @ U_log)).max() < 1e-9
        A = (U_phys @ Pi) @ (Pf @ U_log).conj().T
        assert np.abs(np.abs(np.trace(A)) - 16) < 1e-9, f"seed {seed}"


def test_qft_routing_beats_duration_bar():
    """The duration-arbitrated router (commutation DAG + depth-aware swap
    scoring + critical-path scheduling) must land QFT-16/4x4 below the
    reference's qiskit-O3 basic duration of 127.5 (BASELINE.md) — the
    round-1 swap-greedy router sat at 133-137.5. Swap count is explicitly
    NOT pinned: the router optimizes makespan, and routinely prefers more
    swaps placed off the critical path."""
    from slam_decomposition_tpu.transpile import library
    from slam_decomposition_tpu.transpile.route import (
        duration_proxy,
        grid_coupling,
        route,
    )

    qft = library.qft(16)
    # best-of-10 seeds, matching the benchmark protocol (seed variance on
    # a single route call spans ~112-137)
    best = min(
        duration_proxy(
            route(qft, grid_coupling(4, 4), seed=s, rows_cols=(4, 4))
        )
        for s in range(10)
    )
    assert best < 127.5, f"routed QFT-16 proxy duration {best}"


def test_block_coordinate_counts_shot_chart():
    from slam_decomposition_tpu.transpile.consolidate import (
        block_coordinate_counts,
    )

    c = Circuit(3)
    c.append("cx", (0, 1))
    c.append("swap", (1, 2))
    c.append("cx", (0, 1))
    counts = block_coordinate_counts(c)
    assert counts == {(0.5, 0.0, 0.0): 2, (0.5, 0.5, 0.5): 1}
