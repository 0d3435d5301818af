"""Sampler tests: batched Haar draw, analytic sqiswap counts, exact-k.

The exact-k sampler is ground-truthed against the full synthesis path
(reference Haar2Sample/Haar3Sample counted riswap ops after a per-sample
RootiSwapWeylDecomposition, sampler.py:73-107; here the batched analytic
count must agree with transpile.kak.sqiswap_decompose's emitted count).
"""

import numpy as np
import pytest

from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.opt.samplers import (
    haar_exact_sample,
    haar_sample,
    sqiswap_count_batch,
)
from slam_decomposition_tpu.transpile.kak import sqiswap_decompose


def test_haar_sample_batched_unitary():
    U = haar_sample(17, seed=0)
    assert U.shape == (17, 4, 4)
    eye = np.broadcast_to(np.eye(4), (17, 4, 4))
    assert np.abs(np.conj(np.swapaxes(U, 1, 2)) @ U - eye).max() < 1e-12
    # same seed reproduces
    assert np.allclose(U, haar_sample(17, seed=0))


def test_sqiswap_count_batch_matches_synthesis():
    Us = list(haar_sample(40, seed=7))
    Us += [
        np.eye(4),
        G.SQISWAP.to_numpy(),
        G.ISWAP.to_numpy(),
        G.CNOT.to_numpy(),
        G.SWAP.to_numpy(),
        G.berkeley().to_numpy(),
        G.canonical(0.3, 0.2, 0.1).to_numpy(),
    ]
    Us = np.stack(Us)
    batch = sqiswap_count_batch(Us)
    serial = np.array([sqiswap_decompose(U)[1] for U in Us])
    np.testing.assert_array_equal(batch, serial)
    # single-matrix auto-promotion
    assert sqiswap_count_batch(G.SWAP.to_numpy()) == serial[-3]


@pytest.mark.parametrize("n_uses,n", [(2, 200), (3, 100)])
def test_haar_exact_sample_batched(n_uses, n):
    U = haar_exact_sample(n_uses, n, seed=3)
    assert U.shape == (n, 4, 4)
    assert (sqiswap_count_batch(U) == n_uses).all()
    # spot-check a few against the full synthesis count
    for i in range(0, n, max(1, n // 5)):
        assert sqiswap_decompose(U[i])[1] == n_uses


def test_haar_exact_sample_budget():
    with pytest.raises(RuntimeError):
        haar_exact_sample(1, 5, seed=0, max_tries=256)  # measure-zero class


def test_symplectic_index_bijection_small_n():
    """The Koenig-Smolin index map hits every element of Sp(2n, GF(2))
    exactly once for n=1 (6) and n=2 (720), and every output preserves
    the symplectic form."""
    from slam_decomposition_tpu.opt.samplers import (
        _sp_inner,
        sp_group_order,
        symplectic_from_index,
    )

    assert (sp_group_order(1), sp_group_order(2)) == (6, 720)
    for n in (1, 2):
        seen = set()
        for i in range(sp_group_order(n)):
            g = symplectic_from_index(i, n)
            nn = 2 * n
            for a in range(nn):
                for b in range(a + 1, nn):
                    want = 1 if (a // 2 == b // 2) else 0
                    assert _sp_inner(g[a], g[b]) == want
            seen.add(g.tobytes())
        assert len(seen) == sp_group_order(n)


def test_clifford_unitary_covers_full_group_n1():
    """Symplectic index x all sign patterns builds EXACTLY the enumerated
    1Q Clifford group (24 elements mod phase) — ground truth that the
    stabilizer-projection construction realizes the whole group with no
    duplicates (the same construction then extends to any n)."""
    import numpy as np

    from slam_decomposition_tpu.opt.samplers import (
        _clifford_group,
        clifford_unitary,
        sp_group_order,
        symplectic_from_index,
    )

    def canon(U):
        flat = U.reshape(-1)
        idx = int(np.argmax(np.abs(flat) > 1e-9))
        Uc = U * (abs(flat[idx]) / flat[idx])
        return tuple(np.round(Uc.reshape(-1), 6).view(float))

    keys = set()
    for i in range(sp_group_order(1)):
        g = symplectic_from_index(i, 1)
        for s in range(4):
            signs = np.array([s & 1, (s >> 1) & 1])
            U = clifford_unitary(g, signs)
            assert np.allclose(U @ U.conj().T, np.eye(2), atol=1e-12)
            keys.add(canon(U))
    assert keys == {canon(U) for U in _clifford_group(1)}


def test_clifford_sample_3q():
    """n >= 3 sampling (the reference's qiskit random_clifford capability,
    sampler.py:57-59): unitary, and conjugates single-qubit Paulis to
    signed Paulis (the defining Clifford property)."""
    import numpy as np

    from slam_decomposition_tpu.opt.samplers import (
        _pauli_matrix,
        clifford_sample,
    )

    Us = clifford_sample(6, n_qubits=3, seed=7)
    assert Us.shape == (6, 8, 8)
    I = np.eye(8)
    probes = [
        np.array([1, 0, 0, 0, 0, 0]),  # X_0
        np.array([0, 1, 0, 0, 0, 0]),  # Z_0
        np.array([0, 0, 1, 1, 0, 0]),  # Y_1 (up to phase)
        np.array([0, 0, 0, 0, 1, 1]),  # Y_2
    ]
    for U in Us:
        assert np.allclose(U @ U.conj().T, I, atol=1e-12)
        for v in probes:
            P = U @ _pauli_matrix(v, 0) @ U.conj().T
            a = np.abs(P)
            nz = a[a > 1e-9]
            assert np.allclose(nz, 1.0, atol=1e-9)
            assert len(nz) == 8  # exactly one nonzero entry per row/col
