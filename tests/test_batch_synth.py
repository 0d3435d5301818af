"""Batched device-resident sqiswap synthesis (transpile/batch_synth.py).

The batched path must honor `sqiswap_decompose`'s exact contract — steps
reproduce each block to trace infidelity <= 1e-10 INCLUDING the global
phase, with the same application count — while actually running the
device program (not just falling back to the host routine per block).
"""

import numpy as np

from slam_decomposition_tpu.opt.samplers import haar_sample, sqiswap_count_batch
from slam_decomposition_tpu.transpile import kak as hkak
from slam_decomposition_tpu.transpile import library
from slam_decomposition_tpu.transpile.batch_synth import sqiswap_decompose_batch
from slam_decomposition_tpu.transpile.passes import pass_manager_basic


def _mixed_batch():
    zoo = np.stack(
        [
            np.eye(4, dtype=complex),  # k=0: identity class
            np.kron(hkak._rz(0.3), hkak._rx(1.1)),  # k=0: pure local
            hkak.SQISWAP_M,  # k=1: the basis gate itself
            hkak.can_matrix(0.2, 0.2, 0.0),  # z = 0 boundary branch
            hkak.can_matrix(np.pi / 4, 0.1, 0.1),  # x = pi/4 wall
            hkak.can_matrix(0.3, 0.15, 0.15),  # |z| = x - y double root
            hkak.can_matrix(np.pi / 4, np.pi / 4, np.pi / 4),  # SWAP class
            hkak.can_matrix(np.pi / 4, np.pi / 8, np.pi / 8),  # B class
        ]
    )
    return np.concatenate([haar_sample(24, seed=11), zoo])


def test_batch_matches_host_contract():
    U = _mixed_batch()
    stats = {}
    res = sqiswap_decompose_batch(U, stats=stats)
    assert len(res) == len(U)
    counts = sqiswap_count_batch(U)
    for (steps, n), Ui, ci in zip(res, U, counts):
        assert n == ci
        V = hkak.steps_to_matrix(steps)
        # phase folded in: V reproduces Ui itself, not just its class
        infid = 1.0 - abs(np.trace(V.conj().T @ Ui)) / 4.0
        assert infid <= 1e-10, (n, infid)
        assert np.abs(V - Ui).max() < 1e-4, (n, np.abs(V - Ui).max())
        assert sum(1 for kind, _ in steps if kind == "sqiswap") == n
    # the device path carried the bulk of the batch (k>=2 lanes); host
    # fallback is allowed only for the occasional uncertified lane
    n_k2p = int((counts >= 2).sum())
    assert stats["device"] >= n_k2p - 2, stats
    # counters partition the batch: trivial (k<=1) + device + fallback
    assert stats["trivial"] == int((counts <= 1).sum())
    assert stats["device"] + stats["fallback"] + stats["trivial"] == len(U)


def test_product_steps_batch_fast_path():
    """The vectorized k=0 synthesis recovers exact product blocks in one
    numpy pass (phase + 1q split, no sqiswaps) and rejects non-product
    blocks so they route to the exact host path."""
    from slam_decomposition_tpu.transpile.batch_synth import (
        _product_steps_batch,
    )

    rng = np.random.default_rng(17)

    def rand1q():
        z = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        q, r = np.linalg.qr(z)
        return q * (np.diag(r) / np.abs(np.diag(r)))

    prods = np.stack(
        [np.exp(1j * rng.uniform(-np.pi, np.pi)) * np.kron(rand1q(), rand1q())
         for _ in range(12)]
    )
    prods[0] = np.eye(4)  # degenerate: exact identity
    non_prod = np.stack([hkak.can_matrix(0.3, 0.1, 0.05),
                         hkak.SQISWAP_M])
    out = _product_steps_batch(np.concatenate([prods, non_prod]), 1e-10)
    for i, steps in enumerate(out[:12]):
        assert steps is not None, i
        assert all(kind != "sqiswap" for kind, _ in steps)
        V = hkak.steps_to_matrix(steps)
        infid = 1.0 - abs(np.trace(V.conj().T @ prods[i])) / 4.0
        assert infid <= 1e-10, (i, infid)
    assert out[12] is None and out[13] is None  # entangling: rejected


def test_pass_manager_basic_batched_matches_host():
    c = library.qft(5)
    host, m_host = pass_manager_basic(
        c, gate="sqiswap", duration_1q=0.25, batched=False
    )
    dev, m_dev = pass_manager_basic(
        c, gate="sqiswap", duration_1q=0.25, batched=True
    )
    # identical structure => identical duration metrics and gate counts
    assert m_dev["duration"] == m_host["duration"]
    assert m_dev["gate_counts"] == m_host["gate_counts"]
    U0, U1, U2 = c.to_matrix(), host.to_matrix(), dev.to_matrix()
    d = U0.shape[0]
    assert abs(np.trace(U0.conj().T @ U2)) / d > 1 - 1e-9
    assert abs(np.trace(U1.conj().T @ U2)) / d > 1 - 1e-9


def test_params_to_steps_batch_matches_scalar():
    """The vectorized certify+emit pass is lane-exact vs the per-lane
    routine (incl. rejection of non-finite lanes and phase bookkeeping)."""
    from slam_decomposition_tpu.transpile.batch_synth import (
        _params_to_steps,
        _params_to_steps_batch,
    )
    from slam_decomposition_tpu.transpile.kak import steps_to_matrix

    rng = np.random.default_rng(5)
    for k in (2, 3):
        xs = rng.uniform(0, 2 * np.pi, (6, 6 * (k + 1)))
        # lanes 0..3: self-consistent targets (U built FROM the params, so
        # certification passes); lane 4: random target (fails); lane 5: NaN
        Us = []
        for j in range(6):
            steps = _params_to_steps(xs[j], k, np.eye(4), atol=np.inf)
            Us.append(steps_to_matrix(steps[1:]))  # drop the phase step
        Us = np.stack(Us)
        Us[4] = np.linalg.qr(
            rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
        )[0]
        xs[5, 0] = np.nan
        batch = _params_to_steps_batch(xs, k, Us, atol=1e-9)
        for j in range(6):
            scalar = _params_to_steps(xs[j], k, Us[j], atol=1e-9)
            if scalar is None:
                assert batch[j] is None, (k, j)
                continue
            assert batch[j] is not None, (k, j)
            Vb = steps_to_matrix(batch[j])
            Vs = steps_to_matrix(scalar)
            assert np.abs(Vb - Vs).max() < 1e-12
            assert np.abs(Vb - Us[j]).max() < 1e-9
