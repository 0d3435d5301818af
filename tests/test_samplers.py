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
