"""Sycamore counting decomposer tests.

Reference parity: SYCDecomposer (weyl_decompose.py:333-340) emits a
constant FOUR FSim(pi/2, pi/6) per block (cirq's guarantee). Here the
count is exact per target, so the tests check (a) every count respects
the <=4 guarantee, (b) the counts are ground-truthed by variational
synthesis at exactly k applications (the suite's standard
optimizer-vs-polytope cross-check), (c) the constant-4 stub is strictly
refined.

Needs the SYC coverage cache (data/polytope_coverage_['SYC'].pkl, built
once by coverage.gate_set_to_coverage) — skipped when absent so a cold
checkout never triggers the multi-hour exact-rational build in CI.
"""

import os

import numpy as np
import pytest

from slam_decomposition_tpu.config import config
from slam_decomposition_tpu.models import gates as G

_CACHE = config.data_dir / "polytope_coverage_['SYC'].pkl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_CACHE),
    reason="SYC coverage cache not built (see module docstring)",
)


def test_syc_counts_guarantee_and_refinement():
    from slam_decomposition_tpu.opt.samplers import haar_sample
    from slam_decomposition_tpu.transpile.syc_decompose import (
        syc_counts_batch,
    )

    U = haar_sample(64, seed=3)
    ks = syc_counts_batch(U)
    assert (ks >= 1).all() and (ks <= 4).all()  # cirq <=4 guarantee
    # the reference's constant-4 stub is strictly refined
    assert (ks < 4).any()
    named = np.stack(
        [np.eye(4), G.syc().to_numpy(), G.CNOT.to_numpy(), G.SWAP.to_numpy()]
    )
    ks_named = syc_counts_batch(named)
    assert ks_named[0] == 0
    assert ks_named[1] == 1  # SYC itself is one application


def test_syc_count_groundtruth_by_synthesis():
    """Optimizer-vs-polytope cross-check: a Haar target with count k must
    be reachable with k SYC applications and NOT with k-1."""
    from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
    from slam_decomposition_tpu.opt.optimizer import TemplateOptimizer
    from slam_decomposition_tpu.opt.samplers import haar_sample
    from slam_decomposition_tpu.transpile.syc_decompose import (
        syc_counts_batch,
        syc_decompose,
    )

    U = haar_sample(8, seed=21)
    ks = syc_counts_batch(U)
    i = int(np.argmin(ks))  # cheapest target keeps the CPU solve small
    k = int(ks[i])
    steps, k2 = syc_decompose(U[i])
    assert k2 == k
    assert sum(1 for s in steps if s[0] == "syc") == k

    def builder(kk):
        return build_ansatz(cycle_gates([G.syc()], kk))

    ok = TemplateOptimizer(
        builder, spanning_range=[k], training_restarts=5,
        override_fail=True, max_iters=300,
    ).approximate_from_distribution(U[i : i + 1])
    assert ok.success.all(), ok.loss
    if k > 1:
        fail = TemplateOptimizer(
            builder, spanning_range=[k - 1], training_restarts=5,
            override_fail=True, max_iters=300,
        ).approximate_from_distribution(U[i : i + 1])
        assert not fail.success.any()


def test_syc_scores_row():
    from slam_decomposition_tpu.transpile.syc_decompose import syc_scores

    s = syc_scores()
    assert s.shape == (3,)
    assert 1.0 < s[0] < 4.0  # E[Haar] in applications
    assert s[1] in (2.0, 3.0, 4.0) and s[2] in (2.0, 3.0, 4.0)
