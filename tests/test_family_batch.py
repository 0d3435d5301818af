"""family_costs_batch == recursive_sibling_check lane by lane.

The batched form replaces the reference's per-target recursion
(haar_improvements.ipynb cell 4) with one ks-assignment call per distinct
sibling gate; scores must be bit-identical to the scalar recursion.
"""

import numpy as np
import pytest

from slam_decomposition_tpu.config import setup_x64

setup_x64()

from slam_decomposition_tpu.coverage.coverage import gate_set_to_coverage
from slam_decomposition_tpu.explore.family import (
    family_costs_batch,
    recursive_sibling_check,
)
from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.opt.samplers import haar_sample


@pytest.mark.parametrize("gg_frac", [8, 5])
def test_family_batch_parity(gg_frac):
    base = G.conversion_gain_gate(0, 0, 0, np.pi / gg_frac, 1.0)
    cov = gate_set_to_coverage(G.cg_canonicalize(base))
    rng_targets = list(haar_sample(6, seed=3))
    swap = np.zeros((4, 4), complex)
    swap[0, 0] = swap[3, 3] = 1.0
    swap[1, 2] = swap[2, 1] = 1.0
    targets = np.stack(
        rng_targets + [np.asarray(G.CNOT.to_numpy()), swap, np.eye(4)]
    )
    batch = family_costs_batch(base, targets, cost_1q=0.1, basis_factor=0.7)
    for i, t in enumerate(targets):
        _, want = recursive_sibling_check(
            cov, base, t, cost_1q=0.1, basis_factor=0.7
        )
        assert batch[i] == pytest.approx(want, abs=1e-12), (i, batch[i], want)
    assert batch[-1] == 0.0  # identity is free
