"""Sycamore (FSim(pi/2, pi/6)) counting decomposer.

Reference counterpart: ``RootiSwapWeylDecomposition.SYCDecomposer``
(/root/reference/src/slam/utils/transpiler_pass/weyl_decompose.py:333-340),
which UNCONDITIONALLY emits four FSim(pi/2, pi/6) applications, citing
cirq's decompose-into-four-fsim guarantee and "totally ignoring 1Q gates"
— a pure gate-duration counting stub.

Here the count is exact per target: the SYC monodromy coverage set gives
the minimal k (<= 4 by the same guarantee; SYC coordinates are the
denominator-24 rationals (11/24, 1/24, 1/24)) via batched polytope
membership, so SYC-basis circuit scoring uses the true per-block counts,
strictly refining the reference's constant-4. Counts are ground-truthed
in tests by variational synthesis at k applications (the same
cross-check discipline as the sqiswap path).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from slam_decomposition_tpu.models import gates as G

_COVERAGE: dict = {}


def syc_coverage(max_layers: int = 8):
    """Coverage set for the SYC basis (cached on disk like every other
    coverage pickle; gate_set_to_coverage handles the build). Memoized per
    max_layers — a smaller request must not silently reuse a deeper set."""
    if max_layers not in _COVERAGE:
        from slam_decomposition_tpu.coverage.coverage import (
            gate_set_to_coverage,
        )

        _COVERAGE[max_layers] = gate_set_to_coverage(
            G.syc(), max_layers=max_layers
        )
    return _COVERAGE[max_layers]


def syc_counts_batch(targets) -> np.ndarray:
    """Exact minimal SYC application counts for a batch of U(4) targets —
    one k-assignment device call (coverage.monodromy_ks_batch)."""
    from slam_decomposition_tpu.coverage.coverage import monodromy_ks_batch

    return monodromy_ks_batch(syc_coverage(), targets)


def syc_scores() -> np.ndarray:
    """[E-Haar, D-CNOT, D-SWAP] for the SYC basis — the candidate-DB row
    shape (bare_candidates.py:120-125) so SYC slots into the winner
    machinery next to the conversion-gain candidates."""
    from slam_decomposition_tpu.coverage.coverage import (
        monodromy_range_from_target,
    )
    from slam_decomposition_tpu.coverage.haar import expected_cost

    cov = syc_coverage()
    haar = expected_cost(cov)
    cnot, _ = monodromy_range_from_target(cov, G.CNOT.to_numpy())
    swap, _ = monodromy_range_from_target(cov, G.SWAP.to_numpy())
    return np.array([haar, float(cnot), float(swap)])


def syc_decompose(U: np.ndarray) -> Tuple[List, int]:
    """Counting decomposition of one U(4) into k SYC applications.

    Returns (steps, k) in the sqiswap_decompose step format: alternating
    ("1q", None) placeholders and ("syc", None) applications. 1Q contents
    are placeholders exactly as in the reference stub — the variational
    engine supplies exact locals when fidelity-faithful output is needed
    (see tests: a k-application template converges below threshold).
    """
    k = int(syc_counts_batch(np.asarray(U)[None])[0])
    steps: List = [("1q", None)]
    for _ in range(k):
        steps.append(("syc", None))
        steps.append(("1q", None))
    return steps, k
