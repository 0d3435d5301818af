"""Family extension: can an "older sibling" gate (same gc:gg mix, 2x or 3x
the duration) synthesize a target cheaper than k applications of the child?

Reference: family_extend.py:17-117 (recursive_sibling_check). The recursion
depth is tiny, so this stays host-side, calling the coverage engine for
ranges.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.models.gates import Gate


def recursive_sibling_check(
    coverage,
    child_gate: Gate,
    target_u: np.ndarray,
    basis_factor: float = 1.0,
    cost_1q: float = 0.1,
    use_smush: bool = False,
) -> Tuple[List[Tuple[Gate, int]], float]:
    """Returns (build_plan, cost): build_plan is [(gate, k)] meaning "apply
    gate k times"; cost follows the reference's scoring
    ((k+1)*cost_1q + k*basis_factor, family_extend.py:67-70).
    """
    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        monodromy_range_from_target,
    )

    if np.allclose(target_u, np.eye(4)):
        return [], 0.0

    ki, _ = monodromy_range_from_target(coverage, target_u)
    if ki == 0:
        return [], 0.0
    child_cost = (ki + 1) * cost_1q + ki * basis_factor
    if ki == 1:
        # locally equivalent to target: nominal 1.2 score as in the
        # reference (family_extend.py:78-81)
        return [(child_gate, 1)], 1.2

    # construct older sibling: duration x2 (even ki) or x3 (odd ki)
    rec_factor = 2 if ki % 2 == 0 else 3
    p1, p2, gc, gg, t = child_gate.params
    sibling = G.conversion_gain_gate(p1, p2, gc, gg, t * rec_factor)
    sibling = G.cg_normalize_duration(sibling, 1.0)

    # stop when the sibling exceeds iSwap strength (family_extend.py:96)
    sib_score = np.inf
    sib_plan: List = []
    _, _, sg1, sg2, _ = sibling.params
    if sg1 + sg2 <= np.pi / 2 + 1e-12:
        sib_cov = gate_set_to_coverage(G.cg_canonicalize(sibling), smush=use_smush)
        sib_plan, sib_score = recursive_sibling_check(
            sib_cov,
            sibling,
            target_u,
            basis_factor=rec_factor * basis_factor,
            cost_1q=cost_1q,
            use_smush=use_smush,
        )

    if sib_score < child_cost:
        return sib_plan, sib_score
    return [(child_gate, ki)], child_cost


def family_costs_batch(
    child_gate: Gate,
    targets: np.ndarray,
    cost_1q: float = 0.1,
    basis_factor: float = 1.0,
    use_smush: bool = False,
) -> np.ndarray:
    """Vectorized :func:`recursive_sibling_check` over a whole target
    distribution: the reference evaluates the recursion per target
    (haar_improvements.ipynb cell 4 — one ``monodromy_range_from_target``
    call per target per recursion level), but the sibling *gate chain*
    depends only on the per-target k parity, so a batch needs just one
    device ks-assignment call per distinct sibling gate
    (coverage.monodromy_ks_batch) and the rest is numpy arithmetic.

    Returns the (N,) family-extension scores; bit-identical to the scalar
    recursion (tests/test_family_batch.py proves parity lane by lane).
    """
    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        monodromy_ks_batch,
    )

    targets = np.asarray(targets)
    if targets.ndim == 2:
        targets = targets[None]
    n = len(targets)

    def rec(gate: Gate, bf: float, idx: np.ndarray) -> np.ndarray:
        cov = gate_set_to_coverage(G.cg_canonicalize(gate), smush=use_smush)
        ks = monodromy_ks_batch(cov, targets[idx]).astype(int)
        out = np.empty(len(idx), dtype=float)
        out[ks == 0] = 0.0
        out[ks == 1] = 1.2  # locally equivalent: nominal score (family_extend.py:78-81)
        child_cost = (ks + 1) * cost_1q + ks * bf
        for rec_factor in (2, 3):
            sel = (ks >= 2) & ((ks % 2 == 0) == (rec_factor == 2))
            if not sel.any():
                continue
            p1, p2, gc, gg, t = gate.params
            sib = G.cg_normalize_duration(
                G.conversion_gain_gate(p1, p2, gc, gg, t * rec_factor), 1.0
            )
            _, _, sg1, sg2, _ = sib.params
            if sg1 + sg2 <= np.pi / 2 + 1e-12:
                sib_score = rec(sib, rec_factor * bf, idx[sel])
                out[sel] = np.minimum(sib_score, child_cost[sel])
            else:
                out[sel] = child_cost[sel]
        return out

    return rec(child_gate, basis_factor, np.arange(n))
