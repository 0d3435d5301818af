"""Duration/cost scaling of candidate scores under speed-limit models.

Reference: duraton_scaling.py — convert bare (gate-count) scores into
duration scores: scale by the (possibly speed-limited) 2Q gate cost and add
(k+1) * duration_1q for the interleaved 1Q layers; optionally re-score via
family extension (atomic_cost_scaling, duraton_scaling.py:16-104).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from slam_decomposition_tpu.explore.speed_limit import (
    SLFS,
    speed_limited_cost,
)
from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.models.gates import Gate


def scaled_gate_for(params: Sequence[float], speed_method: str) -> Gate:
    """Reconstruct the gate with its speed-limited duration."""
    p1, p2, gc, gg, t = params
    gate = G.conversion_gain_gate(p1, p2, gc, gg, t)
    slf = SLFS.get(speed_method)
    if slf is None:
        return gate
    import dataclasses

    return dataclasses.replace(
        gate, duration_override=speed_limited_cost(gc, gg, t, slf)
    )


def atomic_cost_scaling(
    params: Sequence[float],
    scores,
    speed_method: str = "linear",
    duration_1q: float = 0.0,
    scaled_gate: Optional[Gate] = None,
    family_extension: bool = False,
    use_smush: bool = False,
    metric=None,
) -> Tuple[Gate, np.ndarray]:
    """Bare scores -> duration scores (duraton_scaling.py:16-104)."""
    if scaled_gate is None:
        gate = scaled_gate_for(params, speed_method)
    else:
        gate = scaled_gate

    scores = np.asarray(scores, dtype=float)
    if "bare" in speed_method:
        scaled = scores.copy()
    else:
        # speed-limited methods scale by the re-costed duration; 'linear'
        # scales by the bare pi/2-normalized cost (duraton_scaling.py:62-65)
        factor = gate.duration if speed_method in ("hardware", "mid", "squared") else gate.cost()
        scaled = scores * factor

    if family_extension:
        from slam_decomposition_tpu.explore.family import recursive_sibling_check
        from slam_decomposition_tpu.coverage.coverage import gate_set_to_coverage

        base = G.conversion_gain_gate(*params)
        cov = gate_set_to_coverage(G.cg_canonicalize(base), smush=use_smush)
        if metric is None:
            targets = [G.CNOT.to_numpy(), G.SWAP.to_numpy()]
            idxs = [1, 2]
        elif metric == 0:
            raise NotImplementedError("family extension not defined for Haar")
        elif metric == 1:
            targets, idxs = [G.CNOT.to_numpy()], [None]
        elif metric == 2:
            targets, idxs = [G.SWAP.to_numpy()], [None]
        else:
            targets, idxs = [G.CNOT.to_numpy(), G.SWAP.to_numpy()], [1, 2]
        for tgt, idx in zip(targets, idxs):
            _, fam_cost = recursive_sibling_check(
                cov, base, tgt, cost_1q=duration_1q,
                basis_factor=gate.cost(), use_smush=use_smush,
            )
            if idx is None:
                return gate, np.asarray(fam_cost)
            scaled[idx] = fam_cost
        return gate, scaled

    scaled = scaled + (scores + 1) * duration_1q  # 1Q layer overhead
    return gate, scaled
