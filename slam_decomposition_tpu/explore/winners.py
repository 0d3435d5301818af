"""Winner selection: pick the best basis gate from the candidate DB under a
metric. Reference: winner_selection.py:17-144 (pick_winner).

Metrics: 0 = E[Haar], 1 = D[CNOT], 2 = D[SWAP], (-1, lambda) = weighted
CNOT/SWAP mix, or exact per-target-distribution cost via monodromy ranges.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

from slam_decomposition_tpu.explore.candidates import (
    get_method_duration,
    load_candidates,
)
from slam_decomposition_tpu.explore.scaling import atomic_cost_scaling
from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.models.gates import Gate

logger = logging.getLogger(__name__)


def pick_winner(
    group_name: str,
    metric=0,
    target_ops: Optional[Sequence[np.ndarray]] = None,
    smush: bool = False,
    family_extension: bool = False,
) -> Tuple[Gate, Gate]:
    """Returns (winner_gate, winner_scaled_gate).

    When the per-(method, duration_1q[,fam][,smush]) scaled-score group has
    been precomputed (explore.scaling.cost_scaling), selection is a pure h5
    lookup — no per-candidate rescoring (the reference's intended
    cost_scaling/pick_winner split, duraton_scaling.py:107-188 +
    winner_selection.py:17).
    """
    speed_method, duration_1q = get_method_duration(group_name)

    if target_ops is None and (
        (metric in (0, 1, 2) and not (family_extension and metric == 0))
        or (isinstance(metric, tuple) and metric[0] == -1)
    ):
        from slam_decomposition_tpu.explore.scaling import (
            load_scaled,
            scaled_gate_for,
        )

        cached = load_scaled(
            speed_method, duration_1q, family_extension, smush
        )
        if cached is not None:
            best = None
            for params, scaled in cached:
                if isinstance(metric, tuple):
                    if len(scaled) < 3:
                        continue
                    lam = metric[1]
                    # linear in the scaled scores: lam*S1+(1-lam)*S2 ==
                    # atomic_cost_scaling applied to the bare mix
                    score = lam * scaled[1] + (1 - lam) * scaled[2]
                else:
                    if metric >= len(scaled):
                        continue
                    score = float(scaled[metric])
                if best is None or score < best[0]:
                    best = (score, params)
            if best is not None:
                winner_gate = G.conversion_gain_gate(*best[1])
                winner_scaled = scaled_gate_for(best[1], speed_method)
                logger.info(
                    "winner %s score %.4f (cached)", winner_gate, best[0]
                )
                return winner_gate, winner_scaled

    candidates = load_candidates()
    winner = None
    winner_score = None
    winner_scaled = None

    for params, scores in candidates:
        if family_extension:
            # same candidate filter as the batch cache (scaling.cost_scaling
            # / reference duraton_scaling.py:127-144): family extension is
            # only defined for the iSwap/CNOT/B families, and cached vs
            # uncached selection must rank the same candidate set
            from slam_decomposition_tpu.explore.scaling import (
                _family_extendable,
            )

            if not _family_extendable(params):
                continue
        if smush:
            from slam_decomposition_tpu.explore.smush_volume import smush_scores

            s = smush_scores(params)
            if s is None:
                continue
            scores = np.array(list(s) + [-1, -1])
        candidate_score = None
        if target_ops is None and metric in (0, 1, 2):
            scaled_gate, scaled = atomic_cost_scaling(
                params, scores[metric], speed_method=speed_method,
                duration_1q=duration_1q, family_extension=family_extension,
                use_smush=smush, metric=metric,
            )
            candidate_score = float(np.atleast_1d(scaled)[0])
        elif target_ops is None and isinstance(metric, tuple) and metric[0] == -1:
            lam = metric[1]
            mix = lam * scores[1] + (1 - lam) * scores[2]
            scaled_gate, scaled = atomic_cost_scaling(
                params, mix, speed_method=speed_method,
                duration_1q=duration_1q, family_extension=family_extension,
                use_smush=smush, metric=metric,
            )
            candidate_score = float(np.atleast_1d(scaled)[0])
        else:
            # exact distribution cost: sum monodromy ranges over targets
            from slam_decomposition_tpu.coverage.coverage import (
                gate_set_to_coverage,
                monodromy_range_from_target,
            )

            base = G.conversion_gain_gate(*params)
            try:
                cov = gate_set_to_coverage(G.cg_canonicalize(base), smush=smush)
            except (ValueError, RuntimeError):
                continue
            total = 0.0
            scaled_gate = None
            for tgt in target_ops:
                k, _ = monodromy_range_from_target(cov, tgt)
                scaled_gate, scaled = atomic_cost_scaling(
                    params, k, speed_method=speed_method,
                    duration_1q=duration_1q, scaled_gate=scaled_gate,
                    family_extension=family_extension, use_smush=smush,
                    metric=metric,
                )
                total += float(np.atleast_1d(scaled)[0])
            candidate_score = total

        if candidate_score is None:
            continue
        if winner_score is None or candidate_score < winner_score:
            winner = params
            winner_score = candidate_score
            winner_scaled = scaled_gate

    if winner is None:
        raise ValueError("no scorable candidates in DB (run collect_data)")
    winner_gate = G.conversion_gain_gate(*winner)
    logger.info("winner %s score %.4f", winner_gate, winner_score)
    return winner_gate, winner_scaled
