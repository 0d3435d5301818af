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


# ------------------------------------------------ batch scaled-score cache


def scaled_group_name(
    speed_method: str,
    duration_1q: float,
    family_extension: bool = False,
    use_smush: bool = False,
) -> str:
    """h5 group for cached scaled scores. Extends the reference's
    ``{method}_scaling_1q{d}`` key (bare_candidates.py:34-42) with explicit
    family/smush suffixes — the reference reused one group for all flag
    combinations (its own "TODO ... messy" at duraton_scaling.py:116-117),
    silently mixing incompatible scores."""
    from slam_decomposition_tpu.explore.candidates import get_group_name

    name = get_group_name(speed_method, duration_1q)
    if family_extension:
        name += "_fam"
    if use_smush:
        name += "_smush"
    return name


def cost_scaling(
    speed_method: str = "linear",
    duration_1q: float = 0.0,
    overwrite: bool = False,
    query_params=None,
    family_extension: bool = False,
    use_smush: bool = False,
):
    """Batch-scale every bare candidate score into a per-(method,
    duration_1q[,fam][,smush]) h5 group with skip-resume — the reference's
    ``cost_scaling`` role (duraton_scaling.py:107-188): precompute once,
    then ``pick_winner`` is a pure lookup. Returns ``(gate, scaled)`` for
    ``query_params`` when given, else the number of rows written.

    Resumable: existing datasets are skipped unless ``overwrite`` — kill
    and rerun continues where it left off (family-extension recursion is
    the expensive part; each finished gate is durably stored).
    """
    import os

    import h5py

    from slam_decomposition_tpu.explore.candidates import (
        H5_PATH,
        load_candidates,
    )

    os.environ.setdefault("HDF5_USE_FILE_LOCKING", "FALSE")
    group = scaled_group_name(
        speed_method, duration_1q, family_extension, use_smush
    )
    candidates = load_candidates()
    written = 0
    with h5py.File(H5_PATH, "a", locking=False) as hf:
        g2 = hf.require_group(group)
        for params, scores in candidates:
            if family_extension and not _family_extendable(params):
                continue
            if use_smush:
                from slam_decomposition_tpu.explore.smush_volume import (
                    smush_scores,
                )

                s = smush_scores(params)
                if s is None:
                    continue  # smush polytope only precomputed for 6 gates
                scores = np.array(list(s) + [-1.0, -1.0])
            key = G.cg_hash(params[2], params[3], params[4])
            if query_params is not None and not np.allclose(params, query_params):
                continue
            if key in g2 and not overwrite and query_params is None:
                continue
            gate, scaled = atomic_cost_scaling(
                params=params,
                # first 3 slots are [haar, cnot, swap]; the rest is -1
                # padding in the 5-slot DB row convention
                scores=np.asarray(scores, dtype=float)[:3],
                speed_method=speed_method,
                duration_1q=duration_1q,
                family_extension=family_extension,
                use_smush=use_smush,
            )
            if query_params is not None and np.allclose(params, query_params):
                return gate, scaled
            if key in g2:
                del g2[key]
            g2.create_dataset(
                key, data=np.stack([np.asarray(params, dtype=float),
                                    _pad5(np.atleast_1d(scaled))])
            )
            written += 1
    if query_params is not None:  # a match would have returned above
        # the query matched no candidate (or one filtered out by the
        # family/smush gates above) — fail loudly rather than returning the
        # int `written` where the caller expects a (gate, scaled) tuple
        raise KeyError(
            f"query_params {list(query_params)} not in the candidate DB "
            f"for group {group!r}"
        )
    return written


def _pad5(v: np.ndarray) -> np.ndarray:
    out = np.full(5, np.nan)
    out[: len(v)] = v
    return out


def _family_extendable(params) -> bool:
    """Family extension is only defined for the iSwap (one coupling zero),
    CNOT (3:1 ratio) and B (equal) families (duraton_scaling.py:127-144)."""
    gc, gg = params[2], params[3]
    if gc == 0 or gg == 0:
        return True
    if gg != 0 and gc / gg == 3 or gc != 0 and gg / gc == 3:
        return True
    return gc == gg


def load_scaled(
    speed_method: str,
    duration_1q: float,
    family_extension: bool = False,
    use_smush: bool = False,
):
    """Cached (params, scaled-scores) rows, or None if the group was never
    populated. Consumed by pick_winner for pure-lookup selection."""
    import os

    import h5py

    from slam_decomposition_tpu.explore.candidates import H5_PATH

    os.environ.setdefault("HDF5_USE_FILE_LOCKING", "FALSE")
    group = scaled_group_name(
        speed_method, duration_1q, family_extension, use_smush
    )
    try:
        with h5py.File(H5_PATH, "r", locking=False) as hf:
            if group not in hf:
                return None
            out = []
            for v in hf[group].values():
                row = np.array(v)
                scaled = row[1]
                out.append((row[0], scaled[~np.isnan(scaled)]))
            return out or None
    except OSError:
        return None
