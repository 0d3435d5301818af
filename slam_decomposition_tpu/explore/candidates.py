"""Candidate basis-gate generation and scoring database.

Reference: bare_candidates.py — 17x21 (strength, mix) grid of
conversion-gain gates, Weyl-deduplicated, scored with bare (gate-count)
metrics [E-Haar, D-CNOT, D-SWAP] into an HDF5 store with skip-if-present
resume semantics (bare_candidates.py:46-125).

TPU redesign: the grid's Weyl coordinates come from one batched c1c2c3 call
instead of a python loop; scoring uses the native coverage engine.
"""

from __future__ import annotations

import logging
import time
from typing import List, Optional, Tuple

import numpy as np

from slam_decomposition_tpu.config import config
from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.models.gates import Gate

logger = logging.getLogger(__name__)

H5_PATH = config.cache_path("cg_gates.h5")


def get_group_name(speed_method: str = "linear", duration_1q: float = 0) -> str:
    """Config-key group naming (bare_candidates.py:34-42)."""
    return f"{speed_method}_scaling_1q{duration_1q}"


def get_method_duration(group_name: str) -> Tuple[str, float]:
    speed_method = group_name.split("_")[0]
    duration_1q = float(group_name.split("_")[-1].replace("1q", ""))
    return speed_method, duration_1q


def build_gates(
    n_strength: int = 17, n_mix: int = 21, elim_extra_weyl: bool = True
) -> Tuple[List[Gate], np.ndarray]:
    """Design-space grid: strength k in [0, 0.5] (units of pi), mix p in
    [0, 1] splitting strength between conversion and gain; dedupe by Weyl
    coordinate (batched on device). Reference: bare_candidates.py:46-67.
    """
    import jax

    from slam_decomposition_tpu.ops import cplx, weyl
    from slam_decomposition_tpu.models.hamiltonians import conversion_gain_u

    ks = np.linspace(0, 0.5, n_strength)
    ps = np.linspace(0, 1, n_mix)
    kk, pp = np.meshgrid(ks, ps, indexing="ij")
    gc = (pp * kk * np.pi).reshape(-1)
    gg = ((1 - pp) * kk * np.pi).reshape(-1)

    with jax.default_device(jax.devices("cpu")[0]):
        U = conversion_gain_u(gc, gg)
        coords = np.asarray(weyl.c1c2c3(U))
    # left-side mirror fold is already canonical in this framework's
    # c1c2c3 (ops/weyl.py); reference needed a manual fold
    del elim_extra_weyl

    out: List[Gate] = []
    out_coords = []
    seen = set()
    for i in range(len(gc)):
        key = tuple(np.round(coords[i], 10))
        if key in seen:
            continue
        seen.add(key)
        out.append(G.conversion_gain_gate(0.0, 0.0, float(gc[i]), float(gg[i]), 1.0))
        out_coords.append(coords[i])
    return out, np.array(out_coords)


def collect_data(
    gate_list: Optional[List[Gate]] = None,
    overwrite: bool = False,
    max_layers: int = 8,
) -> None:
    """Score every candidate with bare costs into the HDF5 DB; resumable by
    key skip (bare_candidates.py:74-125)."""
    import h5py

    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        monodromy_range_from_target,
    )
    from slam_decomposition_tpu.coverage.haar import expected_cost

    if gate_list is None:
        gate_list, _ = build_gates()

    def existing_keys():
        try:
            with h5py.File(H5_PATH, "r") as hf:
                return set(hf["bare_cost"].keys()) if "bare_cost" in hf else set()
        except OSError:
            return set()

    if overwrite:
        with h5py.File(H5_PATH, "a") as hf:
            if "bare_cost" in hf:
                del hf["bare_cost"]
    done = existing_keys()
    for gate in gate_list:
        gc, gg = gate.params[2], gate.params[3]
        if gc == 0 and gg == 0:
            continue  # identity can't build coverage
        if str(gate) in done:
            logger.debug("%s already in file", gate)
            continue
        start = time.time()
        try:
            cov = gate_set_to_coverage(gate, bare_cost=True, max_layers=max_layers)
            haar_score = expected_cost(cov)
            cnot_score, _ = monodromy_range_from_target(cov, G.CNOT.to_numpy())
            swap_score, _ = monodromy_range_from_target(cov, G.SWAP.to_numpy())
        except (ValueError, RuntimeError) as e:
            logger.warning("scoring failed for %s: %s", gate, e)
            continue
        logger.info(
            "scored %s in %.1fs: haar %.4f cnot %d swap %d",
            gate, time.time() - start, haar_score, cnot_score, swap_score,
        )
        # open-append-close per gate so concurrent readers are never
        # locked out for the duration of a long sweep
        with h5py.File(H5_PATH, "a") as hf:
            g = hf.require_group("bare_cost")
            if str(gate) not in g:
                g.create_dataset(
                    str(gate),
                    data=np.array(
                        [list(gate.params),
                         [haar_score, cnot_score, swap_score, -1, -1]]
                    ),
                )


def load_candidates() -> List[Tuple[np.ndarray, np.ndarray]]:
    """All (params, scores) rows from the bare-cost DB (lock-tolerant)."""
    import os

    import h5py

    os.environ.setdefault("HDF5_USE_FILE_LOCKING", "FALSE")
    out = []
    with h5py.File(H5_PATH, "r", locking=False) as hf:
        g = hf["bare_cost"]
        for v in g.values():
            out.append((np.array(v[0]), np.array(v[1])))
    return out
