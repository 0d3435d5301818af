"""Content-hash-keyed persistence (reference src/slam/utils/data_utils.py).

Fixes the reference's divergent filename encoders and hardcoded absolute
path (data_utils.py:20-22 vs hamiltonian.py:11-13, SURVEY.md §5.4): one
encoder, rooted at the configured data dir.
"""

from __future__ import annotations

import hashlib
import json
import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from slam_decomposition_tpu.config import config


def filename_encode(key: str, suffix: str = ".pkl") -> Path:
    """Stable content-hash path for a string key (data_utils.py:20-22)."""
    h = hashlib.sha1(key.encode()).hexdigest()
    return config.cache_path(f"{h}{suffix}")


def pickle_load(path, default=None):
    """Tolerant load (data_utils.py:25-33 returns {} on miss)."""
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except (OSError, EOFError, pickle.PickleError):
        return {} if default is None else default


def pickle_save(path, obj) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def json_load(path, default=None):
    try:
        return json.loads(Path(path).read_text())
    except (OSError, json.JSONDecodeError):
        return {} if default is None else default


def json_save(path, obj) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(obj, indent=1))


def h5_save(path, group: str, key: str, data, overwrite: bool = False) -> None:
    """Resumable HDF5 store (bare_candidates.py:77-125 semantics)."""
    import h5py

    with h5py.File(path, "a") as hf:
        g = hf.require_group(group)
        if key in g:
            if not overwrite:
                return
            del g[key]
        g.create_dataset(key, data=np.asarray(data))


def h5_load_group(path, group: str) -> Dict[str, np.ndarray]:
    import h5py

    out = {}
    with h5py.File(path, "r") as hf:
        g = hf[group]
        for k, v in g.items():
            out[k] = np.array(v)
    return out


def ragged_to_padded(rows, fill=np.nan) -> np.ndarray:
    """Ragged list-of-lists -> padded 2D array (data_utils.py:74-91)."""
    n = max(len(r) for r in rows)
    out = np.full((len(rows), n), fill, dtype=float)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def padded_to_ragged(arr, fill=np.nan):
    """Inverse of ragged_to_padded (data_utils.py:94-109)."""
    out = []
    for row in np.asarray(arr):
        if np.isnan(fill):
            mask = ~np.isnan(row)
        else:
            mask = row != fill
        out.append(list(row[mask]))
    return out
