"""Preseeding store: solved decompositions keyed by Weyl coordinate.

Reference: basis_abc.py:24-98 — a pickle-backed dict {coord: DataDictEntry}
with a scipy KDTree for nearest-neighbor seed lookup, reseeded with
temperature jitter (parameter_guess, :50-58).

TPU redesign: the store is plain arrays; nearest-neighbor lookup for a
whole target batch is one argmin over a (batch, store) distance matrix on
device — no tree rebuild after every insert (optimizer.py:112-118).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from slam_decomposition_tpu.utils.persist import filename_encode, pickle_load, pickle_save


@dataclasses.dataclass
class PreseedStore:
    key: str
    coords: np.ndarray  # (n, 3)
    params: np.ndarray  # (n, max_params) padded with nan
    cycles: np.ndarray  # (n,)
    losses: np.ndarray  # (n,)

    @classmethod
    def load(cls, key: str) -> "PreseedStore":
        data = pickle_load(filename_encode(key))
        if not data:
            return cls(key, np.zeros((0, 3)), np.zeros((0, 0)), np.zeros(0, int), np.zeros(0))
        return cls(key, **data)

    def save(self) -> None:
        pickle_save(
            filename_encode(self.key),
            {
                "coords": self.coords,
                "params": self.params,
                "cycles": self.cycles,
                "losses": self.losses,
            },
        )

    def __len__(self):
        return len(self.coords)

    def add(self, coords, params, cycles, losses) -> None:
        coords = np.atleast_2d(coords)
        params = np.atleast_2d(params)
        cycles = np.atleast_1d(cycles)
        losses = np.atleast_1d(losses)
        if self.params.shape[1] < params.shape[1]:
            pad = np.full(
                (len(self.params), params.shape[1] - self.params.shape[1]), np.nan
            )
            self.params = (
                np.concatenate([self.params, pad], axis=1)
                if len(self.params)
                else np.zeros((0, params.shape[1]))
            )
        elif params.shape[1] < self.params.shape[1]:
            pad = np.full((len(params), self.params.shape[1] - params.shape[1]), np.nan)
            params = np.concatenate([params, pad], axis=1)
        self.coords = np.concatenate([self.coords, coords])
        self.params = np.concatenate([self.params, params])
        self.cycles = np.concatenate([self.cycles, cycles])
        self.losses = np.concatenate([self.losses, losses])

    def nearest(self, query_coords) -> Tuple[np.ndarray, np.ndarray]:
        """(indices, distances) of nearest stored entries for a coordinate
        batch — one vectorized distance computation (replaces
        KDTree.query, basis_abc.py:71-77)."""
        q = np.atleast_2d(query_coords)
        if len(self) == 0:
            return np.full(len(q), -1), np.full(len(q), np.inf)
        d2 = ((q[:, None, :] - self.coords[None, :, :]) ** 2).sum(-1)
        idx = d2.argmin(axis=1)
        return idx, np.sqrt(d2[np.arange(len(q)), idx])

    def seeds_for(
        self,
        query_coords,
        n_params: int,
        cycles: int,
        temperature: float = 0.0,
        rng: Optional[np.random.Generator] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-query seed vectors (nan where unusable): nearest neighbor's
        params jittered +-5% * temperature (basis_abc.py:50-58), valid only
        when the stored entry used the same cycle count (optimizer.py:147).
        """
        rng = rng or np.random.default_rng(0)
        q = np.atleast_2d(query_coords)
        out = np.full((len(q), n_params), np.nan)
        ok = np.zeros(len(q), dtype=bool)
        idx, _ = self.nearest(q)
        for i, j in enumerate(idx):
            if j < 0 or self.cycles[j] != cycles:
                continue
            p = self.params[j, :n_params]
            if np.isnan(p).any():
                continue
            jitter = rng.uniform(
                1 - 0.05 * temperature, 1 + 0.05 * temperature, n_params
            )
            out[i] = p * jitter
            ok[i] = True
        return out, ok
