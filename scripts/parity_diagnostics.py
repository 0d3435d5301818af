"""Per-circuit routing/blocks diagnostics for the headline parity question.

For each benchmark circuit: route onto the 4x4 grid (best duration over
seeds, reference protocol), then report
  - swaps inserted by the router,
  - consolidated 2Q block count and their sqiswap application classes,
  - both duration metrics (critical-path and reference longest-node-path),
so the basic-column deltas vs BASELINE.md can be attributed precisely.

Usage: python scripts/parity_diagnostics.py [circuit ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from slam_decomposition_tpu.opt.samplers import sqiswap_count_batch
from slam_decomposition_tpu.transpile import library
from slam_decomposition_tpu.transpile.consolidate import consolidate_2q_blocks
from slam_decomposition_tpu.transpile.passes import pass_manager_basic
from slam_decomposition_tpu.transpile.route import grid_coupling, route

Q = 16
DUR_1Q = 0.25


def diagnose(name, gen, n_seeds=10):
    edges = grid_coupling(4, 4)
    best = None
    for seed in range(n_seeds):
        c = route(gen(seed), edges, seed=seed, rows_cols=(4, 4))
        _, mb = pass_manager_basic(c, gate="sqiswap", duration_1q=DUR_1Q)
        if best is None or mb["duration"] < best[1]["duration"]:
            best = (c, mb, seed)
    c, mb, seed = best
    n_swaps = sum(1 for op in c.ops if op.name == "swap")
    blocks = consolidate_2q_blocks(c)
    ks = sqiswap_count_batch(np.stack([b.unitary for b in blocks]))
    uniq, cnt = np.unique(ks, return_counts=True)
    out = {
        "circuit": name,
        "seed": seed,
        "router_swaps": n_swaps,
        "n_blocks": len(blocks),
        "k_hist": {int(u): int(n) for u, n in zip(uniq, cnt)},
        "duration": mb["duration"],
        "duration_ref_metric": mb["duration_ref_metric"],
    }
    print(json.dumps(out))
    return out


SUITE = {
    "QFT": lambda s: library.qft(Q),
    "QV": lambda s: library.qv(Q, seed=s),
    "VQE(Full)": lambda s: library.vqe_full(Q, seed=s),
    "VQE(Linear)": lambda s: library.vqe_linear(Q, seed=s),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(SUITE)
    for name in names:
        diagnose(name, SUITE[name])
