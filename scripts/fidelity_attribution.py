"""Attribute the headline FIDELITY-gain deltas to the router.

Closes the loop the duration parity note opened (docs/parity_note.md):
the reference's total-fidelity model is f = exp(-d * 100ns/100us)^n
(results/main.ipynb cell 3), so the basic->optimized fidelity gain is the
analytic identity

    gain = f_opt / f_basic - 1 = exp(n * (d_basic - d_opt) / 1000) - 1

— a function of the ABSOLUTE duration gap only. Any fidelity-gain delta
vs BASELINE.md is therefore exactly a duration-gap delta, and the
duration gaps were already attributed to the router. This script makes
that attribution quantitative: it runs the headline circuits through the
round-1 router (swap-greedy chain-DAG SABRE: single (relax=False,
depth_w=0, swap_busy=False) config, swap-count score, no rescheduling)
and the round-2 duration-arbitrated router, feeds the SAME routed
circuit to both pipelines per seed (the reference's fairness protocol),
and prints the fidelity gains under each router next to the reference's.

Usage: python scripts/fidelity_attribution.py [n_seeds]
Writes fidelity_attribution.json; postscript in docs/parity_note.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from slam_decomposition_tpu.transpile import library
from slam_decomposition_tpu.transpile.passes import (
    pass_manager_basic,
    pass_manager_optimized_sqiswap,
)
from slam_decomposition_tpu.transpile.route import grid_coupling, route

Q = 16
DUR_1Q = 0.25
N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 10

# reference gains from BASELINE.md rows 8-12 (results/main.ipynb cell 8)
REF = {
    "QV": (133.0, 118.08, +27.0),
    "VQE(Linear)": (25.75, 21.5, None),
    "VQE(Full)": (318.0, 273.3, +104.4),
    "QFT": (127.5, 106.2, +40.6),
}

SUITE = {
    "QV": lambda s: library.qv(Q, seed=s),
    "VQE(Linear)": lambda s: library.vqe_linear(Q, seed=s),
    "VQE(Full)": lambda s: library.vqe_full(Q, seed=s),
    "QFT": lambda s: library.qft(Q),
}


def swap_count(circ):
    return sum(1 for op in circ.ops if op.n_qubits == 2)


def gain_pct(d_basic, d_opt, n=Q):
    return 100.0 * (np.exp(n * (d_basic - d_opt) * 1e-3) - 1.0)


def run(name, gen, router):
    edges = grid_coupling(4, 4)
    kw = (
        dict(configs=[(False, 0.0, False)], score_fn=swap_count,
             reschedule=False)
        if router == "round1"
        else {}
    )
    best = None
    for seed in range(N_SEEDS):
        c = route(gen(seed), edges, seed=seed, rows_cols=(4, 4), **kw)
        _, mb = pass_manager_basic(c, gate="sqiswap", duration_1q=DUR_1Q)
        _, mo = pass_manager_optimized_sqiswap(c, duration_1q=DUR_1Q)
        db, do = mb["duration"], mo["duration"]
        if best is None or db < best[0]:
            best = (db, do)
    return best


results = {}
t00 = time.time()
for name, gen in SUITE.items():
    row = {"ref": REF[name]}
    for router in ("round1", "round2"):
        t0 = time.time()
        db, do = run(name, gen, router)
        row[router] = {
            "basic": db, "opt": do, "gap": db - do,
            "fid_gain_pct": round(gain_pct(db, do), 1),
        }
        print(f"{name:<12} {router}: basic {db:.2f} opt {do:.2f} "
              f"gap {db - do:.2f} fid gain {gain_pct(db, do):+.1f}% "
              f"[{time.time() - t0:.0f}s]")
    rb, ro, rg = REF[name]
    ref_gain = gain_pct(rb, ro)
    print(f"{name:<12} reference: basic {rb} opt {ro} gap {rb - ro:.2f} "
          f"fid gain {ref_gain:+.1f}%"
          + (f" (published {rg:+.1f}%)" if rg is not None else ""))
    row["ref_gain_pct"] = round(ref_gain, 1)
    results[name] = row

# identity check: published fidelity gains ARE exp(n*gap/1000)-1
for name, (rb, ro, rg) in REF.items():
    if rg is not None:
        assert abs(gain_pct(rb, ro) - rg) < 0.6, (name, gain_pct(rb, ro), rg)

with open("fidelity_attribution.json", "w") as f:
    json.dump(results, f, indent=1)
print(f"\nwrote fidelity_attribution.json [{time.time() - t00:.0f}s total]")
