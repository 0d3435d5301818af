"""Reproduce the reference's headline duration/fidelity table.

Reference: src/slam/scripts/results/main.ipynb — SWAP duration, Haar-average
2Q duration, and benchmark-circuit durations under the basic (analytic
sqiswap) flow vs the parallel-drive-optimized flow, with duration_1q = 0.25,
linear SLF, and total-fidelity model f = exp(-d * 100ns / 100us)^n
(BASELINE.md rows 6-12).

Usage: python scripts/headline_benchmarks.py [q] [reps]
Writes results to headline_results.json and prints the table.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.transpile import library
from slam_decomposition_tpu.transpile.passes import (
    duration_analysis,
    pass_manager_basic,
    pass_manager_optimized_sqiswap,
)

DUR_1Q = 0.25


def fidelity(duration, n_qubits, t_2q_ns=100.0, t1_us=100.0):
    """f = exp(-d * t_2q / T1)^n (results/main.ipynb cell 3)."""
    return float(np.exp(-duration * t_2q_ns * 1e-9 / (t1_us * 1e-6)) ** n_qubits)


def gate_duration(U, n_qubits=2):
    from slam_decomposition_tpu.transpile.ir import Circuit

    c = Circuit(2)
    c.unitary(U, (0, 1))
    _, mb = pass_manager_basic(c, gate="sqiswap", duration_1q=DUR_1Q)
    _, mo = pass_manager_optimized_sqiswap(c, duration_1q=DUR_1Q)
    return mb["duration"], mo["duration"]


def main(q=16, reps=3):
    results = {}

    # SWAP
    db, do = gate_duration(G.SWAP.to_numpy())
    results["SWAP"] = {"basic": db, "optimized": do}
    print(f"SWAP duration: basic {db:.3f} optimized {do:.3f} "
          f"(reference: 2.5 -> 2.25)")

    # Haar average over N samples
    from slam_decomposition_tpu.opt.samplers import haar_sample

    N = 300
    t0 = time.time()
    basics, opts = [], []
    for U in haar_sample(N, seed=0):
        b, o = gate_duration(U)
        basics.append(b)
        opts.append(o)
    results["haar_avg"] = {
        "basic": float(np.mean(basics)),
        "optimized": float(np.mean(opts)),
        "n": N,
    }
    print(f"Haar-average 2Q duration (N={N}): basic {np.mean(basics):.4f} "
          f"optimized {np.mean(opts):.4f} (reference: 1.9055 -> 1.7075) "
          f"[{time.time()-t0:.0f}s]")

    # circuit suite
    suite = {
        "QV": lambda: library.qv(q, seed=1),
        "VQE(Linear)": lambda: library.vqe_linear(q, seed=1),
        "VQE(Full)": lambda: library.vqe_full(q, seed=1),
        "QFT": lambda: library.qft(q),
    }
    for name, gen in suite.items():
        t0 = time.time()
        best_b, best_o = np.inf, np.inf
        for r in range(reps):
            c = gen()
            _, mb = pass_manager_basic(c, gate="sqiswap", duration_1q=DUR_1Q)
            _, mo = pass_manager_optimized_sqiswap(c, duration_1q=DUR_1Q)
            best_b = min(best_b, mb["duration"])
            best_o = min(best_o, mo["duration"])
        fb, fo = fidelity(best_b, q), fidelity(best_o, q)
        results[name] = {
            "basic": best_b, "optimized": best_o,
            "fid_basic": fb, "fid_opt": fo,
            "fid_gain_pct": 100 * (fo / fb - 1),
        }
        print(f"{name}-{q}: basic {best_b:.2f} optimized {best_o:.2f} "
              f"({100*(best_o/best_b-1):+.1f}%); total-fidelity "
              f"{100*(fo/fb-1):+.1f}% [{time.time()-t0:.0f}s]")
        assert best_b >= best_o - 1e-9, "optimized must not be worse"

    with open("headline_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote headline_results.json")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
