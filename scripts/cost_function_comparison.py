"""Cost-function comparison study — convergence per cost class.

Reproduces the reference's cost_function_comparison.ipynb: a SWAP target,
a k=3 sqiSwap template, and one optimizer per cost class, each judged by
its training-convergence plot. The reference's second axis was the scipy
method (BFGS vs Nelder-Mead, cells 2-6); this framework's engine axis is
the two device engines — the scan-based Adam+LM pipeline (per-iteration
loss history recorded *on device* via use_callback) and the
reference-faithful L-BFGS loop (final loss + iteration count).

Run (CPU is fine): JAX_PLATFORMS=cpu python scripts/cost_function_comparison.py
Saves docs/figures/cost_function_comparison.png and prints the table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from slam_decomposition_tpu.config import setup_x64

setup_x64()

from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
from slam_decomposition_tpu.opt.optimizer import TemplateOptimizer

SWAP = np.zeros((4, 4), complex)
SWAP[0, 0] = SWAP[3, 3] = 1.0
SWAP[1, 2] = SWAP[2, 1] = 1.0

# the reference pair (BasicCost, MakhlinFunctionalCost) plus the two other
# members of each family so the plot separates exact-unitary costs from
# local-equivalence-class costs
CLASSES = ["basic", "square", "makhlin_functional", "square_reduced"]

builder = lambda k: build_ansatz(cycle_gates([gates.SQISWAP], k))
targets = np.asarray([SWAP])

fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
rows = []
for name in CLASSES:
    # engine 1: scan Adam+LM with on-device history
    opt = TemplateOptimizer(
        builder, objective=name, spanning_range=[3], training_restarts=8,
        use_callback=True, override_fail=True, seed=1,
    )
    t0 = time.time()
    res = opt.approximate_from_distribution(targets)
    t_fast = time.time() - t0
    adam = np.asarray(opt.training_history[-1])      # (B, R, iters)
    lm = np.asarray(opt.training_history_lm[-1])     # (B, lm_iters)
    best_r = int(np.argmin(adam[0, :, -1]))
    curve = np.concatenate([adam[0, best_r], lm[0]])
    ax1.semilogy(np.maximum(curve, 1e-16), label=name)

    # engine 2: reference-faithful L-BFGS (no per-iteration telemetry —
    # scipy's loop is opaque in the reference too; final loss only)
    opt2 = TemplateOptimizer(
        builder, objective=name, spanning_range=[3], training_restarts=8,
        method="lbfgs", override_fail=True, seed=1,
    )
    t0 = time.time()
    res2 = opt2.approximate_from_distribution(targets)
    t_lbfgs = time.time() - t0
    rows.append((name, float(res.loss[0]), t_fast, float(res2.loss[0]), t_lbfgs))
    ax2.scatter([t_fast], [max(float(res.loss[0]), 1e-16)], marker="o",
                label=f"{name} (Adam+LM)")
    ax2.scatter([t_lbfgs], [max(float(res2.loss[0]), 1e-16)], marker="x")

ax1.set_xlabel("iteration (Adam warm start + LM polish)")
ax1.set_ylabel("loss")
ax1.set_title("SWAP target, k=3 sqiSwap — convergence per cost class")
ax1.axhline(1e-10, color="k", lw=0.5, ls="--")
ax1.legend(fontsize=7)
ax2.set_xlabel("wall-clock (s)")
ax2.set_ylabel("final loss")
ax2.set_yscale("log")
ax2.set_title("engine comparison (o = Adam+LM, x = L-BFGS)")
ax2.legend(fontsize=6)
fig.tight_layout()
out = os.path.join(os.path.dirname(__file__), "..", "docs", "figures")
os.makedirs(out, exist_ok=True)
path = os.path.join(out, "cost_function_comparison.png")
fig.savefig(path, dpi=150)
print(f"saved {os.path.abspath(path)}")

print(f"\n{'cost class':<22}{'Adam+LM loss':>14}{'s':>8}{'L-BFGS loss':>14}{'s':>8}")
for name, f1, t1, f2, t2 in rows:
    print(f"{name:<22}{f1:>14.2e}{t1:>8.1f}{f2:>14.2e}{t2:>8.1f}")

# the exact-unitary classes must certify; the class costs converge to the
# local-equivalence class (their loss is the invariant mismatch)
assert all(r[1] < 1e-9 or "reduced" in r[0] or "makhlin" in r[0] for r in rows)
