"""Haar-improvement study — family extension + E[Haar] winner scatter.

Reproduces the reference's haar_improvements.ipynb:

A. Family-extension vs plain decomposition cost for CPhase(pi/2/n)
   targets over a weak pi/32 conversion-gain gate (cells 1-2).
B. E[Haar] of the iSwap^t family vs gate strength for several 1Q-layer
   durations, with the bare gate count on a twin axis (cell 3; the
   reference pulled these from the missing bgatev2script module — here
   they come straight from the bare-candidate DB + atomic scaling).
C. Family-extended vs plain E[Haar], D[CX], D[SWAP] over fractional
   iSwap^(1/n) bases (cells 4-5). The reference recursed per target
   (and, a bug, re-sampled `random_unitary(..., seed=42)` inside its MC
   loop — 2000 copies of ONE unitary); here family_costs_batch does one
   batched ks-assignment per distinct sibling gate over a genuine Haar
   sample, and the no-family curve is computed EXACTLY from the closed-form
   layer volumes (coverage/haar.py) rather than by MC.

Run (CPU is fine): JAX_PLATFORMS=cpu python scripts/haar_improvements.py
Saves docs/figures/haar_improvements_{cphase,scatter,family}.png.
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

from slam_decomposition_tpu.coverage import haar as H
from slam_decomposition_tpu.coverage.coverage import (
    gate_set_to_coverage,
    monodromy_ks_batch,
)
from slam_decomposition_tpu.explore.candidates import load_candidates
from slam_decomposition_tpu.explore.family import family_costs_batch
from slam_decomposition_tpu.explore.scaling import atomic_cost_scaling
from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.opt.samplers import haar_sample

FIGDIR = os.path.join(os.path.dirname(__file__), "..", "docs", "figures")
os.makedirs(FIGDIR, exist_ok=True)
COST_1Q = 0.1


def cphase(theta: float) -> np.ndarray:
    return np.diag([1.0, 1.0, 1.0, np.exp(1j * theta)]).astype(complex)


def nofam_expectation(cov, bf: float, c1q: float) -> float:
    """Exact E[(k+1)*c1q + k*bf] from the closed-form layer Haar volumes
    (nested layers: increment of layer k is V_k - V_{k-1})."""
    layers = sorted(cov, key=lambda c: len(c.operations))
    total, prev = 0.0, 0.0
    for cp in layers:
        k = len(cp.operations)
        if k == 0:
            continue
        v = min(max(H.normalized_volume(cp.polytope), prev), 1.0)
        total += ((k + 1) * c1q + k * bf) * (v - prev)
        prev = v
    assert prev > 1.0 - 1e-6, f"incomplete coverage ({prev})"
    return total


# ---------------------------------------------------------------- part A
t0 = time.time()
params = [0, 0, 0, np.pi / 32, 1]
base = G.conversion_gain_gate(*params)
cov = gate_set_to_coverage(G.cg_canonicalize(base))
bf = float(atomic_cost_scaling(params, 1, speed_method="linear", duration_1q=0)[1])
thetas = np.array([np.pi / 2 / n for n in range(1, 16)])
targets = np.stack([cphase(t) for t in thetas])
fam = family_costs_batch(base, targets, cost_1q=COST_1Q, basis_factor=bf)
ks = monodromy_ks_batch(cov, targets).astype(int)
nofam = ks * bf + (ks + 1) * COST_1Q

fig, ax = plt.subplots(figsize=(4.5, 3))
ax.plot(thetas, fam, label="with family", marker="o")
ax.plot(thetas, nofam, label="no family", marker="o")
ax.invert_xaxis()
ax.set_xticks([np.pi / 2, np.pi / 4, np.pi / 8, np.pi / 16])
ax.set_xticklabels([r"$\pi/2$", r"$\pi/4$", r"$\pi/8$", r"$\pi/16$"])
ax.set_xlabel(r"CPhase angle $\theta$")
ax.set_ylabel("decomposition cost")
ax.set_title(r"family extension on a $\pi/32$ gain gate")
ax.legend()
fig.tight_layout()
fig.savefig(os.path.join(FIGDIR, "haar_improvements_cphase.png"), dpi=150)
print(f"A: cphase family curve done in {time.time() - t0:.1f}s "
      f"(max saving {100 * (1 - fam / nofam).max():.1f}%)")

# ---------------------------------------------------------------- part B
t0 = time.time()
rows = [(p, s) for p, s in load_candidates() if p[2] == 0 and p[3] > 0]
rows.sort(key=lambda r: r[0][3])
xs = np.array([p[3] / (np.pi / 2) for p, _ in rows])
fig, ax = plt.subplots(figsize=(4.5, 3))
for d1q in [0, 0.1, 0.25]:
    hs = [
        float(atomic_cost_scaling(p, s, speed_method="linear", duration_1q=d1q)[1][0])
        for p, s in rows
    ]
    ax.plot(xs, hs, marker="o", markersize=3, label=f"D[1Q]={d1q}")
ax2 = ax.twinx()
ax2.plot(xs, [s[0] for _, s in rows], color="gray", ls=":", marker="s",
         markersize=2, label="gate count (bare)")
ax2.set_ylabel("E[Haar] gate count")
ax.set_xlabel(r"iSwap fraction $t$ (iSwap$^t$)")
ax.set_ylabel("E[Haar] duration")
ax.set_title("iSwap-family Haar expectation (linear SLF)")
h1, l1 = ax.get_legend_handles_labels()
h2, l2 = ax2.get_legend_handles_labels()
ax.legend(h1 + h2, l1 + l2, fontsize=7)
fig.tight_layout()
fig.savefig(os.path.join(FIGDIR, "haar_improvements_scatter.png"), dpi=150)
print(f"B: E[Haar] scatter over {len(rows)} iSwap-family gates "
      f"in {time.time() - t0:.1f}s")

# ---------------------------------------------------------------- part C
t0 = time.time()
N_HAAR = 2000
haar_targets = np.asarray(haar_sample(N_HAAR, seed=7))
cx = np.asarray(G.CNOT.to_numpy())
swap = np.zeros((4, 4), complex)
swap[0, 0] = swap[3, 3] = 1.0
swap[1, 2] = swap[2, 1] = 1.0

fracs = range(1, 16)
x_list, curves = [], {k: [] for k in (
    "fam_haar", "nofam_haar", "fam_cx", "nofam_cx", "fam_swap", "nofam_swap")}
for frac in fracs:
    x_list.append(1 / frac)
    b = G.conversion_gain_gate(0, 0, 0, np.pi / 2, 1 / frac)
    canon = G.cg_canonicalize(b)
    covf = gate_set_to_coverage(canon)
    bf = float(atomic_cost_scaling(
        [0, 0, 0, np.pi / 2, 1 / frac], 1, speed_method="linear", duration_1q=0)[1])
    pair = np.stack([cx, swap])
    fc = family_costs_batch(b, pair, cost_1q=COST_1Q, basis_factor=bf)
    kk = monodromy_ks_batch(covf, pair).astype(int)
    nf = kk * bf + (kk + 1) * COST_1Q
    curves["fam_cx"].append(fc[0]); curves["nofam_cx"].append(nf[0])
    curves["fam_swap"].append(fc[1]); curves["nofam_swap"].append(nf[1])
    fh = family_costs_batch(b, haar_targets, cost_1q=COST_1Q, basis_factor=bf)
    curves["fam_haar"].append(float(fh.mean()))
    curves["nofam_haar"].append(nofam_expectation(covf, bf, COST_1Q))

fig, ax = plt.subplots(figsize=(4.5, 3))
style = dict(marker="o", markersize=2)
ax.plot(x_list, curves["nofam_haar"], "k--", label="E[Haar]", **style)
ax.plot(x_list, curves["nofam_swap"], "b--", label="D[Swap]", **style)
ax.plot(x_list, curves["nofam_cx"], "r--", label="D[CX]", **style)
ax.plot(x_list, curves["fam_haar"], "k-", label="E[Haar], family", **style)
ax.plot(x_list, curves["fam_swap"], "b-", label="D[Swap], family", **style)
ax.plot(x_list, curves["fam_cx"], "r-", label="D[CX], family", **style)
ax.set_xlabel(r"basis fraction $1/n$ (iSwap$^{1/n}$)")
ax.set_ylabel("cost (linear SLF, D[1Q]=0.1)")
ax.set_title("family extension over fractional iSwap bases")
ax.legend(fontsize=6)
fig.tight_layout()
fig.savefig(os.path.join(FIGDIR, "haar_improvements_family.png"), dpi=150)
print(f"C: family curves over {len(x_list)} bases x {N_HAAR} Haar targets "
      f"in {time.time() - t0:.1f}s")

# family extension can only help (score <= plain) wherever both defined
assert all(f <= n + 1e-9 for f, n in zip(curves["fam_cx"], curves["nofam_cx"]))
assert all(f <= n + 1e-9 for f, n in zip(curves["fam_swap"], curves["nofam_swap"]))
print("OK")
