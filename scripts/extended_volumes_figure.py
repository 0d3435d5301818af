"""Extended (parallel-drive) volume comparison: this framework vs the
reference's published extended_results.json, per gate per k.

The reference's committed smush pipeline runs Monte-Carlo sampling only
(its targeted-optimizer extension is disabled in the snapshot,
parallel_drive_volume.py:241 `targets = []`); this framework adds
multi-scale MC + vmapped targeted vertex descents
(explore/smush_volume.py), which is where the k=1 gains come from.

Run (CPU is fine): JAX_PLATFORMS=cpu python scripts/extended_volumes_figure.py
Saves docs/figures/extended_volumes.png and prints the row-by-row table.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OURS = os.path.join(REPO, "slam_decomposition_tpu", "data", "extended_results.json")
REF = "/root/reference/src/slam/data/extended_results.json"
FIGDIR = os.path.join(REPO, "docs", "figures")


def main():
    ours = json.load(open(OURS))
    try:
        ref = json.load(open(REF))
    except OSError:
        print("reference JSON not available; nothing to compare")
        return
    gates = [g for g in ref if g in ours]
    rows = []
    for g in gates:
        for k in sorted(ref[g], key=int):
            r = float(ref[g][k][1])
            o = float(ours[g][k][1]) if k in ours[g] else float("nan")
            rows.append((g, int(k), r, o))
    print(f"{'gate':8} {'k':>2} {'reference':>10} {'ours':>10}")
    for g, k, r, o in rows:
        mark = "" if o >= r - 1e-6 else "  << BELOW"
        print(f"{g:8} {k:2d} {r:10.6f} {o:10.6f}{mark}")

    # grouped bar chart, k=1 and k=2 (where the parallel-drive claim lives)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2), sharey=False)
    for ax, kk in zip(axes, ("1", "2")):
        gs = [g for g in gates if kk in ref[g]]
        rv = [float(ref[g][kk][1]) for g in gs]
        ov = [float(ours[g][kk][1]) for g in gs]
        x = np.arange(len(gs))
        ax.bar(x - 0.2, rv, 0.4, label="reference (MC only)", color="#999")
        ax.bar(x + 0.2, ov, 0.4, label="this framework (MC multi-scale\n+ targeted descents)", color="#2b6cb0")
        ax.set_xticks(x)
        ax.set_xticklabels(gs, rotation=30)
        ax.set_title(f"extended Haar volume @ k={kk}")
        ax.set_yscale("log")
        ax.grid(axis="y", alpha=0.3)
    axes[0].legend(fontsize=8)
    fig.tight_layout()
    os.makedirs(FIGDIR, exist_ok=True)
    out = os.path.join(FIGDIR, "extended_volumes.png")
    fig.savefig(out, dpi=140)
    print("wrote", out)


if __name__ == "__main__":
    main()
