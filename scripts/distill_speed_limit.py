"""Distill the measured SNAIL speed-limit frontier into spline knots.

Input: the reference repo's measured dataset (a g_pct heatmap over
(g2_conv, g2_gain) amplitudes; data asset, SURVEY.md §2.7). Processing
mirrors the reference's cleaning (snail_death_gate.py:33-93): per column,
keep the last ~0.5 crossing as the frontier point, drop the known outlier,
sort by conversion amplitude, close the frontier at gain=0, and normalize
the larger axis intercept to pi/2.

Output: slam_decomposition_tpu/data/snail_speed_limit.json {x, y, s}.
Run once: python scripts/distill_speed_limit.py [path-to-measured-json]
"""

import json
import pathlib
import sys

import numpy as np

DEFAULT_SRC = (
    "/root/reference/src/slam/data/"
    "Q1_11.07mA_snailPump_length0.5_prepareE_False_freqG_9070_freqC_695-11_processed.json"
)
OUT = pathlib.Path(__file__).parent.parent / "slam_decomposition_tpu" / "data" / "snail_speed_limit.json"


def main(src=DEFAULT_SRC):
    dd = json.loads(pathlib.Path(src).read_text())
    conv = np.asarray(dd["g2_conv"], dtype=float)
    gain = np.asarray(dd["g2_gain"], dtype=float)
    g_pct = np.asarray(dd["g_pct"], dtype=float).T  # (gain_idx, conv_idx)

    pts = []
    for j in range(g_pct.shape[1]):
        col = g_pct[:, j]
        idx = np.where(np.isclose(col, 0.5, atol=0.05))[0]
        if len(idx) == 0:
            continue
        i = idx[-1]
        # one hand-removed outlier (reference snail_death_gate.py:53:
        # zero-gain row, column 68)
        if i == 0 and j == 68:
            continue
        pts.append((conv[j], gain[i]))

    pts.sort(key=lambda p: p[0])
    pts.append((pts[-1][0], 0.0))  # close at gain=0

    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    max_intercept = max(abs(x[-1]), abs(y[0]))
    x = x / max_intercept * (np.pi / 2)
    y = y / max_intercept * (np.pi / 2)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(
        json.dumps(
            {
                "x": x.tolist(),
                "y": y.tolist(),
                "s": 0.001,
                "provenance": "distilled from reference measured dataset "
                "Q1_11.07mA_snailPump (SURVEY.md §2.7) by scripts/distill_speed_limit.py",
            }
        )
    )
    print(f"wrote {OUT} with {len(x)} knots; intercepts x={x[-1]:.4f}, y={y[0]:.4f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
