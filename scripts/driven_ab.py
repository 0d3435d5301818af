"""Device-vs-host A/B for the driven (Trotter) Adam paths.

Round-4 pinned every Adam-bearing driven-core solve to the 1-core host
after the TPU runtime crashed the worker on long Adam scans
(gauss_newton.driven_adam_device bisect: 20 iterations OK, 400 crash).
Round 5 re-devices them via trip-count segmentation
(gauss_newton.make_driven_solver: <=20-iteration device dispatches with
carried state). This script records the wall-clock of both modes on the
three capability surfaces VERDICT r4 named, and verifies the segmented
results numerically. Writes docs/driven_device.md section lines to
stdout; run in the default (TPU) env.

Usage: python scripts/driven_ab.py [quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from slam_decomposition_tpu.config import setup_x64

setup_x64()

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s")
    sys.stdout.flush()
    return out, dt


def run_mode(mode):
    os.environ["SLAM_DRIVEN_MODE"] = mode
    rows = {}

    # 1. GRAPE (explore/oct.py) — CNOT via the hs functional
    from slam_decomposition_tpu.explore import oct
    from slam_decomposition_tpu.models import gates as G
    from slam_decomposition_tpu.ops import cplx

    ev = oct.make_smush_eval(np.pi / 2, 0.0, n_slices=8, t=1.0)
    tgt = cplx.from_numpy(G.CNOT.to_numpy())
    res, rows["grape_cnot_hs"] = timed(
        f"[{mode}] GRAPE hs CNOT (8 restarts x 300 iters)",
        lambda: oct.optimize_pulses(
            ev, 8, functional="hs", target=tgt, restarts=8, iters=300, seed=3
        ),
    )
    rows["grape_value"] = float(res.value)

    # 2. drive_pulse_for_target (models/trajectory.py) — class fit of CX
    from slam_decomposition_tpu.models import trajectory as traj

    out, rows["drive_pulse_cx"] = timed(
        f"[{mode}] drive_pulse_for_target CX (32 restarts x 400 iters)",
        lambda: traj.drive_pulse_for_target(
            G.CNOT.to_numpy(), np.pi / 2, 0.0, restarts=32, seed=1
        ),
    )
    rows["drive_pulse_loss"] = float(out[1])

    # 3. targeted_smush_coords (explore/smush_volume.py) — iSwap k=1
    from slam_decomposition_tpu.explore.smush_volume import (
        targeted_smush_coords,
    )

    cs, rows["targeted_iswap_k1"] = timed(
        f"[{mode}] targeted_smush_coords iSwap k=1 (5 vx x 6 R x 250 it)",
        lambda: targeted_smush_coords(np.pi / 2, 0.0, 1.0, 1, seed=0),
    )
    rows["targeted_n_coords"] = int(len(cs))
    rows["targeted_mean"] = [round(float(x), 6) for x in cs.mean(0)]
    return rows


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    modes = ["segmented"] if QUICK else ["segmented", "host"]
    all_rows = {m: run_mode(m) for m in modes}
    if not QUICK:
        seg, host = all_rows["segmented"], all_rows["host"]
        print("\n| surface | segmented (device) | host pin | speedup |")
        print("|---|---|---|---|")
        for key, label in (
            ("grape_cnot_hs", "GRAPE hs CNOT 8x300"),
            ("drive_pulse_cx", "drive_pulse CX 32x400"),
            ("targeted_iswap_k1", "targeted descent iSwap k1"),
        ):
            print(
                f"| {label} | {seg[key]:.1f} s | {host[key]:.1f} s | "
                f"{host[key] / max(seg[key], 1e-9):.1f}x |"
            )
        # numerical agreement of the two modes (same seeds, same math)
        print(
            f"values: grape {seg['grape_value']:.3e} vs "
            f"{host['grape_value']:.3e}; drive_pulse loss "
            f"{seg['drive_pulse_loss']:.3e} vs {host['drive_pulse_loss']:.3e}; "
            f"targeted mean {seg['targeted_mean']} vs {host['targeted_mean']}"
        )


if __name__ == "__main__":
    main()
