"""Parallel-drive pulses: trajectories and solved ImprovedCX."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Host-side analysis runs on CPU; set JAX_PLATFORMS=cpu to skip TPU init.
import numpy as np
from slam_decomposition_tpu.models.trajectory import (
    smush_trajectory, improved_cx)

traj = smush_trajectory(0, 0, np.pi/2, 0, [0.3, -0.2, 0.5, 0.1], [0.1, 0.4, -0.3, 0.2])
print("trajectory through the chamber:\n", np.round(traj, 3))
params, loss, (A1, B1, A2, B2) = improved_cx()
print("solved parallel-driven CX pulse (1 application + exact 1Q locals), "
      f"certified loss: {loss:.2e}")
assert loss < 1e-10

# SWAP from TWO driven full-iSwap-time pulses — certified exact via the
# golden artifact (capability the reference lacks: its driven attempt
# stalled at ~1e-5 and its undriven route needs THREE applications).
import json, pathlib
from slam_decomposition_tpu.models.gates import SWAP
from slam_decomposition_tpu.models.trajectory import evaluate_drive_sequence

art = json.loads((pathlib.Path(__file__).resolve().parents[1] /
    "slam_decomposition_tpu/data/improved_swap_2pulse.json").read_text())
locs = [np.array([[complex(re, im) for re, im in row] for row in L])
        for L in art["locals"]]
U = evaluate_drive_sequence(art["params"], art["plan"], art["gc"],
                            art["gg"], art["n_slices"], locs)
infid = 1.0 - abs(np.trace(SWAP.to_numpy().conj().T @ U)) / 4.0
print(f"SWAP via 2 driven iSwap pulses: infidelity {infid:.2e}")
assert infid < 1e-10
