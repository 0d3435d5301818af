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
