"""Speed-limit-aware transpilation of a benchmark circuit."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Host-side analysis runs on CPU; set JAX_PLATFORMS=cpu to skip TPU init.
from slam_decomposition_tpu.transpile import library
from slam_decomposition_tpu.transpile.passes import (
    pass_manager_basic, pass_manager_optimized_sqiswap, pass_manager_slam)

qc = library.qft(8)
_, basic = pass_manager_basic(qc, gate="sqiswap", duration_1q=0.25)
_, opt_ = pass_manager_optimized_sqiswap(qc, duration_1q=0.25)
print(f"QFT-8 duration: basic {basic['duration']:.2f} -> "
      f"parallel-drive {opt_['duration']:.2f}")
_, slam = pass_manager_slam(qc, strategy="weighted_overall",
                            speed_method="linear", duration_1q=0.25)
print(f"slam weighted_overall: {slam['duration']:.2f}")
