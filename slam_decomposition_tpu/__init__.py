"""slam_decomposition_tpu — TPU-native 2-qubit gate-synthesis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Pitt-JonesLab/slam_decomposition (ISCA'23 "Parallel Driving for Fast Quantum
Computing Under Speed Limits"):

  * variational template synthesis (batched, autodiff, device-resident
    multi-start L-BFGS) — reference: src/slam/optimizer.py
  * monodromy-polytope coverage analysis (exact rational host engine +
    batched device membership) — reference: src/slam/utils/polytopes/
  * speed-limit-aware transpilation — reference:
    src/slam/utils/transpiler_pass/speed_limit_pass.py

Everything on the compute path is pure JAX over fixed-shape arrays; complex
numbers are carried as (real, imag) pairs so the same code runs in float32
and float64 on TPU (complex128 is unsupported on TPU hardware).
"""

from slam_decomposition_tpu import config as _config_module
from slam_decomposition_tpu.config import setup_x64

setup_x64()
settings = _config_module.config  # the Config instance (module stays importable)

__version__ = "0.1.0"
