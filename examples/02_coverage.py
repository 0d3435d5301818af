"""Monodromy coverage: how many basis applications reach which targets."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Host-side analysis runs on CPU; set JAX_PLATFORMS=cpu to skip TPU init.
from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.coverage.coverage import (
    gate_set_to_coverage, monodromy_range_from_target)
from slam_decomposition_tpu.coverage.haar import expected_cost, normalized_volume

cov = gate_set_to_coverage(gates.cg_sqiswap())
for name, g in [("CNOT", gates.CNOT), ("SWAP", gates.SWAP), ("B", gates.berkeley())]:
    k, _ = monodromy_range_from_target(cov, g.to_numpy())
    print(f"k({name}) = {k}")
print("P2 Haar volume:", normalized_volume(cov[2].polytope))
print("E[Haar] cost:", expected_cost(cov))
