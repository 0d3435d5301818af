"""3Q end-to-end: circulator Hamiltonian -> fixed 3Q gate synthesis, plus
the entanglement-monotone costs the reference declared but never
implemented (reference cost_function.py:102-114 stubs; CirculatorSNAILGate
custom_gates.py:95-138, VSwap :141)."""
# Host-side analysis runs on CPU; set JAX_PLATFORMS=cpu to skip TPU init.
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from slam_decomposition_tpu.models import gates, hamiltonians as ham
from slam_decomposition_tpu.models.templates import (
    build_ansatz, cycle_gates, hamiltonian_ansatz,
)
from slam_decomposition_tpu.opt import costs
from slam_decomposition_tpu.opt.optimizer import TemplateOptimizer
from slam_decomposition_tpu.ops import cplx

# 1. Recover VSWAP (the circulator's native 3Q permutation) by optimizing
#    the 7 physical circulator-Hamiltonian parameters.
target = gates.vswap().to_numpy()
ansatz = hamiltonian_ansatz(
    lambda p1, p2, p3, g1, g2, g3, t: ham.circulator_u(p1, p2, p3, g1, g2, g3, t=t),
    7,
    lower=np.array([-np.pi, -np.pi, -np.pi, 0, 0, 0, 0.5]),
    upper=np.array([np.pi, np.pi, np.pi, 1.5, 1.5, 1.5, 1.5]),
    n_qubits=3,
)
opt = TemplateOptimizer(
    ansatz, objective="square", training_restarts=12,
    override_fail=True, max_iters=300,
)
res = opt.approximate_target_U(target)
print("circulator -> VSWAP loss:", float(res.loss[0]))

# 2. Synthesize a fixed 3Q gate (CParitySwap) from 2Q CNOTs on a line —
#    CircuitTemplate with explicit edge embedding (basis.py:69-73 role).
builder = lambda k: build_ansatz(
    cycle_gates([gates.CNOT], k),
    edges=[[(0, 1), (1, 2), (0, 2)][i % 3] for i in range(k)],
    n_qubits=3,
)
opt3 = TemplateOptimizer(
    builder, objective="square", spanning_range=[6, 8, 10],
    training_restarts=8, override_fail=True,
)
r3 = opt3.approximate_target_U(gates.CPARITY_SWAP.to_numpy())
print("CParitySwap from CNOTs: k =", int(r3.cycles[0]),
      "loss:", float(r3.loss[0]))

# 3. Entanglement monotones on prep states — real implementations of the
#    reference's dead stubs, all differentiable.
eye8 = cplx.from_numpy(np.eye(8))
print("W-state monotones under identity:",
      {name: round(float(fn(eye8, state="w")), 4)
       for name, fn in (("MI", costs.mutual_information_cost),
                        ("negativity", costs.negativity_cost),
                        ("EoE", costs.entropy_of_entanglement_cost))})
