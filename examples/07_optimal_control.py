"""Optimal-control pulse shaping: drive a weak coupling into the
perfect-entangler polytope (the reference's krotov smush_OCT study as one
jitted GRAPE program)."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from slam_decomposition_tpu.explore.oct import (
    is_perfect_entangler, make_smush_eval, optimize_pulses, pe_functional)
from slam_decomposition_tpu.models.hamiltonians import evolve_smush, populations

N = 16
ev = make_smush_eval(gc=7 * np.pi / 8, gg=0.0, n_slices=N)
print(f"undriven riswap(1.75)-class: F_PE = {float(pe_functional(ev(np.zeros((2, N))))):.3f} (> 0, not a PE)")

res = optimize_pulses(ev, N, functional="pe", restarts=8, iters=250, lr=0.2, seed=1)
print(f"after pulse shaping:    F_PE = {float(res.value):.2e} "
      f"(perfect entangler: {bool(is_perfect_entangler(res.U, tol=1e-3))})")
print("gx pulse:", np.round(res.pulses[0], 2))
print("gy pulse:", np.round(res.pulses[1], 2))

# population dynamics along the optimized pulse (the hamiltonian_sim
# notebook's mesolve role)
import jax.numpy as jnp
psi0 = (jnp.zeros(4).at[1].set(1.0), jnp.zeros(4))
pops = populations(evolve_smush(0.0, 0.0, 7 * np.pi / 8, 0.0, res.pulses[0], res.pulses[1], psi0))
print("pop(|01>) along pulse:", np.round(np.asarray(pops)[:, 1], 3))
assert bool(is_perfect_entangler(res.U, tol=1e-6))
