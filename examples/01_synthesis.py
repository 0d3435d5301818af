"""Batched variational synthesis — the reference's 4-object idiom
(reference README.md:33-52) on a whole target distribution at once."""
# Host-side analysis runs on CPU; set JAX_PLATFORMS=cpu to skip TPU init.
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
from slam_decomposition_tpu.opt.optimizer import TemplateOptimizer
from slam_decomposition_tpu.opt.samplers import haar_sample

builder = lambda k: build_ansatz(cycle_gates([gates.SQISWAP], k))
optimizer = TemplateOptimizer(builder, objective="square", spanning_range=[2, 3],
                              training_restarts=6, override_fail=True)
targets = haar_sample(64, seed=0)
res = optimizer.approximate_from_distribution(targets)
print("k counts:", np.bincount(res.cycles), "worst loss:", res.loss.max())
