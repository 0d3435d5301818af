"""Device-resident transpile evidence: QFT-64 pass wall-clock on TPU.

The unrouted QFT-64 has 64*63/2 = 2016 consolidated cp blocks — above
the >=1024 device-routing threshold, so the whole coordinate +
k-assignment flow rides the accelerator (weyl_coords_float mixed-precision
coords; monodromy_ks_batch membership), with the host seeing only int32
ks. Records wall-clock (cold incl. compile, then warm) and checks the
device coordinates against the pinned-CPU f64 path.

Run in the default (TPU) env: python scripts/qft64_pass_timing.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from slam_decomposition_tpu.config import setup_x64

setup_x64()

from slam_decomposition_tpu.coverage.coverage import (
    gate_set_to_coverage,
    monodromy_ks_batch,
    weyl_coords_float,
)
from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.transpile import library
from slam_decomposition_tpu.transpile.consolidate import consolidate_2q_blocks
from slam_decomposition_tpu.transpile.passes import optimized_sqiswap_sub

print(f"backend: {jax.default_backend()}", file=sys.stderr)

qc = library.qft(64)
t0 = time.time()
blocks = consolidate_2q_blocks(qc)
us = np.stack([b.unitary for b in blocks])
t_cons = time.time() - t0
print(f"consolidate: {len(blocks)} blocks in {t_cons:.2f}s")

# coords: device (mixed precision) vs pinned-CPU f64 parity
t0 = time.time()
coords_dev = weyl_coords_float(us)
t_cold = time.time() - t0
t0 = time.time()
coords_dev = weyl_coords_float(us)
t_warm = time.time() - t0
print(f"coords ({len(us)}): cold {t_cold:.2f}s warm {t_warm:.3f}s")

if jax.default_backend() == "tpu":
    coords_cpu = weyl_coords_float(us, force_cpu=True)
    err = np.abs(coords_dev - coords_cpu).max()
    print(f"device-vs-f64 coordinate parity: max |delta| = {err:.2e}")
    assert err < 1e-7, err

cov = gate_set_to_coverage(G.cg_sqiswap())
t0 = time.time()
ks = monodromy_ks_batch(cov, us)
t_ks_cold = time.time() - t0
t0 = time.time()
ks = monodromy_ks_batch(cov, us)
t_ks_warm = time.time() - t0
import collections

print(f"ks ({len(us)}): cold {t_ks_cold:.2f}s warm {t_ks_warm:.3f}s "
      f"dist {dict(collections.Counter(ks.tolist()))}")

t0 = time.time()
out = optimized_sqiswap_sub(qc, duration_1q=0.25)
t_pass = time.time() - t0
t0 = time.time()
out = optimized_sqiswap_sub(qc, duration_1q=0.25)
t_pass_w = time.time() - t0
print(f"optimized_sqiswap_sub full pass: cold {t_pass:.2f}s "
      f"warm {t_pass_w:.2f}s ({len(out.ops)} ops out)")

# fidelity-faithful variant: fit_substituted_1q/_pd route >=64-block
# groups through the accelerator (_accel_solve; Pallas chain kernels only
# for groups that will actually run there — advisor r3 high)
t0 = time.time()
out_fit = optimized_sqiswap_sub(qc, duration_1q=0.25, fit_1q=True)
t_fit = time.time() - t0
t0 = time.time()
out_fit = optimized_sqiswap_sub(qc, duration_1q=0.25, fit_1q=True)
t_fit_w = time.time() - t0
print(f"optimized_sqiswap_sub fit_1q=True: cold {t_fit:.2f}s "
      f"warm {t_fit_w:.2f}s ({len(out_fit.ops)} ops out)")

# basic manager: host per-block KAK loop vs one batched device synthesis
# call per k-class (transpile/batch_synth.py)
from slam_decomposition_tpu.transpile.passes import pass_manager_basic

t0 = time.time()
host_out, host_m = pass_manager_basic(qc, duration_1q=0.25, batched=False)
t_host = time.time() - t0
print(f"pass_manager_basic host loop: {t_host:.2f}s "
      f"(duration {host_m['duration']:.2f})")
t0 = time.time()
dev_out, dev_m = pass_manager_basic(qc, duration_1q=0.25, batched=True)
t_dev_cold = time.time() - t0
t0 = time.time()
dev_out, dev_m = pass_manager_basic(qc, duration_1q=0.25, batched=True)
t_dev = time.time() - t0
print(f"pass_manager_basic batched: cold {t_dev_cold:.2f}s warm {t_dev:.2f}s "
      f"(duration {dev_m['duration']:.2f})")
assert dev_m["duration"] == host_m["duration"], (dev_m, host_m)
