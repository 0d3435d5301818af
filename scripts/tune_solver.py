"""Solver throughput/convergence study: restarts x Adam-iteration sweep.

The bench pipeline (bench.py) spends its solve time in three fused Pallas
phases; the Adam warm start runs on B*R lanes and dominates. This script
measures, per configuration (R, adam_iters, lm32_iters), the FIRST-PASS
convergence fraction and steady-state wall-clock on N exact-k Haar targets
for k=2 and k=3 — the data needed to pick (R, iters) for bench.py: fewer
restarts/iterations are only a win if the rescue-round cost of the extra
failures stays below the saved warm-start work.

Usage:
  python scripts/tune_solver.py R ADAM_ITERS [LM32_ITERS] [TOP_M] [LM_ITERS] [N] [CHUNK]

TOP_M=0 means no restart cut (the pre-round-5 flat path); TOP_M=m runs
the f32-LM ranking pass on only the best m restarts by Adam-final cost
(make_solver top_m). LM_ITERS is the df64 polish iteration count.

Prints one JSON line per k with {k, R, adam_iters, lm32_iters, top_m,
lm_iters, n, chunk, converged_frac, seconds, targets_per_s, warmup_s}.
Each new config tuple is a new XLA executable — expect one remote AOT
compile per k on first run; results land in the persistent .jax_cache
like bench.py's.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
from slam_decomposition_tpu.opt.gauss_newton import make_solver
from slam_decomposition_tpu.opt.samplers import haar_sample
from slam_decomposition_tpu.ops import cplx

R = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ADAM_ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
LM32_ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
TOP_M = int(sys.argv[4]) if len(sys.argv) > 4 else 0
LM_ITERS = int(sys.argv[5]) if len(sys.argv) > 5 else 6
N = int(sys.argv[6]) if len(sys.argv) > 6 else 10_000
CHUNK = int(sys.argv[7]) if len(sys.argv) > 7 else 10_000
CERT = sys.argv[8] if len(sys.argv) > 8 else "f64"
THRESH = 1e-10


def main():
    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        monodromy_ks_batch,
    )

    coverage = gate_set_to_coverage(gates.cg_sqiswap())
    # oversample, then keep the first N of each exact-k bucket
    M = 3 * N
    T_np = haar_sample(M, seed=20260817)
    T = cplx.from_numpy(T_np)
    ks = np.maximum(monodromy_ks_batch(coverage, T), 2)

    for k in (2, 3):
        idx = np.where(ks == k)[0][:N]
        n = len(idx)
        a = build_ansatz(cycle_gates([gates.SQISWAP], k))
        solver = jax.jit(
            make_solver(
                a.eval_fn,
                a.n_params,
                adam_iters=ADAM_ITERS,
                lm32_iters=LM32_ITERS,
                lm_iters=LM_ITERS,
                top_m=TOP_M if TOP_M > 0 else None,
                chain_gates=a.chain_gates,
                certify=CERT,
            )
        )

        def one_pass(seed):
            key = jax.random.PRNGKey(seed)
            losses = np.empty(n)
            futs = []
            for s in range(0, n, CHUNK):
                part_idx = idx[s : s + CHUNK]
                valid = len(part_idx)
                if valid < CHUNK:
                    part_idx = np.concatenate(
                        [part_idx, np.repeat(part_idx[:1], CHUNK - valid)]
                    )
                ii = jnp.asarray(part_idx, dtype=jnp.int32)
                tgt = (jnp.take(T[0], ii, axis=0), jnp.take(T[1], ii, axis=0))
                key, sub = jax.random.split(key)
                x0 = jax.random.uniform(
                    sub, (CHUNK, R, a.n_params), dtype=jnp.float64
                ) * (2 * np.pi)
                _, bf = solver(x0, tgt)
                futs.append((s, valid, bf))
            for s, valid, bf in futs:
                losses[s : s + valid] = np.asarray(bf)[:valid]
            return losses

        t0 = time.time()
        one_pass(0)  # warmup/compile
        warmup = time.time() - t0

        t0 = time.time()
        losses = one_pass(1)
        dt = time.time() - t0
        frac = float((losses <= THRESH).mean())
        print(
            json.dumps(
                {
                    "k": k,
                    "R": R,
                    "adam_iters": ADAM_ITERS,
                    "lm32_iters": LM32_ITERS,
                    "top_m": TOP_M,
                    "lm_iters": LM_ITERS,
                    "certify": CERT,
                    "n": n,
                    "chunk": CHUNK,
                    "converged_frac": round(frac, 5),
                    "seconds": round(dt, 3),
                    "targets_per_s": round(n / dt, 1),
                    "warmup_s": round(warmup, 1),
                }
            )
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
