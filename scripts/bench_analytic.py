"""Timing experiment: analytic KAK warm start vs Adam multi-restart.

Compares, per 10k-target chunk on the real chip (same protocol as bench.py:
device-resident targets, steady-state medians):

  A. the shipping variational solver (fused Pallas Adam x R restarts +
     f32 LM ranking + df64 polish) — bench.py's path;
  B. the analytic solver (ops/kak_batch.make_analytic_init seeding the
     df64 polish directly — no Adam, no restarts);
  C. the analytic init alone (to attribute B's time).

Usage: python scripts/bench_analytic.py [chunk=10000]
Writes nothing; prints a table. Convergence is reported alongside time —
a faster phase that certifies fewer targets is not a win (bench counts
only certified targets).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
from slam_decomposition_tpu.opt.gauss_newton import make_analytic_solver, make_solver
from slam_decomposition_tpu.opt.samplers import haar_sample
from slam_decomposition_tpu.ops import cplx

CH = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
RESTARTS = 4
THRESH = 1e-10


def _sync(out):
    # hard sync: force a (tiny) download of the last leaf. On the axon
    # relay, block_until_ready was observed returning early for one
    # executable's outputs (k=3 analytic reported 0.1 ms for a measured
    # 3.3 s program); a host transfer cannot lie.
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    return out


def timed(fn, reps=3):
    out = _sync(fn())  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = _sync(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts)), out


def main():
    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        monodromy_ks_batch,
    )

    coverage = gate_set_to_coverage(gates.cg_sqiswap())
    # draw until each k-bucket holds CH targets
    rng_seed = 7
    U = haar_sample(3 * CH, seed=rng_seed)
    ks = np.maximum(monodromy_ks_batch(coverage, U), 2)
    buckets = {}
    for k in (2, 3):
        idx = np.where(ks == k)[0]
        if len(idx) < CH:
            idx = np.concatenate([idx, np.repeat(idx[:1], CH - len(idx))])
        buckets[k] = idx[:CH]

    key = jax.random.PRNGKey(0)
    for k in (2, 3):
        a = build_ansatz(cycle_gates([gates.SQISWAP], k))
        var = jax.jit(make_solver(a.eval_fn, a.n_params, chain_gates=a.chain_gates))
        ana = make_analytic_solver(a.eval_fn, a.n_params, k, chain_gates=a.chain_gates)
        ana_solve = jax.jit(ana)
        ana_init = ana.init_only

        T = cplx.from_numpy(U[buckets[k]])
        x0 = (
            jax.random.uniform(key, (CH, RESTARTS, a.n_params), dtype=jnp.float64)
            * 2
            * np.pi
        )

        t0 = time.time()
        t_var, (_, bf_var) = timed(lambda: var(x0, T))
        print(f"# k={k} variational warm+timed total {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        t_ana, (_, bf_ana) = timed(lambda: ana_solve(T))
        print(f"# k={k} analytic warm+timed total {time.time()-t0:.1f}s",
              file=sys.stderr)
        t_init, _ = timed(lambda: ana_init(T))

        nv = int((np.asarray(bf_var) <= THRESH).sum())
        na = int((np.asarray(bf_ana) <= THRESH).sum())
        print(
            f"k={k} chunk={CH}: variational {t_var*1e3:8.1f} ms ({nv}/{CH} cert) | "
            f"analytic {t_ana*1e3:8.1f} ms ({na}/{CH} cert, init {t_init*1e3:.1f} ms) | "
            f"speedup x{t_var/t_ana:.2f}"
        )


if __name__ == "__main__":
    main()
