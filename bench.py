"""Headline benchmark: Haar-target 2Q decomposition throughput on one chip.

North star (BASELINE.json): decompose 10k Haar-random 2-qubit unitaries
into a sqiSwap basis to infidelity < 1e-9 in < 60 s on one TPU v5e chip.
The reference (scipy BFGS + qiskit parameter binding, single-thread CPU)
manages roughly 0.5-2 targets/s on the same workload; the north-star bar
is 10000/60 = 167 targets/s (>=100x reference).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
where vs_baseline = achieved_throughput / 167 (>=1.0 beats the target) and
value is steady-state decompositions/s with every target certified below
1e-10 square-cost (~ <1e-9 average-gate infidelity).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
from slam_decomposition_tpu.opt import costs
from slam_decomposition_tpu.opt.minimize import lbfgs
from slam_decomposition_tpu.opt.samplers import haar_sample
from slam_decomposition_tpu.ops import cplx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
B = (B // CHUNK) * CHUNK
RESTARTS = 3
THRESH = 1e-10
NORTH_STAR_RATE = 10_000 / 60.0


def make_solver(k: int, max_iters: int):
    ansatz = build_ansatz(cycle_gates([gates.SQISWAP], k))

    def solve_one(x0, tgt):
        return lbfgs(
            lambda x: costs.square_cost(ansatz.eval_fn(x), tgt),
            x0,
            max_iters=max_iters,
            f_tol=THRESH * 0.5,
            g_tol=1e-14,
        )

    def solve(x0s, tr, ti):
        inner = jax.vmap(solve_one, in_axes=(0, None))
        res = jax.vmap(inner, in_axes=(0, 0))(x0s, (tr, ti))
        bf = jnp.min(res.f, axis=1)
        bi = jnp.argmin(res.f, axis=1)
        bx = jnp.take_along_axis(res.x, bi[:, None, None], axis=1).squeeze(1)
        return bx, bf

    return jax.jit(solve), ansatz


def run_pipeline(targets, key, solver2, solver3, a2, a3):
    """Solve in fixed-size chunks (keeps per-launch footprint bounded and
    reuses one compiled program per k)."""
    bfs, cyc = [], []
    for s in range(0, len(targets), CHUNK):
        tr, ti = cplx.from_numpy(targets[s : s + CHUNK])
        key, k2, k3 = jax.random.split(key, 3)
        x2 = jax.random.uniform(
            k2, (CHUNK, RESTARTS, a2.n_params), dtype=jnp.float64
        ) * (2 * np.pi)
        bx2, bf2 = solver2(x2, tr, ti)
        x3 = jax.random.uniform(
            k3, (CHUNK, RESTARTS, a3.n_params), dtype=jnp.float64
        ) * (2 * np.pi)
        bx3, bf3 = solver3(x3, tr, ti)
        bf = jnp.minimum(bf2, bf3)
        bfs.append(np.asarray(bf))
        cyc.append(np.asarray(jnp.where(bf2 <= THRESH, 2, 3)))
    return np.concatenate(bfs), np.concatenate(cyc)


def main():
    solver2, a2 = make_solver(2, 220)
    solver3, a3 = make_solver(3, 220)

    targets_w = haar_sample(CHUNK, seed=123)
    targets = haar_sample(B, seed=456)

    t0 = time.time()
    bf_w, _ = run_pipeline(targets_w, jax.random.PRNGKey(0), solver2, solver3, a2, a3)
    t_warm = time.time() - t0
    print(f"# warmup (incl. compile): {t_warm:.1f}s", file=sys.stderr)

    t0 = time.time()
    bf, cycles = run_pipeline(
        targets, jax.random.PRNGKey(1), solver2, solver3, a2, a3
    )
    dt = time.time() - t0

    n_ok = int((np.asarray(bf) <= THRESH).sum())
    frac_k2 = float((np.asarray(cycles) == 2).mean())
    print(
        f"# steady-state: {dt:.2f}s for {B} targets; converged {n_ok}/{B}; "
        f"k=2 fraction {frac_k2:.3f}; worst loss {float(np.max(bf)):.2e}",
        file=sys.stderr,
    )
    rate = n_ok / dt
    print(
        json.dumps(
            {
                "metric": "haar_2q_decompositions_to_1e-10_per_sec_sqiswap_basis",
                "value": round(rate, 2),
                "unit": "targets/s",
                "vs_baseline": round(rate / NORTH_STAR_RATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
