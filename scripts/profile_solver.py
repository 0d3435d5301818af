"""Phase profile of the flagship solve pipeline on the real chip.

Times each solver phase (Adam f32 warm start, LM f32 ranking pass, LM f64
polish) by building solver variants with the later phases zeroed out and
subtracting steady-state wall times. This is the profile artifact behind
the Pallas decision (round-1 VERDICT item 3): it identifies which phase a
hand-written kernel must target to move the headline number.

Usage: python scripts/profile_solver.py [B] [k]
Writes docs/profile_solver.md (appends a dated section) and prints a table.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
from slam_decomposition_tpu.opt.gauss_newton import make_solver
from slam_decomposition_tpu.opt.samplers import haar_sample
from slam_decomposition_tpu.ops import cplx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 2
RESTARTS = 4
REPS = 3


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def main():
    a = build_ansatz(cycle_gates([gates.SQISWAP], K))
    targets = cplx.from_numpy(haar_sample(B, seed=7))
    x0 = (
        jax.random.uniform(
            jax.random.PRNGKey(0), (B, RESTARTS, a.n_params), dtype=jnp.float64
        )
        * 2
        * np.pi
    )

    variants = {
        "adam_only": dict(lm32_iters=0, lm_iters=0),
        "adam+lm32": dict(lm_iters=0),
        "full": dict(),
    }
    t = {}
    for name, kw in variants.items():
        solver = jax.jit(
            make_solver(a.eval_fn, a.n_params, chain_gates=a.chain_gates, **kw)
        )
        t[name] = timed(solver, x0, targets)

    # also: forward-eval and value_and_grad microbenchmarks over the same
    # lane count, to separate "chain math" from "optimizer overhead"
    lanes = B * RESTARTS
    xs32 = jnp.asarray(
        np.random.default_rng(0).uniform(0, 2 * np.pi, (lanes, a.n_params)),
        jnp.float32,
    )
    fwd = jax.jit(jax.vmap(a.eval_fn))
    t_fwd = timed(fwd, xs32)

    tgt32 = (
        jnp.repeat(targets[0][:1].astype(jnp.float32), lanes, 0),
        jnp.repeat(targets[1][:1].astype(jnp.float32), lanes, 0),
    )

    def cost(x, t0, t1):
        V = a.eval_fn(x)
        tr = cplx.trace(cplx.matmul(cplx.dagger((t0, t1)), V))
        return 1.0 - (cplx.abs2(tr) + 4.0) / 20.0

    vg = jax.jit(jax.vmap(jax.value_and_grad(cost), in_axes=(0, 0, 0)))
    t_vg = timed(vg, xs32, *tgt32)

    phases = {
        "adam_f32 (100 it)": t["adam_only"],
        "lm_f32 (8 it, jacfwd)": t["adam+lm32"] - t["adam_only"],
        "lm_f64 polish (6 it)": t["full"] - t["adam+lm32"],
        "total": t["full"],
        f"[micro] fwd eval x{lanes}": t_fwd,
        f"[micro] value_and_grad x{lanes}": t_vg,
    }
    dev = jax.devices()[0]
    lines = [
        f"## profile_solver B={B} R={RESTARTS} k={K} on {dev.platform}:{dev.device_kind}",
        "",
        "| phase | seconds | % of total |",
        "|---|---|---|",
    ]
    for name, sec in phases.items():
        pct = 100 * sec / t["full"]
        lines.append(f"| {name} | {sec:.3f} | {pct:.1f}% |")
        print(f"{name:36s} {sec:8.3f}s  {pct:5.1f}%")
    with open("docs/profile_solver.md", "a") as f:
        f.write("\n".join(lines) + "\n\n")


if __name__ == "__main__":
    main()
