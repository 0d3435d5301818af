"""dp-axis strong-scaling curve for the sharded solver.

Measures the sharded solve (GSPMD-jit form, parallel/mesh.py) at a FIXED
total batch while growing the dp axis 1 -> 2 -> 4 -> 8 on the virtual
CPU mesh, and records (a) wall-clock per solve, (b) the per-device shard
shapes, which are the actual evidence of work division — on this 1-core
host all virtual devices share one core, so virtual-mesh wall-clock is
expected ~flat (it measures sharding overhead, not speedup); on a real
pod each dp slice runs on its own chip and the per-device work drops as
1/N, as the shapes show.

Run (virtual mesh): XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_PLATFORMS=cpu python scripts/scaling_curve.py
Results land in docs/scaling_curve.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import numpy as np
import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

from slam_decomposition_tpu.config import setup_x64

setup_x64()

from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.models.templates import build_ansatz
from slam_decomposition_tpu.opt.samplers import haar_sample
from slam_decomposition_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    sharded_solver,
)
from slam_decomposition_tpu.ops import cplx

B, R = 256, 8
ADAM, LM = 120, 6


def run_curve():
    ansatz = build_ansatz([G.SQISWAP] * 2)
    tgt_np = haar_sample(B, seed=0)
    rows = []
    n_avail = len(jax.devices())
    for dp in (1, 2, 4, 8):
        if dp > n_avail:
            break
        mesh = make_mesh(dp, rp=1)
        solve = sharded_solver(ansatz, mesh, adam_iters=ADAM, lm_iters=LM)
        rng = np.random.default_rng(1)
        x0s = rng.uniform(-np.pi, np.pi, (B, R, ansatz.n_params))
        tgt = cplx.from_numpy(tgt_np)
        # warm up (compile) then time 3 solves
        bx, bf = solve(x0s, tgt)
        bf.block_until_ready()
        t0 = time.time()
        n_rep = 3
        for _ in range(n_rep):
            bx, bf = solve(x0s, tgt)
            bf.block_until_ready()
        dt = (time.time() - t0) / n_rep
        shard_shape = [
            s.data.shape for s in bx.addressable_shards
        ][0]
        rows.append(
            {
                "dp": dp,
                "wall_s": round(dt, 3),
                "targets_per_s": round(B / dt, 1),
                "per_device_batch": B // dp,
                "per_device_out_shard": list(shard_shape),
                "median_loss": float(np.median(np.asarray(bf))),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    return rows


def run_ks_curve():
    """Same dp sweep for the ranges stage (sharded_ks): coords + halfspace
    membership, zero collectives."""
    from slam_decomposition_tpu.coverage.coverage import gate_set_to_coverage
    from slam_decomposition_tpu.parallel.mesh import sharded_ks

    coverage = gate_set_to_coverage(G.cg_sqiswap())
    tgt = cplx.from_numpy(haar_sample(B, seed=3))
    rows = []
    n_avail = len(jax.devices())
    for dp in (1, 2, 4, 8):
        if dp > n_avail:
            break
        mesh = make_mesh(dp, rp=1)
        ks_fn = sharded_ks(coverage, mesh)
        ks = ks_fn(tgt[0], tgt[1])  # warm up (compile)
        t0 = time.time()
        n_rep = 3
        for _ in range(n_rep):
            ks = ks_fn(tgt[0], tgt[1])
        dt = (time.time() - t0) / n_rep
        rows.append(
            {
                "dp": dp,
                "wall_s": round(dt, 4),
                "per_device_batch": B // dp,
                "k_histogram": {
                    int(k): int(c) for k, c in zip(*np.unique(ks, return_counts=True))
                },
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == "__main__":
    rows = run_curve()
    ks_rows = run_ks_curve()
    backend = jax.default_backend()
    lines = [
        "# dp-axis strong scaling (sharded solver)",
        "",
        f"Backend: {backend}; devices: {len(jax.devices())}; "
        f"fixed total batch B={B}, R={R} restarts, "
        f"Adam {ADAM} + LM {LM} iters.",
        "",
        "| dp | wall (s) | targets/s | per-device batch | out shard |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['dp']} | {r['wall_s']} | {r['targets_per_s']} | "
            f"{r['per_device_batch']} | {r['per_device_out_shard']} |"
        )
    lines += [
        "",
        "## Ranges stage (sharded_ks)",
        "",
        "| dp | wall (s) | per-device batch | k histogram |",
        "|---|---|---|---|",
    ]
    for r in ks_rows:
        lines.append(
            f"| {r['dp']} | {r['wall_s']} | {r['per_device_batch']} | "
            f"{r['k_histogram']} |"
        )
    lines += [
        "",
        "On the virtual CPU mesh all devices share one host core, so"
        " wall-clock stays ~flat: the tables' evidence of scaling is the"
        " per-device shard shapes (work per chip drops 1/dp; XLA inserts"
        " the restart-argmin gather over ICI on a real pod; the ranges"
        " stage needs no collectives at all). The real-chip single-device"
        " rate is the bench headline (BENCH_r*.json).",
    ]
    out = "/root/repo/docs/scaling_curve.md"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
