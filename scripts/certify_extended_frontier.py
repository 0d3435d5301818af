"""Cross-certify the extended-volume frontier by SOLVING inside it.

The extended-coverage hulls (explore/smush_volume.rational_hull) are built
from float Qhull facets with offsets relaxed OUTWARD to contain every
sampled point exactly — so each hull is an upper estimate of the sampled
cloud's hull, and a row's "extended volume" could in principle overstate
what the parallel-driven template actually reaches (VERDICT r4, weak #6;
the reference's exact-LRS hulls of Fraction points carry no such
relaxation, parallel_drive_volume.py:354-360).

This script closes the loop experimentally: for every (gate, k) row whose
extended volume exceeds its base volume, it Haar-samples target classes
that lie INSIDE the claimed extended region but OUTSIDE the bare-coverage
polytope (the frontier — exactly the region the volume win is claimed
from), then runs the parallel-drive class fit (Makhlin residual over the
k-cycle driven template, the same template the hulls were sampled from)
and reports the fraction certified below 1e-10. A high fraction means the
claimed region is genuinely reachable, not a relaxation artifact.

Solves run through gauss_newton.make_driven_solver — on TPU that is the
trip-count-segmented Adam path (round-5 re-deviced driven core).

Usage: python scripts/certify_extended_frontier.py [n_targets] [restarts]
Writes data/frontier_certification.json and prints one JSON line per row.
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

from slam_decomposition_tpu.config import config
from slam_decomposition_tpu.explore.smush_volume import NAMED_GATES, _smush_eval
from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.opt import costs as cost_lib
from slam_decomposition_tpu.opt.gauss_newton import make_driven_solver
from slam_decomposition_tpu.opt.samplers import haar_sample
from slam_decomposition_tpu.ops import cplx

N_TARGETS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
RESTARTS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
THRESH = 1e-10
HAAR_POOL = 20_000


def frontier_targets(name: str, k: int, n: int):
    """Haar-sampled unitaries whose monodromy class is inside the extended
    polytope for (name, k) but outside the bare coverage polytope."""
    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        monodromy_reps_float,
    )
    from slam_decomposition_tpu.explore.smush_volume import load_smush_coverage

    gc, gg, t, iters = NAMED_GATES[name]
    base_gate = G.cg_canonicalize(G.conversion_gain_gate(0, 0, gc, gg, t))
    bare_cov = gate_set_to_coverage(base_gate, max_layers=iters)
    smush_cov = load_smush_coverage(base_gate)
    ext = smush_cov[k]
    base = bare_cov[k] if k < len(bare_cov) else None

    Us = haar_sample(HAAR_POOL, seed=20260821 + 31 * k + len(name))
    picked = []
    for U in Us:
        reps = np.asarray(monodromy_reps_float(U))[:, :3]
        if not ext.contains_float(reps):
            continue
        if base is not None and base.contains_float(reps):
            continue
        picked.append(U)
        if len(picked) >= n:
            break
    return np.stack(picked) if picked else np.zeros((0, 4, 4), complex)


def certify_row(name: str, k: int, n_targets: int):
    gc, gg, t, _ = NAMED_GATES[name]
    Us = frontier_targets(name, k, n_targets)
    B = len(Us)
    if B == 0:
        return {"name": name, "k": k, "frontier_sampled": 0}
    eval_one, n_params = _smush_eval(gc, gg, t, k)
    n_slices = max(int(round(t / 0.25)), 1)
    per_cycle = 2 + 2 * n_slices

    solver = make_driven_solver(
        eval_one,
        n_params,
        adam_iters=400,
        lm32_iters=16,
        lm_iters=16,
        residual="makhlin",
        final_cost_fn=cost_lib.makhlin_functional_cost,
    )

    # pad B to a fixed lane count so every row of the same (n_params)
    # shares one executable; pad lanes cycle real targets
    PAD = 128
    idx = np.resize(np.arange(B), PAD)
    tgt = cplx.from_numpy(Us[idx])
    rng = np.random.default_rng(7 * k + len(name))

    def x0_draw(r):
        x0 = rng.uniform(0, 2 * np.pi, (PAD, r, n_params))
        for c in range(k):  # physically-scaled drive amplitudes
            lo = c * per_cycle + 2
            x0[..., lo : lo + 2 * n_slices] = rng.uniform(
                -4.0, 4.0, (PAD, r, 2 * n_slices)
            )
        return jnp.asarray(x0)

    t0 = time.time()
    _, bf = solver(x0_draw(RESTARTS), tgt)
    losses = np.full(B, np.inf)
    np.minimum.at(losses, idx, np.asarray(bf))
    # rescue rounds with fresh seeds for the stragglers
    for _ in range(2):
        if (losses <= THRESH).all():
            break
        _, bf = solver(x0_draw(RESTARTS), tgt)
        np.minimum.at(losses, idx, np.asarray(bf))
    dt = time.time() - t0

    out = {
        "name": name,
        "k": k,
        "frontier_sampled": B,
        "certified_frac": round(float((losses <= THRESH).mean()), 4),
        "median_loss": float(np.median(losses)),
        "worst_loss": float(losses.max()),
        "seconds": round(dt, 1),
        "threshold": THRESH,
    }
    print(json.dumps(out))
    sys.stdout.flush()
    return out


def main():
    summary = config.cache_path("extended_results.json")
    rows = json.loads(summary.read_text())
    out_path = config.cache_path("frontier_certification.json")
    try:
        results = json.loads(out_path.read_text())
    except (OSError, json.JSONDecodeError):
        results = []
    done = {(r["name"], r["k"]) for r in results}
    # k=1 rows first (where the headline volume wins live), then k=2+
    todo = []
    for name, per_k in rows.items():
        for k_str, (base_vol, ext_vol, *_flags) in sorted(per_k.items()):
            k = int(k_str)
            if ext_vol <= base_vol + 1e-12 or (name, k) in done:
                continue  # no claimed win at this row / already certified
            todo.append((k, name))
    for k, name in sorted(todo):
        results.append(certify_row(name, k, N_TARGETS))
        # incremental write: partial results survive a timeout/cutoff
        out_path.write_text(json.dumps(results, indent=1))
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
