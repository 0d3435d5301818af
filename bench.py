"""Headline benchmark: Haar-target 2Q decomposition throughput on one chip.

North star (BASELINE.json): decompose 10k Haar-random 2-qubit unitaries
into a sqiSwap basis to infidelity < 1e-9 in < 60 s on one TPU v5e chip.
The reference (scipy BFGS with finite differences + qiskit parameter
binding, single-thread CPU) manages ~0.5-2 targets/s; the north-star bar is
10000/60 = 167 targets/s (>=100x reference).

Pipeline (the reference's own flow, batched):
  1. monodromy coverage ranges for ALL targets in one batched device call
     (polytope membership; reference did this serially per target,
     optimizer.py:183 + polytope_wrap.py:39);
  2. bucket targets by exact k (2 or 3 for sqiswap), pad to ONE fixed
     chunk shape (pad lanes cycle the bucket's own targets, so padding is
     extra restarts, min-reduced on collect — not wasted work);
  3. per bucket, solve at exactly k applications through the MESH path
     (parallel.mesh.sharded_solver_smap over a 1-device mesh here; the
     same program shards dp x rp on real pods) hosting the three fused
     Pallas kernels (Adam warm start, f32 LM ranking, double-single LM
     polish — ops/pallas_chain.py) + double-single certification derived
     in-kernel from the final accepted residual (see CERT below;
     BENCH_CERT_F64=1 restores the true-f64 XLA chain eval).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"};
vs_baseline = rate / 167. Every counted target is certified below 1e-10
square-cost (stricter than the reference's 1e-10 BasicCost threshold);
the certificate is the ~2^-47-accurate double-single residual of the
final ACCEPTED polish iterate (>=6 accurate digits at the bar, gated
parity test vs true f64).

Timing protocol: the target set (default 100k; B is argv[1]) is uploaded
to the device ONCE before the clock starts and the timed region covers
ranges + solve + certification + result download. The one-time upload
(~25 MB at B=100k, ~1.4 s through the ~18 MB/s tunnel) is excluded
deliberately — it is an artifact of the remote-tunnel test rig, not of
the pipeline (production targets are generated or held on-device); this
exclusion is stated next to the headline number in README.md. B=100k is
the default because at 10k the ~0.3 s timed region is dominated by fixed
per-dispatch tunnel latency rather than device throughput.

Warmup protocol (the invariant whose violation caused the 21x BENCH_r03
regression — VERDICT r3, weak #1): EVERY executable shape the timed
region can dispatch is compiled before the clock starts. Two layers of
defense:
  1. an explicit AOT warm plan (utils/warmup.warm_all) listing every
     shape — the two solver chunks, the tier-1 ks kernel at its chunk
     plan, the mixed-precision ks escalation at its single SMALL shape —
     traced serially on the 1-core host and compiled in background
     threads (compile releases the GIL, so compiles overlap the
     remaining traces instead of serializing after them);
  2. a full-B rehearsal of the ENTIRE pipeline on a disjoint warmup set,
     which executes the exact steady-state dispatch sequence; any shape
     the plan missed compiles here, outside the timed region, and is
     reported via the dispatchers' fallback counters.

Env knobs: BENCH_MESH=0 falls back to the plain (non-shard_map) jit
solver; BENCH_MFU=0 suppresses the FLOPs/MFU roofline line (default on,
so driver-recorded artifacts carry the measured MFU).
"""

import json
import os
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
from slam_decomposition_tpu.opt.samplers import haar_sample
from slam_decomposition_tpu.ops import cplx

def _argv_int(i, default):
    # tolerate import under pytest/tools where argv isn't ours
    try:
        return int(sys.argv[i])
    except (IndexError, ValueError):
        return default


B = _argv_int(1, 100_000)
CHUNK = _argv_int(2, 10_000)
RESTARTS = 4
THRESH = 1e-10
NORTH_STAR_RATE = 10_000 / 60.0
# Default: plain jit solver. Same-session A/B on the chip at B=100k
# (docs/ROUND4_NOTES.md): plain 65.6k targets/s / 194.6 s warmup vs
# mesh-on-1-device 56.7k / 350.6 s (the shard_map wrapper splits the
# pipeline into local_solve + gather + polish executables and roughly
# doubles the trace cost; its solve stage ran 1.41 s vs 1.37 s plain).
# The multi-chip dryrun still certifies the mesh program every round
# (__graft_entry__._dryrun_impl, incl. a production-shaped B=2048 chunk);
# BENCH_MESH=1 opts back in for pod-scale runs where dp>1 pays.
USE_MESH = os.environ.get("BENCH_MESH", "0") == "1"
# Certification mode (round 5): "df64" derives every counted loss inside
# the Pallas polish kernel from the final accepted double-single residual
# (cost = 0.2||r||^2 - ||r||^4/80 exactly; ~6e-8 RELATIVE accuracy, >=6
# digits at the 1e-10 bar; TPU-gated parity test vs true f64 in
# tests/test_pallas.py::test_polish_with_cost_on_tpu_matches_true_f64_cert).
# The prior true-f64 XLA chain eval was ~60% of EVERY solve chunk (k=2:
# 131 ms -> 54 ms measured same-session, 2026-08-20) because emulated-f64
# 4x4 work lowers to layout-shuffled small ops. BENCH_CERT_F64=1 restores
# it for cross-checking.
CERT = "f64" if os.environ.get("BENCH_CERT_F64", "0") == "1" else "df64"


def build(k):
    from slam_decomposition_tpu.utils.warmup import ExecCache, ShapeDispatcher

    a = build_ansatz(cycle_gates([gates.SQISWAP], k))
    if USE_MESH:
        # production path == mesh path (round-2 VERDICT item 4): the same
        # shard_map program the multi-chip dryrun certifies, on a 1-device
        # mesh here; iteration counts match make_solver's defaults exactly
        from slam_decomposition_tpu.parallel.mesh import (
            make_mesh,
            sharded_solver_smap,
        )

        mesh = make_mesh(1, rp=1)
        solver = sharded_solver_smap(
            a,
            mesh,
            adam_iters=100,
            lm32_iters=8,
            lm_iters=6,
            chain_gates=a.chain_gates,
            certify=CERT,
        )
    else:
        from slam_decomposition_tpu.opt.gauss_newton import make_solver

        solver = jax.jit(
            make_solver(
                a.eval_fn,
                a.n_params,
                chain_gates=a.chain_gates,
                certify=CERT,
            )
        )
    # ExecCache: warmup loads the serialized COMPILED executable when one
    # exists for this code version + worker (skips tracing AND compile);
    # see utils/warmup.ExecCache. Mesh and plain programs share arg
    # signatures, so the name must carry the path choice.
    name = f"solve-k{k}-mesh" if USE_MESH else f"solve-k{k}"
    return ShapeDispatcher(solver, ExecCache(), name), a


def launch_bucket(T, idx, solver, ansatz, key):
    """Launch solves for targets T[idx] in CHUNK-size pieces; the final
    partial chunk cycles the bucket's own indices (np.resize), so pad
    lanes are EXTRA RESTARTS of real targets rather than dead work —
    collect() min-reduces duplicates. One fixed chunk shape means one
    solver executable per k (the 2.5k tail shape of round 2 is gone:
    each extra jit shape cost 40-125 s of compile-cache deserialization
    or minutes of remote AOT per round, ROUND2_NOTES.md "Warm-up").

    Targets stay device-resident (T was uploaded ONCE for the whole run);
    chunks are gathered on device from int32 index arrays, and all chunk
    results download in ONE jax.device_get (collect)."""
    futs = []
    for s in range(0, len(idx), CHUNK):
        part = idx[s : s + CHUNK]
        if len(part) < CHUNK:
            part = np.resize(idx[s:], CHUNK)
        ii = jnp.asarray(part, dtype=jnp.int32)
        tgt = (jnp.take(T[0], ii, axis=0), jnp.take(T[1], ii, axis=0))
        key, sub = jax.random.split(key)
        x0 = jax.random.uniform(
            sub, (CHUNK, RESTARTS, ansatz.n_params), dtype=jnp.float64
        ) * (2 * np.pi)
        _, bf = solver(x0, tgt)
        futs.append((part, bf))
    return futs, key


def collect(losses, futs):
    """One parallel transfer for every launched chunk, min-reduced into
    the global loss array (duplicate indices from cyclic padding keep
    their best restart)."""
    flat = jax.device_get([bf for _, bf in futs])
    for (part, _), l in zip(futs, flat):
        np.minimum.at(losses, part, l)


def run(T, n_targets, key, s2, a2, s3, a3, ks):
    losses = np.full(n_targets, np.inf)
    futs = []
    for k, solver, ansatz in ((2, s2, a2), (3, s3, a3)):
        idx = np.where(ks == k)[0]
        if len(idx) == 0:
            continue
        f, key = launch_bucket(T, idx, solver, ansatz, key)
        futs += f
    collect(losses, futs)
    # rescue rounds: unconverged targets re-solve at k=3 with fresh seeds
    # (the reference's spanning-range extension + restart ladder,
    # optimizer.py:233-303); every target is k<=3-coverable. The cyclic
    # chunk padding gives each stuck target CHUNK/len(stuck) extra restart
    # groups per round, so one round almost always clears the set.
    for _ in range(3):
        stuck = np.where(losses > THRESH)[0]
        if len(stuck) == 0:
            break
        f, key = launch_bucket(T, stuck, s3, a3, key)
        collect(losses, f)
    return losses


def main():
    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        ks_dispatchers,
        ks_warm_plan,
        monodromy_ks_batch,
    )
    from slam_decomposition_tpu.utils.warmup import warm_all

    t0 = time.time()
    s2, a2 = build(2)
    s3, a3 = build(3)
    coverage = gate_set_to_coverage(gates.cg_sqiswap())
    print(f"# warmup/build+coverage: {time.time() - t0:.1f}s", file=sys.stderr)

    # upload each target set ONCE; ranges and every solve chunk gather
    # from the device-resident pair. The rehearsal set is FULL-B (not one
    # chunk as in round 3): warmup must execute the exact steady-state
    # dispatch sequence, and the chunk plan (incl. the escalation set
    # size) depends on B.
    T_w = cplx.from_numpy(haar_sample(B, seed=123))
    T = cplx.from_numpy(haar_sample(B, seed=456))

    # --- warmup stage 1: explicit AOT warm of every dispatch shape.
    # Traces run serially on the main thread (GIL-bound either way on
    # this 1-core host); each lowered artifact compiles in a background
    # thread (compile/cache-deserialize release the GIL). Longest-compile
    # first, so the big solver compiles overlap the remaining traces.
    t0 = time.time()
    plan = []
    for s, a in ((s3, a3), (s2, a2)):
        x0 = jnp.zeros((CHUNK, RESTARTS, a.n_params), dtype=jnp.float64)
        z = jnp.zeros((CHUNK, 4, 4), dtype=jnp.float64)
        plan.append((s, (x0, (z, z))))
    plan += ks_warm_plan(coverage, B)
    warm_all(
        plan,
        # 4 workers: compiles AND deferred device loads (exec-cache hits)
        # are RPC-bound and release the GIL; with 4 entries in the plan,
        # all of them overlap
        max_workers=4,
        log=lambda m: print(f"# warmup/{m}", file=sys.stderr),
    )
    print(f"# warmup/trace+compile: {time.time() - t0:.1f}s", file=sys.stderr)

    # --- warmup stage 2: full-pipeline rehearsal at the measured size on
    # a disjoint target set. Pure execution (~1-2 s) when stage 1 covered
    # everything; any missed shape compiles HERE, outside the timed
    # region, and shows up in the fallback counters below.
    t1 = time.time()
    ks_w = np.maximum(monodromy_ks_batch(coverage, T_w), 2)
    run(T_w, B, jax.random.PRNGKey(0), s2, a2, s3, a3, ks_w)
    fn32, fn_mixed, _ = ks_dispatchers(coverage)
    fallbacks = sum(
        d.fallback_calls for d in (s2, s3, fn32, fn_mixed)
    )
    print(
        f"# warmup/rehearsal: {time.time() - t1:.1f}s "
        f"(un-warmed shape dispatches: {fallbacks})",
        file=sys.stderr,
    )
    if fallbacks:
        print(
            "# warmup WARNING: the AOT warm plan missed shapes that the "
            "rehearsal compiled via the jit fallback — timed region is "
            "still warm, but update ks_warm_plan/bench warm plan",
            file=sys.stderr,
        )
    print(f"# warmup (incl. compile): {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    ks = np.maximum(monodromy_ks_batch(coverage, T), 2)
    t_ranges = time.time() - t0
    losses = run(T, B, jax.random.PRNGKey(1), s2, a2, s3, a3, ks)
    dt = time.time() - t0

    n_ok = int((losses <= THRESH).sum())
    print(
        f"# steady-state: {dt:.2f}s for {B} targets (ranges {t_ranges:.2f}s); "
        f"converged {n_ok}/{B}; k histogram "
        f"{dict(zip(*[list(x) for x in np.unique(ks, return_counts=True)]))}; "
        f"worst loss {float(losses.max()):.2e}",
        file=sys.stderr,
    )
    if os.environ.get("BENCH_MFU", "1") == "1":
        from slam_decomposition_tpu.utils.mfu import mfu_report

        mfu_report(B, dt, t_ranges, ks, RESTARTS, file=sys.stderr)
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
