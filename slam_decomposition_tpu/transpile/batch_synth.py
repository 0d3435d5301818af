"""Batched device-resident sqiswap synthesis for the transpile layer.

`sqiswap_decompose` (transpile/kak.py, reference counterpart
weyl_decompose.py:343-387) is exact but host-serial: one numpy KAK +
interleave solve per 2Q block. At transpile scale (a consolidated QFT-64
has ~2000 blocks) that is seconds of single-thread host work. This module
runs the same synthesis as ONE batched device program per k-class
(ops/kak_batch.make_analytic_init seeding the df64 polish kernel —
the route scripts/bench_analytic.py timed at ~0.33 s per 10k blocks),
then emits the identical step format on the host. Every emitted block is
re-certified on the host against the 1e-10 trace-infidelity bar that
`sqiswap_decompose` itself enforces (kak.py:555-558); any lane the device
path cannot certify (or any k<=1 block, where synthesis is trivial) falls
back to the exact host routine, so the result contract is unchanged.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from slam_decomposition_tpu.transpile.kak import (
    sqiswap_decompose,
    steps_to_matrix,
)

# ONE compiled shape per k-class: every batch is padded to _CHUNK
# multiples. Chunk-shape proliferation matters more than padding waste
# here — on the remote-TPU toolchain each new executable shape costs
# minutes of AOT compile (persistent-cached thereafter), while a padded
# 256-lane chunk runs in ~10 ms.
_CHUNK = 256
_SOLVERS: Dict[int, tuple] = {}
_F64_INITS: Dict[int, object] = {}


def _init_f64(k: int):
    """Batched TRUE-f64 analytic synthesis on the CPU backend — the rescue
    tier for lanes the f32 device init cannot place in the polish basin
    (near-identity classes: the interleave quartic's roots merge below f32
    resolution; exact-SWAP lanes NaN on TPU — docs/device_transpile.md
    "Fallback anatomy"). One vectorized XLA:CPU call replaces ~5 ms/block
    of serial host KAK (the round-2 warm QFT-64 pass spent ~2.5 s here)."""
    if k not in _F64_INITS:
        import jax
        import jax.numpy as jnp

        from slam_decomposition_tpu.ops.kak_batch import make_analytic_init

        cpu = jax.devices("cpu")[0]
        raw = make_analytic_init(k, dtype=jnp.float64)

        def run(Us: np.ndarray) -> np.ndarray:
            n = len(Us)
            pad = -(-n // _CHUNK) * _CHUNK - n
            if pad:
                Us = np.concatenate([Us, np.repeat(Us[:1], pad, axis=0)])
            with jax.default_device(cpu):
                x = raw(
                    jnp.asarray(Us.real, jnp.float64),
                    jnp.asarray(Us.imag, jnp.float64),
                )
            return np.asarray(x)[:n]

        _F64_INITS[k] = run
    return _F64_INITS[k]


def _u3_np(theta: float, phi: float, lam: float) -> np.ndarray:
    """qiskit-convention U gate (ops/su2.py:10) as a numpy 2x2."""
    ct, st = np.cos(theta / 2.0), np.sin(theta / 2.0)
    return np.array(
        [
            [ct, -np.exp(1j * lam) * st],
            [np.exp(1j * phi) * st, np.exp(1j * (phi + lam)) * ct],
        ]
    )


def _solver(k: int):
    """(jitted analytic solve, ansatz) for the k-application template."""
    if k not in _SOLVERS:
        import jax

        from slam_decomposition_tpu.models import gates
        from slam_decomposition_tpu.models.templates import (
            build_ansatz,
            cycle_gates,
        )
        from slam_decomposition_tpu.opt.gauss_newton import make_analytic_solver

        a = build_ansatz(cycle_gates([gates.SQISWAP], k))
        solve = jax.jit(
            make_analytic_solver(a.eval_fn, a.n_params, k, chain_gates=a.chain_gates)
        )
        _SOLVERS[k] = (solve, a)
    return _SOLVERS[k]


def _params_to_steps(x: np.ndarray, k: int, U: np.ndarray, atol: float):
    """Flat ansatz params (6*(k+1),) -> sqiswap_decompose step list, or
    None when the emitted steps miss the trace-infidelity bar."""
    steps: List = []
    for layer in range(k + 1):
        p = x[6 * layer : 6 * (layer + 1)]
        steps.append(("1q", (_u3_np(*p[0:3]), _u3_np(*p[3:6]))))
        if layer < k:
            steps.append(("sqiswap", None))
    V = steps_to_matrix(steps)
    tr = np.trace(V.conj().T @ U)
    # NaN params give a NaN trace; "NaN > atol" is False, so an explicit
    # finiteness check is required to REJECT (the batch path and the old
    # call-site isfinite guard agree on this)
    if not np.isfinite(tr) or 1.0 - abs(tr) / 4.0 > atol:
        return None
    # fold the block's global phase in, exactly like the host path's
    # ("phase", ...) bookkeeping (kak.py:519,544): steps_to_matrix(steps)
    # then reproduces U including phase
    return [("phase", float(np.angle(tr)))] + steps


def _u3_np_batch(t, p, l):
    """(...,) angle arrays -> (..., 2, 2) qiskit-convention U batch."""
    ct, st = np.cos(t / 2.0), np.sin(t / 2.0)
    out = np.empty(t.shape + (2, 2), dtype=complex)
    out[..., 0, 0] = ct
    out[..., 0, 1] = -np.exp(1j * l) * st
    out[..., 1, 0] = np.exp(1j * p) * st
    out[..., 1, 1] = np.exp(1j * (p + l)) * ct
    return out


def _params_to_steps_batch(
    xs: np.ndarray, k: int, Us: np.ndarray, atol: float
) -> List:
    """Vectorized :func:`_params_to_steps` over a whole lane batch: ONE
    numpy pass builds every lane's u3 layers, chains them ((m,4,4)
    matmuls, k+1 layers), and certifies all traces at once; step-list
    emission for passing lanes is pure slicing of the precomputed layer
    tensors. The per-lane loop (steps_to_matrix per block: ~1.5 ms x
    ~1700 device lanes on QFT-64) was most of what remained of the warm
    pass after the f64 rescue tier (docs/device_transpile.md "what
    remains ... one batched certification einsum and the IR emit loop").
    Lanes with non-finite params or traces simply fail certification
    (NaN compares false) and return None."""
    from slam_decomposition_tpu.transpile.kak import SQISWAP_M

    m = len(xs)
    if m == 0:
        return []
    with np.errstate(invalid="ignore"):
        x = np.asarray(xs, dtype=float).reshape(m, k + 1, 6)
        A = _u3_np_batch(x[..., 0], x[..., 1], x[..., 2])  # (m, k+1, 2, 2)
        Bm = _u3_np_batch(x[..., 3], x[..., 4], x[..., 5])
        L = np.einsum("mkab,mkcd->mkacbd", A, Bm).reshape(m, k + 1, 4, 4)
        V = L[:, 0]
        for layer in range(1, k + 1):
            V = np.einsum("ij,mjl->mil", SQISWAP_M, V)
            V = np.einsum("mij,mjl->mil", L[:, layer], V)
        # tr(V^dag U) per lane, phase folded exactly as _params_to_steps
        tr = np.einsum("mij,mij->m", np.conj(V), Us)
        infid = 1.0 - np.abs(tr) / 4.0
        phases = np.angle(tr)
    out: List = []
    for i in range(m):
        if not (np.isfinite(infid[i]) and infid[i] <= atol):
            out.append(None)
            continue
        steps: List = [("phase", float(phases[i]))]
        for layer in range(k + 1):
            steps.append(("1q", (A[i, layer], Bm[i, layer])))
            if layer < k:
                steps.append(("sqiswap", None))
        out.append(steps)
    return out


def _product_steps_batch(Us: np.ndarray, atol: float):
    """Vectorized k=0 synthesis: each U is (within the k-assignment
    tolerance) e^{i phase} kron(l, r), recovered by the rank-1
    rearrangement in one numpy pass over the whole batch — the same
    closed form as kak.py:83-94 without the per-block SVD (the dominant
    row of the rearrangement IS the right factor for a product gate).
    Returns a steps list per block, or None where the product
    approximation misses the certification bar (a genuinely non-product
    block inside the identity-class tolerance band goes to the exact
    host routine). The full host KAK costs ~5 ms/block; on a 2048-block
    QFT-64 the ~750 identity-class cp gates were most of the warm
    pass wall-clock."""
    B = len(Us)
    # non-product blocks inside the k=0 band yield near-zero dets/norms;
    # the NaN/inf infidelity is rejected explicitly below — suppress the
    # transient numpy warnings rather than leak them to callers
    with np.errstate(invalid="ignore", divide="ignore"):
        R = (
            Us.reshape(B, 2, 2, 2, 2).transpose(0, 1, 3, 2, 4).reshape(B, 4, 4)
        )
        norms = (np.abs(R) ** 2).sum(axis=2)  # (B, 4) row norms^2
        i0 = norms.argmax(axis=1)
        ar = np.arange(B)
        rvec = R[ar, i0]  # (B, 4)
        lvec = np.einsum("bij,bj->bi", R, rvec.conj()) / norms[ar, i0][:, None]
        l = lvec.reshape(B, 2, 2)
        r = rvec.reshape(B, 2, 2)
        dl = l[:, 0, 0] * l[:, 1, 1] - l[:, 0, 1] * l[:, 1, 0]
        dr = r[:, 0, 0] * r[:, 1, 1] - r[:, 0, 1] * r[:, 1, 0]
        l = l / np.sqrt(dl)[:, None, None]
        r = r / np.sqrt(dr)[:, None, None]
        V = np.einsum("bik,bjl->bijkl", l, r).reshape(B, 4, 4)
        tr = np.einsum("bij,bij->b", V.conj(), Us)
        infid = 1.0 - np.abs(tr) / 4.0
    phases = np.angle(tr)
    out = []
    for i in range(B):
        if np.isfinite(infid[i]) and infid[i] <= atol:
            out.append([("phase", float(phases[i])), ("1q", (l[i], r[i]))])
        else:
            out.append(None)
    return out


def sqiswap_decompose_batch(
    Us: np.ndarray,
    atol: float = 1e-10,
    stats: Optional[dict] = None,
) -> List[Tuple[list, int]]:
    """Batched `sqiswap_decompose` over a (B, 4, 4) block array.

    Returns a list of (steps, n) in block order, same contract as the
    host routine (steps reproduce each block to trace infidelity <= atol,
    phase included). k in {2, 3} blocks are synthesized in one device
    call per k-class; k <= 1 blocks and uncertified lanes use the exact
    host path. ``stats`` (if given) records {"device": n_device_blocks,
    "fallback": n_host_fallbacks, "trivial": n_k_le_1_blocks}; the three
    sum to the batch size.
    """
    import jax

    from slam_decomposition_tpu.ops import cplx
    from slam_decomposition_tpu.opt.samplers import sqiswap_count_batch

    Us = np.asarray(Us, dtype=complex)
    B = len(Us)
    counts = np.atleast_1d(sqiswap_count_batch(Us))
    results: List = [None] * B
    n_device = n_fallback = n_rescued = 0

    trivial_idx = np.where(counts <= 1)[0]
    zeros = trivial_idx[counts[trivial_idx] == 0]
    if len(zeros):
        for i, steps in zip(zeros, _product_steps_batch(Us[zeros], atol)):
            if steps is not None:
                results[i] = (steps, 0)
    for i in trivial_idx:
        if results[i] is None:
            results[i] = sqiswap_decompose(Us[i])

    for k in (2, 3):
        idx = np.where(counts == k)[0]
        if len(idx) == 0:
            continue
        solve, _ = _solver(k)
        # launch every chunk, then download all results in one transfer
        # (serial per-chunk syncs cost a tunnel round trip each — same
        # finding as bench.py's collect_buckets)
        futs = []
        for s in range(0, len(idx), _CHUNK):
            part = idx[s : s + _CHUNK]
            if len(part) < _CHUNK:
                part = np.concatenate(
                    [part, np.repeat(part[:1], _CHUNK - len(part))]
                )
            futs.append(solve(cplx.from_numpy(Us[part])))
        got = jax.device_get(futs)
        xs = np.concatenate([x for x, _ in got])[: len(idx)]
        losses = np.concatenate([l for _, l in got])[: len(idx)]
        # certify + emit the whole k-class in one vectorized pass (the
        # per-lane steps_to_matrix loop was the warm-pass tail) — over
        # the lanes whose solver loss passed atol only: a lane already
        # over the bar is discarded regardless, so building/certifying
        # its u3 chain is pure waste (advisor r4 low)
        ok = losses <= atol
        ok_idx = np.where(ok)[0]
        ok_steps = (
            _params_to_steps_batch(xs[ok_idx], k, Us[idx[ok_idx]], atol)
            if len(ok_idx)
            else []
        )
        all_steps = [None] * len(idx)
        for j, s in zip(ok_idx, ok_steps):
            all_steps[j] = s
        miss = []
        for j, i in enumerate(idx):
            steps = all_steps[j]
            if steps is None:
                miss.append(i)
            else:
                results[i] = (steps, k)
                n_device += 1
        if miss:
            # tier 2: one vectorized true-f64 analytic synthesis (CPU
            # backend) over every miss lane — no root merging, no polish
            # needed; the per-block exact host routine is tier 3
            miss_arr = np.asarray(miss)
            xs64 = _init_f64(k)(Us[miss_arr])
            rescue_steps = _params_to_steps_batch(xs64, k, Us[miss_arr], atol)
            for steps, i in zip(rescue_steps, miss_arr):
                if steps is None:
                    results[i] = sqiswap_decompose(Us[i])
                    n_fallback += 1
                else:
                    results[i] = (steps, k)
                    n_device += 1
                    n_rescued += 1

    if stats is not None:
        stats["device"] = n_device
        stats["fallback"] = n_fallback
        stats["trivial"] = len(trivial_idx)
        # f64-CPU rescues are a subset of "device" (batched path, not the
        # serial host fallback); device + fallback + trivial == B holds
        stats["f64_rescue"] = n_rescued
    return results
