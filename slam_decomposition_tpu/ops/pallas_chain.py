"""Pallas TPU kernel: fused chain-eval + gradient + Adam loop.

The flagship solve's Adam warm start is 100 iterations of
value_and_grad over U(x) = L_k G_{k-1} ... L_1 G_0 L_0 (u3-layer /
constant-2Q-gate chains, models/templates.py:127-151) batched over
(targets x restarts) lanes. Under plain XLA this is the dominant phase
(67% — docs/profile_solver.md): the batched 4x4 complex matmuls lower to
layout-shuffled small ops and every scan iteration round-trips the carry.

This kernel runs the WHOLE Adam loop on-chip (round-1 VERDICT item 3 /
DESIGN.md candidate 1): lanes are packed into (SUBLANES, 128) VPU tiles so
each of the 16 complex matrix entries is one vector register, the chain and
its reverse-mode gradient (jax.grad traced inside the kernel) are straight
vector FMAs, and x/m/v plus all AD intermediates stay in VMEM for all
``adam_iters`` iterations — HBM sees one read of (x0, target) and one write
of x_final per lane.

The math matches opt/gauss_newton.adam_one exactly (same update, bias
corrections, lr schedule), so convergence statistics are identical; only
the wall clock changes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 32  # lanes per kernel call = SUBLANES*128 packed as one VPU tile
# NOTE: this environment's AOT TPU compiler fails Mosaic legalization for
# ANY pallas grid (bisected: even a blocked 2D copy with grid=(2,) dies in
# 'func.return' legalization, while gridless full-array kernels compile and
# run fine). So the kernel is gridless — one invocation per lane block with
# everything in VMEM — and the host loops blocks via lax.map.


def _cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _u3(th, ph, la):
    """qiskit-convention u3 as a 2x2 list of (re, im) tiles (ops/su2.py:10)."""
    ct, st = jnp.cos(th * 0.5), jnp.sin(th * 0.5)
    z = jnp.zeros_like(ct)
    return [
        [(ct, z), (-jnp.cos(la) * st, -jnp.sin(la) * st)],
        [
            (jnp.cos(ph) * st, jnp.sin(ph) * st),
            (jnp.cos(ph + la) * ct, jnp.sin(ph + la) * ct),
        ],
    ]


def _layer(x, off):
    """kron(u3(x[off:off+3]), u3(x[off+3:off+6])) as 4x4 entry tiles."""
    A = _u3(x[off + 0], x[off + 1], x[off + 2])
    B = _u3(x[off + 3], x[off + 4], x[off + 5])
    return [
        [_cmul(A[a][b], B[c][d]) for b in range(2) for d in range(2)]
        for a in range(2)
        for c in range(2)
    ]


def _matmul4(A, B):
    out = []
    for i in range(4):
        row = []
        for j in range(4):
            acc = _cmul(A[i][0], B[0][j])
            for kk in range(1, 4):
                acc = _cadd(acc, _cmul(A[i][kk], B[kk][j]))
            row.append(acc)
        out.append(row)
    return out


def _const_matmul(G: np.ndarray, B):
    """C = G @ B with G a host-side constant complex 4x4: dead entries are
    skipped structurally, so a sparse basis gate (e.g. sqiSwap: 8 nonzeros)
    costs only its nonzero row combinations."""
    out = []
    for i in range(4):
        row = []
        for j in range(4):
            acc = None
            for kk in range(4):
                gr, gi = float(G[i, kk].real), float(G[i, kk].imag)
                if gr == 0.0 and gi == 0.0:
                    continue
                br, bi = B[kk][j]
                if gi == 0.0:
                    term = (gr * br, gr * bi)
                elif gr == 0.0:
                    term = (-gi * bi, gi * br)
                else:
                    term = (gr * br - gi * bi, gr * bi + gi * br)
                acc = term if acc is None else _cadd(acc, term)
            if acc is None:
                z = jnp.zeros_like(B[0][0][0])
                acc = (z, z)
            row.append(acc)
        out.append(row)
    return out


def _chain(x, Gs: np.ndarray, k: int):
    """U = L_k G_{k-1} ... L_1 G_0 L_0 (templates.py:143-151 order)."""
    U = _layer(x, 0)
    for i in range(k):
        U = _const_matmul(Gs[i], U)
        U = _matmul4(_layer(x, 6 * (i + 1)), U)
    return U


def _phase_residual_tiles(xs, T, Gs, k, n_params):
    """Phase-aligned residual r = vec(V - e^{i phi} U) as 32 (S, L) tiles
    (16 re + 16 im), matching opt/gauss_newton._phase_residual."""
    x = [xs[p] for p in range(n_params)]
    V = _chain(x, Gs, k)
    t_re = jnp.zeros_like(xs[0])
    t_im = jnp.zeros_like(xs[0])
    for i in range(4):
        for j in range(4):
            tre, tim = T[i][j]
            vre, vim = V[i][j]
            t_re = t_re + tre * vre + tim * vim
            t_im = t_im + tre * vim - tim * vre
    inv = jax.lax.rsqrt(t_re * t_re + t_im * t_im + 1e-30)
    c, s = t_re * inv, t_im * inv
    out = []
    for i in range(4):
        for j in range(4):
            tre, tim = T[i][j]
            vre, vim = V[i][j]
            out.append(vre - (c * tre - s * tim))
    for i in range(4):
        for j in range(4):
            tre, tim = T[i][j]
            vre, vim = V[i][j]
            out.append(vim - (c * tim + s * tre))
    return out


def _jacobian_tiles(res, x, n):
    """J: list of n (32, S, L) columns of the residual Jacobian w.r.t. the
    n per-lane parameters.

    Linearize ``res`` ONCE at x, then apply the linear map to n CONSTANT
    one-hot tangents, unrolled. Two deliberate choices:

    * linearize-once (not n ``jax.jvp`` calls): the linear jaxpr is
      ~primal-sized, so tracing splices n linear chains instead of n full
      forward+tangent chains — about half the round-2 warm-up tracing
      cost (ROUND2_NOTES.md "Warm-up").
    * UNROLLED constant tangents (not a vmapped runtime eye): with a
      compile-time one-hot, XLA folds the zero-multiplies per column —
      column p only pays the chain downstream of parameter p's layer. The
      round-3 vmapped-iota variant defeated that folding (every tangent
      paid the full linear chain) and cost ~25-35% of steady-state solve
      throughput on the chip (BENCH r3/r4 A/B: plain-solver solve stage
      1.0 s -> 1.37 s at B=100k).
    """
    _, lin = jax.linearize(res, x)
    one = jnp.ones_like(x[:1])
    zero = jnp.zeros_like(x[:1])
    cols = []
    for p in range(n):
        # unit tangent by concatenation (scatter doesn't lower on Mosaic)
        e = jnp.concatenate([zero] * p + [one] + [zero] * (n - p - 1), axis=0)
        cols.append(jnp.stack(lin(e)))  # (32, S, L)
    return cols


def _normal_eq(J, r, n):
    """A = J J^T (n, n, S, L) and g = J r (n, S, L) from the n Jacobian
    columns, exploiting symmetry (only the upper triangle is computed —
    the round-3 full outer product doubled the A flops and peaked two
    (n, n, S, L) temporaries at once in VMEM)."""
    rows = []
    for i in range(n):
        row = []
        for j in range(n):
            if j < i:
                row.append(rows[j][i])
            else:
                row.append((J[i] * J[j]).sum(axis=0))
        rows.append(row)
    A = jnp.stack([jnp.stack(row) for row in rows])  # (n, n, S, L)
    g = jnp.stack([(J[i] * r).sum(axis=0) for i in range(n)])
    return A, g


def lm_block(xs, tt, Gs: np.ndarray, lm_iters: int):
    """Pure-jnp LM block: xs (n, S, L) params, tt (32, S, L) target tiles
    -> (x_final, ||r||^2 per lane). This IS the Pallas kernel body — kept
    as a plain function so CI can compile it on CPU and check it against
    opt/gauss_newton.lm_one without the (minutes-slow) Pallas interpreter.
    """
    Gs = np.asarray(Gs, dtype=complex)
    k = Gs.shape[0]
    n = 6 * (k + 1)
    T = [[(tt[4 * i + j], tt[16 + 4 * i + j]) for j in range(4)] for i in range(4)]

    def res(x):
        return _phase_residual_tiles(x, T, Gs, k, n)

    tiny = jnp.float32(1e-30)

    def cg_solve(A, b, lam):
        # A: (n, n, S, L) normal matrix (without lam), b: (n, S, L);
        # per-lane CG on the regularized system, n+8 iterations
        def matvec(p):
            Ap = (A * p[None, :]).sum(axis=1)
            return Ap + lam[None] * p

        def body(_, carry):
            xx, rr, pp, rs = carry
            Ap = matvec(pp)
            pAp = (pp * Ap).sum(axis=0)
            alpha = rs / jnp.maximum(pAp, tiny)
            xx = xx + alpha[None] * pp
            rr = rr - alpha[None] * Ap
            rs_new = (rr * rr).sum(axis=0)
            pp = rr + (rs_new / jnp.maximum(rs, tiny))[None] * pp
            return (xx, rr, pp, rs_new)

        carry = (jnp.zeros_like(b), b, b, (b * b).sum(axis=0))
        xx, _, _, _ = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n + 8), body, carry
        )
        return xx

    def lm_step(_, carry):
        x, lam, r, f0 = carry
        # J (n, 32, S, L) via linearize-once + vmapped one-hot tangents
        J = _jacobian_tiles(res, x, n)
        A, g = _normal_eq(J, r, n)
        dx = cg_solve(A, -g, lam)
        xn = x + dx
        rn = jnp.stack(res(xn))
        fn = (rn * rn).sum(axis=0)
        improved = fn < f0
        # explicit f32 constants: under x64 weak literals can lower as
        # f64 -> f32 truncf, which Mosaic rejects
        lam = jnp.where(
            improved, lam * jnp.float32(0.3), lam * jnp.float32(8.0)
        )
        lam = jnp.clip(lam, jnp.float32(1e-14), jnp.float32(1e3))
        x = jnp.where(improved[None], xn, x)
        r = jnp.where(improved[None], rn, r)
        f0 = jnp.where(improved, fn, f0)
        return (x, lam, r, f0)

    r0 = jnp.stack(res(xs))
    f0 = (r0 * r0).sum(axis=0)
    lam0 = jnp.full_like(f0, 1e-3)
    x, _, _, f = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(lm_iters), lm_step, (xs, lam0, r0, f0)
    )
    return x, f


def make_lm_chain(
    Gs: np.ndarray,
    lm_iters: int = 8,
    interpret: bool = False,
    sublanes: int = 8,
):
    """Fused Levenberg-Marquardt kernel on the u3-layer chain (f32).

    Per iteration, entirely on-chip per (sublanes*128)-lane tile block:
    Jacobian of the 32-dim phase residual via ``n_params`` unrolled JVPs,
    normal equations J^T J + lam I (lam per lane), CG solve, trial step
    with per-lane accept/reject and lam update — the exact algorithm of
    opt/gauss_newton.lm_one's f32 ranking pass. Returns
    run(x (L, n) f32, tgt pair (L,4,4) f32) -> (x_final (L, n), ||r||^2 (L,)).

    The returned sum-of-squares is monotone in |tr(U^dag V)| exactly like
    the square cost, so callers can rank restarts on it directly.
    """
    Gs = np.asarray(Gs, dtype=complex)
    k = Gs.shape[0]
    n = 6 * (k + 1)
    tb = sublanes * LANES

    def kernel(x_ref, t_ref, o_ref, f_ref):
        x, f = lm_block(x_ref[:], t_ref[:], Gs, lm_iters)
        o_ref[:] = x
        f_ref[:] = f

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, sublanes, LANES), jnp.float32),
            jax.ShapeDtypeStruct((sublanes, LANES), jnp.float32),
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(x0, tgt_re, tgt_im):
        L = x0.shape[0]
        nt = -(-L // tb)
        pad = nt * tb - L

        def tile(a, feat):
            a = jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            return a.reshape(nt, sublanes, LANES, feat).transpose(0, 3, 1, 2)

        xt = tile(x0.astype(jnp.float32), n)
        tflat = jnp.concatenate(
            [
                tgt_re.astype(jnp.float32).reshape(L, 16),
                tgt_im.astype(jnp.float32).reshape(L, 16),
            ],
            axis=1,
        )
        tt = tile(tflat, 32)
        xs, fs = jax.lax.map(lambda a: call(a[0], a[1]), (xt, tt))
        xs = xs.transpose(0, 2, 3, 1).reshape(nt * tb, n)[:L]
        fs = fs.reshape(nt * tb)[:L]
        return xs, fs

    return run


def _chain_df64(x_df, Gs: np.ndarray, k: int):
    """U = L_k G_{k-1} ... L_1 G_0 L_0 in double-single arithmetic.

    ``x_df``: list of n_params (hi, lo) angle tiles. Matrix entries are
    ((re_hi, re_lo), (im_hi, im_lo)) — complex df64. ~10x the f32 flop
    count instead of XLA's ~140x f64-emulation slowdown
    (docs/profile_solver.md)."""
    from slam_decomposition_tpu.ops import df64

    def u3(th, ph, la):
        sth, cth = df64.sincos(df64.scale_exact(th, jnp.float32(0.5)))
        sp, cp = df64.sincos(ph)
        sl, cl = df64.sincos(la)
        spl, cpl = df64.sincos(df64.add(ph, la))
        z = df64.lift(jnp.zeros_like(th[0]))
        return [
            [(cth, z), (df64.neg(df64.mul(cl, sth)), df64.neg(df64.mul(sl, sth)))],
            [
                (df64.mul(cp, sth), df64.mul(sp, sth)),
                (df64.mul(cpl, cth), df64.mul(spl, cth)),
            ],
        ]

    def layer(off):
        A = u3(x_df[off + 0], x_df[off + 1], x_df[off + 2])
        B = u3(x_df[off + 3], x_df[off + 4], x_df[off + 5])
        return [
            [df64.cmul(A[a][b], B[c][d]) for b in range(2) for d in range(2)]
            for a in range(2)
            for c in range(2)
        ]

    def matmul4(A, B):
        out = []
        for i in range(4):
            row = []
            for j in range(4):
                acc = df64.cmul(A[i][0], B[0][j])
                for kk in range(1, 4):
                    acc = df64.cadd(acc, df64.cmul(A[i][kk], B[kk][j]))
                row.append(acc)
            out.append(row)
        return out

    def const_matmul(G, B):
        out = []
        zt = jnp.zeros_like(x_df[0][0])
        for i in range(4):
            row = []
            for j in range(4):
                acc = None
                for kk in range(4):
                    gr, gi = complex(G[i, kk]).real, complex(G[i, kk]).imag
                    if gr == 0.0 and gi == 0.0:
                        continue
                    gc = (
                        (jnp.full_like(zt, df64.const(gr)[0]), jnp.full_like(zt, df64.const(gr)[1])),
                        (jnp.full_like(zt, df64.const(gi)[0]), jnp.full_like(zt, df64.const(gi)[1])),
                    )
                    term = df64.cmul(gc, B[kk][j])
                    acc = term if acc is None else df64.cadd(acc, term)
                if acc is None:
                    acc = ((zt, zt), (zt, zt))
                row.append(acc)
            out.append(row)
        return out

    U = layer(0)
    for i in range(k):
        U = const_matmul(Gs[i], U)
        U = matmul4(layer(6 * (i + 1)), U)
    return U


def polish_block(xh, xl, th, tl, Gs: np.ndarray, lm_iters: int):
    """df64 LM polish block (the Pallas polish-kernel body, pure jnp).

    xh/xl: (n, S, L) double-single parameters; th/tl: (32, S, L) target
    tiles (16 re + 16 im, hi and lo words). The residual r = vec(V -
    e^{i phi} U) is evaluated in double-single (~2^-47), the Jacobian /
    normal equations / CG run in f32 (mixed-precision LM,
    opt/gauss_newton.lm_one), and accept/reject compares ||r||^2 hi-words
    (f32 holds tiny magnitudes fine). Returns (xh, xl) after lm_iters.
    """
    from slam_decomposition_tpu.ops import df64

    Gs = np.asarray(Gs, dtype=complex)
    k = Gs.shape[0]
    n = 6 * (k + 1)

    T32 = [
        [(th[4 * i + j], th[16 + 4 * i + j]) for j in range(4)]
        for i in range(4)
    ]
    Tdf = [
        [
            (
                (th[4 * i + j], tl[4 * i + j]),
                (th[16 + 4 * i + j], tl[16 + 4 * i + j]),
            )
            for j in range(4)
        ]
        for i in range(4)
    ]

    def res32(xs):
        return _phase_residual_tiles(xs, T32, Gs, k, n)

    def _res_df_impl(x_pairs):
        V = _chain_df64(x_pairs, Gs, k)
        zt = jnp.zeros_like(x_pairs[0][0])
        t_re = df64.lift(zt)
        t_im = df64.lift(zt)
        for i in range(4):
            for j in range(4):
                (tre, tim), (vre, vim) = Tdf[i][j], V[i][j]
                # tr(T^dag V) += conj(T_ij) * V_ij
                t_re = df64.add(t_re, df64.add(df64.mul(tre, vre), df64.mul(tim, vim)))
                t_im = df64.add(t_im, df64.sub(df64.mul(tre, vim), df64.mul(tim, vre)))
        mag = df64.sqrt(
            df64.add(df64.mul(t_re, t_re), df64.mul(t_im, t_im))
        )
        c = df64.div(t_re, mag)
        s = df64.div(t_im, mag)
        out = []
        for i in range(4):
            for j in range(4):
                (tre, tim), (vre, vim) = Tdf[i][j], V[i][j]
                out.append(df64.sub(vre, df64.sub(df64.mul(c, tre), df64.mul(s, tim))))
        for i in range(4):
            for j in range(4):
                (tre, tim), (vre, vim) = Tdf[i][j], V[i][j]
                out.append(df64.sub(vim, df64.add(df64.mul(c, tim), df64.mul(s, tre))))
        return out

    # the df64 chain is ~20k primitives when traced; an inner jit makes its
    # two call sites (init + loop body) share ONE traced jaxpr instead of
    # re-tracing per site (the round-2 warm-up cost), and the pjit call is
    # inlined again at lowering so the compiled kernel is unchanged
    _res_df_jit = jax.jit(lambda xh_, xl_: _res_df_impl(
        [(xh_[p], xl_[p]) for p in range(n)]
    ))

    def res_df(x_pairs):
        xh_ = jnp.stack([p[0] for p in x_pairs])
        xl_ = jnp.stack([p[1] for p in x_pairs])
        return _res_df_jit(xh_, xl_)

    def sumsq_hi(r_list):
        f = jnp.zeros_like(r_list[0][0])
        for r in r_list:
            f = f + r[0] * r[0]
        return f

    tiny = jnp.float32(1e-30)

    def cg_solve(A, b, lam):
        def matvec(p):
            return (A * p[None, :]).sum(axis=1) + lam[None] * p

        def body(_, carry):
            xx, rr, pp, rs = carry
            Ap = matvec(pp)
            alpha = rs / jnp.maximum((pp * Ap).sum(axis=0), tiny)
            xx = xx + alpha[None] * pp
            rr = rr - alpha[None] * Ap
            rs_new = (rr * rr).sum(axis=0)
            pp = rr + (rs_new / jnp.maximum(rs, tiny))[None] * pp
            return (xx, rr, pp, rs_new)

        carry = (jnp.zeros_like(b), b, b, (b * b).sum(axis=0))
        xx, _, _, _ = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n + 8), body, carry
        )
        return xx

    def unstack(xh_, xl_):
        return [(xh_[p], xl_[p]) for p in range(n)]

    def lm_step(_, carry):
        # r_hi is the df64 residual's hi word at the CURRENT iterate,
        # carried across iterations (identical math to recomputing it —
        # the accepted rn below IS res_df at the new x; f32 keeps ~7
        # digits of the df64 residual at ANY magnitude: exactly enough
        # for the gradient direction)
        xh_, xl_, lam, r_hi, f0 = carry
        # f32 Jacobian at the hi words (mixed-precision: J only steers),
        # linearize-once + vmapped tangents (see _jacobian_tiles)
        J = _jacobian_tiles(res32, xh_, n)
        A, g = _normal_eq(J, r_hi, n)
        dx = cg_solve(A, -g, lam)
        # trial step in df64
        from slam_decomposition_tpu.ops import df64 as _df

        xn = [_df.add((xh_[p], xl_[p]), _df.lift(dx[p])) for p in range(n)]
        rn = res_df(xn)
        fn = sumsq_hi(rn)
        improved = fn < f0
        lam = jnp.where(improved, lam * jnp.float32(0.3), lam * jnp.float32(8.0))
        lam = jnp.clip(lam, jnp.float32(1e-14), jnp.float32(1e3))
        xnh = jnp.stack([x[0] for x in xn])
        xnl = jnp.stack([x[1] for x in xn])
        rn_hi = jnp.stack([r[0] for r in rn])
        xh_ = jnp.where(improved[None], xnh, xh_)
        xl_ = jnp.where(improved[None], xnl, xl_)
        r_hi = jnp.where(improved[None], rn_hi, r_hi)
        f0 = jnp.where(improved, fn, f0)
        return (xh_, xl_, lam, r_hi, f0)

    r0 = res_df(unstack(xh, xl))
    f0 = sumsq_hi(r0)
    r0_hi = jnp.stack([r[0] for r in r0])
    lam0 = jnp.full_like(f0, 1e-3)
    xh, xl, _, _, f0 = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(lm_iters), lm_step, (xh, xl, lam0, r0_hi, f0)
    )
    # f0 = ||r||^2 of the final ACCEPTED iterate, from the df64 residual's
    # hi words (|error| <~ 2^-24 relative of an already ~2^-47-accurate
    # residual): callers can certify on it without a separate f64 chain
    # eval (see make_polish_chain with_cost)
    return xh, xl, f0


def make_polish_chain(
    Gs: np.ndarray,
    lm_iters: int = 6,
    interpret: bool = False,
    sublanes: int = 8,
    with_cost: bool = False,
):
    """Fused double-single LM polish kernel.

    run(x (L, n) f64, tgt pair (L,4,4) f64) -> x (L, n) f64. Replaces the
    XLA emulated-f64 polish phase (the round-1 bottleneck at 71% of solve
    time); the ~2^-47 double-single residual drives true losses to ~1e-25,
    and final certification stays in real f64 on the host path.

    ``with_cost=True`` additionally returns the final accepted iterate's
    ||r||^2 per lane, (L,) f32 — the df64 residual's hi-word sum of
    squares, i.e. a ~2^-24-relative reading of a ~2^-47-accurate
    residual. |tr| = (8 - ||r||^2)/2, so the square cost follows
    algebraically; callers certifying at 1e-10 get >=6 accurate digits
    at the threshold, replacing the ~20 ms/chunk XLA emulated-f64 chain
    eval (the per-chunk anatomy measured 2026-08-20; TPU-gated parity
    test vs true f64: tests/test_pallas.py).
    """
    Gs = np.asarray(Gs, dtype=complex)
    k = Gs.shape[0]
    n = 6 * (k + 1)
    tb = sublanes * LANES

    def kernel(xh_ref, xl_ref, th_ref, tl_ref, oh_ref, ol_ref, *maybe_f):
        xh, xl, f = polish_block(
            xh_ref[:], xl_ref[:], th_ref[:], tl_ref[:], Gs, lm_iters
        )
        oh_ref[:] = xh
        ol_ref[:] = xl
        if with_cost:
            maybe_f[0][:] = f

    out_shape = (
        jax.ShapeDtypeStruct((n, sublanes, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n, sublanes, LANES), jnp.float32),
    )
    if with_cost:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((sublanes, LANES), jnp.float32),
        )
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=jax.tree_util.tree_map(
            lambda _: pl.BlockSpec(memory_space=pltpu.VMEM), out_shape
        ),
        out_shape=out_shape,
        interpret=interpret,
    )

    @jax.jit
    def run(x0, tgt_re, tgt_im):
        # df64.sincos is only valid for |x| < ~2000 (quadrant index must be
        # exact in f32). All chain parameters are u3 angles, and u3 is
        # exactly invariant under any angle += 4*pi (theta enters as
        # theta/2; phi/lambda as phases), so reduce mod 4*pi in true f64
        # BEFORE the hi/lo split — guarantees the precondition regardless
        # of how far Adam/LM wandered.
        four_pi = jnp.asarray(4.0 * np.pi, dtype=x0.dtype)
        x0 = x0 - four_pi * jnp.round(x0 / four_pi)
        L = x0.shape[0]
        nt = -(-L // tb)
        pad = nt * tb - L

        def tile(a, feat):
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]
            )
            return a.reshape(nt, sublanes, LANES, feat).transpose(0, 3, 1, 2)

        def split_tiles(a64, feat):
            hi = a64.astype(jnp.float32)
            lo = (a64 - hi.astype(a64.dtype)).astype(jnp.float32)
            return tile(hi, feat), tile(lo, feat)

        xh, xl = split_tiles(x0, n)
        tflat = jnp.concatenate(
            [tgt_re.reshape(L, 16), tgt_im.reshape(L, 16)], axis=1
        )
        th, tl = split_tiles(tflat, 32)
        res = jax.lax.map(
            lambda a: call(a[0], a[1], a[2], a[3]), (xh, xl, th, tl)
        )
        oh, ol = res[0], res[1]
        out = oh.astype(jnp.float64) + ol.astype(jnp.float64)
        out = out.transpose(0, 2, 3, 1).reshape(nt * tb, n)[:L]
        if with_cost:
            return out, res[2].reshape(nt * tb)[:L]
        return out

    return run


def make_adam_chain(
    Gs: np.ndarray,
    adam_iters: int = 100,
    adam_lr: float = 0.1,
    interpret: bool = False,
    sublanes: int = SUBLANES,
    with_cost: bool = False,
):
    """Build run(x0 (L, 6k+6) f32, tgt pair of (L, 4, 4) f32) -> x (L, 6k+6).

    ``Gs``: (k, 4, 4) complex numpy constants of the per-cycle 2Q gates.
    Lanes are padded to a multiple of sublanes*128; the pad lanes re-run
    lane 0 (harmless).

    ``with_cost=True`` additionally returns the per-lane square cost at the
    final iterate, (L,) f32 — one extra fused forward eval per lane
    (~0.3% of the loop's flops). Callers use it to rank restarts BEFORE
    the f32-LM pass, so the LM ranking kernel can run on a top-m subset
    of lanes instead of all of them (opt/gauss_newton.make_solver top_m).
    """
    Gs = np.asarray(Gs, dtype=complex)
    k = Gs.shape[0]
    n_params = 6 * (k + 1)
    tb = sublanes * LANES
    # per-iteration Adam schedule, precomputed host-side (Mosaic has no
    # scalar transcendentals): [1/bias1, 1/bias2, lr] per iteration,
    # matching gauss_newton.adam_one's update exactly
    it = np.arange(adam_iters, dtype=np.float64)
    sched_np = np.stack(
        [
            1.0 / (1.0 - 0.9 ** (it + 1.0)),
            1.0 / (1.0 - 0.999 ** (it + 1.0)),
            adam_lr * 0.5 ** (it / (adam_iters / 3.0)),
        ],
        axis=1,
    ).astype(np.float32)

    def kernel(sched_ref, x_ref, t_ref, o_ref, *maybe_f_ref):
        T = [
            [(t_ref[4 * i + j], t_ref[16 + 4 * i + j]) for j in range(4)]
            for i in range(4)
        ]

        def cost_lane(xs):
            x = [xs[p] for p in range(n_params)]
            U = _chain(x, Gs, k)
            # tr(T^dag U) summed entrywise; square cost per lane
            tr_re = jnp.zeros_like(xs[0])
            tr_im = jnp.zeros_like(xs[0])
            for i in range(4):
                for j in range(4):
                    tre, tim = T[i][j]
                    ure, uim = U[i][j]
                    tr_re = tr_re + tre * ure + tim * uim
                    tr_im = tr_im + tre * uim - tim * ure
            return 1.0 - (tr_re * tr_re + tr_im * tr_im + 4.0) / 20.0

        def cost_sum(xs):
            return jnp.sum(cost_lane(xs))

        g_fn = jax.grad(cost_sum)

        def body(i, carry):
            x, m, v = carry
            g = g_fn(x)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * (g * g)
            mhat = m * sched_ref[i, 0]
            vhat = v * sched_ref[i, 1]
            x = x - sched_ref[i, 2] * mhat / (jnp.sqrt(vhat) + 1e-8)
            return (x, m, v)

        x0 = x_ref[:]
        x, _, _ = jax.lax.fori_loop(
            jnp.int32(0),
            jnp.int32(adam_iters),
            body,
            (x0, jnp.zeros_like(x0), jnp.zeros_like(x0)),
        )
        o_ref[:] = x
        if with_cost:
            maybe_f_ref[0][:] = cost_lane(x)

    out_shape = jax.ShapeDtypeStruct((n_params, sublanes, LANES), jnp.float32)
    if with_cost:
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((sublanes, LANES), jnp.float32),
        )
    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=jax.tree_util.tree_map(
            lambda _: pl.BlockSpec(memory_space=pltpu.VMEM), out_shape
        ),
        out_shape=out_shape,
        interpret=interpret,
    )
    sched = jnp.asarray(sched_np)

    @jax.jit
    def run(x0, tgt_re, tgt_im):
        L = x0.shape[0]
        nt = -(-L // tb)
        pad = nt * tb - L

        def tile(a, feat):  # (L, feat) -> (nt, feat, sublanes, 128)
            a = jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            return a.reshape(nt, sublanes, LANES, feat).transpose(0, 3, 1, 2)

        xt = tile(x0.astype(jnp.float32), n_params)
        tflat = jnp.concatenate(
            [
                tgt_re.astype(jnp.float32).reshape(L, 16),
                tgt_im.astype(jnp.float32).reshape(L, 16),
            ],
            axis=1,
        )
        tt = tile(tflat, 32)
        out = jax.lax.map(lambda a: call(sched, a[0], a[1]), (xt, tt))
        if with_cost:
            xs, fs = out
            xs = xs.transpose(0, 2, 3, 1).reshape(nt * tb, n_params)[:L]
            return xs, fs.reshape(nt * tb)[:L]
        return out.transpose(0, 2, 3, 1).reshape(nt * tb, n_params)[:L]

    return run
