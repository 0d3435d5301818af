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

import functools
from typing import List, Tuple

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


def make_adam_chain(
    Gs: np.ndarray,
    adam_iters: int = 100,
    adam_lr: float = 0.1,
    interpret: bool = False,
    sublanes: int = SUBLANES,
):
    """Build run(x0 (L, 6k+6) f32, tgt pair of (L, 4, 4) f32) -> x (L, 6k+6).

    ``Gs``: (k, 4, 4) complex numpy constants of the per-cycle 2Q gates.
    Lanes are padded to a multiple of sublanes*128; the pad lanes re-run
    lane 0 (harmless).
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

    def kernel(sched_ref, x_ref, t_ref, o_ref):
        T = [
            [(t_ref[4 * i + j], t_ref[16 + 4 * i + j]) for j in range(4)]
            for i in range(4)
        ]

        def cost_sum(xs):
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
            cost = 1.0 - (tr_re * tr_re + tr_im * tr_im + 4.0) / 20.0
            return jnp.sum(cost)

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

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_params, sublanes, LANES), jnp.float32),
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
        return out.transpose(0, 2, 3, 1).reshape(nt * tb, n_params)[:L]

    return run
