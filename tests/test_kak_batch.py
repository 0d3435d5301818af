"""Batched analytic sqrt(iSwap) synthesis (ops/kak_batch.py).

The on-device branch-free transcription of transpile/kak.py must put every
target inside the polish kernel's convergence basin (square cost < 1e-4;
in practice orders of magnitude better), including the degenerate zoo the
host path special-cases. End-to-end: make_analytic_solver certifies below
the reference's 1e-10 success threshold (optimizer.py:18) with NO Adam and
NO restarts.
"""

import numpy as np
import jax
import jax.numpy as jnp

from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
from slam_decomposition_tpu.opt.gauss_newton import make_analytic_solver
from slam_decomposition_tpu.opt.samplers import haar_sample
from slam_decomposition_tpu.ops import cplx
from slam_decomposition_tpu.ops.kak_batch import make_analytic_init
from slam_decomposition_tpu.transpile import kak as hkak


def _square_cost(ansatz, x, tp):
    V = jax.vmap(ansatz.eval_fn)(jnp.asarray(x, jnp.float64))
    tr = cplx.trace(cplx.matmul(cplx.dagger(tp), V))
    return np.asarray(1.0 - (cplx.abs2(tr) + 4.0) / 20.0)


def test_ansatz_gate_is_canonical_sqiswap():
    # the mapping from kak.py steps to build_ansatz params assumes the
    # template's 2Q constant IS CAN(pi/8, pi/8, 0) exactly
    np.testing.assert_allclose(
        gates.SQISWAP.to_numpy(), hkak.SQISWAP_M, atol=1e-15
    )


def _route_by_host_kak(U):
    ks = []
    for i in range(U.shape[0]):
        f = hkak.kak_form(U[i])
        ks.append(2 if hkak._in_2region(f.t) else 3)
    return np.array(ks)


def test_analytic_init_lands_in_polish_basin_haar():
    B = 96
    U = haar_sample(B, seed=21)
    ks = _route_by_host_kak(U)
    for k in (2, 3):
        idx = np.where(ks == k)[0]
        a = build_ansatz(cycle_gates([gates.SQISWAP], k))
        tp = cplx.from_numpy(U[idx])
        x = np.asarray(make_analytic_init(k)(tp[0], tp[1]))
        assert x.shape == (len(idx), 6 * (k + 1))
        cost = _square_cost(a, x, tp)
        # f32 synthesis: typically ~1e-9; the basin bound is what matters
        assert np.median(cost) < 1e-7
        assert (cost < 1e-4).mean() == 1.0, cost.max()


def test_analytic_init_degenerate_zoo():
    zoo2 = np.stack(
        [
            np.eye(4, dtype=complex),  # identity class
            hkak.SQISWAP_M,  # the basis gate itself
            np.kron(hkak._rz(0.3), hkak._rx(1.1)),  # pure local
            hkak.can_matrix(0.2, 0.2, 0.0),  # z = 0 boundary branch
            hkak.can_matrix(np.pi / 4, 0.1, 0.1),  # x = pi/4 wall
            hkak.can_matrix(0.3, 0.15, 0.15),  # |z| = x - y double root
            hkak.can_matrix(0.3, 0.15, -0.15),  # negative-z mirror
            hkak.can_matrix(np.pi / 4, np.pi / 4, 0.0),  # iSwap class corner
        ]
    )
    a2 = build_ansatz(cycle_gates([gates.SQISWAP], 2))
    tp = cplx.from_numpy(zoo2)
    x = np.asarray(make_analytic_init(2)(tp[0], tp[1]))
    cost = _square_cost(a2, x, tp)
    assert (cost < 1e-4).all(), cost

    zoo3 = np.stack(
        [
            hkak.can_matrix(np.pi / 4, np.pi / 4, np.pi / 4),  # SWAP class
            hkak.can_matrix(0.5, 0.4, 0.3),
            hkak.can_matrix(np.pi / 4, np.pi / 8, np.pi / 8),  # B-gate class
        ]
    )
    a3 = build_ansatz(cycle_gates([gates.SQISWAP], 3))
    tp3 = cplx.from_numpy(zoo3)
    x3 = np.asarray(make_analytic_init(3)(tp3[0], tp3[1]))
    cost3 = _square_cost(a3, x3, tp3)
    assert (cost3 < 1e-4).all(), cost3


def test_analytic_solver_certifies_without_restarts():
    B = 12
    U = haar_sample(B, seed=5)
    ks = _route_by_host_kak(U)
    for k in (2, 3):
        idx = np.where(ks == k)[0]
        if len(idx) == 0:
            continue
        a = build_ansatz(cycle_gates([gates.SQISWAP], k))
        solver = jax.jit(
            make_analytic_solver(
                a.eval_fn, a.n_params, k, chain_gates=a.chain_gates
            )
        )
        tp = cplx.from_numpy(U[idx])
        x, bf = solver(tp)
        bf = np.asarray(bf)
        assert bf.max() < 1e-10, bf
