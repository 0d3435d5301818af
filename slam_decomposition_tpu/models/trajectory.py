"""Cartan trajectories of parallel-driven gates (pd_playground analog).

Reference: src/slam/utils/pd_playground.py — sweep partial evolution times
of a smush pulse and watch the Weyl-chamber trajectory
(iterate_time, :179-208). The reference re-built and re-evaluated a qiskit
circuit per timestep; here the whole trajectory is ONE device program:
``lax.associative_scan`` over the slice unitaries yields every prefix
product in O(log N) depth (SURVEY.md §5.7 — this domain's sequence-scaling
story), then one batched c1c2c3 call maps it to coordinates.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from slam_decomposition_tpu.models import hamiltonians as ham
from slam_decomposition_tpu.ops import cplx, weyl
from slam_decomposition_tpu.ops.expm import expm_taylor


def smush_prefix_unitaries(
    phi_c, phi_g, gc, gg, gx_vec, gy_vec, t=1.0, dts=None, dtype=jnp.float64
) -> cplx.CMat:
    """All prefix products U_1..k of the Trotter slices, k = 1..N, shape
    (N, 4, 4) pair — associative scan, not a serial loop.

    ``dts`` optionally gives per-slice durations (the reference's
    prepare_parameters_nonuniform role, pd_playground.py:140-167); default
    is uniform t/N."""
    gx_vec = jnp.asarray(gx_vec, dtype=dtype)
    gy_vec = jnp.asarray(gy_vec, dtype=dtype)
    n = gx_vec.shape[-1]
    if dts is None:
        dts = jnp.full((n,), jnp.asarray(t, dtype=dtype) / n, dtype=dtype)
    else:
        dts = jnp.asarray(dts, dtype=dtype)

    def slice_u(gx, gy, dt):
        H = ham.smush_h(phi_c, phi_g, gc, gg, gx, gy, dtype=dtype)
        return expm_taylor((H[1] * dt, -H[0] * dt))

    Us = jax.vmap(slice_u)(gx_vec, gy_vec, dts)  # (N,4,4) pair

    def combine(a, b):
        # prefix convention: later slice multiplies from the left
        return cplx.matmul(b, a)

    return jax.lax.associative_scan(combine, Us)


def smush_trajectory(
    phi_c, phi_g, gc, gg, gx_vec, gy_vec, t=1.0
) -> np.ndarray:
    """Weyl-coordinate trajectory (N, 3) of the pulse's partial evolutions
    (pd_playground.iterate_time, :179-208)."""
    Us = smush_prefix_unitaries(phi_c, phi_g, gc, gg, gx_vec, gy_vec, t)
    return np.asarray(weyl.c1c2c3(Us))


def drive_pulse_for_target(
    target_u: np.ndarray,
    gc: float,
    gg: float,
    t: float = 1.0,
    n_slices: int = 4,
    seed: int = 0,
    restarts: int = 8,
    threshold: float = 1e-10,
):
    """Solve for piecewise-constant 1Q drives realizing a target with ONE
    parallel-driven application (no exterior 1Q gates): the construction
    behind the reference's hardcoded ImprovedCX / ImprovedSWAP pulses
    (pd_playground.py:247-339), computed on demand instead of hardcoded.

    Returns (params, loss): params = [phi_c, phi_g, gx..., gy...].
    """
    from slam_decomposition_tpu.opt.gauss_newton import make_solver

    n_params = 2 + 2 * n_slices

    def eval_fn(x):
        return ham.smush_u(
            x[0], x[1], gc, gg, x[2 : 2 + n_slices], x[2 + n_slices :], t=t
        )

    solver = jax.jit(make_solver(eval_fn, n_params, adam_iters=400, lm_iters=12))
    tgt = cplx.from_numpy(np.asarray(target_u)[None])
    key = jax.random.PRNGKey(seed)
    x0 = jax.random.uniform(
        key, (1, restarts, n_params), dtype=jnp.float64,
        minval=-4 * np.pi, maxval=4 * np.pi,
    )
    bx, bf = solver(x0, tgt)
    return np.asarray(bx[0]), float(bf[0])


def improved_cx(gc=np.pi / 2, gg=0.0, t=1.0, n_slices=4, **kw):
    """Parallel-driven CX realization on an iSwap-strength coupler
    (ImprovedCX, pd_playground.py:247-286)."""
    from slam_decomposition_tpu.models.gates import CNOT

    return drive_pulse_for_target(CNOT.to_numpy(), gc, gg, t, n_slices, **kw)


def improved_swap(gc=np.pi / 2, gg=0.0, t=1.5, n_slices=6, **kw):
    """Parallel-driven SWAP realization (ImprovedSWAP,
    pd_playground.py:289-339)."""
    from slam_decomposition_tpu.models.gates import SWAP

    return drive_pulse_for_target(SWAP.to_numpy(), gc, gg, t, n_slices, **kw)
