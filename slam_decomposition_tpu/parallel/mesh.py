"""Mesh sharding for batched synthesis.

The reference is single-process/single-thread (SURVEY.md §2.5) — every axis
here is new capability. The natural decomposition of this domain is
embarrassingly parallel, so the sharding story is:

  * 'dp' axis: target batch (data parallel across ICI)
  * 'rp' axis: optimizer restarts (reduction axis — best-of-restarts needs
    an argmin across 'rp', which XLA lowers to an all-gather over ICI)

``solve_sharded`` jits the multi-start L-BFGS step over a Mesh with
NamedSharding constraints; XLA inserts the collectives. Used by
__graft_entry__.dryrun_multichip and by bench sweeps on real pods.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_decomposition_tpu.models.templates import Ansatz


def make_mesh(n_devices: Optional[int] = None, rp: int = 1) -> Mesh:
    """Mesh with ('dp', 'rp') axes over the first n devices.

    Raises instead of silently truncating when fewer than ``n_devices``
    devices are visible — on this platform the backend may be pinned to a
    single-chip TPU plugin; tests/conftest.py shows how to force N virtual
    CPU devices for mesh work without hardware.
    """
    all_devs = jax.devices()
    n = n_devices or len(all_devs)
    if len(all_devs) < n:
        raise RuntimeError(
            f"make_mesh: requested {n} devices but only {len(all_devs)} "
            f"visible (platform="
            f"{all_devs[0].platform if all_devs else 'none'}). For a "
            "virtual mesh, set XLA_FLAGS=--xla_force_host_platform_device_"
            "count=N and select the CPU platform before first jax use."
        )
    if n % rp != 0:
        raise ValueError(f"make_mesh: n_devices={n} not divisible by rp={rp}")
    arr = np.array(all_devs[:n]).reshape(n // rp, rp)
    return Mesh(arr, ("dp", "rp"))


def sharded_solver(
    ansatz: Ansatz,
    mesh: Mesh,
    adam_iters: int = 250,
    lm_iters: int = 10,
):
    """Build a jitted sharded solve: (x0s (B,R,n), tgt pair (B,4,4)) ->
    (best_x (B,n), best_f (B,)).

    Targets are sharded over 'dp'; restarts over 'rp'; outputs are
    dp-sharded (the argmin over restarts contracts the 'rp' axis, for which
    XLA emits the cross-device gather over ICI). Uses the scan-based
    Adam+LM solver (opt/gauss_newton.py) — the TPU-fast path.
    """
    from slam_decomposition_tpu.opt.gauss_newton import make_solver

    solve = make_solver(
        ansatz.eval_fn, ansatz.n_params, adam_iters=adam_iters, lm_iters=lm_iters
    )

    x_sharding = NamedSharding(mesh, P("dp", "rp", None))
    t_sharding = (
        NamedSharding(mesh, P("dp", None, None)),
        NamedSharding(mesh, P("dp", None, None)),
    )
    out_sharding = (
        NamedSharding(mesh, P("dp", None)),
        NamedSharding(mesh, P("dp")),
    )
    return jax.jit(
        solve, in_shardings=(x_sharding, t_sharding), out_shardings=out_sharding
    )


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad batch to a device-count multiple (static shapes for pjit)."""
    b = arr.shape[axis]
    rem = (-b) % multiple
    if rem == 0:
        return arr, b
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, rem)
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(0, 1)
    filler = np.repeat(arr[tuple(idx)], rem, axis=axis)
    return np.concatenate([arr, filler], axis=axis), b
