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


def sharded_ks(coverage, mesh: Mesh):
    """Mesh-sharded k-assignment: the bench pipeline's ranges stage
    (coverage.monodromy_ks_batch) over every device of the mesh.

    The target batch shards across BOTH mesh axes (k-assignment has no
    restart dimension, so 'rp' devices would otherwise idle); coordinates
    + halfspace membership run device-local with zero collectives — the
    axis is embarrassingly parallel. Returns ``ks_fn(T0, T1) -> int32 ks``
    taking a device or host (B, 4, 4) pair, B divisible by the device
    count (see :func:`pad_to_multiple`).

    Completes the multi-chip pipeline story: ranges (here) + solve
    (:func:`sharded_solver` / :func:`sharded_solver_smap`) are both
    sharded; __graft_entry__.dryrun_multichip runs both per driver round.
    """
    from slam_decomposition_tpu.coverage.coverage import make_ks_assign_fn

    _, assign_fn, ks_of_layer = make_ks_assign_fn(coverage)
    shard = NamedSharding(mesh, P(("dp", "rp"), None, None))
    out = NamedSharding(mesh, P(("dp", "rp")))
    # two-tier precision, same as monodromy_ks_batch: the all-f32 tier
    # (5x cheaper per target than the f64-emulated eigensolve) runs
    # sharded over the whole mesh; band-unsafe targets (~0.3% of Haar)
    # escalate to the mixed-precision kernel on one device — the
    # escalation set is far too small to amortize a collective gather
    fn32 = jax.jit(
        assign_fn.f32, in_shardings=(shard, shard), out_shardings=(out, out)
    )
    fn_mixed = jax.jit(assign_fn)
    ESC_PAD = 256  # fixed escalation shape: one compile, reused

    def ks_fn(T0, T1) -> np.ndarray:
        d_idx, d_unsafe = jax.device_get(fn32(T0, T1))
        idx = np.array(d_idx)  # writable copy: escalation writes in place
        unsafe = np.asarray(d_unsafe)
        esc = np.where(unsafe)[0]
        if len(esc):
            # gather escalated lanes ON DEVICE (jnp.take): a host
            # materialization of the full batch would ship ~50 MB over the
            # ~18 MB/s tunnel at B=100k for a ~0.3% escalation set
            for s in range(0, len(esc), ESC_PAD):
                part = esc[s : s + ESC_PAD]
                sel = jnp.asarray(
                    np.concatenate(
                        [part, np.repeat(part[:1], ESC_PAD - len(part))]
                    )
                )
                e0 = jnp.take(jnp.asarray(T0), sel, axis=0)
                e1 = jnp.take(jnp.asarray(T1), sel, axis=0)
                idx[part] = np.asarray(fn_mixed(e0, e1))[: len(part)]
        if (idx == -2).any():
            raise ValueError("no coverage polytope contains some targets")
        return np.where(idx < 0, 0, ks_of_layer[np.maximum(idx, 0)])

    return ks_fn


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


def sharded_solver_smap(
    ansatz: Ansatz,
    mesh: Mesh,
    adam_iters: int = 250,
    lm_iters: int = 10,
    lm32_iters: int = 8,
    chain_gates=None,
    certify: str = "f64",
):
    """shard_map variant of :func:`sharded_solver` with explicit
    collectives — the form that runs the fused Pallas kernels per-device on
    real pods (a pallas_call inside plain GSPMD-jit has no partitioning
    rule; under shard_map it sees local shapes and needs none).

    Layout: targets over 'dp', restarts over 'rp'. Each device runs the
    full local pipeline (Adam + f32 LM + local restart ranking) on its
    (B/dp, R/rp) shard; the global best-of-restarts crosses 'rp' with one
    all_gather of (params, loss) per target row; the winner's polish is
    computed redundantly on the rp ranks (cheap, keeps the result
    replicated exactly as the out_spec requires).

    Pass ``chain_gates=ansatz.chain_gates`` to engage the Pallas kernels
    on TPU backends; on CPU meshes the same code rides the XLA path.
    """
    from slam_decomposition_tpu.opt.gauss_newton import make_solver

    dp = mesh.shape["dp"]
    rp = mesh.shape["rp"]
    # local pipeline without the final polish (lm_iters=0): returns the
    # best over LOCAL restarts
    local_solve = make_solver(
        ansatz.eval_fn,
        ansatz.n_params,
        adam_iters=adam_iters,
        lm32_iters=lm32_iters,
        lm_iters=0,
        chain_gates=chain_gates,
    )
    polisher = make_solver(
        ansatz.eval_fn,
        ansatz.n_params,
        adam_iters=0,
        lm32_iters=0,
        lm_iters=lm_iters,
        chain_gates=chain_gates,
        certify=certify,
    )

    def local(x0s, t0, t1):
        xs, bf = local_solve(x0s, (t0, t1))  # (Bl, n), (Bl,)
        xs_all = jax.lax.all_gather(xs, "rp")  # (rp, Bl, n)
        bf_all = jax.lax.all_gather(bf, "rp")
        best = jnp.argmin(bf_all, axis=0)
        xw = jnp.take_along_axis(xs_all, best[None, :, None], axis=0)[0]
        # polish + certification in one pass — identical certification
        # semantics to the plain solver (df64 in-kernel when certify=
        # "df64" and the Pallas kernels are engaged; true-f64 otherwise)
        xw, bfw = polisher.polish_cert(xw, (t0, t1))
        return xw, bfw

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp", "rp", None), P("dp", None, None), P("dp", None, None)),
        out_specs=(P("dp", None), P("dp")),
        check_vma=False,
    )

    def solve(x0s, tgt):
        return fn(x0s, tgt[0], tgt[1])

    return jax.jit(solve)
