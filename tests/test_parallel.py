"""Mesh-sharding tests: the (dp, rp) mesh path exercised on the 8 virtual
CPU devices provisioned by conftest.py.

The reference is single-process (SURVEY.md §2.5) — this axis is this
framework's own value-add, so it is proven here: the sharded solve must
produce the same result as the unsharded solver on identical inputs, and
outputs must actually carry dp shardings.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
from slam_decomposition_tpu.opt.gauss_newton import make_solver
from slam_decomposition_tpu.opt.samplers import haar_sample
from slam_decomposition_tpu.ops import cplx
from slam_decomposition_tpu.parallel.mesh import (
    make_mesh,
    sharded_solver_smap,
    pad_to_multiple,
    sharded_solver,
)


def test_make_mesh_shape():
    mesh = make_mesh(8, rp=2)
    assert mesh.shape == {"dp": 4, "rp": 2}
    assert mesh.axis_names == ("dp", "rp")


def test_make_mesh_rejects_bad_rp():
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(8, rp=3)


def test_make_mesh_rejects_too_many_devices():
    with pytest.raises(RuntimeError, match="requested 64 devices"):
        make_mesh(64, rp=2)


def test_pad_to_multiple_roundtrip():
    arr = np.arange(10 * 3, dtype=np.float64).reshape(10, 3)
    padded, orig = pad_to_multiple(arr, 8, axis=0)
    assert padded.shape == (16, 3)
    assert orig == 10
    np.testing.assert_array_equal(padded[:orig], arr)
    # already aligned: no copy semantics change
    padded2, orig2 = pad_to_multiple(arr[:8], 8, axis=0)
    assert padded2.shape == (8, 3) and orig2 == 8


def test_sharded_solver_matches_unsharded():
    """The dp x rp sharded solve must agree with the single-device solver
    on identical inputs (same program; XLA inserts the collectives)."""
    mesh = make_mesh(8, rp=2)
    ansatz = build_ansatz(cycle_gates([gates.SQISWAP], 2))
    B, R = 8, 4  # dp=4 -> 2 targets/device; rp=2 -> 2 restarts/device
    targets = cplx.from_numpy(haar_sample(B, seed=7))
    x0s = jnp.asarray(
        np.random.default_rng(7).uniform(0, 2 * np.pi, (B, R, ansatz.n_params))
    )

    solver = sharded_solver(ansatz, mesh, adam_iters=40, lm_iters=4)
    bx_sh, bf_sh = solver(x0s, targets)

    plain = make_solver(
        ansatz.eval_fn, ansatz.n_params, adam_iters=40, lm_iters=4
    )
    bx_ref, bf_ref = jax.jit(plain)(x0s, targets)

    assert bx_sh.shape == (B, ansatz.n_params)
    assert bf_sh.shape == (B,)
    np.testing.assert_allclose(np.asarray(bf_sh), np.asarray(bf_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(bx_sh), np.asarray(bx_ref), atol=1e-6)


def test_sharded_solver_output_sharding():
    """Outputs must be dp-sharded (not replicated): each device holds its
    own slice of the target batch."""
    mesh = make_mesh(8, rp=2)
    ansatz = build_ansatz(cycle_gates([gates.SQISWAP], 2))
    B, R = 8, 2
    targets = cplx.from_numpy(haar_sample(B, seed=3))
    x0s = jnp.asarray(
        np.random.default_rng(3).uniform(0, 2 * np.pi, (B, R, ansatz.n_params))
    )
    solver = sharded_solver(ansatz, mesh, adam_iters=3, lm_iters=1)
    bx, bf = solver(x0s, targets)
    assert bx.sharding.is_equivalent_to(
        NamedSharding(mesh, P("dp", None)), ndim=bx.ndim
    )
    assert bf.sharding.is_equivalent_to(
        NamedSharding(mesh, P("dp")), ndim=bf.ndim
    )
    # the argmin over restarts contracted 'rp': one row per target remains
    assert int(np.asarray(bf.sharding.shard_shape(bf.shape))[0]) == B // 4


def test_sharded_solver_smap_matches_unsharded():
    """The shard_map variant (explicit rp all_gather; the form that hosts
    the Pallas kernels per-device on real pods) must agree with the
    unsharded pipeline at identical hyperparameters."""
    mesh = make_mesh(8, rp=2)
    ansatz = build_ansatz(cycle_gates([gates.SQISWAP], 2))
    B, R = 8, 4
    targets = cplx.from_numpy(haar_sample(B, seed=11))
    x0s = jnp.asarray(
        np.random.default_rng(11).uniform(0, 2 * np.pi, (B, R, ansatz.n_params))
    )
    solver = sharded_solver_smap(
        ansatz, mesh, adam_iters=40, lm_iters=4, lm32_iters=4
    )
    bx, bf = solver(x0s, targets)
    plain = make_solver(
        ansatz.eval_fn, ansatz.n_params, adam_iters=40, lm_iters=4,
        lm32_iters=4,
    )
    bx_ref, bf_ref = jax.jit(plain)(x0s, targets)
    assert bx.shape == (B, ansatz.n_params)
    np.testing.assert_allclose(np.asarray(bf), np.asarray(bf_ref), atol=1e-9)


def test_sharded_ks_matches_host_ranges():
    """The mesh-sharded ranges stage (coords + membership over dp x rp)
    agrees exactly with the host fallback — the last unsharded piece of
    the bench pipeline."""
    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        monodromy_ranges_batch,
    )
    from slam_decomposition_tpu.parallel.mesh import sharded_ks

    mesh = make_mesh(8, rp=2)
    coverage = gate_set_to_coverage(gates.cg_sqiswap())
    B = 16  # divisible by the 8 devices
    targets = haar_sample(B, seed=21)
    degenerate = np.stack(
        [np.eye(4), gates.SWAP.to_numpy(), gates.CNOT.to_numpy(),
         gates.SQISWAP.to_numpy()]
    )
    targets[:4] = degenerate
    T = cplx.from_numpy(targets)
    ks = sharded_ks(coverage, mesh)(T[0], T[1])
    ks_ref = np.array([k for k, _ in monodromy_ranges_batch(coverage, targets)])
    np.testing.assert_array_equal(ks, ks_ref)
