"""Golden tests for Weyl/Makhlin invariants against analytically known gates
and random-local-equivalence consistency (replaces the weylchamber package's
behavior; values cross-checked with reference usage, e.g. optimizer.py:85)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import unitary_group

from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.ops import cplx, weyl


def _c(U):
    return np.asarray(weyl.c1c2c3(cplx.from_numpy(U)))


def _rand_local(rng):
    u = unitary_group.rvs(2, random_state=rng)
    v = unitary_group.rvs(2, random_state=rng)
    return np.kron(u, v)


KNOWN = [
    ("cx", gates.CNOT.to_numpy(), (0.5, 0, 0)),
    ("iswap", gates.ISWAP.to_numpy(), (0.5, 0.5, 0)),
    ("swap", gates.SWAP.to_numpy(), (0.5, 0.5, 0.5)),
    ("B", gates.berkeley().to_numpy(), (0.5, 0.25, 0)),
    ("sqiswap", gates.SQISWAP.to_numpy(), (0.25, 0.25, 0)),
    ("id", np.eye(4), (0, 0, 0)),
    ("cz", gates.CZ.to_numpy(), (0.5, 0, 0)),
]


@pytest.mark.parametrize("name,U,expect", KNOWN, ids=[k[0] for k in KNOWN])
def test_known_coordinates(name, U, expect):
    np.testing.assert_allclose(_c(U), expect, atol=1e-9)


def test_local_invariance():
    rng = np.random.default_rng(7)
    U = gates.berkeley().to_numpy()
    c0 = _c(U)
    for _ in range(5):
        V = _rand_local(rng) @ U @ _rand_local(rng)
        np.testing.assert_allclose(_c(V), c0, atol=1e-8)


def test_canonical_roundtrip_interior():
    """Random chamber points (incl. c1 > 1/2 interior) survive the full
    CAN -> c1c2c3 roundtrip, also when dressed with random locals."""
    rng = np.random.default_rng(3)
    pts = []
    while len(pts) < 20:
        c = np.sort(rng.uniform(0, 1, 3))[::-1]
        if c[0] + c[1] < 0.98 and c[2] > 0.02 and c[0] - c[1] > 0.02 and c[1] - c[2] > 0.02:
            pts.append(c)
    pts = np.array(pts)
    CANs = weyl.canonical_gate(jnp.asarray(pts))
    got = np.asarray(weyl.c1c2c3(CANs))
    np.testing.assert_allclose(got, pts, atol=1e-8)
    # dress one with locals
    U = cplx.to_numpy((CANs[0][3], CANs[1][3]))
    V = _rand_local(rng) @ U @ _rand_local(rng)
    np.testing.assert_allclose(_c(V), pts[3], atol=1e-8)


def test_makhlin_known():
    vals = {
        "id": (np.eye(4), (1, 0, 3)),
        "cx": (gates.CNOT.to_numpy(), (0, 0, 1)),
        "iswap": (gates.ISWAP.to_numpy(), (0, 0, -1)),
        "swap": (gates.SWAP.to_numpy(), (-1, 0, -3)),
    }
    for name, (U, expect) in vals.items():
        g = np.asarray(weyl.g1g2g3(cplx.from_numpy(U)))
        np.testing.assert_allclose(g, expect, atol=1e-9, err_msg=name)


def test_makhlin_local_invariance():
    rng = np.random.default_rng(11)
    U = unitary_group.rvs(4, random_state=rng)
    g0 = np.asarray(weyl.g1g2g3(cplx.from_numpy(U)))
    V = _rand_local(rng) @ U @ _rand_local(rng)
    np.testing.assert_allclose(
        np.asarray(weyl.g1g2g3(cplx.from_numpy(V))), g0, atol=1e-8
    )


def test_monodromy_coords_cnot():
    a = np.asarray(weyl.monodromy_coords(cplx.from_numpy(gates.CNOT.to_numpy())))
    # one representative must be (1/4,1/4,-1/4,-1/4)
    target = np.array([0.25, 0.25, -0.25, -0.25])
    assert any(np.allclose(a[i], target, atol=1e-9) for i in range(2)), a


def test_monodromy_alcove_validity():
    rng = np.random.default_rng(5)
    U = unitary_group.rvs(4, random_state=rng)
    a = np.asarray(weyl.monodromy_coords(cplx.from_numpy(U)))
    for rep in a:
        assert np.all(np.diff(rep) <= 1e-12)
        assert abs(rep.sum()) < 1e-9
        assert rep[0] - rep[3] <= 1 + 1e-12


def test_batched_and_jitted():
    rng = np.random.default_rng(9)
    Us = np.stack([unitary_group.rvs(4, random_state=rng) for _ in range(8)])
    pair = cplx.from_numpy(Us)
    f = jax.jit(weyl.c1c2c3)
    batched = np.asarray(f(pair))
    for i in range(8):
        np.testing.assert_allclose(batched[i], _c(Us[i]), atol=1e-9)
