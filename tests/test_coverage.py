"""Coverage-engine golden tests against the reference's published numbers
(BASELINE.md): basis applications for full Weyl-chamber coverage, target
ranges, Haar volumes, and cross-checks against the variational optimizer.
"""

import numpy as np
import pytest

from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.coverage.coverage import (
    gate_set_to_coverage,
    monodromy_range_from_target,
    gate_monodromy_reps,
)
from slam_decomposition_tpu.coverage.haar import expected_cost, normalized_volume
from slam_decomposition_tpu.coverage.qlr import qlr_inequalities


def _cov(gate):
    return gate_set_to_coverage(gate, use_cache=False)


@pytest.fixture(scope="module")
def sqiswap_cov():
    return _cov(gates.cg_sqiswap())


def test_qlr_table_size():
    assert len(qlr_inequalities()) == 72


def test_sqiswap_layers_and_volumes(sqiswap_cov):
    cov = sqiswap_cov
    assert len(cov) == 4  # identity + k=1..3 (full coverage at 3)
    assert abs(normalized_volume(cov[2].polytope) - 0.7901) < 5e-4
    assert abs(normalized_volume(cov[3].polytope) - 1.0) < 1e-6
    assert abs(expected_cost(cov) - 2.2099) < 1e-3


def test_sqiswap_ranges(sqiswap_cov):
    cov = sqiswap_cov
    k_cnot, _ = monodromy_range_from_target(cov, gates.CNOT.to_numpy())
    k_swap, _ = monodromy_range_from_target(cov, gates.SWAP.to_numpy())
    k_b, _ = monodromy_range_from_target(cov, gates.berkeley().to_numpy())
    k_id, _ = monodromy_range_from_target(cov, np.eye(4))
    assert (k_cnot, k_swap, k_b, k_id) == (2, 3, 2, 0)


@pytest.mark.parametrize(
    "gate_fn,expected_k",
    [
        (gates.cg_iswap, 3),
        (gates.cg_cnot, 3),
        (gates.cg_b, 2),
    ],
    ids=["iswap", "cnot", "b"],
)
def test_full_coverage_counts(gate_fn, expected_k):
    """Basis applications for full chamber coverage (BASELINE.md row 2)."""
    cov = _cov(gate_fn())
    assert len(cov) - 1 == expected_k
    assert abs(normalized_volume(cov[-1].polytope) - 1.0) < 1e-6


def test_monodromy_reps_match_reference_format():
    """Reference stores sqiswap's k=1 reps as (1/4,0,0) and (1/2,1/4,-1/4)
    (observed in its shipped coverage pickles)."""
    from fractions import Fraction as F

    reps = gate_monodromy_reps(gates.SQISWAP)
    assert (F(1, 4), F(0), F(0)) in reps
    assert (F(1, 2), F(1, 4), F(-1, 4)) in reps


def test_optimizer_agrees_with_monodromy(sqiswap_cov):
    """The three routes to k must agree: polytope range == variational k
    (SURVEY.md §4 cross-check)."""
    from slam_decomposition_tpu.models.templates import build_ansatz, cycle_gates
    from slam_decomposition_tpu.opt.optimizer import TemplateOptimizer
    from slam_decomposition_tpu.opt.samplers import haar_sample

    targets = haar_sample(4, seed=11)
    ks = [monodromy_range_from_target(sqiswap_cov, t)[0] for t in targets]
    opt = TemplateOptimizer(
        lambda k: build_ansatz(cycle_gates([gates.SQISWAP], k)),
        spanning_range=[2, 3],
        training_restarts=10,
        override_fail=True,
        max_iters=300,
    )
    res = opt.approximate_from_distribution(targets)
    assert res.success.all()
    np.testing.assert_array_equal(res.cycles, ks)


def test_union_covers_exact_gap_detection():
    """Region-subtraction completeness: a 0.5%-wide uncovered slab must be
    detected (the old sampled check could silently miss it and cache a
    truncated coverage set), while boundary-touching unions and
    measure-zero gaps count as covered (volume-saturation semantics of the
    reference stack's completeness criterion)."""
    from fractions import Fraction as F

    from slam_decomposition_tpu.coverage.coverage import _union_covers
    from slam_decomposition_tpu.coverage.polytope import ConvexPolytope, Polytope

    cube_rows = [
        [0, 1, 0, 0], [1, -1, 0, 0],
        [0, 0, 1, 0], [1, 0, -1, 0],
        [0, 0, 0, 1], [1, 0, 0, -1],
    ]
    chunk = ConvexPolytope.make(ineqs=cube_rows, name="cube")

    def slab(lo, hi):
        return ConvexPolytope.make(
            ineqs=cube_rows + [[-F(lo), 1, 0, 0], [F(hi), -1, 0, 0]],
            name=f"x[{lo},{hi}]",
        )

    # gap (0.99, 0.995): NOT covered
    assert not _union_covers(
        chunk, Polytope([slab(0, F(99, 100)), slab(F(995, 1000), 1)])
    )
    # boundary-touching halves: covered
    assert _union_covers(
        chunk, Polytope([slab(0, F(99, 100)), slab(F(99, 100), 1)])
    )
    # overlapping cover: covered
    assert _union_covers(
        chunk, Polytope([slab(0, F(6, 10)), slab(F(4, 10), 1)])
    )
    # a lower-dimensional subpolytope contributes nothing
    plane = ConvexPolytope.make(
        ineqs=cube_rows, eqs=[[-F(995, 1000), 1, 0, 0]], name="plane"
    )
    assert not _union_covers(
        chunk, Polytope([slab(0, F(99, 100)), plane])
    )
    # three-piece cover with an interior notch removed from the middle piece
    notched = ConvexPolytope.make(
        ineqs=cube_rows
        + [[-F(3, 10), 1, 0, 0], [F(7, 10), -1, 0, 0], [F(1, 2), 0, -1, 0]],
        name="mid-notched",
    )
    assert not _union_covers(chunk, Polytope([slab(0, F(3, 10)), notched, slab(F(7, 10), 1)]))


def test_monodromy_ks_batch_matches_ranges():
    """Device k-assignment API (bench hot path) agrees with the reference
    per-target ranges on generic + degenerate targets (on CPU backends it
    falls back to monodromy_ranges_batch; the TPU path was parity-checked
    on-chip over 4096 Haar targets + the degenerate zoo)."""
    import numpy as np

    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        monodromy_ks_batch,
        monodromy_ranges_batch,
    )
    from slam_decomposition_tpu.models import gates
    from slam_decomposition_tpu.opt.samplers import haar_sample

    cov = gate_set_to_coverage(gates.cg_sqiswap())
    targets = np.concatenate(
        [
            haar_sample(64, seed=5),
            np.stack([np.eye(4), gates.SWAP.to_numpy(), gates.CNOT.to_numpy()]),
        ]
    )
    ks_ref = np.array([k for k, _ in monodromy_ranges_batch(cov, targets)])
    np.testing.assert_array_equal(monodromy_ks_batch(cov, targets), ks_ref)


def test_make_ks_assign_fn_memoized():
    """Repeat calls with the same coverage return the SAME kernel objects
    (no host table rebuild, no re-upload of the layer arrays — the hot
    paths call this per invocation)."""
    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        make_ks_assign_fn,
    )
    from slam_decomposition_tpu.models import gates

    cov = gate_set_to_coverage(gates.cg_sqiswap())
    key1, fn1, ks1 = make_ks_assign_fn(cov)
    key2, fn2, ks2 = make_ks_assign_fn(cov)
    assert fn1 is fn2 and ks1 is ks2 and key1 == key2


import jax as _jax
import pytest as _pytest


@_pytest.mark.skipif(
    _jax.default_backend() != "tpu",
    reason="on-chip parity for the TPU k-assignment path (CPU backends "
    "take the monodromy_ranges_batch fallback inside monodromy_ks_batch)",
)
def test_monodromy_ks_batch_on_tpu_parity_4096():
    """TPU device path (mixed-precision coords + on-device halfspace
    membership) vs the host fallback over 4096 Haar targets + the
    degenerate zoo — the bench's k-assignment correctness, now in CI."""
    import numpy as np

    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        monodromy_ks_batch,
        monodromy_ranges_batch,
    )
    from slam_decomposition_tpu.models import gates
    from slam_decomposition_tpu.opt.samplers import haar_sample

    cov = gate_set_to_coverage(gates.cg_sqiswap())
    degenerate = np.stack(
        [
            np.eye(4),
            gates.SWAP.to_numpy(),
            gates.CNOT.to_numpy(),
            gates.ISWAP.to_numpy(),
            gates.SQISWAP.to_numpy(),
            gates.berkeley().to_numpy(),
            gates.canonical(0.5, 0.25, 0.0).to_numpy(),
            gates.canonical(0.25, 0.25, 0.25).to_numpy(),
        ]
    )
    targets = np.concatenate([haar_sample(4096 - len(degenerate), seed=9), degenerate])
    ks_dev = monodromy_ks_batch(cov, targets)  # TPU path (n >= 1024)
    ks_ref = np.array([k for k, _ in monodromy_ranges_batch(cov, targets)])
    np.testing.assert_array_equal(ks_dev, ks_ref)


@_pytest.mark.skipif(
    _jax.default_backend() != "tpu",
    reason="on-chip parity for the multi-chunk TPU dispatch (8192-chunked "
    "launches + single parallel device_get download)",
)
def test_monodromy_ks_batch_on_tpu_multichunk_parity():
    """>CHUNK batch: 3 chunks incl. a padded SMALL tail, results fetched
    in one parallel transfer — the B=100k bench dispatch shape, vs the
    host fallback. Also accepts a device-resident cplx pair (the bench's
    upload-once form)."""
    import numpy as np

    from slam_decomposition_tpu.coverage.coverage import (
        gate_set_to_coverage,
        monodromy_ks_batch,
        monodromy_ranges_batch,
    )
    from slam_decomposition_tpu.models import gates
    from slam_decomposition_tpu.ops import cplx
    from slam_decomposition_tpu.opt.samplers import haar_sample

    cov = gate_set_to_coverage(gates.cg_sqiswap())
    n = 2 * 8192 + 100  # two full chunks + SMALL-padded tail
    targets = haar_sample(n, seed=11)
    ks_np = monodromy_ks_batch(cov, targets)
    ks_pair = monodromy_ks_batch(cov, cplx.from_numpy(targets))
    ks_ref = np.array([k for k, _ in monodromy_ranges_batch(cov, targets)])
    np.testing.assert_array_equal(ks_np, ks_ref)
    np.testing.assert_array_equal(ks_pair, ks_ref)


def test_haar_closed_form_vs_cubature():
    """The exponential-sum closed form (divided-difference simplex
    integrals) agrees with independent Gauss-Legendre cubature to float
    rounding on the alcove — no quadrature truncation remains in the
    production path (round-2 VERDICT missing item 2)."""
    from slam_decomposition_tpu.coverage.coverage import EVERYTHING_POLYTOPE
    from slam_decomposition_tpu.coverage.haar import (
        convex_volume,
        convex_volume_cubature,
        _density_terms,
    )

    M, C = _density_terms()
    assert len(C) == 24  # 64 sign patterns merge into 24 frequencies
    # density is real: frequencies pair up as (m, -m) with equal coeffs
    table = {tuple(m): c for m, c in zip(M.tolist(), C.tolist())}
    for m, c in table.items():
        neg = tuple(-x for x in m)
        assert neg in table and abs(table[neg] - c) < 1e-15

    cp = EVERYTHING_POLYTOPE.convex_subpolytopes[0]
    exact = convex_volume(cp)
    cub = convex_volume_cubature(cp)
    assert exact > 0
    assert abs(exact - cub) / cub < 1e-12


def test_haar_volumes_closed_form_regression(sqiswap_cov):
    """12-digit pins of the closed-form sqiswap volumes (the published
    reference values 0.7901 / 2.2099 are the 4-digit truncations)."""
    from slam_decomposition_tpu.coverage.haar import (
        disjoint_pieces,
        normalized_volume,
    )

    cov = sqiswap_cov
    assert abs(normalized_volume(cov[2].polytope) - 0.790117363684) < 1e-12
    assert abs(normalized_volume(cov[3].polytope) - 1.0) < 1e-12
    assert abs(expected_cost(cov) - 2.209882636316) < 1e-12
    # union volumes ride a disjoint decomposition, never 2^n terms
    assert len(disjoint_pieces(cov[3].polytope)) >= 1


def test_disjoint_pieces_matches_inclusion_exclusion():
    """On a 2-subpolytope overlap, the subtraction decomposition equals
    V(A) + V(B) - V(A&B) computed independently."""
    from fractions import Fraction as F

    from slam_decomposition_tpu.coverage.coverage import EVERYTHING_POLYTOPE
    from slam_decomposition_tpu.coverage.haar import (
        convex_volume,
        disjoint_pieces,
    )
    from slam_decomposition_tpu.coverage.polytope import ConvexPolytope, Polytope

    alcove = EVERYTHING_POLYTOPE.convex_subpolytopes[0]

    def clip(lo, hi):  # alcove slab lo <= x1 <= hi
        return ConvexPolytope(
            inequalities=list(alcove.inequalities)
            + [(-F(lo), F(1), F(0), F(0)), (F(hi), F(-1), F(0), F(0))],
            name="slab",
        )

    A, B = clip(0, F(3, 10)), clip(F(2, 10), F(1, 2))
    union = sum(convex_volume(p) for p in disjoint_pieces(Polytope([A, B])))
    ie = (
        convex_volume(A)
        + convex_volume(B)
        - convex_volume(A.intersect(B))
    )
    assert abs(union - ie) < 1e-15 + 1e-12 * ie


def test_facet_fan_matches_delaunay():
    """The exact facet-fan triangulation (Qhull-failure fallback) and the
    Delaunay path integrate to the same closed-form value."""
    from slam_decomposition_tpu.coverage.coverage import EVERYTHING_POLYTOPE
    from slam_decomposition_tpu.coverage.haar import (
        _facet_fan,
        _triangulate,
        convex_volume,
        _density_terms,
        _expm_dd,
    )
    import numpy as np

    cp = EVERYTHING_POLYTOPE.convex_subpolytopes[0]

    def integrate(simplices):
        v0 = simplices[:, 0]
        edges = simplices[:, 1:] - v0[:, None, :]
        vol6 = np.abs(np.linalg.det(edges))
        M, C = _density_terms()
        z = 1j * np.pi * np.einsum("ti,svi->tsv", M, simplices)
        return abs(float(np.einsum("t,ts,s->", C, _expm_dd(z), vol6).real))

    fan = integrate(_facet_fan(cp, cp.vertices()))
    dela = integrate(_triangulate(cp))
    assert abs(fan - dela) < 1e-14 + 1e-12 * dela
    assert abs(fan - convex_volume(cp)) < 1e-14 + 1e-12 * fan


def test_circuit_to_polytope_fold():
    """Reachable-set fold of a fixed gate sequence (reference
    get_polytope_from_circuit, polytope_wrap.py:97-125): two sqiSwaps
    reach CNOT but not SWAP; three reach SWAP."""
    from fractions import Fraction

    from slam_decomposition_tpu.coverage.coverage import (
        circuit_to_polytope,
        gate_monodromy_reps,
    )
    from slam_decomposition_tpu.models import gates

    def contains_gate(poly, g):
        tol = Fraction(1, 10**9)
        return any(poly.contains(r, tol) for r in gate_monodromy_reps(g))

    two = circuit_to_polytope([gates.SQISWAP, gates.SQISWAP])
    three = circuit_to_polytope([gates.SQISWAP] * 3)
    assert contains_gate(two, gates.CNOT)
    assert not contains_gate(two, gates.SWAP)
    assert contains_gate(three, gates.SWAP)
    # raw unitary input works too
    two_np = circuit_to_polytope([gates.SQISWAP.to_numpy()] * 2)
    assert contains_gate(two_np, gates.CNOT)
