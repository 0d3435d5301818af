"""Explore-layer tests: speed limits (golden published values), scaling,
family extension, candidates, smush pieces, preseeding, persistence."""

import numpy as np
import pytest

from slam_decomposition_tpu.explore import speed_limit as sl
from slam_decomposition_tpu.explore.scaling import atomic_cost_scaling
from slam_decomposition_tpu.models import gates as G


GOLDEN_SLF = {  # BASELINE.md / results/basis_speeds.ipynb
    "iSwap": ((np.pi / 2, 0, 1), 1.0013),
    "sqiSwap": ((np.pi / 2, 0, 0.5), 0.5006),
    "CNOT": ((np.pi / 4, np.pi / 4, 1), 1.7835),
    "sqCNOT": ((np.pi / 4, np.pi / 4, 0.5), 0.8917),
    "B": ((3 * np.pi / 8, np.pi / 8, 1), 1.4067),
    "sqB": ((3 * np.pi / 8, np.pi / 8, 0.5), 0.7033),
}


@pytest.mark.parametrize("name", list(GOLDEN_SLF))
def test_hardware_slf_golden(name):
    (gc, gg, t), expect = GOLDEN_SLF[name]
    got = sl.speed_limited_cost(gc, gg, t, sl.hardware_sl)
    assert abs(got - expect) < 2e-4, (name, got, expect)


def test_analytic_slfs():
    # circle SLF: 45-degree ray intersects at pi/2/sqrt(2)
    d = sl.speed_limited_cost(1.0, 1.0, 1.0, sl.squared_sl)
    assert abs(d - 1.0 / (np.pi / (2 * np.sqrt(2)) / 1.0)) < 0.01
    # mid SLF intercepts at pi/2 on both axes
    assert abs(sl.mid_sl(0.0) - np.pi / 2) < 1e-9
    assert abs(sl.mid_sl(np.pi / 2)) < 1e-9


def test_atomic_cost_scaling_linear():
    params = (0, 0, np.pi / 4, np.pi / 4, 1.0)  # CNOT-strength gate, cost 1
    gate, scaled = atomic_cost_scaling(params, np.array([3.0]), "linear", 0.25)
    # scaled = 3 * cost(=1) + (3+1)*0.25 = 4.0
    assert abs(float(scaled[0]) - 4.0) < 1e-9


def test_build_gates_dedup():
    from slam_decomposition_tpu.explore.candidates import build_gates

    gates_, coords = build_gates(n_strength=5, n_mix=5)
    assert len(gates_) == len(coords)
    assert len(gates_) < 25  # dedup removed mirror/duplicate entries
    assert len({tuple(np.round(c, 8)) for c in coords}) == len(coords)


def test_family_extension_prefers_sibling():
    """A weak gate (iSwap/8) should defer to a stronger sibling for CNOT
    (family_extend.py:120-136 __main__ example shape)."""
    from slam_decomposition_tpu.coverage.coverage import gate_set_to_coverage
    from slam_decomposition_tpu.explore.family import recursive_sibling_check

    base = G.cg_canonicalize(G.conversion_gain_gate(0, 0, 0, np.pi / 8, 1.0))
    cov = gate_set_to_coverage(base, max_layers=8)
    plan, cost = recursive_sibling_check(
        cov, base, G.CNOT.to_numpy(), cost_1q=0.1, basis_factor=0.25
    )
    assert plan, "expected a build plan"
    assert np.isfinite(cost)
    direct_k, _ = __import__(
        "slam_decomposition_tpu.coverage.coverage", fromlist=["monodromy_range_from_target"]
    ).monodromy_range_from_target(cov, G.CNOT.to_numpy())
    direct = (direct_k + 1) * 0.1 + direct_k * 0.25
    assert cost <= direct + 1e-9


def test_preseed_store_roundtrip(tmp_path, monkeypatch):
    from slam_decomposition_tpu.config import config as cfg_obj
    from slam_decomposition_tpu.opt.preseed import PreseedStore

    monkeypatch.setattr(cfg_obj, "data_dir", tmp_path)
    st = PreseedStore.load("testkey")
    st.add([[0.5, 0.2, 0.1]], [[1.0, 2.0, 3.0]], [2], [1e-12])
    st.add([[0.1, 0.1, 0.0]], [[4.0, 5.0, 6.0]], [3], [1e-12])
    st.save()
    st2 = PreseedStore.load("testkey")
    assert len(st2) == 2
    idx, dist = st2.nearest([[0.5, 0.2, 0.11]])
    assert idx[0] == 0 and dist[0] < 0.02
    seeds, ok = st2.seeds_for([[0.5, 0.2, 0.1]], 3, cycles=2, temperature=1.0)
    assert ok[0]
    np.testing.assert_allclose(seeds[0], [1, 2, 3], rtol=0.06)
    seeds, ok = st2.seeds_for([[0.5, 0.2, 0.1]], 3, cycles=3)
    assert not ok[0]  # cycle mismatch blocks the seed


def test_persist_ragged(tmp_path):
    from slam_decomposition_tpu.utils.persist import padded_to_ragged, ragged_to_padded

    rows = [[1.0, 2.0], [3.0], [4.0, 5.0, 6.0]]
    arr = ragged_to_padded(rows)
    assert arr.shape == (3, 3)
    back = padded_to_ragged(arr)
    assert back == rows


def test_qasm_roundtrip():
    from slam_decomposition_tpu.transpile import library
    from slam_decomposition_tpu.transpile.qasm import from_qasm, to_qasm

    c = library.qft(3)
    text = to_qasm(c)
    c2 = from_qasm(text)
    U1, U2 = c.to_matrix(), c2.to_matrix()
    assert abs(np.trace(U1.conj().T @ U2)) / 8 > 1 - 1e-9


def test_smush_hull_rationalization():
    from slam_decomposition_tpu.explore.smush_volume import rational_hull

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 0.3, size=(40, 3))
    hull = rational_hull(pts)
    from fractions import Fraction

    for p in pts:
        assert hull.contains([Fraction(float(x)).limit_denominator(10**6) for x in p],
                             Fraction(1, 10**6))


def test_exact_clifford_group_sizes():
    from slam_decomposition_tpu.opt.samplers import _clifford_group

    assert len(_clifford_group(1)) == 24
    assert len(_clifford_group(2)) == 11520


# ------------------------------------------------ scaled-score cache (h5)


def _fake_bare_db(tmp_path, monkeypatch):
    """Point the DB at a tmp file with 3 synthetic bare candidates."""
    import h5py

    from slam_decomposition_tpu.explore import candidates as cand

    path = str(tmp_path / "cg_gates.h5")
    rows = [
        # (params, [haar, cnot, swap]) — params = (p1,p2,gc,gg,t)
        ((0, 0, np.pi / 4, np.pi / 4, 1.0), [2.2, 2.0, 3.0]),  # B family
        ((0, 0, 0.0, np.pi / 2, 1.0), [2.5, 2.0, 3.0]),  # iSwap family
        ((0, 0, 0.1, 0.7, 1.0), [3.1, 3.0, 3.0]),  # generic (non-family)
    ]
    with h5py.File(path, "w") as hf:
        g = hf.require_group("bare_cost")
        for params, scores in rows:
            key = G.cg_hash(params[2], params[3], params[4])
            g.create_dataset(
                key,
                data=np.array([list(params), list(scores) + [-1, -1]]),
            )
    monkeypatch.setattr(cand, "H5_PATH", path)
    return path, rows


def test_cost_scaling_cache_and_pick_winner_lookup(tmp_path, monkeypatch):
    from slam_decomposition_tpu.explore import winners
    from slam_decomposition_tpu.explore.scaling import (
        atomic_cost_scaling,
        cost_scaling,
        load_scaled,
    )

    _, rows = _fake_bare_db(tmp_path, monkeypatch)

    written = cost_scaling("linear", 0.25)
    assert written == 3
    cached = load_scaled("linear", 0.25)
    assert cached is not None and len(cached) == 3
    # cached values equal the atomic computation
    by_params = {tuple(np.round(p, 8)): s for p, s in cached}
    for params, scores in rows:
        _, expect = atomic_cost_scaling(
            params, np.array(scores), "linear", 0.25
        )
        got = by_params[tuple(np.round(params, 8))]
        np.testing.assert_allclose(got[:3], expect, rtol=1e-12)

    # second cost_scaling call is a no-op (skip-resume)
    assert cost_scaling("linear", 0.25) == 0

    # pick_winner must now be a PURE lookup: poison the rescoring path
    monkeypatch.setattr(
        winners, "load_candidates",
        lambda: (_ for _ in ()).throw(AssertionError("rescored!")),
    )
    g1, _ = winners.pick_winner("linear_scaling_1q0.25", metric=1)
    # expected winner under metric 1 (scaled cnot): argmin over cached
    best = min(rows, key=lambda r: atomic_cost_scaling(
        r[0], np.array(r[1]), "linear", 0.25)[1][1])
    assert np.allclose(g1.params, best[0])
    # lambda mix rides the same cache (linearity of the scaling)
    g2, _ = winners.pick_winner("linear_scaling_1q0.25", metric=(-1, 0.5))
    assert g2 is not None


def test_cost_scaling_resume_after_kill(tmp_path, monkeypatch):
    import h5py

    from slam_decomposition_tpu.explore import candidates as cand
    from slam_decomposition_tpu.explore.scaling import (
        cost_scaling,
        scaled_group_name,
    )

    path, _ = _fake_bare_db(tmp_path, monkeypatch)
    assert cost_scaling("linear", 0.0) == 3
    # simulate a killed sweep: remove one finished row
    group = scaled_group_name("linear", 0.0)
    with h5py.File(path, "a") as hf:
        key = list(hf[group].keys())[0]
        del hf[group][key]
    # resume recomputes ONLY the missing row
    assert cost_scaling("linear", 0.0) == 1


def test_targeted_smush_coords_valid_chamber_points():
    """Targeted vertex descents emit finite Weyl-chamber coordinates for
    every iterate, and descents toward CNOT actually approach it (the
    frontier-extension property the k=1 volumes rely on,
    parallel_drive_volume.py:229-286 role)."""
    import numpy as np

    from slam_decomposition_tpu.explore.smush_volume import (
        NAMED_GATES,
        targeted_smush_coords,
    )

    gc, gg, t, _ = NAMED_GATES["iSwap"]
    cs = targeted_smush_coords(gc, gg, t, 1, restarts=2, iters=40, seed=3)
    assert cs.shape == (5 * 2 * 41, 3)
    assert np.isfinite(cs).all()
    assert (cs >= -1e-9).all() and (cs[:, 0] <= 1 + 1e-9).all()
    # the CNOT-target descents close most of the distance from a random
    # start (iSwap k=1 with drives reaches the CX class)
    d_cx = np.linalg.norm(cs - np.array([0.5, 0.0, 0.0]), axis=1)
    assert d_cx.min() < 0.05
