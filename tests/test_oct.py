"""Optimal-control pulse shaping (explore/oct.py) — the smush_OCT
notebook's capability: shaped 1Q drives over a fixed 2Q coupling reaching
gate / local-class / perfect-entangler objectives.

Reference: src/slam/scripts/smush_OCT.ipynb (krotov + weylchamber PE
functional over ConversionGainSmush pulses).
"""

import numpy as np
import jax
import jax.numpy as jnp

from slam_decomposition_tpu.explore.oct import (
    OCTResult,
    flattop,
    hs_cost,
    is_perfect_entangler,
    make_smush_eval,
    optimize_pulses,
    pe_functional,
)
from slam_decomposition_tpu.models import gates
from slam_decomposition_tpu.ops import cplx


def _pair(g):
    return g.matrix() if isinstance(g, gates.Gate) else cplx.from_numpy(g)


def test_flattop_window():
    w = np.asarray(flattop(64, rise_frac=0.1))
    assert w[0] < 0.1 and w[-1] < 0.1  # ramps from/to ~zero
    assert np.isclose(w[28:36], 1.0).all()  # flat top
    assert (np.diff(w[:6]) > 0).all() and (np.diff(w[-6:]) < 0).all()


def test_pe_membership_corners():
    # In: the four classic perfect entanglers (sqiSwap/sqSwap on boundary)
    for g in (
        gates.CNOT,
        gates.ISWAP,
        gates.SQISWAP,
        gates.canonical(np.pi / 8, np.pi / 8, np.pi / 8, "sqswap"),
        gates.berkeley(),
    ):
        assert bool(is_perfect_entangler(_pair(g), tol=1e-7)), g
    # Out: identity class (both reps) and SWAP
    for g in (
        gates.canonical(0.0, 0.0, 0.0, "id"),
        gates.canonical(np.pi / 2, 0.0, 0.0, "id2"),
        gates.SWAP,
    ):
        assert not bool(is_perfect_entangler(_pair(g), tol=1e-7)), g


def test_pe_functional_signs():
    ident = cplx.eye(4)
    assert float(pe_functional(ident)) > 1.0  # identity: F_PE = 2
    # quarter-iSwap: not a PE, positive functional
    assert float(pe_functional(_pair(gates.riswap(0.25)))) > 0.05
    # boundary (CNOT, sqiSwap) and B (all Makhlin invariants vanish): <= 0
    assert abs(float(pe_functional(_pair(gates.CNOT)))) < 1e-9
    assert float(pe_functional(_pair(gates.berkeley()))) <= 1e-9


def test_grape_reaches_perfect_entangler():
    # gc = 7pi/8 conversion folds back to the riswap(1.75) ~ (1/8,1/8,0)
    # class: NOT a PE, but with ample interaction budget for drives to
    # steer into the polytope (a weak coupling like pi/8 could never get
    # there — the speed limit caps c1+c2 below the PE face)...
    n = 16
    ev = make_smush_eval(gc=7 * np.pi / 8, gg=0.0, n_slices=n)
    U0 = ev(jnp.zeros((2, n)))
    assert not bool(is_perfect_entangler(U0, tol=1e-6))
    assert float(pe_functional(U0)) > 0.05
    # ...shaped parallel drives do (the notebook's krotov PE optimization,
    # one jitted call here; iterate selection = exact membership)
    res = optimize_pulses(
        ev, n, functional="pe", restarts=4, iters=200, lr=0.2, seed=1
    )
    assert isinstance(res, OCTResult)
    assert bool(is_perfect_entangler(res.U, tol=1e-6))
    assert float(res.value) <= 1e-3  # F_PE at the selected iterate
    # history records the raw per-iteration F_PE of the winning restart
    # (iters pre-update points + the appended final iterate)
    assert res.history.shape == (201,)
    # structural Krotov constraint: the update-shape window multiplies the
    # raw parameters, so boundary slices are always suppressed
    np.testing.assert_allclose(
        res.pulses, res.raw * np.asarray(flattop(n))[None, :], atol=1e-12
    )


def test_grape_hits_reachable_gate_target():
    # self-consistency: a gate made by some pulse vector is recovered from
    # fresh random restarts (square cost, phase-invariant)
    n = 12
    ev = make_smush_eval(gc=np.pi / 4, gg=0.0, n_slices=n)
    p_true = (
        jax.random.uniform(jax.random.PRNGKey(7), (2, n), dtype=jnp.float64)
        * 2.0
        - 1.0
    )
    target = ev(p_true)
    res = optimize_pulses(
        ev,
        n,
        functional="square",
        target=target,
        restarts=8,
        iters=400,
        lr=0.1,
        seed=3,
    )
    assert float(res.value) < 1e-4
    # optimization descended
    assert res.history[-1] < res.history[0]


def test_final_adam_update_is_selectable():
    # regression: the scan logs pre-update points, so the last Adam step
    # used to be computed in the carry and thrown away — iters=1 returned
    # the untouched random init. Now history carries iters+1 points and
    # the selected iterate can be the post-final-update one.
    n = 8
    ev = make_smush_eval(gc=np.pi / 4, gg=0.0, n_slices=n)
    target = ev(jnp.zeros((2, n)))
    res = optimize_pulses(
        ev, n, functional="square", target=target,
        restarts=2, iters=1, lr=0.1, seed=0,
    )
    assert res.history.shape == (2,)
    # the single Adam update was applied (init is random, not a minimum)
    assert res.history[-1] != res.history[0]
    # non-PE selection picks the final point of the best restart
    assert float(res.value) == float(res.history[-1])


def test_hs_cost_zero_at_match():
    U = _pair(gates.CNOT)
    assert float(hs_cost(U, U)) == 0.0
    # phase-AWARE (krotov J_T_hs): a global phase costs
    V = cplx.cscale(U, cplx.expi(jnp.asarray(0.5)))
    assert float(hs_cost(U, V)) > 1e-3


def test_amp_penalty_shrinks_pulses():
    n = 12
    ev = make_smush_eval(gc=7 * np.pi / 8, gg=0.0, n_slices=n)
    kw = dict(functional="pe", restarts=4, iters=150, lr=0.2, seed=5)
    free = optimize_pulses(ev, n, amp_penalty=0.0, **kw)
    pen = optimize_pulses(ev, n, amp_penalty=0.05, **kw)
    assert float(np.mean(pen.raw**2)) < float(np.mean(free.raw**2))
    assert bool(is_perfect_entangler(pen.U, tol=1e-6))  # still reaches PE


def test_grape_li_reaches_cnot_class_one_application():
    # cross-module consistency: GRAPE on J_T_LI drives ONE application of
    # the iSwap-strength coupler into the CNOT local class — the same
    # physics models/trajectory.improved_cx solves exactly by LM + KAK
    # locals (there to 1e-14; Adam-only plateaus ~1e-6 here, which is
    # plenty to confirm class reachability)
    from slam_decomposition_tpu.ops import weyl

    n = 16
    ev = make_smush_eval(gc=np.pi / 2, gg=0.0, n_slices=n)
    res = optimize_pulses(
        ev, n, functional="li", target=_pair(gates.CNOT),
        restarts=8, iters=400, lr=0.15, seed=2,
    )
    assert float(res.value) < 1e-3
    c = np.asarray(weyl.c1c2c3(res.U))
    np.testing.assert_allclose(c, [0.5, 0.0, 0.0], atol=0.05)
