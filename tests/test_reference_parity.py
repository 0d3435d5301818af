"""Cross-validation against the reference's shipped coverage data.

Loads the reference repo's precomputed monodromy coverage pickles (data
assets, SURVEY.md §2.7) through stub classes — no reference code executes —
and checks that THIS framework's independently computed coverage sets make
identical membership decisions across a dense coordinate grid.

Skipped when the reference checkout isn't present.
"""

import pickle
import sys
import types
from fractions import Fraction
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src/slam/data/polytopes")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference data not available"
)


class _Stub:
    def __init__(self, *a, **k):
        self.__dict__.update(k)

    def __setstate__(self, state):
        self.__dict__.update(state)


class _FlexUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            mod = sys.modules.get(module)
            if mod is None:
                mod = types.ModuleType(module)
                sys.modules[module] = mod
            if not hasattr(mod, name):
                setattr(mod, name, type(name, (_Stub,), {}))
            return getattr(mod, name)


def _load_reference_coverage(fname):
    with open(REF / fname, "rb") as f:
        cov, _ = _FlexUnpickler(f).load()
    out = []
    for cp in cov:
        subs = []
        for s in cp.__dict__["convex_subpolytopes"]:
            subs.append(
                (
                    [tuple(map(Fraction, r)) for r in s.__dict__["inequalities"]],
                    [tuple(map(Fraction, r)) for r in s.__dict__["equalities"]],
                )
            )
        out.append((cp.__dict__["cost"], subs))
    return out


def _ref_member(subs, p):
    for ineqs, eqs in subs:
        ok = all(r[0] + sum(c * x for c, x in zip(r[1:], p)) >= 0 for r in ineqs)
        ok = ok and all(
            r[0] + sum(c * x for c, x in zip(r[1:], p)) == 0 for r in eqs
        )
        if ok:
            return True
    return False


def _overlapping_cases():
    """Every reference-shipped coverage whose gate this framework has also
    scored (the candidate sweep regenerates the same canonical keys)."""
    import re

    from slam_decomposition_tpu.config import config as _cfg

    cases = []
    for f in sorted(REF.glob("polytope_coverage_*.pkl")) if REF.exists() else []:
        if "smush" in f.name:
            continue
        m = re.search(r"2QGate\(([\d.]+), ([\d.]+), ([\d.]+)\)", f.name)
        if not m:
            continue
        if (_cfg.data_dir / f.name).exists():
            g1, g2, t = map(float, m.groups())
            cases.append(pytest.param(f.name, (g1, g2, t), id=f"{g1:.3f}_{g2:.3f}"))
    return cases


@pytest.mark.parametrize("fname,gate_p", _overlapping_cases())
def test_membership_agrees_with_reference(fname, gate_p):
    """For every layer k and a dense grid of monodromy points, the
    reference polytope and ours agree on membership (accounting for our
    both-center-image convention: a class is a member iff either image is)."""
    from slam_decomposition_tpu.coverage.coverage import gate_set_to_coverage
    from slam_decomposition_tpu.models import gates as G

    ref = _load_reference_coverage(fname)
    mine = gate_set_to_coverage(
        G.conversion_gain_gate(0, 0, gate_p[0], gate_p[1], gate_p[2])
    )
    if len(mine) < len(ref):
        pytest.skip("local coverage capped below the reference's depth")
    assert len(ref) == len(mine), "layer counts differ"

    # grid of alcove points (both images per class)
    rng = np.random.default_rng(0)
    pts = []
    while len(pts) < 200:
        a = np.sort(rng.uniform(-0.75, 0.75, 3))[::-1]
        a4 = -a.sum()
        if a[2] >= a4 and a[0] - a4 <= 1:
            pts.append(a)
    pts = np.array(pts)

    def shift_image(a3):
        a = np.array([*a3, -a3.sum()]) + 0.5
        a = np.sort(a)[::-1]
        s = round(a.sum())
        for _ in range(2):
            if s > 0:
                a[0] -= 1
                s -= 1
                a = np.sort(a)[::-1]
            elif s < 0:
                a[-1] += 1
                s += 1
                a = np.sort(a)[::-1]
        return a[:3]

    mismatches = 0
    for k in range(1, len(ref)):
        ref_subs = ref[k][1]
        cp = mine[k]
        for p in pts:
            fr1 = [Fraction(x).limit_denominator(10**6) for x in p]
            p2 = shift_image(p)
            fr2 = [Fraction(x).limit_denominator(10**6) for x in p2]
            in_ref = _ref_member(ref_subs, fr1) or _ref_member(ref_subs, fr2)
            in_mine = cp.contains_float(np.stack([p, p2]), tol=1e-7)
            if in_ref != in_mine:
                mismatches += 1
    # boundary rationalization can flip measure-zero points; demand >99%
    total = (len(ref) - 1) * len(pts)
    assert mismatches <= total * 0.01, f"{mismatches}/{total} disagreements"
