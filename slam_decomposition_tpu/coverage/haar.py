"""Haar volumes and expected costs over monodromy polytopes.

The magic-basis KAK is the AI symmetric space U(4)/O(4) (gamma = M M^T is
symmetric unitary), whose radial part has root multiplicity 1, so the Haar
pushforward density on alcove coordinates is

    rho(a)  proportional to  prod_{i<j} sin(pi (a_i - a_j))

(nonnegative throughout the alcove; validated against the reference's
published sqiswap k=2 base volume 0.7901, BASELINE.md / extended_results).

Volumes are computed deterministically: exact vertex enumeration ->
Delaunay triangulation -> collapsed-cube Gauss-Legendre quadrature per
simplex; unions via inclusion-exclusion over the (few) convex subpolytopes.
Normalization: volume(EVERYTHING_POLYTOPE) == 1. Replaces
monodromy.haar.distance_polynomial_integrals / expected_cost
(polytope_wrap.py:206-214, parallel_drive_volume.py:44-46).
"""

from __future__ import annotations

import itertools
from typing import List, Sequence

import numpy as np

from slam_decomposition_tpu.coverage.polytope import ConvexPolytope, Polytope

_GL_N = 14
_gl_x, _gl_w = np.polynomial.legendre.leggauss(_GL_N)
_gl_x = (_gl_x + 1) / 2
_gl_w = _gl_w / 2


def haar_density(pts3: np.ndarray) -> np.ndarray:
    """rho at reduced coordinates (..., 3); unnormalized."""
    a = np.concatenate([pts3, -pts3.sum(axis=-1, keepdims=True)], axis=-1)
    p = np.ones(a.shape[:-1])
    for i in range(4):
        for j in range(i + 1, 4):
            p = p * np.sin(np.pi * (a[..., i] - a[..., j]))
    return np.abs(p)


def _simplex_integral(verts: np.ndarray) -> float:
    """Integrate rho over a 3-simplex via the collapsed-cube map."""
    v0, v1, v2, v3 = verts
    vol6 = abs(np.linalg.det(np.stack([v1 - v0, v2 - v0, v3 - v0])))
    if vol6 < 1e-300:
        return 0.0
    u1, u2, u3 = np.meshgrid(_gl_x, _gl_x, _gl_x, indexing="ij")
    w = (
        _gl_w[:, None, None]
        * _gl_w[None, :, None]
        * _gl_w[None, None, :]
        * (u1**2)
        * u2
    )
    t1 = u1
    t2 = u1 * u2
    t3 = u1 * u2 * u3
    x = (
        v0[None, None, None, :] * (1 - t1)[..., None]
        + v1 * (t1 - t2)[..., None]
        + v2 * (t2 - t3)[..., None]
        + v3 * t3[..., None]
    )
    vals = haar_density(x)
    return float(vol6 * (w * vals).sum())


def convex_volume(cp: ConvexPolytope) -> float:
    """Haar-weighted (unnormalized) volume of one convex subpolytope."""
    verts = cp.vertices()
    if len(verts) < 4:
        return 0.0
    pts = np.array([[float(x) for x in v] for v in verts])
    try:
        from scipy.spatial import Delaunay, QhullError

        tri = Delaunay(pts)
    except Exception:
        return 0.0
    total = 0.0
    for simplex in tri.simplices:
        total += _simplex_integral(pts[simplex])
    return total


def polytope_volume(p: Polytope, _depth: int = 0) -> float:
    """Union volume via inclusion-exclusion over convex subpolytopes."""
    subs = p.convex_subpolytopes
    total = 0.0
    for k in range(1, len(subs) + 1):
        for combo in itertools.combinations(subs, k):
            inter = combo[0]
            for c in combo[1:]:
                inter = inter.intersect(c)
            v = convex_volume(inter)
            total += v if k % 2 == 1 else -v
    return total


_EVERYTHING_VOLUME = None


def normalized_volume(p: Polytope) -> float:
    """Haar probability mass of p (both-center-image convention)."""
    global _EVERYTHING_VOLUME
    if _EVERYTHING_VOLUME is None:
        from slam_decomposition_tpu.coverage.coverage import EVERYTHING_POLYTOPE

        _EVERYTHING_VOLUME = polytope_volume(EVERYTHING_POLYTOPE)
    return polytope_volume(p) / _EVERYTHING_VOLUME


_HAAR_COORD_CACHE = {}


def haar_monodromy_samples(n: int = 200_000, seed: int = 0) -> np.ndarray:
    """(n, 2, 3) reduced monodromy coordinates (both center images) of Haar
    2Q unitaries — the exact measure, for Monte-Carlo volume estimation of
    polytopes too facet-rich for exact quadrature (smush hulls)."""
    key = (n, seed)
    if key not in _HAAR_COORD_CACHE:
        import jax

        from slam_decomposition_tpu.opt.samplers import haar_sample
        from slam_decomposition_tpu.ops import cplx, weyl

        out = []
        chunk = 20_000
        with jax.default_device(jax.devices("cpu")[0]):
            fn = jax.jit(weyl.monodromy_coords)
            for s in range(0, n, chunk):
                us = haar_sample(min(chunk, n - s), seed=seed + s)
                out.append(np.asarray(fn(cplx.from_numpy(us)))[:, :, :3])
        _HAAR_COORD_CACHE[key] = np.concatenate(out)
    return _HAAR_COORD_CACHE[key]


def mc_volume(polytope: Polytope, n: int = 200_000, seed: int = 0, tol=1e-9) -> float:
    """Haar mass of a polytope by direct Haar Monte-Carlo: fraction of
    samples with EITHER center image inside (float row evaluation)."""
    samples = haar_monodromy_samples(n, seed)
    member = np.zeros(len(samples), dtype=bool)
    for cp in polytope.convex_subpolytopes:
        rows = np.array(
            [[float(c) for c in r] for r in cp.inequalities], dtype=float
        )
        eqs = np.array(
            [[float(c) for c in r] for r in cp.equalities], dtype=float
        )
        for img in range(2):
            pts = samples[:, img, :]
            ok = np.ones(len(pts), dtype=bool)
            for r in rows:
                ok &= (r[0] + pts @ r[1:]) >= -tol
            for r in eqs:
                ok &= np.abs(r[0] + pts @ r[1:]) <= tol
            member |= ok
    return float(member.mean())


def expected_cost(coverage: Sequence, chatty: bool = False) -> float:
    """Haar-expected synthesis cost of a coverage set: sum over layers of
    cost_k * (V_k - V_{k-1}) assuming nested layers (the construction is
    monotone). Reference: monodromy.haar.expected_cost via
    coverage_to_haar_expectation (polytope_wrap.py:206-214)."""
    layers = sorted(coverage, key=lambda c: c.cost)
    total = 0.0
    prev = 0.0
    for cp in layers:
        if cp.cost == 0:
            continue
        v = normalized_volume(cp.polytope)
        v = min(max(v, prev), 1.0)
        total += cp.cost * (v - prev)
        if chatty:
            print(f"  cost {cp.cost}: volume {v:.6f} (+{v - prev:.6f})")
        prev = v
    if prev < 1.0 - 1e-6:
        raise ValueError(
            f"coverage set incomplete: total volume {prev:.6f} < 1 "
            "(gate set cannot span the chamber)"
        )
    return total
