"""Single-qubit gate constructors on (re, im) pairs, batched over params."""

from __future__ import annotations

import jax.numpy as jnp

from slam_decomposition_tpu.ops import cplx


def u3(theta, phi, lam) -> cplx.CMat:
    """qiskit-convention U gate. Accepts broadcastable param arrays; returns
    (..., 2, 2) pair."""
    theta = jnp.asarray(theta)
    ct = jnp.cos(theta / 2.0)
    st = jnp.sin(theta / 2.0)
    re = jnp.stack(
        [
            jnp.stack([ct, -jnp.cos(lam) * st], axis=-1),
            jnp.stack([jnp.cos(phi) * st, jnp.cos(phi + lam) * ct], axis=-1),
        ],
        axis=-2,
    )
    im = jnp.stack(
        [
            jnp.stack([jnp.zeros_like(ct), -jnp.sin(lam) * st], axis=-1),
            jnp.stack([jnp.sin(phi) * st, jnp.sin(phi + lam) * ct], axis=-1),
        ],
        axis=-2,
    )
    return (re, im)


def rz(theta) -> cplx.CMat:
    theta = jnp.asarray(theta)
    z = jnp.zeros_like(theta)
    re = jnp.stack(
        [
            jnp.stack([jnp.cos(theta / 2), z], axis=-1),
            jnp.stack([z, jnp.cos(theta / 2)], axis=-1),
        ],
        axis=-2,
    )
    im = jnp.stack(
        [
            jnp.stack([-jnp.sin(theta / 2), z], axis=-1),
            jnp.stack([z, jnp.sin(theta / 2)], axis=-1),
        ],
        axis=-2,
    )
    return (re, im)


def rx(theta) -> cplx.CMat:
    theta = jnp.asarray(theta)
    z = jnp.zeros_like(theta)
    c = jnp.cos(theta / 2)
    s = jnp.sin(theta / 2)
    re = jnp.stack(
        [jnp.stack([c, z], axis=-1), jnp.stack([z, c], axis=-1)], axis=-2
    )
    im = jnp.stack(
        [jnp.stack([z, -s], axis=-1), jnp.stack([-s, z], axis=-1)], axis=-2
    )
    return (re, im)


def ry(theta) -> cplx.CMat:
    theta = jnp.asarray(theta)
    z = jnp.zeros_like(theta)
    c = jnp.cos(theta / 2)
    s = jnp.sin(theta / 2)
    re = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )
    im = jnp.stack(
        [jnp.stack([z, z], axis=-1), jnp.stack([z, z], axis=-1)], axis=-2
    )
    return (re, im)


def u3_angles(W) -> tuple:
    """(theta, phi, lam) with u3(theta, phi, lam) == W up to global phase,
    for any 2x2 unitary W. Host-side numpy (inverse of u3 for circuit
    parameter extraction)."""
    import numpy as _np

    W = _np.asarray(W, dtype=complex)
    a, b = W[0, 0], W[0, 1]
    c, d = W[1, 0], W[1, 1]
    theta = 2.0 * _np.arctan2(_np.abs(c), _np.abs(a))
    if _np.abs(a) > 1e-12 and _np.abs(c) > 1e-12:
        phi = _np.angle(c) - _np.angle(a)
        lam = _np.angle(-b) - _np.angle(a)
    elif _np.abs(a) <= 1e-12:  # theta = pi: only phi + lam matters... phi - lam
        phi = _np.angle(c) - _np.angle(-b)
        lam = 0.0
    else:  # theta = 0: only phi + lam matters
        phi = _np.angle(d) - _np.angle(a)
        lam = 0.0
    return float(theta), float(phi), float(lam)
