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
