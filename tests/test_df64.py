"""Double-single arithmetic (ops/df64.py) vs numpy f64 ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from slam_decomposition_tpu.ops import df64


def _err(x_df, ref):
    got = np.asarray(df64.to_f64(x_df))
    return np.abs(got - ref).max()


def test_field_ops_reach_df64_precision():
    rng = np.random.default_rng(0)
    a64 = rng.uniform(-30, 30, 2048)
    b64 = rng.uniform(0.5, 30, 2048) * np.sign(rng.uniform(-1, 1, 2048))
    A = df64.from_f64(jnp.asarray(a64))
    B = df64.from_f64(jnp.asarray(b64))
    assert _err(df64.add(A, B), a64 + b64) < 1e-12
    assert _err(df64.sub(A, B), a64 - b64) < 1e-12
    rel_mul = np.abs(
        np.asarray(df64.to_f64(df64.mul(A, B))) - a64 * b64
    ) / np.abs(a64 * b64 + 1e-300)
    assert rel_mul.max() < 1e-13
    rel_div = np.abs(
        np.asarray(df64.to_f64(df64.div(A, B))) - a64 / b64
    ) / np.abs(a64 / b64 + 1e-300)
    assert rel_div.max() < 1e-13
    assert _err(df64.sqrt(df64.from_f64(jnp.abs(jnp.asarray(a64)))),
                np.sqrt(np.abs(a64))) < 1e-12


def test_sincos_df64_precision():
    rng = np.random.default_rng(1)
    # the solver's working domain (angles stay within a few periods)
    a64 = rng.uniform(-8 * np.pi, 8 * np.pi, 4096)
    s, c = df64.sincos(df64.from_f64(jnp.asarray(a64)))
    assert _err(s, np.sin(a64)) < 5e-13
    assert _err(c, np.cos(a64)) < 5e-13
    # f32 alone cannot do this (sanity that the test is meaningful)
    f32_err = np.abs(np.sin(a64.astype(np.float32)).astype(np.float64) - np.sin(a64)).max()
    assert f32_err > 1e-8


def test_exactness_of_error_free_transforms():
    """two_sum / two_prod must be EXACT (bit-level) — the foundation the
    whole representation rests on (verified on-chip in Pallas too)."""
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0.5, 2.0, 1024).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.5, 2.0, 1024).astype(np.float32))
    s, es = df64.two_sum(a, b)
    p, ep = df64.two_prod(a, b)
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)
    assert np.abs(
        (np.asarray(s, np.float64) + np.asarray(es, np.float64)) - (a64 + b64)
    ).max() == 0.0
    assert np.abs(
        (np.asarray(p, np.float64) + np.asarray(ep, np.float64)) - (a64 * b64)
    ).max() == 0.0


def test_complex_chain_product_precision():
    """A df64 complex product chain stays ~1e-13-accurate — the regime the
    polish kernel (ops/pallas_chain.polish_block) operates in."""
    rng = np.random.default_rng(3)
    z = np.exp(1j * rng.uniform(0, 2 * np.pi, (64, 16)))
    acc_re = df64.from_f64(jnp.ones(64, dtype=jnp.float64))
    acc_im = df64.from_f64(jnp.zeros(64, dtype=jnp.float64))
    for i in range(16):
        zr = df64.from_f64(jnp.asarray(z[:, i].real))
        zi = df64.from_f64(jnp.asarray(z[:, i].imag))
        acc_re, acc_im = df64.cmul((acc_re, acc_im), (zr, zi))
    ref = z.prod(axis=1)
    assert _err(acc_re, ref.real) < 1e-13
    assert _err(acc_im, ref.imag) < 1e-13
