"""Unit tests for cplx arithmetic, Jacobi eigensolvers, and expm."""

import numpy as np
import jax.numpy as jnp
import scipy.linalg
from scipy.stats import unitary_group

from slam_decomposition_tpu.ops import cplx
from slam_decomposition_tpu.ops.eig import eigh_hermitian, jacobi_eigh, joint_diag
from slam_decomposition_tpu.ops.expm import expm_skew, expm_taylor


def test_cplx_matmul_det():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    B = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    got = cplx.to_numpy(cplx.matmul(cplx.from_numpy(A), cplx.from_numpy(B)))
    np.testing.assert_allclose(got, A @ B, atol=1e-12)
    d = cplx.to_numpy(cplx.det4(cplx.from_numpy(A)))
    np.testing.assert_allclose(d, np.linalg.det(A), atol=1e-10)


def test_cplx_kron():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    b = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    got = cplx.to_numpy(cplx.kron(cplx.from_numpy(a), cplx.from_numpy(b)))
    np.testing.assert_allclose(got, np.kron(a, b), atol=1e-12)


def test_jacobi_eigh_real():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(4, 4))
    A = A + A.T
    w, V = jacobi_eigh(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    np.testing.assert_allclose(V @ np.diag(w) @ V.T, A, atol=1e-12)
    np.testing.assert_allclose(np.sort(w), np.linalg.eigvalsh(A), atol=1e-12)


def test_joint_diag_commuting():
    rng = np.random.default_rng(3)
    # build commuting symmetric pair from shared eigenbasis with degeneracies
    Q, _ = np.linalg.qr(rng.normal(size=(4, 4)))
    x = np.array([1.0, 1.0, -2.0, 0.5])  # degenerate in X
    y = np.array([0.3, -0.7, 0.1, 0.1])
    X = Q @ np.diag(x) @ Q.T
    Y = Q @ np.diag(y) @ Q.T
    xd, yd, V = joint_diag(jnp.asarray(X), jnp.asarray(Y))
    xd, yd, V = np.asarray(xd), np.asarray(yd), np.asarray(V)
    np.testing.assert_allclose(V @ np.diag(xd) @ V.T, X, atol=1e-11)
    np.testing.assert_allclose(V @ np.diag(yd) @ V.T, Y, atol=1e-11)


def test_eigh_hermitian():
    rng = np.random.default_rng(4)
    H = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    H = H + H.conj().T
    w, V = eigh_hermitian(cplx.from_numpy(H))
    w = np.asarray(w)
    Vn = cplx.to_numpy(V)
    np.testing.assert_allclose(w, np.linalg.eigvalsh(H), atol=1e-10)
    np.testing.assert_allclose(Vn @ np.diag(w) @ Vn.conj().T, H, atol=1e-10)


def test_expm_taylor_vs_scipy():
    rng = np.random.default_rng(5)
    H = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    H = (H + H.conj().T) * 1.5  # norm comparable to pi-level couplings
    got = cplx.to_numpy(expm_skew(cplx.from_numpy(H), t=1.0))
    want = scipy.linalg.expm(-1j * H)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_expm_8x8():
    rng = np.random.default_rng(6)
    H = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    H = H + H.conj().T
    got = cplx.to_numpy(expm_skew(cplx.from_numpy(H), t=0.7))
    want = scipy.linalg.expm(-0.7j * H)
    np.testing.assert_allclose(got, want, atol=1e-11)


def test_eig_unitary():
    rng = np.random.default_rng(7)
    U = unitary_group.rvs(4, random_state=rng)
    from slam_decomposition_tpu.ops.eig import eig_unitary

    th, V = eig_unitary(cplx.from_numpy(U))
    Vn = cplx.to_numpy(V)
    rec = Vn @ np.diag(np.exp(1j * np.asarray(th))) @ Vn.conj().T
    np.testing.assert_allclose(rec, U, atol=1e-12)


def test_unitary_power_and_continuous_cost():
    from slam_decomposition_tpu.opt.costs import continuous_cost, unitary_power

    rng = np.random.default_rng(8)
    U = unitary_group.rvs(4, random_state=rng)
    h = cplx.to_numpy(unitary_power(cplx.from_numpy(U), 0.5))
    np.testing.assert_allclose(h @ h, U, atol=1e-12)
    c = continuous_cost(cplx.from_numpy(U), cplx.from_numpy(U))
    assert abs(float(c)) < 1e-12
