"""Parameterized 2Q/3Q Hamiltonians and their propagators.

TPU-native re-design of reference src/slam/hamiltonian.py: instead of qutip
operator algebra + ``.expm()`` per objective evaluation (hamiltonian.py:33),
each Hamiltonian is a pure function ``params -> (re, im) matrix`` built from
precomputed constant generator matrices, and propagators go through a
branch-free Taylor scaling-and-squaring expm that is batched (vmap) and
exactly differentiable. Time-sliced "smush" products (hamiltonian.py:131-144)
become a ``lax.scan`` over slices.

Operator conventions match the reference: raising op cr = [[0,0],[1,0]],
big-endian tensor order A = kron(cr, I), B = kron(I, cr) (qutip tensor
order, hamiltonian.py:49-52).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from slam_decomposition_tpu.ops import cplx
from slam_decomposition_tpu.ops.expm import expm_taylor

_CR = np.array([[0.0, 0.0], [1.0, 0.0]])
_I2 = np.eye(2)


def _kron(*ms):
    out = ms[0]
    for m in ms[1:]:
        out = np.kron(out, m)
    return out


# 2Q generator constants (4x4, real)
_A2 = _kron(_CR, _I2)
_B2 = _kron(_I2, _CR)
K_CONV = _A2 @ _B2.T  # A B^dag   (conversion / hopping)
K_GAIN = _A2 @ _B2  # A B       (gain / two-mode squeeze)
K_X = _A2  # drive on qubit 0:  gx (A + A^dag)
K_Y = _B2  # drive on qubit 1
K_Z1 = _A2.T @ _A2  # number operator qubit 0
K_Z2 = _B2.T @ _B2

# 3Q generators (8x8)
_A3 = _kron(_CR, _I2, _I2)
_B3 = _kron(_I2, _CR, _I2)
_C3 = _kron(_I2, _I2, _CR)
K_AB = _A3 @ _B3.T
K_AC = _A3 @ _C3.T
K_BC = _B3 @ _C3.T
K_AB_G = _A3 @ _B3
K_AC_G = _A3 @ _C3
K_BC_G = _B3 @ _C3

# FSim generators
_SP = np.array([[0.0, 1.0], [0.0, 0.0]])
_SZ = np.diag([1.0, -1.0])
K_HOP = _kron(_SP, _I2) @ _kron(_I2, _SP).T + _kron(_SP, _I2).T @ _kron(_I2, _SP)
K_ZZ = _kron(_SZ, _SZ)


def _phased_pair(K: np.ndarray, g, phi, dtype):
    """g * (e^{i phi} K + e^{-i phi} K^dag) as a cplx pair. K real."""
    Kj = jnp.asarray(K, dtype=dtype)
    c = jnp.cos(phi) * g
    s = jnp.sin(phi) * g
    re = c[..., None, None] * (Kj + Kj.T)
    im = s[..., None, None] * (Kj - Kj.T)
    return (re, im)


def conversion_gain_h(gc, gg, phi_c=0.0, phi_g=0.0, dtype=jnp.float64) -> cplx.CMat:
    """H = gc * (e^{i phi_c} AB^dag + h.c.) + gg * (e^{i phi_g} AB + h.c.)

    Reference: ConversionGainPhaseHamiltonian (hamiltonian.py:84-111);
    phi_c=phi_g=0 reduces to ConversionGainHamiltonian (hamiltonian.py:64).
    """
    gc = jnp.asarray(gc, dtype=dtype)
    gg = jnp.asarray(gg, dtype=dtype)
    phi_c = jnp.asarray(phi_c, dtype=dtype)
    phi_g = jnp.asarray(phi_g, dtype=dtype)
    return cplx.add(
        _phased_pair(K_CONV, gc, phi_c, dtype), _phased_pair(K_GAIN, gg, phi_g, dtype)
    )


def conversion_gain_u(gc, gg, phi_c=0.0, phi_g=0.0, t=1.0, dtype=jnp.float64):
    """U = expm(-i t H). Reference: ConversionGainPhaseHamiltonian.construct_U."""
    H = conversion_gain_h(gc, gg, phi_c, phi_g, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)
    A = (H[1] * t[..., None, None], -H[0] * t[..., None, None])
    return expm_taylor(A)


def snail_effective_u(geff, t=1.0, dtype=jnp.float64):
    """iSwap-family generator (gain = 0). Reference hamiltonian.py:44-61."""
    return conversion_gain_u(geff, 0.0, t=t, dtype=dtype)


def smush_h(phi_c, phi_g, gc, gg, gx, gy, dtype=jnp.float64) -> cplx.CMat:
    """Conversion+gain plus simultaneous 1Q drives gx (A+A^dag), gy (B+B^dag).

    Reference: ConversionGainSmush (hamiltonian.py:114-129).
    """
    H = conversion_gain_h(gc, gg, phi_c, phi_g, dtype=dtype)
    gx = jnp.asarray(gx, dtype=dtype)
    gy = jnp.asarray(gy, dtype=dtype)
    zero = jnp.zeros_like(gx)
    H = cplx.add(H, _phased_pair(K_X, gx, zero, dtype))
    H = cplx.add(H, _phased_pair(K_Y, gy, zero, dtype))
    return H


def smush_u(phi_c, phi_g, gc, gg, gx_vec, gy_vec, t=1.0, dtype=jnp.float64):
    """Trotter product over piecewise-constant 1Q drive slices.

    U = prod_i expm(-i dt H(gx_i, gy_i)), dt = t / N.
    Reference: ConversionGainSmush.construct_U (hamiltonian.py:131-144).

    The slice loop UNROLLS for small static N (a Python loop, no
    lax.scan) — a PERFORMANCE choice: typical N here is 2-16 slices,
    where unrolling is simply the faster program; genuinely long slice
    vectors (OCT pulse shaping) keep the scan. Unrolling does NOT fix
    the TPU worker-crash fault (long Adam scans over this propagator
    kill the worker with the inner scan unrolled too — the bisect record
    in opt/gauss_newton.driven_adam_device); the actual mitigation is
    trip-count segmentation of the OUTER Adam loop
    (opt/gauss_newton.make_driven_solver, round 5), with the whole-solve
    host pin as its fallback mode.
    """
    gx_vec = jnp.asarray(gx_vec, dtype=dtype)
    gy_vec = jnp.asarray(gy_vec, dtype=dtype)
    n = gx_vec.shape[-1]
    dt = jnp.asarray(t, dtype=dtype) / n

    def slice_u(gx, gy):
        H = smush_h(phi_c, phi_g, gc, gg, gx, gy, dtype=dtype)
        A = (H[1] * dt, -H[0] * dt)
        return expm_taylor(A)

    if n <= 32:
        U = cplx.eye(4, dtype=dtype)
        for i in range(n):
            U = cplx.matmul(slice_u(gx_vec[..., i], gy_vec[..., i]), U)
        return U

    def step(U, gxy):
        return cplx.matmul(slice_u(*gxy), U), None

    U0 = cplx.eye(4, dtype=dtype)
    # move slice axis to front for scan
    xs = (jnp.moveaxis(gx_vec, -1, 0), jnp.moveaxis(gy_vec, -1, 0))
    U, _ = jax.lax.scan(step, U0, xs)
    return U


def smush_1q_phase_u(
    phi_a, phi_b, phi_c, phi_g, gc, gg, gz1, gz2, gx_vec, gy_vec, t=1.0,
    dtype=jnp.float64,
):
    """Smush with per-qubit drive phases and detunings.

    Reference: ConversionGainSmush1QPhase (hamiltonian.py:147-182).
    """
    gx_vec = jnp.asarray(gx_vec, dtype=dtype)
    gy_vec = jnp.asarray(gy_vec, dtype=dtype)
    n = gx_vec.shape[-1]
    dt = jnp.asarray(t, dtype=dtype) / n
    gz1 = jnp.asarray(gz1, dtype=dtype)
    gz2 = jnp.asarray(gz2, dtype=dtype)
    Hz = (
        gz1[..., None, None] * jnp.asarray(K_Z1, dtype=dtype)
        + gz2[..., None, None] * jnp.asarray(K_Z2, dtype=dtype),
        jnp.zeros((4, 4), dtype=dtype),
    )

    def step(U, gxy):
        gx, gy = gxy
        H = conversion_gain_h(gc, gg, phi_c, phi_g, dtype=dtype)
        H = cplx.add(H, _phased_pair(K_X, gx, jnp.asarray(phi_a, dtype=dtype), dtype))
        H = cplx.add(H, _phased_pair(K_Y, gy, jnp.asarray(phi_b, dtype=dtype), dtype))
        H = cplx.add(H, Hz)
        A = (H[1] * dt, -H[0] * dt)
        Ui = expm_taylor(A)
        return cplx.matmul(Ui, U), None

    U0 = cplx.eye(4, dtype=dtype)
    xs = (jnp.moveaxis(gx_vec, -1, 0), jnp.moveaxis(gy_vec, -1, 0))
    U, _ = jax.lax.scan(step, U0, xs)
    return U


def evolve_piecewise(Hs: cplx.CMat, psi0: cplx.CMat, dt) -> cplx.CMat:
    """States after each slice of a piecewise-constant Hamiltonian.

    Hs is a (n, d, d) cplx pair (slice axis leading), psi0 a (d,) pair;
    returns the (n+1, d) pair [psi0, psi1, ..., psin] with
    psi_{i+1} = expm(-i dt H_i) psi_i — one ``lax.scan``, exactly
    differentiable. Covers the reference's qutip ``mesolve`` usage for
    closed-system population dynamics (scripts/hamiltonian_sim.ipynb
    cells 1-2: excited-state transfer under ConversionGainSmush).
    """
    dt = jnp.asarray(dt, dtype=Hs[0].dtype)

    def step(psi, H):
        A = (H[1] * dt, -H[0] * dt)
        Ui = expm_taylor(A)
        psi = cplx.matvec(Ui, psi)
        return psi, psi

    _, states = jax.lax.scan(step, psi0, Hs)
    return (
        jnp.concatenate([psi0[0][None], states[0]], axis=0),
        jnp.concatenate([psi0[1][None], states[1]], axis=0),
    )


def evolve_smush(
    phi_c, phi_g, gc, gg, gx_vec, gy_vec, psi0, t=1.0, dtype=jnp.float64
) -> cplx.CMat:
    """Population dynamics under the smush Hamiltonian's drive slices.

    Returns the (n_slices+1, 4) state pair along the pulse; pair with
    ``populations`` for the notebook's mesolve population plots.
    """
    gx_vec = jnp.asarray(gx_vec, dtype=dtype)
    gy_vec = jnp.asarray(gy_vec, dtype=dtype)
    n = gx_vec.shape[-1]
    Hs = jax.vmap(
        lambda gx, gy: smush_h(phi_c, phi_g, gc, gg, gx, gy, dtype=dtype)
    )(jnp.moveaxis(gx_vec, -1, 0), jnp.moveaxis(gy_vec, -1, 0))
    return evolve_piecewise(Hs, psi0, jnp.asarray(t, dtype=dtype) / n)


def populations(states: cplx.CMat) -> jnp.ndarray:
    """|amplitude|^2 per basis state, any leading batch/time axes."""
    return states[0] ** 2 + states[1] ** 2


def fsim_h(g, eta, dtype=jnp.float64) -> cplx.CMat:
    """H = g (s+ s- + s- s+) + (g^2/|eta|) ZZ. Reference hamiltonian.py:220-235."""
    g = jnp.asarray(g, dtype=dtype)
    eta = jnp.asarray(eta, dtype=dtype)
    re = g[..., None, None] * jnp.asarray(K_HOP, dtype=dtype) + (
        (g**2) / jnp.abs(eta)
    )[..., None, None] * jnp.asarray(K_ZZ, dtype=dtype)
    return (re, jnp.zeros_like(re))


def fsim_u(g, eta, t=1.0, dtype=jnp.float64):
    H = fsim_h(g, eta, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)
    return expm_taylor((H[1] * t[..., None, None], -H[0] * t[..., None, None]))


def circulator_h(
    phi_ab, phi_ac, phi_bc, g_ab, g_ac, g_bc, dtype=jnp.float64
) -> cplx.CMat:
    """3Q circulator: pairwise phased conversion couplings.

    Reference: CirculatorHamiltonian (hamiltonian.py:244-272).
    """
    H = _phased_pair(K_AB, jnp.asarray(g_ab, dtype=dtype), jnp.asarray(phi_ab, dtype=dtype), dtype)
    H = cplx.add(H, _phased_pair(K_AC, jnp.asarray(g_ac, dtype=dtype), jnp.asarray(phi_ac, dtype=dtype), dtype))
    H = cplx.add(H, _phased_pair(K_BC, jnp.asarray(g_bc, dtype=dtype), jnp.asarray(phi_bc, dtype=dtype), dtype))
    return H


def circulator_u(phi_ab, phi_ac, phi_bc, g_ab, g_ac, g_bc, t=1.0, dtype=jnp.float64):
    H = circulator_h(phi_ab, phi_ac, phi_bc, g_ab, g_ac, g_bc, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)
    return expm_taylor((H[1] * t[..., None, None], -H[0] * t[..., None, None]))


def delta_conversion_gain_h(
    gphi_ab, gphi_ac, gphi_bc, g_ab, g_ac, g_bc,
    cphi_ab, cphi_ac, cphi_bc, c_ab, c_ac, c_bc,
    dtype=jnp.float64,
) -> cplx.CMat:
    """3Q pairwise conversion+gain (12 params), for parity-detection search.

    Reference: DeltaConversionGainHamiltonian (hamiltonian.py:275-335).
    Note: the reference has a copy/paste bug using cphi_ac for the ab pair
    (hamiltonian.py:288); here each pair uses its own phase as intended.
    """
    pairs = [
        (K_AB, K_AB_G, c_ab, cphi_ab, g_ab, gphi_ab),
        (K_AC, K_AC_G, c_ac, cphi_ac, g_ac, gphi_ac),
        (K_BC, K_BC_G, c_bc, cphi_bc, g_bc, gphi_bc),
    ]
    H = cplx.zeros((8, 8), dtype=dtype)
    for Kc, Kg, c, cphi, g, gphi in pairs:
        H = cplx.add(H, _phased_pair(Kc, jnp.asarray(c, dtype=dtype), jnp.asarray(cphi, dtype=dtype), dtype))
        H = cplx.add(H, _phased_pair(Kg, jnp.asarray(g, dtype=dtype), jnp.asarray(gphi, dtype=dtype), dtype))
    return H


def delta_conversion_gain_u(*args, t=1.0, dtype=jnp.float64):
    H = delta_conversion_gain_h(*args, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)
    return expm_taylor((H[1] * t[..., None, None], -H[0] * t[..., None, None]))
