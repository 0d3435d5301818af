"""Gate zoo: every gate family from reference custom_gates.py, as frozen
specs with pure matrix constructors.

Design: a ``Gate`` is an immutable dataclass (name, params, cost model); its
``matrix(dtype)`` returns an (re, im) pair. There is no qiskit ``Gate``
object graph — batched synthesis paths consume raw matrix pairs, and gates
carry the cost/duration metadata used by coverage scoring and transpilation.

Reference: src/slam/utils/gates/custom_gates.py (file:line cites per class).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from slam_decomposition_tpu.models import hamiltonians as ham
from slam_decomposition_tpu.ops import cplx, weyl

HALF_PI = np.pi / 2.0


@dataclasses.dataclass(frozen=True)
class Gate:
    """Immutable gate instance.

    ``cost`` is the speed-limit-normalized duration used throughout coverage
    scoring (custom_gates.py:208-212); ``duration`` defaults to cost.
    """

    name: str
    n_qubits: int
    params: Tuple[float, ...]
    _matrix_fn: Callable[..., cplx.CMat]
    _cost_fn: Optional[Callable[..., float]] = None
    duration_override: Optional[float] = None

    def matrix(self, dtype=jnp.float64) -> cplx.CMat:
        return self._matrix_fn(*self.params, dtype=dtype)

    def to_numpy(self):
        # host-side conversion by definition — build the matrix on the CPU
        # backend so eager construction never round-trips through a remote
        # accelerator (tunnel dispatch latency dominates at 4x4 scale)
        with jax.default_device(jax.devices("cpu")[0]):
            return cplx.to_numpy(self.matrix())

    def cost(self) -> float:
        if self._cost_fn is None:
            return 1.0
        return float(self._cost_fn(*self.params))

    @property
    def duration(self) -> float:
        if self.duration_override is not None:
            return self.duration_override
        return self.cost()

    def fidelity(self, base: float = 0.999) -> float:
        """1 - (1-base) * cost, floored at 0 (custom_gates.py:132-135)."""
        return max(1.0 - (1.0 - base) * self.cost(), 0.0)

    def __str__(self) -> str:
        return self.name


# ---------------------------------------------------------------- fixed 2Q


def _const_gate(name, n_qubits, arr):
    arr = np.asarray(arr, dtype=complex)

    def fn(*, dtype=jnp.float64):
        return cplx.from_numpy(arr, dtype=dtype)

    return Gate(name=name, n_qubits=n_qubits, params=(), _matrix_fn=fn)


CNOT = _const_gate("cx", 2, [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
CZ = _const_gate("cz", 2, np.diag([1, 1, 1, -1]))
SWAP = _const_gate(
    "swap", 2, [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]]
)
ISWAP = _const_gate(
    "iswap", 2, [[1, 0, 0, 0], [0, 0, 1j, 0], [0, 1j, 0, 0], [0, 0, 0, 1]]
)
IDENTITY2 = _const_gate("id2", 2, np.eye(4))


def riswap(alpha: float) -> Gate:
    """iSwap^alpha; cost = alpha (custom_gates.py:534-606)."""

    def fn(a, *, dtype=jnp.float64):
        half = a / 2.0
        c = np.cos(np.pi * half)
        s = np.sin(np.pi * half)
        arr = np.array(
            [[1, 0, 0, 0], [0, c, 1j * s, 0], [0, 1j * s, c, 0], [0, 0, 0, 1]]
        )
        return cplx.from_numpy(arr, dtype=dtype)

    return Gate(
        name=f"riswap({alpha})",
        n_qubits=2,
        params=(alpha,),
        _matrix_fn=fn,
        _cost_fn=lambda a: float(a),
    )


SQISWAP = riswap(0.5)


def canonical(c1: float, c2: float, c3: float, name: str = "can") -> Gate:
    """CAN in weylchamber units — CanonicalGate normalizes inputs in radians
    by 2/pi (custom_gates.py:384-392); here inputs are radians too."""

    def fn(a, b, c, *, dtype=jnp.float64):
        coords = jnp.asarray([a, b, c], dtype=dtype) / HALF_PI
        return weyl.canonical_gate(coords, dtype=dtype)

    return Gate(
        name=f"{name}({c1:.6f},{c2:.6f},{c3:.6f})",
        n_qubits=2,
        params=(c1, c2, c3),
        _matrix_fn=fn,
    )


def berkeley() -> Gate:
    """B gate = CAN(pi/4, pi/8, 0) (custom_gates.py:395-400)."""
    g = canonical(np.pi / 4, np.pi / 8, 0.0, name="B")
    return dataclasses.replace(g, name="B")


def fsim(theta: float, phi: float) -> Gate:
    """FSim(theta, phi) (custom_gates.py:489-503)."""

    def fn(th, ph, *, dtype=jnp.float64):
        c, s = np.cos(th), np.sin(th)
        arr = np.array(
            [
                [1, 0, 0, 0],
                [0, c, -1j * s, 0],
                [0, -1j * s, c, 0],
                [0, 0, 0, np.exp(1j * ph)],
            ]
        )
        return cplx.from_numpy(arr, dtype=dtype)

    return Gate(name=f"fsim({theta:.4f},{phi:.4f})", n_qubits=2, params=(theta, phi), _matrix_fn=fn)


def syc() -> Gate:
    """Sycamore = FSim(pi/2, pi/6) (custom_gates.py:522-531)."""
    g = fsim(np.pi / 2, np.pi / 6)
    return dataclasses.replace(g, name="SYC")


def fsim_hamiltonian_gate(g: float, eta: float, t: float) -> Gate:
    """FSim from its Hamiltonian (custom_gates.py:509-519)."""

    def fn(g_, eta_, t_, *, dtype=jnp.float64):
        return ham.fsim_u(g_, eta_, t=t_, dtype=dtype)

    return Gate(name=f"fsimH({g:.4f},{eta:.4f},{t:.4f})", n_qubits=2, params=(g, eta, t), _matrix_fn=fn)


# ------------------------------------------------------- conversion / gain


def _cg_cost(p1, p2, g1, g2, t):
    return (abs(g1) + abs(g2)) * t / HALF_PI


def conversion_gain_gate(p1: float, p2: float, g1: float, g2: float, t: float = 1.0) -> Gate:
    """The workhorse 2Q gate: phased conversion+gain evolution.

    params (p1, p2, g1, g2, t) = (phi_c, phi_g, gc, gg, t);
    cost = (|gc|+|gg|) t / (pi/2). Reference: ConversionGainGate
    (custom_gates.py:163-212) incl. the 8-decimal hash string.
    """

    def fn(p1_, p2_, g1_, g2_, t_, *, dtype=jnp.float64):
        return ham.conversion_gain_u(g1_, g2_, phi_c=p1_, phi_g=p2_, t=t_, dtype=dtype)

    return Gate(
        name=cg_hash(g1, g2, t),
        n_qubits=2,
        params=(p1, p2, g1, g2, t),
        _matrix_fn=fn,
        _cost_fn=_cg_cost,
    )


def cg_hash(g1: float, g2: float, t: float) -> str:
    """Content hash used as the coverage-cache key (custom_gates.py:187-193)."""
    return f"2QGate({g1:.8f}, {g2:.8f}, {t:.8f})"


def cg_normalize_duration(gate: Gate, new_duration: float) -> Gate:
    """Rescale g terms so t becomes new_duration, preserving the unitary and
    cost (custom_gates.py:195-206)."""
    p1, p2, g1, g2, t = gate.params
    scale = t / new_duration
    return conversion_gain_gate(p1, p2, g1 * scale, g2 * scale, new_duration)


def cg_canonicalize(gate: Gate) -> Gate:
    """Order gc < gg and normalize duration to 1 — the canonical form used
    to key coverage polytopes (reference basis.py:243-258)."""
    p1, p2, g1, g2, t = gate.params
    if g1 > g2:
        g1, g2 = g2, g1
    return cg_normalize_duration(conversion_gain_gate(p1, p2, g1, g2, t), 1.0)


def smush_gate(pc, pg, gc, gg, gx_vec, gy_vec, t=1.0) -> Gate:
    """Parallel-driven conversion+gain gate; cost ignores the 1Q drives
    (custom_gates.py:215-257)."""
    gx_vec = tuple(float(x) for x in np.atleast_1d(gx_vec))
    gy_vec = tuple(float(y) for y in np.atleast_1d(gy_vec))
    n = len(gx_vec)

    def fn(pc_, pg_, gc_, gg_, *rest, dtype=jnp.float64):
        gx = jnp.asarray(rest[:n], dtype=dtype)
        gy = jnp.asarray(rest[n:-1], dtype=dtype)
        t_ = rest[-1]
        return ham.smush_u(pc_, pg_, gc_, gg_, gx, gy, t=t_, dtype=dtype)

    return Gate(
        name=f"2QSmushGate({gc:.8f}, {gg:.8f}, {t:.8f}, n={n})",
        n_qubits=2,
        params=(pc, pg, gc, gg) + gx_vec + gy_vec + (t,),
        _matrix_fn=fn,
        _cost_fn=lambda pc_, pg_, gc_, gg_, *rest: (abs(gc_) + abs(gg_)) * rest[-1] / HALF_PI,
    )


# ----------------------------------------------------------------- 3Q gates


def circulator_snail_gate(p1, p2, p3, g1, g2, g3, t=1.0) -> Gate:
    """3Q circulator gate; cost = sum|g| * t / (pi/2)
    (custom_gates.py:95-138)."""

    def fn(p1_, p2_, p3_, g1_, g2_, g3_, t_, *, dtype=jnp.float64):
        return ham.circulator_u(p1_, p2_, p3_, g1_, g2_, g3_, t=t_, dtype=dtype)

    return Gate(
        name="3QGate",
        n_qubits=3,
        params=(p1, p2, p3, g1, g2, g3, t),
        _matrix_fn=fn,
        _cost_fn=lambda p1_, p2_, p3_, g1_, g2_, g3_, t_: (
            (abs(g1_) + abs(g2_) + abs(g3_)) * t_ / HALF_PI
        ),
    )


def vswap(t: float = 1.0) -> Gate:
    """VSWAP (custom_gates.py:141-150)."""
    v_nn = 4.0 / np.sqrt(2.0)
    g = circulator_snail_gate(
        np.pi / 2, np.pi / 2, 0.0, np.pi / v_nn, np.pi / v_nn, 0.0, t
    )
    return dataclasses.replace(g, name="VSWAP")


def delta_swap(t: float = 1.0) -> Gate:
    """Delta-iSWAP (custom_gates.py:153-160)."""
    nn = 3.0 * np.sqrt(3.0) / 2.0
    g = circulator_snail_gate(
        np.pi / 2, -np.pi / 2, np.pi / 2, np.pi / nn, np.pi / nn, np.pi / nn, t
    )
    return dataclasses.replace(g, name="D-iSWAP")


CPARITY_SWAP = _const_gate(
    "cpswap",
    3,
    [
        [1, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 1, 0, 0, 0],
        [0, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 1, 0],
        [0, 0, 1, 0, 0, 0, 0, 0],
        [0, 0, 0, 1, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 1, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 1],
    ],
)  # custom_gates.py:316-361

MARGOLUS = _const_gate(
    "margolus",
    3,
    np.diag([1.0, 1, 1, 1, 1, -1, 1, 1]) @ np.eye(8)[:, [0, 1, 2, 3, 4, 5, 7, 6]],
)  # custom_gates.py:364-381

CCZ = _const_gate("ccz", 3, np.diag([1, 1, 1, 1, 1, 1, 1, -1]))  # :409-426

_ccix = np.eye(8, dtype=complex)
_ccix[6, 6] = _ccix[7, 7] = 0
_ccix[6, 7] = _ccix[7, 6] = 1j
CCIX = _const_gate("ccix", 3, _ccix)  # :429-446

_ciswap = np.eye(8, dtype=complex)
_ciswap[5, 5] = _ciswap[6, 6] = 0
_ciswap[5, 6] = _ciswap[6, 5] = 1j
CISWAP = _const_gate("ciswap", 3, _ciswap)  # :449-466

PERES = _const_gate(
    "peres", 3, np.eye(8)[:, [0, 1, 2, 3, 7, 6, 5, 4]]
)  # :469-486


def custom_cost_gate(unitary, name: str, cost: float = 1.0, duration: float = 1.0, n_qubits: int = 2) -> Gate:
    """Wrap an arbitrary unitary with a cost/duration (CustomCostGate,
    custom_gates.py:28-57)."""
    arr = np.asarray(unitary, dtype=complex)

    def fn(*, dtype=jnp.float64):
        return cplx.from_numpy(arr, dtype=dtype)

    return Gate(
        name=name,
        n_qubits=n_qubits,
        params=(),
        _matrix_fn=fn,
        _cost_fn=lambda: cost,
        duration_override=duration,
    )


# named CG instances used throughout benchmarks (parallel_drive_volume.py:91-97)
def cg_iswap(t=1.0):
    return conversion_gain_gate(0, 0, np.pi / 2, 0, t)


def cg_sqiswap():
    return conversion_gain_gate(0, 0, np.pi / 2, 0, 0.5)


def cg_cnot(t=1.0):
    return conversion_gain_gate(0, 0, np.pi / 4, np.pi / 4, t)


def cg_sqcnot():
    return conversion_gain_gate(0, 0, np.pi / 4, np.pi / 4, 0.5)


def cg_b(t=1.0):
    return conversion_gain_gate(0, 0, 3 * np.pi / 8, np.pi / 8, t)


def cg_sqb():
    return conversion_gain_gate(0, 0, 3 * np.pi / 8, np.pi / 8, 0.5)
