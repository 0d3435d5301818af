"""Target distributions (reference src/slam/sampler.py), batched.

Samplers return stacked numpy arrays of unitaries (B, d, d) — the batched
optimizer consumes whole distributions at once instead of iterating
(sampler.py:25-27 yields one at a time).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from slam_decomposition_tpu.models.gates import Gate


def haar_sample(n_samples: int = 1, n_qubits: int = 2, seed: Optional[int] = None):
    """Haar-random U(2^n) via QR of complex Ginibre (sampler.py:62-71)."""
    rng = np.random.default_rng(seed)
    d = 2**n_qubits
    out = np.empty((n_samples, d, d), dtype=complex)
    z = (rng.standard_normal((n_samples, d, d)) + 1j * rng.standard_normal((n_samples, d, d))) / np.sqrt(2)
    for i in range(n_samples):
        q, r = np.linalg.qr(z[i])
        ph = np.diag(r) / np.abs(np.diag(r))
        out[i] = q * ph
    return out


_H = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
_S = np.diag([1, 1j])
_CNOT = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
_I2 = np.eye(2)


def _clifford_generators(n_qubits: int):
    gens = []
    if n_qubits == 1:
        return [_H, _S]
    if n_qubits == 2:
        gens = [np.kron(_H, _I2), np.kron(_I2, _H), np.kron(_S, _I2), np.kron(_I2, _S), _CNOT]
        return gens
    raise NotImplementedError


_CLIFFORD_CACHE = {}


def _clifford_group(n_qubits: int) -> np.ndarray:
    """The full n-qubit Clifford group modulo global phase, enumerated by
    BFS over {H_i, S_i, CNOT_ij} with phase-canonicalized matrices
    (|C_1| = 24, |C_2| = 11520). Exact replacement for qiskit's
    random_clifford (reference sampler.py:57-59)."""
    if n_qubits in _CLIFFORD_CACHE:
        return _CLIFFORD_CACHE[n_qubits]
    gens = _clifford_generators(n_qubits)
    d = 2**n_qubits

    def canon(U):
        flat = U.reshape(-1)
        idx = int(np.argmax(np.abs(flat) > 1e-9))
        Uc = U * (abs(flat[idx]) / flat[idx])
        return Uc, tuple(np.round(Uc.reshape(-1), 6).view(float))

    seen = {}
    frontier = [np.eye(d, dtype=complex)]
    Uc, key = canon(frontier[0])
    seen[key] = Uc
    while frontier:
        nxt = []
        for U in frontier:
            for g in gens:
                Uc, key = canon(g @ U)
                if key not in seen:
                    seen[key] = Uc
                    nxt.append(Uc)
        frontier = nxt
    group = np.stack(list(seen.values()))
    expected = {1: 24, 2: 11520}.get(n_qubits)
    if expected is not None and len(group) != expected:
        raise RuntimeError(f"Clifford enumeration found {len(group)} != {expected}")
    _CLIFFORD_CACHE[n_qubits] = group
    return group


def clifford_sample(n_samples: int = 1, n_qubits: int = 2, seed: Optional[int] = None):
    """Exactly uniform random Clifford unitaries (up to global phase)."""
    group = _clifford_group(n_qubits)
    rng = np.random.default_rng(seed)
    return group[rng.integers(0, len(group), size=n_samples)].copy()


def gate_sample(gate: Gate, n_samples: int = 1):
    """Repeat a fixed gate's unitary (sampler.py:33-39)."""
    U = gate.to_numpy()
    return np.broadcast_to(U, (n_samples, *U.shape)).copy()


def haar_exact_sample(
    n_uses: int, n_samples: int = 1, seed: Optional[int] = None, max_tries: int = 10_000
):
    """Haar samples known a priori to need exactly ``n_uses`` sqiswap
    applications — ground-truthed by the analytic synthesis count
    (Haar2Sample/Haar3Sample, sampler.py:73-107; the reference counted
    riswap ops after RootiSwapWeylDecomposition)."""
    from slam_decomposition_tpu.transpile.kak import sqiswap_decompose

    rng = np.random.default_rng(seed)
    out = []
    tries = 0
    while len(out) < n_samples and tries < max_tries:
        tries += 1
        U = haar_sample(1, seed=int(rng.integers(0, 2**31)))[0]
        _, n = sqiswap_decompose(U)
        if n == n_uses:
            out.append(U)
    if len(out) < n_samples:
        raise RuntimeError(f"could not draw {n_samples} exact-{n_uses} samples")
    return np.stack(out)


def circuit_sample(circuit):
    """All consolidated 2Q block unitaries of a circuit (sampler.py:42-54).

    ``circuit`` is a slam_decomposition_tpu.transpile.ir.Circuit; blocks are
    collected+consolidated like Collect2qBlocks+ConsolidateBlocks.
    """
    from slam_decomposition_tpu.transpile.consolidate import consolidate_2q_blocks

    blocks = consolidate_2q_blocks(circuit)
    return np.stack([b.unitary for b in blocks])
