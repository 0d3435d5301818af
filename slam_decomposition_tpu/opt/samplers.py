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
    """Haar-random U(2^n) via QR of complex Ginibre (sampler.py:62-71).

    Batched: one stacked QR for the whole draw (numpy's qr broadcasts over
    leading dims), no per-sample Python loop.
    """
    rng = np.random.default_rng(seed)
    d = 2**n_qubits
    z = (
        rng.standard_normal((n_samples, d, d))
        + 1j * rng.standard_normal((n_samples, d, d))
    ) / np.sqrt(2)
    q, r = np.linalg.qr(z)
    diag = np.einsum("...ii->...i", r)
    ph = diag / np.abs(diag)
    return q * ph[:, None, :]


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


_COUNT_JIT = None


def sqiswap_count_batch(Us: np.ndarray) -> np.ndarray:
    """Analytic sqiswap application counts (0/1/2/3) for a batch of U(4)s.

    Pure coordinate geometry, no synthesis: one batched c1c2c3 device call,
    then the Huang et al. (arXiv:2105.06074) region test |z| <= x - y in
    the positive canonical cell (the CNOT-mirror fold c1 > 1/2 maps
    (c1,c2,c3) -> (1-c1,c2,c3) up to the irrelevant sign of c3). Matches
    transpile.kak.sqiswap_decompose's emitted count exactly (tested).
    Reference counterpart: Haar2Sample/Haar3Sample counted riswap ops after
    a full per-sample RootiSwapWeylDecomposition (sampler.py:73-107).
    """
    import jax

    from slam_decomposition_tpu.ops import cplx, weyl

    global _COUNT_JIT
    if _COUNT_JIT is None:
        _COUNT_JIT = jax.jit(weyl.c1c2c3)
    Us = np.asarray(Us)
    single = Us.ndim == 2
    if single:
        Us = Us[None]
    m = len(Us)
    # pad to the next power of two: bounds the number of compiled shapes
    p = 1 << (m - 1).bit_length()
    padded = np.concatenate([Us, np.broadcast_to(np.eye(4), (p - m, 4, 4))])
    with jax.default_device(jax.devices("cpu")[0]):
        c = np.asarray(_COUNT_JIT(cplx.from_numpy(padded)))[:m]
    fold = c[:, 0] > 0.5
    x = np.where(fold, 1.0 - c[:, 0], c[:, 0])
    y = c[:, 1]
    az = np.abs(c[:, 2])
    tol = 1e-8
    n = np.full(len(c), 3, dtype=np.int64)
    n[az <= x - y + tol] = 2
    n[(np.abs(x - 0.25) < tol) & (np.abs(y - 0.25) < tol) & (az < tol)] = 1
    n[(x < tol) & (y < tol) & (az < tol)] = 0
    return n[0] if single else n


def haar_exact_sample(
    n_uses: int, n_samples: int = 1, seed: Optional[int] = None, max_tries: int = 10_000
):
    """Haar samples known a priori to need exactly ``n_uses`` sqiswap
    applications — ground-truthed by the analytic synthesis count
    (Haar2Sample/Haar3Sample, sampler.py:73-107).

    Batched: each round draws one oversized Haar batch (sized by the Haar
    measure of the count region: P[2] ~ 0.79, P[3] ~ 0.21), computes all
    counts in a single device call, and keeps the matches — the same
    distribution as the reference's one-at-a-time rejection loop (a filter
    commutes with i.i.d. draws), at thousands of samples per call.
    ``max_tries`` keeps its meaning as the total-draw budget.
    """
    rng = np.random.default_rng(seed)
    region_p = {0: 1e-4, 1: 1e-4, 2: 0.79, 3: 0.21}.get(n_uses, 0.25)
    out = []
    drawn = 0
    n_found = 0
    while n_found < n_samples and drawn < max_tries:
        want = n_samples - n_found
        batch = min(
            max(int(want / region_p * 1.3) + 8, 64), max_tries - drawn
        )
        U = haar_sample(batch, seed=int(rng.integers(0, 2**31)))
        drawn += batch
        counts = sqiswap_count_batch(U)
        hit = U[counts == n_uses]
        n_found += len(hit)
        out.append(hit)
    if n_found < n_samples:
        raise RuntimeError(f"could not draw {n_samples} exact-{n_uses} samples")
    return np.concatenate(out)[:n_samples]


def circuit_sample(circuit):
    """All consolidated 2Q block unitaries of a circuit (sampler.py:42-54).

    ``circuit`` is a slam_decomposition_tpu.transpile.ir.Circuit; blocks are
    collected+consolidated like Collect2qBlocks+ConsolidateBlocks.
    """
    from slam_decomposition_tpu.transpile.consolidate import consolidate_2q_blocks

    blocks = consolidate_2q_blocks(circuit)
    return np.stack([b.unitary for b in blocks])
