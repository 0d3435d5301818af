"""Variational circuit templates as pure parameter->unitary evaluators.

TPU-first re-design of reference basis.py / basisv2.py / basis_abc.py: a
template is not a qiskit object graph re-bound per objective evaluation
(reference basis.py:102-116, the #1 hot-loop cost) but a closed-form chain

    U(x) = L_k G_k ... L_1 G_1 L_0

of 1Q layers L_i (u3 x u3, or rz-only) and 2Q basis gates G_i, evaluated as
a fixed-shape complex-pair matmul chain that jits, vmaps over
(targets x restarts), and differentiates exactly.

Layout of the parameter vector x (documented, replaces qiskit's
name-sorted Parameter ordering):
    [ all 1Q-layer params (layer-major, qubit-major, 3 per u3 / 1 per rz) |
      all 2Q-gate params (cycle-major) ]
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from slam_decomposition_tpu.models.gates import Gate
from slam_decomposition_tpu.ops import cplx, su2


@dataclasses.dataclass(frozen=True)
class Ansatz:
    """A built template of fixed depth k: shapes are static under jit."""

    n_qubits: int
    k: int
    n_params: int
    n_params_1q: int
    eval_fn: Callable[[jnp.ndarray], cplx.CMat]  # x -> (2^n, 2^n) pair
    lower: np.ndarray  # (n_params,) sampling/bound box
    upper: np.ndarray
    use_bounds: bool = False
    # circuit cost of the instantiated 2Q gates (basisv2.py:96-127); None
    # means "sum of fixed gate costs" (constant)
    cost_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    fixed_cost: float = 0.0
    # (k, 4, 4) complex constants of the per-cycle 2Q gates when the
    # template is a plain u3-layer/constant-gate chain on 2 qubits — the
    # structure the fused Pallas Adam kernel (ops/pallas_chain.py) needs;
    # None when the template doesn't match that shape
    chain_gates: Optional[np.ndarray] = None
    # True when eval_fn contains a driven/Trotterized propagator (expm
    # chains): long Adam scans over such bodies crash this environment's
    # TPU worker (gauss_newton.driven_adam_device), so the optimizer
    # host-pins Adam-bearing solves for these templates on TPU backends
    driven: bool = False

    def circuit_cost(self, x):
        if self.cost_fn is None:
            return self.fixed_cost
        return self.cost_fn(jnp.asarray(x))


def _embed_2q(U4: cplx.CMat, edge: Tuple[int, int], n_qubits: int) -> cplx.CMat:
    """Embed a 4x4 gate acting on `edge` into 2^n x 2^n (big-endian order).

    Host-side constant construction (numpy) — only used at template build.
    """
    if n_qubits == 2 and tuple(edge) == (0, 1):
        return U4
    dim = 2**n_qubits
    U = cplx.to_numpy(U4)
    full = np.zeros((dim, dim), dtype=complex)
    others = [q for q in range(n_qubits) if q not in edge]
    for i in range(dim):
        bits_i = [(i >> (n_qubits - 1 - q)) & 1 for q in range(n_qubits)]
        for j in range(dim):
            bits_j = [(j >> (n_qubits - 1 - q)) & 1 for q in range(n_qubits)]
            if any(bits_i[q] != bits_j[q] for q in others):
                continue
            a = (bits_i[edge[0]] << 1) | bits_i[edge[1]]
            b = (bits_j[edge[0]] << 1) | bits_j[edge[1]]
            full[i, j] = U[a, b]
    return cplx.from_numpy(full)


def _layer_1q(params, n_qubits: int, vz_only: bool, dtype) -> cplx.CMat:
    """Tensor product of per-qubit 1Q gates from a flat param slice."""
    per = 1 if vz_only else 3
    mats = []
    for q in range(n_qubits):
        p = params[q * per : (q + 1) * per]
        if vz_only:
            mats.append(su2.rz(p[0]))
        else:
            mats.append(su2.u3(p[0], p[1], p[2]))
    out = mats[0]
    for m in mats[1:]:
        out = cplx.kron(out, m)
    return out


def build_ansatz(
    gate_seq: Sequence[Gate],
    edges: Optional[Sequence[Tuple[int, int]]] = None,
    n_qubits: int = 2,
    no_exterior_1q: bool = False,
    vz_only: bool = False,
    dtype=jnp.float64,
) -> Ansatz:
    """Template over a fixed (possibly mixed-order) 2Q gate sequence.

    Mirrors CircuitTemplate semantics (basis.py:51-169): an initial 1Q layer
    (unless no_exterior_1q), then per cycle the 2Q gate followed by a 1Q
    layer on its edge qubits (here: on all qubits — equal expressive power
    on 2Q, simpler static shapes; the final layer is dropped when
    no_exterior_1q). Mixed-order sequences subsume
    MixedOrderBasisCircuitTemplate.build (basis.py:332-359).
    """
    k = len(gate_seq)
    if edges is None:
        edges = [(0, 1)] * k
    per = 1 if vz_only else 3
    layer_p = per * n_qubits
    n_layers = (k + 1) if not no_exterior_1q else max(k - 1, 0)
    n_1q = n_layers * layer_p

    # precompute embedded gate constants (stacked). Built on HOST CPU and
    # held as numpy: eager constant construction on the default accelerator
    # is pure dispatch latency (each tiny op is a device round-trip — on the
    # remote-tunnel rig this made template build take minutes, and it buys
    # nothing: jit embeds the constants as literals either way).
    with jax.default_device(jax.devices("cpu")[0]):
        Gs = cplx.stack(
            [
                cplx.astype(
                    _embed_2q(g.matrix(dtype=jnp.float64), e, n_qubits), dtype
                )
                for g, e in zip(gate_seq, edges)
            ]
        )
        Gs = (np.asarray(Gs[0]), np.asarray(Gs[1]))
    fixed_cost = float(sum(g.cost() for g in gate_seq))

    def eval_fn(x):
        # follow the parameter dtype so an f32 optimization phase stays f32
        # end-to-end (f64 constants would silently promote everything)
        x = jnp.asarray(x)
        dt = x.dtype
        G = (Gs[0].astype(dt), Gs[1].astype(dt))
        if no_exterior_1q:
            U = (G[0][0], G[1][0])
            for i in range(1, k):
                if i - 1 < n_layers:
                    L = _layer_1q(
                        x[(i - 1) * layer_p : i * layer_p], n_qubits, vz_only, dt
                    )
                    U = cplx.matmul(L, U)
                U = cplx.matmul((G[0][i], G[1][i]), U)
            return U
        else:
            U = _layer_1q(x[:layer_p], n_qubits, vz_only, dt)
            for i in range(k):
                U = cplx.matmul((G[0][i], G[1][i]), U)
                L = _layer_1q(
                    x[(i + 1) * layer_p : (i + 2) * layer_p], n_qubits, vz_only, dt
                )
                U = cplx.matmul(L, U)
            return U

    lower = np.full(n_1q, 0.0)
    upper = np.full(n_1q, 2 * np.pi)  # v1 guess range (basis.py:111)
    chain_gates = None
    if (
        n_qubits == 2
        and not vz_only
        and not no_exterior_1q
        and all(tuple(e) == (0, 1) for e in edges)
        and k > 0
    ):
        chain_gates = np.stack([g.to_numpy() for g in gate_seq])
    return Ansatz(
        n_qubits=n_qubits,
        k=k,
        n_params=n_1q,
        n_params_1q=n_1q,
        eval_fn=eval_fn,
        lower=lower,
        upper=upper,
        fixed_cost=fixed_cost,
        chain_gates=chain_gates,
    )


def build_ansatz_v2(
    gate_fn: Callable[..., cplx.CMat],
    n_gate_params: int,
    k: int,
    n_qubits: int = 2,
    edges: Optional[Sequence[Tuple[int, int]]] = None,
    no_exterior_1q: bool = False,
    vz_only: bool = False,
    gate_cost_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    gate_bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    dtype=jnp.float64,
) -> Ansatz:
    """Template with *parameterized* 2Q(+) gates — CircuitTemplateV2
    (basisv2.py:27-299).

    ``gate_fn(qparams, dtype)`` returns the gate matrix pair for one cycle's
    ``n_gate_params`` parameters (vector-valued smush params are just a
    longer slice — subsumes param_vec_expand, basisv2.py:48-50).
    ``gate_cost_fn`` maps a cycle's qparams to its cost (for the cost
    ceiling constraint, basisv2.py:192-199).
    """
    if edges is None:
        edges = [(0, 1)] * k
    per = 1 if vz_only else 3
    layer_p = per * n_qubits
    n_layers = (k + 1) if not no_exterior_1q else max(k - 1, 0)
    n_1q = n_layers * layer_p
    n_total = n_1q + k * n_gate_params

    def gate_at(x, i):
        q = x[n_1q + i * n_gate_params : n_1q + (i + 1) * n_gate_params]
        G = gate_fn(q, dtype=dtype)
        if n_qubits != 2 or tuple(edges[i]) != (0, 1):
            raise NotImplementedError(
                "parameterized gates on >2 qubits use explicit embedding"
            )
        return G

    def eval_fn(x):
        x = jnp.asarray(x, dtype=dtype)
        if no_exterior_1q:
            U = gate_at(x, 0)
            for i in range(1, k):
                L = _layer_1q(
                    x[(i - 1) * layer_p : i * layer_p], n_qubits, vz_only, dtype
                )
                U = cplx.matmul(L, U)
                U = cplx.matmul(gate_at(x, i), U)
            return U
        else:
            U = _layer_1q(x[:layer_p], n_qubits, vz_only, dtype)
            for i in range(k):
                U = cplx.matmul(gate_at(x, i), U)
                L = _layer_1q(
                    x[(i + 1) * layer_p : (i + 2) * layer_p], n_qubits, vz_only, dtype
                )
                U = cplx.matmul(L, U)
            return U

    # default bounds: (-4 pi, 4 pi) — basisv2.py:157
    lower = np.full(n_total, -4 * np.pi)
    upper = np.full(n_total, 4 * np.pi)
    if gate_bounds is not None:
        glo, ghi = gate_bounds
        for i in range(k):
            lower[n_1q + i * n_gate_params : n_1q + (i + 1) * n_gate_params] = glo
            upper[n_1q + i * n_gate_params : n_1q + (i + 1) * n_gate_params] = ghi

    cost_fn = None
    if gate_cost_fn is not None:

        def cost_fn(x):
            x = jnp.asarray(x, dtype=dtype)
            total = 0.0
            for i in range(k):
                q = x[n_1q + i * n_gate_params : n_1q + (i + 1) * n_gate_params]
                total = total + gate_cost_fn(q)
            return total

    return Ansatz(
        n_qubits=n_qubits,
        k=k,
        n_params=n_total,
        n_params_1q=n_1q,
        eval_fn=eval_fn,
        lower=lower,
        upper=upper,
        use_bounds=gate_bounds is not None,
        cost_fn=cost_fn,
    )


def cycle_gates(base_gates: Sequence[Gate], k: int) -> List[Gate]:
    """The reference's itertools.cycle over base gates (basis.py:69-73)."""
    return [base_gates[i % len(base_gates)] for i in range(k)]


def hamiltonian_ansatz(
    u_fn: Callable[..., cplx.CMat],
    n_params: int,
    lower=None,
    upper=None,
    n_qubits: int = 2,
) -> Ansatz:
    """Optimize directly over Hamiltonian parameters: eval(x) = U(x[0], ...,
    x[n-1]). HamiltonianTemplate (reference basis.py:24-48) — e.g. pass
    models.hamiltonians.circulator_u with n_params=7 to search 3Q gates.
    """
    import numpy as _np

    lower = _np.zeros(n_params) if lower is None else _np.asarray(lower)
    upper = _np.ones(n_params) if upper is None else _np.asarray(upper)

    def eval_fn(x):
        return u_fn(*[x[i] for i in range(n_params)])

    return Ansatz(
        n_qubits=n_qubits,
        k=1,
        n_params=n_params,
        n_params_1q=0,
        eval_fn=eval_fn,
        driven=True,
        lower=lower,
        upper=upper,
    )
