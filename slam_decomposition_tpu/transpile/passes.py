"""Speed-limit-aware transpilation passes and pass managers.

Reference: speed_limit_pass.py — duration analysis (fooAnalysis :36-101),
winner-based 2Q substitution (SpeedGateSubstitute :104-314), the
parallel-drive identity pass (OptimizedSqiswapSub :317-464), and the three
pass-manager recipes (:468-551).

TPU redesign: passes operate on consolidated 2Q blocks; every per-block
coordinate/range computation happens as one batched device call instead of
per-node qiskit DAG surgery. 1Q parameters in substituted templates are
duration placeholders (as in the reference, :311-313) — exact 1Q fits come
from the variational engine when fidelity-faithful output is requested.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from slam_decomposition_tpu.coverage.mixed import MixedOrderBasisTemplate
from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.transpile.consolidate import consolidate_2q_blocks
from slam_decomposition_tpu.transpile.ir import Circuit, unroll_3q_or_more

logger = logging.getLogger(__name__)

_TEMPLATE_CACHE: Dict[str, MixedOrderBasisTemplate] = {}
_C1C2C3_JIT = None


def _c1c2c3_batch(us: np.ndarray) -> np.ndarray:
    global _C1C2C3_JIT
    import jax

    from slam_decomposition_tpu.ops import cplx, weyl

    if _C1C2C3_JIT is None:
        _C1C2C3_JIT = jax.jit(weyl.c1c2c3)
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(_C1C2C3_JIT(cplx.from_numpy(np.asarray(us))))


def _cached_template(key: str, factory):
    if key not in _TEMPLATE_CACHE:
        _TEMPLATE_CACHE[key] = factory()
    return _TEMPLATE_CACHE[key]


# ----------------------------------------------------------------- analysis


def duration_analysis(circ: Circuit, duration_1q: float = 0.0) -> Dict:
    """Critical-path duration + gate counts. Per-op durations: explicit op
    duration, else duration_1q for 1Q ops, else 1 for cx (fooAnalysis,
    speed_limit_pass.py:36-101; this computes the true duration-weighted
    critical path rather than the reference's op-count longest path, whose
    mismatch the reference itself flags at :44)."""
    finish = [0.0] * circ.n_qubits
    counts: Dict[str, int] = {}
    # reference-metric DP: longest path by NODE COUNT through the per-qubit
    # dependency DAG, then sum of durations along that path (ties broken
    # toward larger duration for determinism)
    plen = [0] * circ.n_qubits  # longest node-count path ending at qubit q
    pdur = [0.0] * circ.n_qubits
    for op in circ.ops:
        if op.duration is not None:
            d = op.duration
        elif op.n_qubits == 1:
            d = duration_1q
        elif op.name == "cx":
            d = 1.0
        else:
            d = 1.0
        start = max(finish[q] for q in op.qubits)
        for q in op.qubits:
            finish[q] = start + d
        best = max((plen[q], pdur[q]) for q in op.qubits)
        for q in op.qubits:
            plen[q] = best[0] + 1
            pdur[q] = best[1] + d
        counts[op.name] = counts.get(op.name, 0) + 1
    return {
        "duration": max(finish) if finish else 0.0,
        # the reference's property_set["duration"]: durations summed along
        # dag.longest_path(), which is the node-count-longest path — NOT the
        # true duration-critical path (its own FIXME, speed_limit_pass.py:44)
        "duration_ref_metric": (
            max(zip(plen, pdur))[1] if circ.n_qubits else 0.0
        ),
        "gate_counts": counts,
        "depth": circ.depth(),
    }


def _blocks_to_circuit(circ: Circuit, substitutions: Dict[int, Circuit]) -> Circuit:
    """Rebuild a circuit replacing block i with its substitution circuit
    (qubit indices inside substitutions are block-local 0/1)."""
    from slam_decomposition_tpu.transpile.consolidate import collect_2q_blocks

    blocks, leftovers = collect_2q_blocks(circ)
    events = [(pos, op, None) for pos, op in leftovers]
    for i, b in enumerate(blocks):
        events.append((max(b.positions), i, b))
    events.sort(key=lambda e: e[0])
    out = Circuit(circ.n_qubits)
    for _, tag, b in events:
        if b is None:
            out.append(tag)
            continue
        sub = substitutions.get(tag)
        if sub is None:
            out.unitary(b.unitary, b.qubits, name="unitary2q")
            continue
        for op in sub.ops:
            mapped = tuple(b.qubits[q] for q in op.qubits)
            out.append(dataclasses.replace(op, qubits=mapped))
    return out


def _random_1q_layer(sub: Circuit, rng, duration_1q):
    for q in (0, 1):
        sub.append(
            "u", (q,), params=tuple(rng.uniform(0, 2 * np.pi, 3)), duration=duration_1q
        )


def optimize_1q_gates(circ: Circuit) -> Circuit:
    """Merge consecutive 1Q ops on the same qubit into one op (the
    Optimize1qGates role, speed_limit_pass.py:492/526/549 — without it the
    substitution passes double-count 1Q layer durations). Matrices multiply
    when available; parameter placeholders merge by replacement."""
    out = Circuit(circ.n_qubits)
    last_1q: Dict[int, int] = {}  # qubit -> index in out.ops
    for op in circ.ops:
        if op.n_qubits == 1:
            q = op.qubits[0]
            prev = last_1q.get(q)
            if prev is not None:
                pop = out.ops[prev]
                try:
                    m = op.to_matrix() @ pop.to_matrix()
                    out.ops[prev] = dataclasses.replace(
                        pop, name="u1q", params=(), matrix=m
                    )
                except KeyError:
                    out.ops[prev] = op
                continue
            out.append(op)
            last_1q[q] = len(out.ops) - 1
        else:
            for q in op.qubits:
                last_1q.pop(q, None)
            out.append(op)
    return out


# ---------------------------------------------------- winner substitution


def speed_gate_substitute(
    circ: Circuit,
    strategy: str = "basic_overall",
    speed_method: str = "linear",
    duration_1q: float = 0.0,
    basic_metric: int = 0,
    lambda_weight: float = 0.47,
    family_extension: bool = False,
    coupling_edges: Optional[List[Tuple[int, int]]] = None,
    seed: int = 0,
) -> Circuit:
    """SpeedGateSubstitute (speed_limit_pass.py:104-314): pick winner
    gate(s) from the candidate DB, replace every 2Q block with the winner
    template at its monodromy range."""
    from slam_decomposition_tpu.explore.candidates import get_group_name
    from slam_decomposition_tpu.explore.winners import pick_winner

    circ = unroll_3q_or_more(circ)
    blocks = consolidate_2q_blocks(circ)
    group = get_group_name(speed_method, duration_1q)
    rng = np.random.default_rng(seed)
    smush = "smush" in strategy

    def substitute_with(template, scaled_gate, target, sub_seed_rng):
        if family_extension:
            from slam_decomposition_tpu.explore.family import recursive_sibling_check

            base = template.base_gates[0]
            _, cost = recursive_sibling_check(
                template.coverage, base, target,
                cost_1q=duration_1q, basis_factor=scaled_gate.duration,
                use_smush=smush,
            )
            sub = Circuit(2)
            # dummy op carrying the family-extended duration
            # (speed_limit_pass.py:196-214)
            sub.unitary(target, (0, 1), name="dummy",
                        duration=max(cost - 2 * duration_1q, 0.0))
            return sub
        k, cp = template.range_for(target)
        sub = Circuit(2)
        _random_1q_layer(sub, sub_seed_rng, duration_1q)
        for _ in range(k):
            sub.append(
                "winner2q", (0, 1), matrix=scaled_gate.to_numpy(),
                duration=scaled_gate.duration,
            )
            _random_1q_layer(sub, sub_seed_rng, duration_1q)
        return sub

    subs: Dict[int, Circuit] = {}
    if strategy in ("basic_overall", "lambda_weight", "basic_smush", "lambda_smush"):
        metric = basic_metric if "basic" in strategy else (-1, lambda_weight)
        winner, scaled = pick_winner(
            group, metric=metric, smush=smush, family_extension=family_extension
        )
        template = MixedOrderBasisTemplate([winner], smush=smush)
        for i, b in enumerate(blocks):
            subs[i] = substitute_with(template, scaled, b.unitary, rng)
    elif strategy == "weighted_overall":
        targets = [b.unitary for b in blocks]
        winner, scaled = pick_winner(
            group, metric=-1, target_ops=targets, family_extension=family_extension
        )
        template = MixedOrderBasisTemplate([winner])
        for i, b in enumerate(blocks):
            subs[i] = substitute_with(template, scaled, b.unitary, rng)
    elif strategy == "weighted_pairwise":
        edges = coupling_edges or sorted(
            {tuple(sorted(b.qubits)) for b in blocks}
        )
        for edge in edges:
            idxs = [i for i, b in enumerate(blocks) if tuple(sorted(b.qubits)) == tuple(edge)]
            if not idxs:
                continue
            targets = [blocks[i].unitary for i in idxs]
            winner, scaled = pick_winner(
                group, metric=-1, target_ops=targets,
                family_extension=family_extension,
            )
            template = MixedOrderBasisTemplate([winner])
            for i in idxs:
                subs[i] = substitute_with(template, scaled, blocks[i].unitary, rng)
    else:
        raise ValueError(f"unknown strategy {strategy}")

    return _blocks_to_circuit(circ, subs)


# ------------------------------------------------ parallel-drive identities


def optimized_sqiswap_sub(
    circ: Circuit,
    duration_1q: float = 0.0,
    speed_method: str = "linear",
    seed: int = 0,
) -> Circuit:
    """OptimizedSqiswapSub (speed_limit_pass.py:317-464): replace CX-family
    blocks with a time-scaled parallel-driven iSwap, SWAP with iSwap_pd +
    sqiswap, general blocks via the extended (smush) coverage lookup.
    Coordinates for all blocks come from one batched c1c2c3 call."""
    from slam_decomposition_tpu.explore.scaling import scaled_gate_for

    circ = unroll_3q_or_more(circ)
    blocks = consolidate_2q_blocks(circ)
    if not blocks:
        return circ
    rng = np.random.default_rng(seed)

    iswap = G.cg_iswap()
    sqiswap = G.conversion_gain_gate(0, 0, np.pi / 2, 0, 0.5)
    scaled_iswap = scaled_gate_for(iswap.params, speed_method)
    edge_iswap_t = _cached_template("iswap_smush", lambda: MixedOrderBasisTemplate([iswap], smush=True))
    sq_t = _cached_template("sqiswap_smush", lambda: MixedOrderBasisTemplate([sqiswap], smush=True))

    us = np.stack([b.unitary for b in blocks])
    coords = _c1c2c3_batch(us)

    def scaled_fraction(frac: float) -> G.Gate:
        g = G.conversion_gain_gate(
            *scaled_iswap.params[:-1], scaled_iswap.params[-1] * frac
        )
        g = G.cg_normalize_duration(g, 1.0)
        return dataclasses.replace(
            g, duration_override=scaled_iswap.duration * frac
        )

    subs: Dict[int, Circuit] = {}
    for i, b in enumerate(blocks):
        c = coords[i]
        sub = Circuit(2)
        _random_1q_layer(sub, rng, duration_1q)
        if abs(c[1]) < 1e-9 and abs(c[2]) < 1e-9:
            # controlled family: parallel-driven iSwap fraction
            # (speed_limit_pass.py:385-396)
            frac = c[0] / 0.5
            g = scaled_fraction(frac)
            sub.append("pd_iswap", (0, 1), matrix=g.to_numpy(), duration=g.duration)
        elif np.allclose(c, [0.5, 0.5, 0.5], atol=1e-9):
            # SWAP = pd-iSwap then sqiswap (speed_limit_pass.py:398-423)
            sub.append("pd_iswap", (0, 1), matrix=scaled_iswap.to_numpy(),
                       duration=scaled_iswap.duration)
            _random_1q_layer(sub, rng, duration_1q)
            g = scaled_fraction(0.5)
            sub.append("pd_sqiswap", (0, 1), matrix=g.to_numpy(), duration=g.duration)
        elif np.allclose(c, [0.5, 0.5, 0.0], atol=1e-9):
            sub.append("pd_iswap", (0, 1), matrix=scaled_iswap.to_numpy(),
                       duration=scaled_iswap.duration)
        else:
            # general: extended-coverage lookups (speed_limit_pass.py:425-455)
            k_i, _ = edge_iswap_t.range_for(b.unitary)
            if k_i == 1:
                sub.append("pd_iswap", (0, 1), matrix=scaled_iswap.to_numpy(),
                           duration=scaled_iswap.duration)
            else:
                k, _ = sq_t.range_for(b.unitary)
                gsq = scaled_fraction(0.5)
                for _ in range(k):
                    sub.append("pd_sqiswap", (0, 1), matrix=gsq.to_numpy(),
                               duration=gsq.duration)
                    _random_1q_layer(sub, rng, duration_1q)
        _random_1q_layer(sub, rng, duration_1q)
        subs[i] = sub
    return _blocks_to_circuit(circ, subs)


# -------------------------------------------------------------- managers


def pass_manager_basic(
    circ: Circuit, gate: str = "sqiswap", duration_1q: float = 0.0
) -> Tuple[Circuit, Dict]:
    """Analytic decomposition baseline (pass_manager_basic,
    speed_limit_pass.py:531-551)."""
    from slam_decomposition_tpu.transpile.kak import (
        sqiswap_decompose,
        steps_to_circuit,
    )
    from slam_decomposition_tpu.transpile.cx_decompose import cx_decompose_to_circuit

    circ = unroll_3q_or_more(circ)
    blocks = consolidate_2q_blocks(circ)
    subs: Dict[int, Circuit] = {}
    for i, b in enumerate(blocks):
        if gate == "sqiswap":
            steps, _ = sqiswap_decompose(b.unitary)
            sub = Circuit(2)
            for kind, payload in steps:
                if kind == "sqiswap":
                    sub.append("riswap", (0, 1), params=(0.5,), duration=0.5)
                elif kind == "1q":
                    sub.unitary(payload[0], (0,), name="u1q", duration=duration_1q)
                    sub.unitary(payload[1], (1,), name="u1q", duration=duration_1q)
            subs[i] = sub
        elif gate == "cx":
            subs[i] = cx_decompose_to_circuit(b.unitary, duration_1q)
        else:
            raise ValueError(gate)
    out = optimize_1q_gates(_blocks_to_circuit(circ, subs))
    return out, duration_analysis(out, duration_1q)


def pass_manager_slam(
    circ: Circuit,
    strategy: str = "basic_overall",
    speed_method: str = "linear",
    duration_1q: float = 0.0,
    basic_metric: int = 0,
    family_extension: bool = False,
    coupling_edges=None,
) -> Tuple[Circuit, Dict]:
    """Winner-substitution manager (pass_manager_slam,
    speed_limit_pass.py:501-528)."""
    out = optimize_1q_gates(
        speed_gate_substitute(
            circ, strategy=strategy, speed_method=speed_method,
            duration_1q=duration_1q, basic_metric=basic_metric,
            family_extension=family_extension, coupling_edges=coupling_edges,
        )
    )
    return out, duration_analysis(out, duration_1q)


def pass_manager_optimized_sqiswap(
    circ: Circuit, duration_1q: float = 0.0, speed_method: str = "linear"
) -> Tuple[Circuit, Dict]:
    """Parallel-drive identity manager (pass_manager_optimized_sqiswap,
    speed_limit_pass.py:468-497)."""
    out = optimize_1q_gates(
        optimized_sqiswap_sub(
            circ, duration_1q=duration_1q, speed_method=speed_method
        )
    )
    return out, duration_analysis(out, duration_1q)
