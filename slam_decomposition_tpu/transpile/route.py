"""Coupling-map routing: SABRE-style SWAP insertion.

The reference delegates layout/routing to qiskit's
``transpile(qc, coupling_map=CouplingMap.from_grid(4, 4),
optimization_level=3)`` before its duration passes
(results/main.ipynb cell 8). This framework is qiskit-free, so the router
is native: a SABRE-lite heuristic (front layer + lookahead + decay,
Li/Ding/Xie arXiv:1809.02573) over an arbitrary coupling graph, with
multi-trial layout search (snake / trivial / random) keeping the
lowest-duration result.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from slam_decomposition_tpu.transpile.ir import Circuit


def grid_coupling(rows: int, cols: int) -> List[Tuple[int, int]]:
    """Edges of a rows x cols grid, row-major numbering
    (CouplingMap.from_grid analog)."""
    edges = []
    for r in range(rows):
        for c in range(cols):
            q = r * cols + c
            if c + 1 < cols:
                edges.append((q, q + 1))
            if r + 1 < rows:
                edges.append((q, q + cols))
    return edges


def snake_order(rows: int, cols: int) -> List[int]:
    """Physical qubits in boustrophedon order — a Hamiltonian path of the
    grid, so a linear-chain circuit routes with zero swaps."""
    order = []
    for r in range(rows):
        row = list(range(r * cols, (r + 1) * cols))
        order.extend(row if r % 2 == 0 else row[::-1])
    return order


def _distances(n: int, edges: Sequence[Tuple[int, int]]) -> np.ndarray:
    adj: List[List[int]] = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    dist = np.full((n, n), np.inf)
    for s in range(n):
        dist[s, s] = 0
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if dist[s, v] == np.inf:
                    dist[s, v] = dist[s, u] + 1
                    dq.append(v)
    return dist


def _sabre_once(
    circ: Circuit,
    edges: Sequence[Tuple[int, int]],
    dist: np.ndarray,
    layout: List[int],
    decay_step: float = 0.001,
    lookahead: int = 20,
    lookahead_w: float = 0.5,
    final_layout: Optional[List[int]] = None,
) -> Circuit:
    """One routing pass with a fixed initial layout. ``layout[logical] =
    physical``. Returns the routed circuit on physical qubits; if
    ``final_layout`` is a list it receives the end-of-circuit mapping
    (for SABRE's forward-backward layout iteration)."""
    n = dist.shape[0]  # physical qubit count (>= circ.n_qubits)
    pi = list(layout)

    # dependency DAG over ops: per-qubit chains
    n_ops = len(circ.ops)
    preds = [0] * n_ops
    succs: List[List[int]] = [[] for _ in range(n_ops)]
    last: Dict[int, int] = {}
    for i, op in enumerate(circ.ops):
        for q in op.qubits:
            if q in last:
                succs[last[q]].append(i)
                preds[i] += 1
            last[q] = i
    front = deque(i for i in range(n_ops) if preds[i] == 0)
    out = Circuit(n)
    decay = np.zeros(n)
    done = 0
    front_set = set(front)
    executed = [False] * n_ops

    last_pair: Dict[int, Tuple[int, int]] = {}  # phys qubit -> last 2q pair

    def emit(i):
        op = circ.ops[i]
        mapped = tuple(pi[q] for q in op.qubits)
        out.append(dataclasses.replace(op, qubits=mapped))
        if op.n_qubits == 2:
            pair = (min(mapped), max(mapped))
            for p in mapped:
                last_pair[p] = pair
        executed[i] = True
        for s in succs[i]:
            preds[s] -= 1
            if preds[s] == 0:
                front.append(s)
                front_set.add(s)

    while done < n_ops:
        progressed = True
        while progressed:
            progressed = False
            for i in list(front):
                op = circ.ops[i]
                if op.n_qubits == 1 or (
                    op.n_qubits == 2 and dist[pi[op.qubits[0]], pi[op.qubits[1]]] <= 1
                ):
                    front.remove(i)
                    front_set.discard(i)
                    emit(i)
                    done += 1
                    progressed = True
                    decay[:] = 0.0  # SABRE resets decay on progress
        if done == n_ops:
            break
        # blocked: pick the swap minimizing the SABRE heuristic
        blocked = [circ.ops[i] for i in front if circ.ops[i].n_qubits == 2]
        # extended lookahead set: next few not-yet-done 2Q ops in program order
        ext = []
        for i in range(n_ops):
            if len(ext) >= lookahead:
                break
            if not executed[i] and i not in front_set and circ.ops[i].n_qubits == 2:
                ext.append(circ.ops[i])
        cand_swaps = set()
        for op in blocked:
            for lq in op.qubits:
                p = pi[lq]
                for a, b in edges:
                    if a == p or b == p:
                        cand_swaps.add((min(a, b), max(a, b)))
        inv = {p: l for l, p in enumerate(pi)}

        def score(sw):
            a, b = sw
            trial = dict(((a, b), (b, a)))
            def d(p):
                return trial.get(p, p)
            h = sum(dist[d(pi[o.qubits[0]]), d(pi[o.qubits[1]])] for o in blocked)
            h /= max(len(blocked), 1)
            if ext:
                he = sum(
                    dist[d(pi[o.qubits[0]]), d(pi[o.qubits[1]])] for o in ext
                ) / len(ext)
                h += lookahead_w * he
            h = (1 + max(decay[a], decay[b])) * h
            # consolidation bias: a swap on the pair that just carried a 2Q
            # gate fuses into that block downstream (zero marginal cost)
            if last_pair.get(a) == (a, b):
                h -= 0.12
            return h

        best = min(sorted(cand_swaps), key=score)
        a, b = best
        out.append("swap", (a, b))
        la, lb = inv.get(a), inv.get(b)
        if la is not None:
            pi[la] = b
        if lb is not None:
            pi[lb] = a
        decay[a] += decay_step
        decay[b] += decay_step
    if final_layout is not None:
        final_layout[:] = pi
    return out


def route(
    circ: Circuit,
    edges: Sequence[Tuple[int, int]],
    seed: int = 0,
    trials: int = 4,
    rows_cols: Optional[Tuple[int, int]] = None,
    score_fn=None,
) -> Circuit:
    """Route ``circ`` onto the coupling graph, trying several initial
    layouts (snake, trivial, random) and keeping the best result.

    ``score_fn(circuit) -> float`` ranks results (default: 2Q-op count,
    i.e. fewest inserted swaps)."""
    n = circ.n_qubits
    n_phys = max(max(e) for e in edges) + 1
    if n > n_phys:
        raise ValueError(f"circuit has {n} qubits, coupling graph {n_phys}")
    dist = _distances(n_phys, edges)
    rng = np.random.default_rng(seed)
    layouts: List[List[int]] = [list(range(n))]
    if rows_cols is not None:
        sn = snake_order(*rows_cols)
        layouts.append([sn[i] for i in range(n)])
    for _ in range(max(trials - len(layouts), 0)):
        layouts.append(list(rng.permutation(n_phys))[:n])
    if score_fn is None:
        # consolidation-aware: a routing swap adjacent to a same-pair gate
        # merges into that 4x4 block downstream and is effectively free, so
        # rank trials by CONSOLIDATED block count, not raw swap count
        from slam_decomposition_tpu.transpile.consolidate import (
            collect_2q_blocks,
        )

        def score_fn(c):
            blocks, _ = collect_2q_blocks(c)
            return len(blocks)
    rev = Circuit(n)
    for op in reversed(circ.ops):
        rev.append(op)
    best = None
    for lay in layouts:
        # SABRE layout: forward-backward passes refine the initial layout
        # (Li/Ding/Xie sec. V); the final mapping of each pass seeds the
        # next direction's initial layout.
        cur = list(lay)
        for _ in range(2):
            fl: List[int] = []
            _sabre_once(rev, edges, dist, cur, final_layout=fl)
            cur = fl
            fl = []
            routed = _sabre_once(circ, edges, dist, cur, final_layout=fl)
            s = score_fn(routed)
            if best is None or s < best[0]:
                best = (s, routed)
            cur = fl
    return best[1]
