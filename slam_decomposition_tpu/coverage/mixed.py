"""Coverage-driven templates: the MixedOrderBasisCircuitTemplate analog.

Reference: basis.py:213-359 — a template whose gate order comes from a
coverage polytope's operations list, with optional substitution of a
duration-scaled gate. Here it's a thin factory: coverage + chosen
CircuitPolytope -> Ansatz (models/templates.py) + cost accounting.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from slam_decomposition_tpu.coverage.coverage import (
    CircuitPolytope,
    gate_set_to_coverage,
    monodromy_range_from_target,
)
from slam_decomposition_tpu.models import gates as G
from slam_decomposition_tpu.models.gates import Gate
from slam_decomposition_tpu.models.templates import Ansatz, build_ansatz


class MixedOrderBasisTemplate:
    """Holds a basis gate set's coverage and builds per-target templates.

    Canonicalizes conversion-gain gates (gc < gg, duration 1 —
    basis.py:243-258) so the cached polytope is shared across the family.
    """

    def __init__(
        self,
        base_gates: Sequence[Gate],
        smush: bool = False,
        max_layers: int = 10,
    ):
        canon = []
        for g in base_gates:
            if len(g.params) == 5:  # conversion-gain family
                canon.append(G.cg_canonicalize(g))
            else:
                canon.append(g)
        self.base_gates = canon
        self.gate_map: Dict[str, Gate] = {str(g): g for g in canon}
        if smush:
            from slam_decomposition_tpu.explore.smush_volume import load_smush_coverage

            self.coverage = load_smush_coverage(canon[0])
        else:
            self.coverage = gate_set_to_coverage(
                *canon, max_layers=max_layers, smush=smush
            )
        self.homogeneous = len(canon) == 1

    def range_for(self, target_u: np.ndarray) -> Tuple[int, CircuitPolytope]:
        """Minimum applications + the polytope achieving it
        (polytope_wrap.py:39-94)."""
        return monodromy_range_from_target(self.coverage, target_u)

    def ks_for_batch(self, targets) -> "np.ndarray":
        """Batched k-assignment for a whole target stack — one device
        call on TPU (coverage.monodromy_ks_batch), vectorized host math
        elsewhere. Use this instead of looping range_for per block."""
        from slam_decomposition_tpu.coverage.coverage import (
            monodromy_ks_batch,
        )

        return monodromy_ks_batch(self.coverage, targets)

    def build(
        self,
        polytope: CircuitPolytope,
        scaled_gate: Optional[Gate] = None,
        no_exterior_1q: bool = False,
        vz_only: bool = False,
    ) -> Ansatz:
        """Ansatz realizing the polytope's operation sequence; a
        duration-scaled gate substitutes homogeneously (basis.py:332-359)."""
        k = len(polytope.operations)
        if scaled_gate is not None:
            if not self.homogeneous:
                raise ValueError("scaled-gate substitution needs a homogeneous set")
            seq = [scaled_gate] * k
        else:
            seq = [self.gate_map[name] for name in polytope.operations]
        return build_ansatz(seq, no_exterior_1q=no_exterior_1q, vz_only=vz_only)

    def unit_cost(self, polytope: CircuitPolytope) -> float:
        return polytope.cost

    def cost_from_distribution(self, targets) -> float:
        """Total polytope cost over a target distribution without fitting 1Q
        parameters (optimizer.py:156-178)."""
        total = 0.0
        for t in np.asarray(targets):
            _, cp = self.range_for(t)
            total += cp.cost
        return total
