"""Public row-selector polynomials with closed-form MLE evaluation.

A selector marks which rows of the lookup trace belong to a lookup type (or
to the union of lookups using a memory). Row->lookup assignment is PUBLIC
circuit structure (the `lookups` vec, lasso.rs:35,147), so the verifier can
evaluate selector MLEs itself — this is what makes the flag-corrected
collation/memory-checking sound without committing to flag polynomials
(PROTOCOL.md: deviation from the reference's flag-free expressions,
lasso.rs:463 TODO).

Rows of one lookup are stored as disjoint [start, end) intervals; in the BFV
circuit each lookup occupies O(1) contiguous blocks, so evaluation is
O(#blocks * v) host work.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

from ..fields import FieldSpec


def step_mle(spec: FieldSpec, b: int, num_vars: int, point) -> tuple:
    """MLE of the indicator [x < b] over {0,1}^num_vars at an ext point.

    Recursion over the top variable z (weight 2^(v-1)):
      E_v(b) = (1-z)*E_{v-1}(min(b, H)) + z*E_{v-1}(max(b-H, 0)),  H = 2^(v-1)
    """
    assert 0 <= b <= (1 << num_vars)
    return _step(spec, b, num_vars, point)


def _step(spec: FieldSpec, b: int, v: int, point) -> tuple:
    if b == 0:
        return spec.zero
    if b == (1 << v):
        return spec.one
    z = spec._c(point[v - 1])
    h = 1 << (v - 1)
    if b <= h:
        return spec.emul(spec.esub(spec.one, z), _step(spec, b, v - 1, point))
    return spec.eadd(
        spec.esub(spec.one, z),
        spec.emul(z, _step(spec, b - h, v - 1, point)),
    )


@dataclass(frozen=True)
class RowSelector:
    """Union of disjoint half-open row intervals within [0, 2^num_vars)."""

    num_vars: int
    intervals: Tuple[Tuple[int, int], ...]

    @staticmethod
    def from_intervals(num_vars: int, intervals: List[Tuple[int, int]]):
        ivs = sorted((a, b) for a, b in intervals if a < b)
        for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
            assert b1 <= a2, "selector intervals must be disjoint"
        return RowSelector(num_vars, tuple(ivs))

    @staticmethod
    def union(selectors: List["RowSelector"]) -> "RowSelector":
        assert selectors
        v = selectors[0].num_vars
        ivs = []
        for s in selectors:
            assert s.num_vars == v
            ivs.extend(s.intervals)
        return RowSelector.from_intervals(v, ivs)

    def dense(self) -> List[int]:
        out = [0] * (1 << self.num_vars)
        for a, b in self.intervals:
            for i in range(a, b):
                out[i] = 1
        return out

    def contains(self, row: int) -> bool:
        return any(a <= row < b for a, b in self.intervals)

    def count(self) -> int:
        return sum(b - a for a, b in self.intervals)

    def evaluate_mle(self, spec: FieldSpec, point) -> tuple:
        assert len(point) == self.num_vars
        acc = spec.zero
        for a, b in self.intervals:
            acc = spec.eadd(
                acc,
                spec.esub(
                    step_mle(spec, b, self.num_vars, point),
                    step_mle(spec, a, self.num_vars, point),
                ),
            )
        return acc
