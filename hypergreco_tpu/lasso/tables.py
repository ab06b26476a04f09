"""Lookup-table abstraction: subtables, range lookups, succinct MLEs.

Reference parity (lasso/src/table.rs, lasso/src/table/range.rs):
- `LassoSubtable` — materialize(M) dense table + closed-form `evaluate_mle`
  + `evaluate_mle_expr` (PolyExpr) (table.rs:16-33).
- `FullLimbSubtable` — identity table T[x]=x over the 2^16 limb domain
  (range.rs:11-49).
- `BoundSubtable(bound)` — truncated identity: T[i]=i for i < cutoff else 0,
  cutoff = 2^(bound_bits mod log2M) + bound mod M (range.rs:51-175).
- `RangeLookup(bound)` — decomposes a `< bound` check into full limbs plus
  one remainder limb; `combine_lookups` recomposes with powers of M
  (range.rs:177-274). DEVIATION (documented in PROTOCOL.md): the recombination
  weight for a memory is M^(chunk position) — the reference's collation
  expression weights by flat memory index (lasso.rs:464-470), which is
  inconsistent with its own claimed sum for circuits whose lookups map to
  non-prefix memory indices.

Lookup/subtable identity is by string id; preprocessing orders lookups by
sorted id (BTreeMap parity, lasso.rs:530-541) — the order defines memory
layout and transcript order, so it is load-bearing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from ..fields import FieldSpec


# ---------------------------------------------------------------------------
# PolyExpr: succinct multilinear expressions (gkr::poly::PolyExpr parity)
# ---------------------------------------------------------------------------


class PolyExpr:
    """Tiny expression tree over point variables; evaluate at ext points.

    Reference parity: `MultilinearPolyTerms`/`PolyExpr` {Var, Const, Pow,
    Prod, Sum} (SURVEY.md §2.2 "Succinct MLE expressions"; used verifier-side
    for O(log M) subtable evaluation, range.rs:28-37, 114-161)."""

    __slots__ = ("op", "args")

    def __init__(self, op: str, args):
        self.op = op
        self.args = args

    @staticmethod
    def var(i: int) -> "PolyExpr":
        return PolyExpr("var", i)

    @staticmethod
    def const(c: int) -> "PolyExpr":
        return PolyExpr("const", c)

    @staticmethod
    def pow(base: "PolyExpr", e: int) -> "PolyExpr":
        return PolyExpr("pow", (base, e))

    @staticmethod
    def prod(xs: Sequence["PolyExpr"]) -> "PolyExpr":
        return PolyExpr("prod", list(xs))

    @staticmethod
    def sum(xs: Sequence["PolyExpr"]) -> "PolyExpr":
        return PolyExpr("sum", list(xs))

    def mul(self, other: "PolyExpr") -> "PolyExpr":
        return PolyExpr.prod([self, other])

    def add(self, other: "PolyExpr") -> "PolyExpr":
        return PolyExpr.sum([self, other])

    def sub(self, other: "PolyExpr") -> "PolyExpr":
        return PolyExpr.sum([self, PolyExpr.prod([PolyExpr.const(-1), other])])

    def evaluate(self, spec: FieldSpec, point) -> tuple:
        if self.op == "var":
            return spec._c(point[self.args])
        if self.op == "const":
            return spec.ext(self.args)
        if self.op == "pow":
            base, e = self.args
            return spec.epow(base.evaluate(spec, point), e)
        if self.op == "prod":
            acc = spec.one
            for a in self.args:
                acc = spec.emul(acc, a.evaluate(spec, point))
            return acc
        if self.op == "sum":
            acc = spec.zero
            for a in self.args:
                acc = spec.eadd(acc, a.evaluate(spec, point))
            return acc
        raise ValueError(self.op)


@dataclass(frozen=True)
class MultilinearPolyTerms:
    num_vars: int
    expr: PolyExpr

    def evaluate(self, spec: FieldSpec, point) -> tuple:
        assert len(point) == self.num_vars
        return self.expr.evaluate(spec, point)


# ---------------------------------------------------------------------------
# Subtables
# ---------------------------------------------------------------------------


class LassoSubtable:
    def subtable_id(self) -> str:
        raise NotImplementedError

    def materialize(self, M: int) -> List[int]:
        raise NotImplementedError

    def evaluate_mle(self, spec: FieldSpec, point, M: int) -> tuple:
        raise NotImplementedError

    def evaluate_mle_expr(self, log2_M: int) -> MultilinearPolyTerms:
        raise NotImplementedError


class FullLimbSubtable(LassoSubtable):
    """Identity table T[x] = x over [M] (range.rs:11-49)."""

    def subtable_id(self) -> str:
        return "full"

    def materialize(self, M: int) -> List[int]:
        return list(range(M))

    def evaluate_mle(self, spec: FieldSpec, point, M: int) -> tuple:
        acc = spec.zero
        for i, p in enumerate(point):
            acc = spec.eadd(acc, spec.escale(spec._c(p), 1 << i))
        return acc

    def evaluate_mle_expr(self, log2_M: int) -> MultilinearPolyTerms:
        terms = [PolyExpr.var(0)]
        for i in range(1, log2_M):
            terms.append(
                PolyExpr.prod(
                    [PolyExpr.pow(PolyExpr.const(2), i), PolyExpr.var(i)]
                )
            )
        return MultilinearPolyTerms(log2_M, PolyExpr.sum(terms))


def _eq_step_sum(spec: FieldSpec, point, E: int) -> tuple:
    """sum_{k < E} eq(point, k) over 0 <= E <= 2^len(point), O(v)."""
    v = len(point)
    assert 0 <= E <= 1 << v
    if E == 0:
        return spec.zero
    if E == 1 << v:
        return spec.one
    z = spec._c(point[v - 1])
    H = 1 << (v - 1)
    if E <= H:
        return spec.emul(
            spec.esub(spec.one, z), _eq_step_sum(spec, point[: v - 1], E)
        )
    return spec.eadd(
        spec.esub(spec.one, z),
        spec.emul(z, _eq_step_sum(spec, point[: v - 1], E - H)),
    )


def _eq_id_sum(spec: FieldSpec, point, E: int) -> tuple:
    """sum_{k < E} k * eq(point, k), O(v^2). Full-range value is
    sum_i 2^i point_i (the identity MLE)."""
    v = len(point)
    assert 0 <= E <= 1 << v
    if E == 0 or v == 0:
        return spec.zero
    if E == 1 << v:
        acc = spec.zero
        for i in range(v):
            acc = spec.eadd(acc, spec.escale(spec._c(point[i]), 1 << i))
        return acc
    z = spec._c(point[v - 1])
    H = 1 << (v - 1)
    low = point[: v - 1]
    if E <= H:
        return spec.emul(spec.esub(spec.one, z), _eq_id_sum(spec, low, E))
    upper = spec.eadd(
        _eq_id_sum(spec, low, E - H),
        spec.escale(_eq_step_sum(spec, low, E - H), H),
    )
    return spec.eadd(
        spec.emul(spec.esub(spec.one, z), _eq_id_sum(spec, low, H)),
        spec.emul(z, upper),
    )


def _cutoff(bound: int, log2_M: int) -> int:
    bound_bits = bound.bit_length() - 1  # ilog2 (floor)
    reminder = 1 << (bound_bits % log2_M)
    return reminder + bound % (1 << log2_M)


class BoundSubtable(LassoSubtable):
    """Truncated identity for the most-significant remainder limb:
    T[i] = i for i < cutoff else 0 (range.rs:51-175)."""

    def __init__(self, bound: int):
        assert bound > 0
        self.bound = bound

    def subtable_id(self) -> str:
        return f"bound_{self.bound}"

    def materialize(self, M: int) -> List[int]:
        cutoff = _cutoff(self.bound, M.bit_length() - 1)
        return [i if i < cutoff else 0 for i in range(M)]

    def evaluate_mle(self, spec: FieldSpec, point, M: int) -> tuple:
        """O(log^2 M) closed form. The "extra" block above the power-of-two
        base is sum_{k < num_extra} (g_base + k) eq(point_low, k)
        = g_base * step_sum + partial identity sum — evaluated recursively
        (the round-2 dense k-loop was ~2^15 * 15 emuls per call and
        dominated verify at 2.2 s/proof)."""
        log2_M = M.bit_length() - 1
        cutoff = _cutoff(self.bound, log2_M)
        cutoff_log2 = cutoff.bit_length() - 1
        g_base = 1 << cutoff_log2
        num_extra = cutoff - g_base

        result = spec.zero
        for i in range(len(point)):
            p = spec._c(point[i])
            if i < cutoff_log2:
                result = spec.eadd(result, spec.escale(p, 1 << i))
            else:
                g_value = spec.zero
                if i == cutoff_log2 and num_extra > 0:
                    low = point[:cutoff_log2]
                    g_value = spec.eadd(
                        spec.escale(_eq_step_sum(spec, low, num_extra), g_base),
                        _eq_id_sum(spec, low, num_extra),
                    )
                result = spec.eadd(
                    spec.emul(spec.esub(spec.one, p), result),
                    spec.emul(p, g_value),
                )
        return result

    def evaluate_mle_expr(self, log2_M: int) -> MultilinearPolyTerms:
        cutoff = _cutoff(self.bound, log2_M)
        cutoff_log2 = cutoff.bit_length() - 1
        g_base = 1 << cutoff_log2
        num_extra = cutoff - g_base

        terms = [PolyExpr.var(0)]
        for i in range(1, cutoff_log2):
            terms.append(
                PolyExpr.prod(
                    [PolyExpr.pow(PolyExpr.const(2), i), PolyExpr.var(i)]
                )
            )
        result = PolyExpr.sum(terms)
        for i in range(cutoff_log2, log2_M):
            if num_extra > 0 and i == cutoff_log2:
                # flat sum/product nodes: num_extra can be ~2^15 and a
                # left-nested add chain would blow the recursion limit
                g_terms = []
                for k in range(num_extra):
                    factors = [PolyExpr.const(g_base + k)]
                    for j in range(cutoff_log2):
                        if k & (1 << j):
                            factors.append(PolyExpr.var(j))
                        else:
                            factors.append(
                                PolyExpr.const(1).sub(PolyExpr.var(j))
                            )
                    g_terms.append(PolyExpr.prod(factors))
                g_value = PolyExpr.sum(g_terms) if g_terms else PolyExpr.const(0)
                x = PolyExpr.var(i)
                result = PolyExpr.sum(
                    [
                        PolyExpr.const(1).sub(x).mul(result),
                        x.mul(g_value),
                    ]
                )
            else:
                result = result.mul(PolyExpr.const(1).sub(PolyExpr.var(i)))
        return MultilinearPolyTerms(log2_M, result)


# ---------------------------------------------------------------------------
# Lookup types
# ---------------------------------------------------------------------------


class LookupType:
    def lookup_id(self) -> str:
        raise NotImplementedError

    def subtables(self, C: int, M: int) -> List[Tuple[LassoSubtable, List[int]]]:
        """[(subtable, dimension indices)] (range.rs:207-228)."""
        raise NotImplementedError

    def chunk_bits(self, M: int) -> List[int]:
        raise NotImplementedError

    def chunk_values(self, x: int, M: int) -> List[int]:
        """Decompose a looked-up value into per-chunk addresses (LE chunks of
        the value's low bits; parity with subtable_indices + usize_from_bits_le,
        range.rs:252-254, lasso.rs:381-414)."""
        bits = self.chunk_bits(M)
        log2_M = M.bit_length() - 1
        out = []
        shift = 0
        for i, b in enumerate(bits):
            out.append((x >> shift) & (M - 1))
            shift += log2_M
        return out

    def combine_lookups(self, spec: FieldSpec, operands, M: int):
        raise NotImplementedError

    def output(self, x: int) -> int:
        raise NotImplementedError


class RangeLookup(LookupType):
    """Range check x < bound via limb decomposition (range.rs:177-274)."""

    def __init__(self, bound: int):
        assert bound > 1
        self.bound = bound

    @staticmethod
    def id_for(bound: int) -> str:
        return f"range_{bound}"

    def lookup_id(self) -> str:
        return self.id_for(self.bound)

    def _num_full(self, M: int) -> int:
        log2_M = M.bit_length() - 1
        bound_bits = self.bound.bit_length() - 1
        return bound_bits // log2_M

    def subtables(self, C: int, M: int):
        num_chunks = self._num_full(M)
        if self.bound % M == 0:
            return [(FullLimbSubtable(), list(range(num_chunks)))]
        if self.bound < M:
            return [(BoundSubtable(self.bound), [0])]
        return [
            (FullLimbSubtable(), list(range(num_chunks))),
            (BoundSubtable(self.bound), [num_chunks]),
        ]

    def chunk_bits(self, M: int) -> List[int]:
        log2_M = M.bit_length() - 1
        num_full = self._num_full(M)
        bits = [log2_M] * num_full
        if self.bound % M != 0:
            bits.append(_cutoff(self.bound, log2_M).bit_length() - 1)
        return bits

    def combine_lookups(self, spec: FieldSpec, operands, M: int):
        acc = spec.zero
        w = spec.one
        for op in operands:
            acc = spec.eadd(acc, spec.emul(w, spec._c(op)))
            w = spec.escale(w, M)
        return acc

    def output(self, x: int) -> int:
        return x


# ---------------------------------------------------------------------------
# Preprocessing (lasso.rs:525-651 parity, with per-memory counter layout)
# ---------------------------------------------------------------------------


@dataclass
class LassoPreprocessing:
    """Memory layout derived from the sorted-lookup-id order.

    memory m = (subtable_index, dimension); `weights[m]` = M^dimension — the
    recombination weight of memory m in the collation identity."""

    lookups: Dict[str, LookupType]  # sorted-id order
    lookup_ids: List[str]
    subtables: List[LassoSubtable]
    subtable_to_memory_indices: List[List[int]]
    memory_to_subtable_index: List[int]
    memory_to_dimension_index: List[int]
    lookup_to_memory_indices: List[List[int]]
    num_memories: int
    C: int
    M: int
    materialized: "list | None" = None  # dense subtable int lists (prover)

    @staticmethod
    def preprocess(lookup_types: Sequence[LookupType], C: int, M: int):
        lookups = {lt.lookup_id(): lt for lt in lookup_types}
        ids = sorted(lookups.keys())  # BTreeMap string-order parity

        subtables: List[LassoSubtable] = []
        sub_id_to_index: Dict[str, int] = {}
        sub_dims: List[set] = []
        for lid in ids:
            for st, dims in lookups[lid].subtables(C, M):
                sid = st.subtable_id()
                if sid not in sub_id_to_index:
                    sub_id_to_index[sid] = len(subtables)
                    subtables.append(st)
                    sub_dims.append(set())
                sub_dims[sub_id_to_index[sid]].update(dims)

        subtable_to_memory_indices = []
        memory_to_subtable_index: List[int] = []
        memory_to_dimension_index: List[int] = []
        mi = 0
        for si, dims in enumerate(sub_dims):
            dims = sorted(dims)
            subtable_to_memory_indices.append(list(range(mi, mi + len(dims))))
            memory_to_subtable_index.extend([si] * len(dims))
            memory_to_dimension_index.extend(dims)
            mi += len(dims)

        lookup_to_memory_indices = []
        for lid in ids:
            mems = []
            for st, dims in lookups[lid].subtables(C, M):
                si = sub_id_to_index[st.subtable_id()]
                for m in subtable_to_memory_indices[si]:
                    if memory_to_dimension_index[m] in dims:
                        mems.append(m)
            lookup_to_memory_indices.append(mems)

        materialized = [st.materialize(M) for st in subtables]
        return LassoPreprocessing(
            lookups=lookups,
            lookup_ids=ids,
            subtables=subtables,
            subtable_to_memory_indices=subtable_to_memory_indices,
            memory_to_subtable_index=memory_to_subtable_index,
            memory_to_dimension_index=memory_to_dimension_index,
            lookup_to_memory_indices=lookup_to_memory_indices,
            num_memories=mi,
            C=C,
            M=M,
            materialized=materialized,
        )

    def to_verifier_preprocessing(self) -> "LassoPreprocessing":
        """Drop materialized tables (lasso.rs:639-651 parity)."""
        import copy

        vk = copy.copy(self)
        vk.materialized = None
        return vk

    def weight(self, memory_index: int) -> int:
        return self.M ** self.memory_to_dimension_index[memory_index]

    def lookup_index(self, lookup_id: str) -> int:
        return self.lookup_ids.index(lookup_id)
