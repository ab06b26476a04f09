"""Subtable MLE triangle tests (dense == closed form == expression).

Mirrors the reference's only unit tests (range.rs:276-332)."""

import random

import pytest

from hypergreco_tpu.lasso.tables import (
    BoundSubtable,
    FullLimbSubtable,
    LassoPreprocessing,
    RangeLookup,
)
from hypergreco_tpu.ops import mle
from hypergreco_tpu.ops.fe import get_backend

BE = get_backend("goldilocks")
SPEC = BE.spec
LOG2_M = 16
M = 1 << LOG2_M


def _triangle(subtable, seed):
    rng = random.Random(seed)
    dense = subtable.materialize(M)
    point = [(rng.randrange(SPEC.p), rng.randrange(SPEC.p)) for _ in range(LOG2_M)]
    dense_eval = mle.eval_host(SPEC, dense, point)
    func_eval = subtable.evaluate_mle(SPEC, point, M)
    expr_eval = subtable.evaluate_mle_expr(LOG2_M).evaluate(SPEC, point)
    assert dense_eval == func_eval == expr_eval


def test_full_subtable_triangle():
    _triangle(FullLimbSubtable(), 1)


@pytest.mark.parametrize(
    "bound", [(1 << 55) + 55, 3, 39, 2493, 65537, 82638181]
)
def test_bound_subtable_triangle(bound):
    # bound % M == 0 is excluded: RangeLookup never instantiates a
    # BoundSubtable for it (range.rs:218-219) and the closed forms are
    # degenerate there (in the reference too).
    _triangle(BoundSubtable(bound), bound)


def test_pow2_bound_uses_full_limb_only():
    lk = RangeLookup(1 << 16)
    subs = lk.subtables(4, M)
    assert len(subs) == 1
    assert subs[0][0].subtable_id() == "full" and subs[0][1] == [0]
    assert lk.chunk_bits(M) == [16]


@pytest.mark.parametrize("bound", [3, 39, 2493, 65537, 82638181, (1 << 55) + 55])
def test_range_chunk_recombination(bound):
    """combine(T_c[chunk_c(x)]) == x for in-range x (the collation identity)."""
    rng = random.Random(bound)
    lk = RangeLookup(bound)
    subs = lk.subtables(4, M)
    # chunk c -> its subtable's dense table
    chunk_table = {}
    for st, dims in subs:
        dense = st.materialize(M)
        for d in dims:
            chunk_table[d] = dense
    for _ in range(50):
        x = rng.randrange(bound)
        chunks = lk.chunk_values(x, M)
        vals = [chunk_table[c][chunks[c]] for c in range(len(chunks))]
        got = lk.combine_lookups(SPEC, [SPEC.ext(v) for v in vals], M)
        assert got == SPEC.ext(x), (bound, x, chunks, vals)


def test_preprocessing_layout():
    lookups = [RangeLookup(b) for b in [2493, 3, 39, 65537, 82638181]]
    pp = LassoPreprocessing.preprocess(lookups, C=4, M=M)
    # sorted string order (BTreeMap parity)
    assert pp.lookup_ids == [
        "range_2493",
        "range_3",
        "range_39",
        "range_65537",
        "range_82638181",
    ]
    # subtables dedup in first-seen order
    ids = [st.subtable_id() for st in pp.subtables]
    assert ids == [
        "bound_2493",
        "bound_3",
        "bound_39",
        "full",
        "bound_65537",
        "bound_82638181",
    ]
    # memories: one per (subtable, dim); full covers dim 0 only here
    assert pp.num_memories == 6
    assert pp.memory_to_dimension_index == [0, 0, 0, 0, 1, 1]
    # each small-bound lookup uses its own memory; big ones use full + rem
    assert pp.lookup_to_memory_indices[0] == [0]
    assert pp.lookup_to_memory_indices[3] == [3, 4]
    assert pp.lookup_to_memory_indices[4] == [3, 5]
    # weights are M^dim
    assert [pp.weight(m) for m in range(6)] == [1, 1, 1, 1, M, M]
    # verifier preprocessing drops tables
    vk = pp.to_verifier_preprocessing()
    assert vk.materialized is None and pp.materialized is not None
