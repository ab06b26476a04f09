"""Native (C++) verifier core vs the pure-Python/numpy oracle.

The native path must be byte-for-byte Fiat-Shamir identical to
TranscriptReader and numerically identical to NpField's numpy kernels —
every fast path here is cross-checked against the slow one (the reference's
own strategy for its accelerated backends, SURVEY.md §4)."""

import random

import numpy as np
import pytest

from hypergreco_tpu.fields import GOLDILOCKS
from hypergreco_tpu.gkr import sumcheck as sc
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils import nverifier
from hypergreco_tpu.utils.npfield import NpField
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

SPEC = GOLDILOCKS

pytestmark = pytest.mark.skipif(
    not nverifier.available(SPEC), reason="native verifier lib unavailable"
)


def _rand_ext(rng):
    return (rng.randrange(SPEC.p), rng.randrange(SPEC.p))


def test_transcript_read_squeeze_parity():
    rng = random.Random(7)
    tw = TranscriptWriter(SPEC)
    felts = [rng.randrange(SPEC.p) for _ in range(37)]
    tw.write_felts(felts)
    tw.common_felt(123456789)
    exts = [_rand_ext(rng) for _ in range(5)]
    tw.write_felts_ext(exts)
    proof = tw.into_proof()

    py = TranscriptReader(SPEC, proof)
    nt = nverifier.NativeTranscriptReader(SPEC, proof)
    assert py.read_felts(37) == nt.read_felts(37)
    py.common_felt(123456789)
    nt.common_felt(123456789)
    assert py.squeeze_challenge() == nt.squeeze_challenge()
    assert py.read_felts_ext(5) == nt.read_felts_ext(5)
    assert py.squeeze_challenges(3) == nt.squeeze_challenges(3)
    py.assert_consumed()
    nt.assert_consumed()


def test_transcript_common_statement_parity():
    rng = random.Random(8)
    xs = [rng.randrange(SPEC.p) for _ in range(1 << 10)]
    tw = TranscriptWriter(SPEC)
    d1 = tw.common_statement(xs)
    c1 = tw.squeeze_challenge()
    nt = nverifier.NativeTranscriptReader(SPEC, b"")
    d2 = nt.common_statement(xs)
    c2 = nt.squeeze_challenge()
    assert d1 == d2 and c1 == c2


def test_transcript_error_paths():
    nt = nverifier.NativeTranscriptReader(SPEC, b"\x01" * 8)
    with pytest.raises(ValueError, match="end of proof stream"):
        nt.read_felts(2)
    bad = (SPEC.p + 1).to_bytes(8, "little")
    nt2 = nverifier.NativeTranscriptReader(SPEC, bad)
    with pytest.raises(ValueError, match="encoding"):
        nt2.read_felt()
    nt3 = nverifier.NativeTranscriptReader(SPEC, b"\x01" * 16)
    nt3.read_felt()
    with pytest.raises(ValueError, match="unread proof bytes"):
        nt3.assert_consumed()


def test_native_sumcheck_parity():
    """Same sumcheck proof verified through both transcript types."""
    rng = random.Random(11)
    BE = get_backend("goldilocks")
    v = 6
    d0 = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    d1 = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    expr = sc.SumcheckExpr([sc.Term(None, (0, 1))], 2)
    tables = [BE.from_ints(d) for d in (d0, d1)]
    acc = SPEC.zero
    for x in range(1 << v):
        acc = SPEC.eadd(acc, SPEC.emul(SPEC.ext(d0[x]), SPEC.ext(d1[x])))
    tw = TranscriptWriter(SPEC)
    fclaim, point, _ = sc.prove_sum_check(BE, expr, [], acc, tables, tw)
    proof = tw.into_proof()

    py = TranscriptReader(SPEC, proof)
    c_py, pt_py = sc.verify_sum_check(SPEC, expr.degree, v, acc, py)
    nt = nverifier.NativeTranscriptReader(SPEC, proof)
    c_nt, pt_nt = sc.verify_sum_check(SPEC, expr.degree, v, acc, nt)
    assert c_py == c_nt == fclaim
    assert pt_py == pt_nt == point
    py.assert_consumed()
    nt.assert_consumed()


def _pure_npf():
    """NpField instance with the native path disabled (numpy oracle)."""
    f = NpField(SPEC)
    f._nv = None
    return f


def test_eq_table_parity():
    rng = random.Random(21)
    nat, pure = NpField(SPEC), _pure_npf()
    for v in (1, 4, 9):
        pt = [_rand_ext(rng) for _ in range(v)]
        a = nat.eq_table(pt)
        b = pure.eq_table(pt)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_d_table_parity():
    rng = random.Random(22)
    nat, pure = NpField(SPEC), _pure_npf()
    for logl, inverse in ((4, False), (6, True), (8, False)):
        pts = [[_rand_ext(rng) for _ in range(logl)] for _ in range(2)]
        als = [_rand_ext(rng) for _ in range(2)]
        a = nat.d_table(pts, als, logl, inverse)
        b = pure.d_table(pts, als, logl, inverse)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_dot_parity():
    rng = random.Random(23)
    nat, pure = NpField(SPEC), _pure_npf()
    L = 1 << 7
    a = nat.ext_from_tuples([_rand_ext(rng) for _ in range(L)])
    b = nat.ext_from_tuples([_rand_ext(rng) for _ in range(L)])
    tab = np.asarray([rng.randrange(SPEC.p) for _ in range(L)], dtype=np.uint64)
    assert nat.dot_ext(a, b) == pure.dot_ext(a, b)
    assert nverifier.dot_base(a, tab) == pure.esum(pure.emul_base(a, tab))
    pt = [_rand_ext(rng) for _ in range(7)]
    assert nat.mle_eval_ints(tab, pt) == pure.mle_eval_ints(tab, pt)


def test_dot_base_many_parity():
    rng = random.Random(24)
    nat, pure = NpField(SPEC), _pure_npf()
    L, T = 1 << 6, 5
    eq = nat.ext_from_tuples([_rand_ext(rng) for _ in range(L)])
    tabs = np.asarray(
        [[rng.randrange(SPEC.p) for _ in range(L)] for _ in range(T)],
        dtype=np.uint64,
    )
    outs = nverifier.dot_base_many(eq, tabs)
    for t in range(T):
        assert outs[t] == pure.esum(pure.emul_base(eq, tabs[t]))


def test_gl_scalar_kernels_random():
    """Field-arithmetic spot check: native mul/add chains vs Python ints
    through the eq-table of one variable many times (regression net for the
    u128 reduction edge cases: operands near p, wrap-around sums)."""
    rng = random.Random(25)
    nat = NpField(SPEC)
    edge = [0, 1, SPEC.p - 1, SPEC.p - (1 << 32), (1 << 32) - 1, 1 << 32]
    vals = edge + [rng.randrange(SPEC.p) for _ in range(20)]
    for a0 in vals[:8]:
        for a1 in vals[:8]:
            pt = [(a0, a1)]
            tab = nat.eq_table(pt)
            # eq((a0,a1), x) over x in {0,1} = [1 - a, a]
            exp0 = SPEC.esub(SPEC.one, (a0, a1))
            assert (int(tab[0][0]), int(tab[1][0])) == exp0
            assert (int(tab[0][1]), int(tab[1][1])) == (a0, a1)
            nat._eq_memo.clear()
