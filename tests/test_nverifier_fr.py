"""BN254-Fr native verifier core vs pure-Python oracles.

Montgomery CIOS arithmetic, transcript byte-parity, sumcheck round loop and
table kernels — every fast path cross-checked against the object-dtype
numpy / Python-int implementations (same strategy as the GL half,
tests/test_nverifier.py)."""

import random

import numpy as np
import pytest

from hypergreco_tpu.fields import BN254_FR
from hypergreco_tpu.utils import nverifier as nv
from hypergreco_tpu.utils.npfield import NpField, _ObjOps
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

SPEC = BN254_FR
P = SPEC.p

pytestmark = pytest.mark.skipif(
    not nv.available(SPEC), reason="native verifier lib unavailable"
)


def test_fr_vec_arithmetic_vs_python():
    rng = random.Random(41)
    edge = [0, 1, P - 1, P - 2, 1 << 64, (1 << 128) - 1, P >> 1]
    xs = edge + [rng.randrange(P) for _ in range(40)]
    ys = [rng.randrange(P) for _ in range(len(xs))]
    ops = NpField.for_spec(SPEC).base
    a, b = ops.from_ints(xs), ops.from_ints(ys)
    assert ops.to_ints(ops.add(a, b)) == [(x + y) % P for x, y in zip(xs, ys)]
    assert ops.to_ints(ops.sub(a, b)) == [(x - y) % P for x, y in zip(xs, ys)]
    assert ops.to_ints(ops.mul(a, b)) == [(x * y) % P for x, y in zip(xs, ys)]
    assert ops.to_ints(ops.neg(a)) == [(-x) % P for x in xs]
    c = rng.randrange(P)
    assert ops.to_ints(ops.scale(a, c)) == [x * c % P for x in xs]
    assert ops.sum(a) == sum(xs) % P


def test_fr_transcript_parity():
    rng = random.Random(42)
    tw = TranscriptWriter(SPEC)
    felts = [rng.randrange(P) for _ in range(23)]
    tw.write_felts(felts)
    proof = tw.into_proof()
    py = TranscriptReader(SPEC, proof)
    nt = nv.NativeTranscriptReaderFr(SPEC, proof)
    assert py.read_felts(23) == nt.read_felts(23)
    py.common_felt(987654321)
    nt.common_felt(987654321)
    assert py.squeeze_challenge() == nt.squeeze_challenge()
    assert py.squeeze_challenges(3) == nt.squeeze_challenges(3)
    py.assert_consumed()
    nt.assert_consumed()
    # statement digest
    xs = [rng.randrange(P) for _ in range(100)]
    tw2 = TranscriptWriter(SPEC)
    d1 = tw2.common_statement(xs)
    c1 = tw2.squeeze_challenge()
    nt2 = nv.NativeTranscriptReaderFr(SPEC, b"")
    d2 = nt2.common_statement(xs)
    c2 = nt2.squeeze_challenge()
    assert d1 == d2 and c1 == c2


def test_fr_transcript_error_paths():
    nt = nv.NativeTranscriptReaderFr(SPEC, b"\x01" * 32)
    with pytest.raises(ValueError, match="end of proof stream"):
        nt.read_felts(2)
    bad = (P + 1).to_bytes(32, "little")
    with pytest.raises(ValueError, match="encoding"):
        nv.NativeTranscriptReaderFr(SPEC, bad).read_felt()


def test_fr_native_sumcheck_parity():
    from hypergreco_tpu.gkr import sumcheck as sc
    from hypergreco_tpu.ops.fe import get_backend

    rng = random.Random(43)
    BE = get_backend("bn254")
    v = 4
    d0 = [rng.randrange(P) for _ in range(1 << v)]
    d1 = [rng.randrange(P) for _ in range(1 << v)]
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
    nt = nv.NativeTranscriptReaderFr(SPEC, proof)
    c_nt, pt_nt = sc.verify_sum_check(SPEC, expr.degree, v, acc, nt)
    assert c_py == c_nt == fclaim
    assert pt_py == pt_nt == point
    py.assert_consumed()
    nt.assert_consumed()


def _pure_npf():
    f = NpField(SPEC)
    f.base = _ObjOps(SPEC.p)
    f._nv = None
    return f


def test_fr_eq_table_and_dots_parity():
    rng = random.Random(44)
    nat, pure = NpField.for_spec(SPEC), _pure_npf()
    for v in (1, 5):
        pt = [(rng.randrange(P),) for _ in range(v)]
        a = nat.eq_table(pt)
        b = pure.eq_table(pt)
        assert nat.base.to_ints(a[0]) == pure.base.to_ints(b[0])
    L = 1 << 5
    tab_ints = [rng.randrange(P) for _ in range(L)]
    pt = [(rng.randrange(P),) for _ in range(5)]
    assert nat.mle_eval_ints(nat.base.from_ints(tab_ints), pt) == \
        pure.mle_eval_ints(tab_ints, pt)
    x = [(rng.randrange(P),) for _ in range(L)]
    y = [(rng.randrange(P),) for _ in range(L)]
    assert nat.dot_ext(nat.ext_from_tuples(x), nat.ext_from_tuples(y)) == \
        pure.dot_ext(pure.ext_from_tuples(x), pure.ext_from_tuples(y))


def test_fr_d_table_parity():
    rng = random.Random(45)
    nat, pure = NpField.for_spec(SPEC), _pure_npf()
    for logl, inverse in ((3, False), (5, True)):
        pts = [[(rng.randrange(P),) for _ in range(logl)] for _ in range(2)]
        als = [(rng.randrange(P),) for _ in range(2)]
        a = nat.d_table(pts, als, logl, inverse)
        b = pure.d_table(pts, als, logl, inverse)
        assert nat.base.to_ints(a[0]) == pure.base.to_ints(b[0])


def test_fr_eq_eval_parity():
    from hypergreco_tpu.ops import mle

    rng = random.Random(46)
    x = [(rng.randrange(P),) for _ in range(7)]
    y = [(rng.randrange(P),) for _ in range(7)]
    native = nv.eq_eval_spec(SPEC, x, y)
    acc = SPEC.one
    for xi, yi in zip(x, y):
        t = SPEC.emul(xi, yi)
        u = SPEC.emul(SPEC.esub(SPEC.one, xi), SPEC.esub(SPEC.one, yi))
        acc = SPEC.emul(acc, SPEC.eadd(t, u))
    assert native == acc
    assert mle.eq_eval(SPEC, x, y) == acc


def test_fr_gp_ops_parity():
    rng = random.Random(47)
    ops = nv.gp_ops(SPEC)
    m = 6
    alphas = [(rng.randrange(P),) for _ in range(m)]
    claims = [(rng.randrange(P),) for _ in range(m)]
    ev_tuples = [(rng.randrange(P),) for _ in range(2 * m)]
    al, cl = ops.pack(alphas), ops.pack(claims)
    assert ops.unpack(cl) == claims
    dot = ops.dot(al, cl)
    exp = SPEC.zero
    for a, c in zip(alphas, claims):
        exp = SPEC.eadd(exp, SPEC.emul(a, c))
    assert dot == exp
    ev = ops.pack(ev_tuples)
    d3 = ops.dot3(al, ev)
    exp = SPEC.zero
    for i in range(m):
        exp = SPEC.eadd(
            exp,
            SPEC.emul(alphas[i], SPEC.emul(ev_tuples[2 * i], ev_tuples[2 * i + 1])),
        )
    assert d3 == exp
    mu = (rng.randrange(P),)
    mixed = ops.unpack(ops.mix(ev, mu))
    for i in range(m):
        l_, r_ = ev_tuples[2 * i], ev_tuples[2 * i + 1]
        assert mixed[i] == SPEC.eadd(l_, SPEC.emul(mu, SPEC.esub(r_, l_)))
