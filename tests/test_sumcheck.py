"""Sumcheck engine: prove/verify roundtrip vs host-computed sums.

Mirrors the reference's self-consistency strategy (SURVEY.md §4): the claim is
computed directly on the host, the prover runs on device tables, the verifier
replays the transcript, and the final claim must equal the expression at the
final table evals (which in turn must equal each table's MLE at the point).
"""

import random

import pytest

from hypergreco_tpu.gkr import sumcheck as sc
from hypergreco_tpu.ops import mle
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

BE = get_backend("goldilocks")
SPEC = BE.spec


def _host_sum(expr, coeffs, dense_tables):
    n = len(dense_tables[0])
    acc = SPEC.zero
    for x in range(n):
        for t in expr.terms:
            prod = SPEC.one if t.coeff_idx is None else SPEC._c(coeffs[t.coeff_idx])
            for k in t.factors:
                prod = SPEC.emul(prod, SPEC._c(dense_tables[k][x]))
            acc = SPEC.eadd(acc, prod)
    return acc


def _roundtrip(expr, coeffs, dense_tables, v):
    tables = [BE.from_ints(d) for d in dense_tables]
    claim = _host_sum(expr, coeffs, dense_tables)

    tw = TranscriptWriter(SPEC)
    fclaim, point, fevals = sc.prove_sum_check(BE, expr, coeffs, claim, tables, tw)
    proof = tw.into_proof()

    # final evals must be each table's MLE at the point
    for k, d in enumerate(dense_tables):
        assert fevals[k] == mle.eval_host(SPEC, d, point)
    # and the expression at them must reproduce the final claim
    assert expr.eval_host(SPEC, coeffs, fevals) == fclaim

    tr = TranscriptReader(SPEC, proof)
    vclaim, vpoint = sc.verify_sum_check(SPEC, expr.degree, v, claim, tr)
    assert vclaim == fclaim and vpoint == point
    tr.assert_consumed()
    return claim, proof


def test_degree2_two_tables():
    rng = random.Random(10)
    v = 5
    d0 = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    d1 = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    expr = sc.SumcheckExpr([sc.Term(None, (0, 1))], 2)
    _roundtrip(expr, [], [d0, d1], v)


def test_degree3_with_coeffs_multi_term():
    rng = random.Random(11)
    v = 4
    n = 1 << v
    ds = [[rng.randrange(SPEC.p) for _ in range(n)] for _ in range(3)]
    coeffs = [(rng.randrange(SPEC.p), rng.randrange(SPEC.p)) for _ in range(2)]
    # c0*T0*T1*T2 + c1*T0*T2 + T1
    expr = sc.SumcheckExpr(
        [sc.Term(0, (0, 1, 2)), sc.Term(1, (0, 2)), sc.Term(None, (1,))], 3
    )
    _roundtrip(expr, coeffs, ds, v)


def test_degree1_single_table():
    rng = random.Random(12)
    v = 3
    d0 = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    expr = sc.SumcheckExpr([sc.Term(None, (0,))], 1)
    _roundtrip(expr, [], [d0], v)


def test_eq_weighted_claim_matches_mle_eval():
    """The canonical GKR usage: sum_x eq(r,x)*T(x) == T~(r)."""
    rng = random.Random(13)
    v = 4
    d = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    rpt = [(rng.randrange(SPEC.p), rng.randrange(SPEC.p)) for _ in range(v)]
    eq_dense = BE.to_host(mle.eq_table(BE, rpt))
    expr = sc.SumcheckExpr([sc.Term(None, (0, 1))], 2)

    tables = [mle.eq_table(BE, rpt), BE.from_ints(d)]
    claim = mle.eval_host(SPEC, d, rpt)
    tw = TranscriptWriter(SPEC)
    fclaim, point, fevals = sc.prove_sum_check(BE, expr, [], claim, tables, tw)
    assert fevals[0] == mle.eq_eval(SPEC, rpt, point)
    assert fevals[1] == mle.eval_host(SPEC, d, point)
    assert SPEC.emul(fevals[0], fevals[1]) == fclaim
    # verifier
    tr = TranscriptReader(SPEC, tw.into_proof())
    vclaim, vpoint = sc.verify_sum_check(SPEC, 2, v, claim, tr)
    assert vclaim == fclaim and vpoint == point


def test_corrupted_proof_rejects():
    rng = random.Random(14)
    v = 4
    d0 = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    d1 = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    expr = sc.SumcheckExpr([sc.Term(None, (0, 1))], 2)
    claim, proof = _roundtrip(expr, [], [d0, d1], v)

    bad = bytearray(proof)
    bad[3] ^= 1
    tr = TranscriptReader(SPEC, bytes(bad))
    try:
        vclaim, vpoint = sc.verify_sum_check(SPEC, expr.degree, v, claim, tr)
    except ValueError:
        return  # non-canonical felt encoding — also a rejection
    # the replayed transcript must diverge: final claim can no longer match
    # the honest point/claim pair
    fclaim, point, _ = (claim, None, None)
    assert (vclaim, vpoint) != sc.verify_sum_check.__defaults__ or True
    # re-derive honest verifier result for comparison
    tr2 = TranscriptReader(SPEC, proof)
    hclaim, hpoint = sc.verify_sum_check(SPEC, expr.degree, v, claim, tr2)
    assert (vclaim, vpoint) != (hclaim, hpoint)


def test_lagrange_interp():
    rng = random.Random(15)
    # poly p(x) = 3 + 5x + 7x^2 over ext field
    def p(x):
        return SPEC.ext(3 + 5 * x + 7 * x * x)

    ys = [p(i) for i in range(3)]
    r = rng.randrange(SPEC.p)
    got = sc.lagrange_interp_eval(SPEC, ys, SPEC.ext(r))
    want = SPEC.ext(3 + 5 * r + 7 * r * r)
    assert got == want
