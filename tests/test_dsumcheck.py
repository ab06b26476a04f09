"""Fused device sumcheck vs the host-driven engine: byte-identical
transcripts, identical challenges and final evals."""

import random

import jax
import jax.numpy as jnp
import pytest

from hypergreco_tpu.gkr import dsumcheck as dsc
from hypergreco_tpu.gkr import dtranscript as dt
from hypergreco_tpu.gkr.sumcheck import (
    SumcheckExpr,
    Term,
    prove_sum_check,
    verify_sum_check,
)
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter


def _host_point(be, dev_buf, n):
    vals = be.to_host(dev_buf)
    return [be.spec._c(v) for v in vals[:n]]


def _run_case(v, expr, coeffs, tables_host, num_vars=None, seed=3):
    be = get_backend("goldilocks")
    spec = be.spec
    tables = [be.from_ints(t) for t in tables_host]

    host_tx = TranscriptWriter(spec)
    # host ground truth needs the true claim; compute by direct evaluation
    n_act = 1 << (num_vars or v)
    claim = spec.zero
    for x in range(n_act):
        te = [spec._c(t[x]) for t in tables_host]
        claim = spec.eadd(claim, expr.eval_host(spec, coeffs, te))
    hclaim, hpoint, hevals = prove_sum_check(
        be, expr, coeffs, claim, [be.from_ints(t) for t in tables_host],
        host_tx, num_vars=num_vars,
    )
    host_proof = host_tx.into_proof()

    dtx = dt.new_dtx(1024)
    cdev = dsc.coeffs_device(be, coeffs)
    chal, final, dtx = dsc.prove_sum_check_device(
        be, expr, cdev, tables, dtx, num_vars=num_vars
    )
    dev_proof = dt.log_to_proof(be, dtx.log_lo, dtx.log_hi, int(dtx.log_len))

    assert dev_proof == host_proof
    nv = num_vars or v
    assert _host_point(be, chal, nv) == [spec._c(c) for c in hpoint]
    assert [spec._c(x) for x in be.to_host(final)] == [
        spec._c(x) for x in hevals
    ]

    # and the verifier accepts the device proof
    rd = TranscriptReader(spec, dev_proof)
    fclaim, point = verify_sum_check(spec, expr.degree, nv, claim, rd)
    evals = [spec._c(x) for x in be.to_host(final)]
    assert expr.eval_host(spec, coeffs, evals) == fclaim


def test_deg2_basic():
    rng = random.Random(5)
    v = 5
    p = get_backend("goldilocks").spec.p
    T0 = [rng.randrange(p) for _ in range(1 << v)]
    T1 = [rng.randrange(p) for _ in range(1 << v)]
    expr = SumcheckExpr([Term(None, (0, 1))], 2)
    _run_case(v, expr, [], [T0, T1])


def test_deg3_coeffs_multi_term():
    rng = random.Random(9)
    v = 6
    p = get_backend("goldilocks").spec.p
    tabs = [[rng.randrange(p) for _ in range(1 << v)] for _ in range(4)]
    expr = SumcheckExpr(
        [Term(0, (0, 1, 2)), Term(1, (2, 3)), Term(None, (1,))], 4
    )
    coeffs = [
        (rng.randrange(p), rng.randrange(p)),
        (rng.randrange(p), rng.randrange(p)),
    ]
    _run_case(v, expr, coeffs, tabs)


def test_active_prefix_shared_buffer():
    """num_vars < buffer vars: padded region must not leak into messages."""
    rng = random.Random(13)
    bv, v = 6, 3
    p = get_backend("goldilocks").spec.p
    tabs = [[rng.randrange(p) for _ in range(1 << bv)] for _ in range(2)]
    expr = SumcheckExpr([Term(None, (0, 1))], 2)
    _run_case(bv, expr, [], tabs, num_vars=v)


def test_traced_v_shares_compile():
    """Two different active sizes reuse one compiled program (traced v)."""
    rng = random.Random(17)
    bv = 5
    be = get_backend("goldilocks")
    p = be.spec.p
    expr = SumcheckExpr([Term(None, (0, 1))], 2)
    for v in (2, 4):
        tabs = [[rng.randrange(p) for _ in range(1 << bv)] for _ in range(2)]
        _run_case(bv, expr, [], tabs, num_vars=v)
    fn = dsc._prove_jit("goldilocks", expr.key(), 0, bv)
    assert fn._cache_size() == 1


def test_chunked_round_body_parity(monkeypatch):
    """The column-chunked round body (used when the stacked buffer exceeds
    _CHUNK_BYTES — GB-scale in production) must produce the identical
    transcript: force it by shrinking the thresholds."""
    monkeypatch.setattr(dsc, "_CHUNK_BYTES", 1)
    monkeypatch.setattr(dsc, "_CHUNK_COLS", 1 << 3)
    # _prove_jit is lru_cached by (backend, expr_key, logn): an earlier test
    # that compiled the same key would silently reuse the MONOLITHIC body
    # and this test would stop exercising the chunked path (ADVICE r4)
    dsc._prove_jit.cache_clear()
    rng = random.Random(21)
    v = 6
    p = get_backend("goldilocks").spec.p
    tabs = [[rng.randrange(p) for _ in range(1 << v)] for _ in range(3)]
    expr = SumcheckExpr([Term(0, (0, 1, 2)), Term(None, (1, 2))], 3)
    coeffs = [(rng.randrange(p), rng.randrange(p))]
    _run_case(v, expr, coeffs, tabs)
