"""BN254 Fr device kernels vs Python-int oracles + engine smoke test."""

import os
import random

import pytest

from hypergreco_tpu.gkr import sumcheck as sc
from hypergreco_tpu.ops import mle
from hypergreco_tpu.ops import bn254
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

P = bn254.P
BE = get_backend("bn254")
SPEC = BE.spec


def _rand(rng, n):
    return [rng.randrange(P) for _ in range(n)]


def test_roundtrip_and_add_sub_mul():
    rng = random.Random(1)
    n = 64
    xs, ys = _rand(rng, n), _rand(rng, n)
    a, b = bn254.from_ints(xs), bn254.from_ints(ys)
    assert bn254.to_ints(a) == xs
    assert bn254.to_ints(bn254.add(a, b)) == [
        (x + y) % P for x, y in zip(xs, ys)
    ]
    assert bn254.to_ints(bn254.sub(a, b)) == [
        (x - y) % P for x, y in zip(xs, ys)
    ]
    assert bn254.to_ints(bn254.mul(a, b)) == [
        (x * y) % P for x, y in zip(xs, ys)
    ]


def test_mul_edge_cases():
    edge = [0, 1, P - 1, P - 2, (1 << 256) % P, 1 << 128, (P + 1) // 2]
    a = bn254.from_ints(edge)
    for y in [0, 1, P - 1, 12345678901234567890]:
        b = bn254.from_ints([y] * len(edge))
        assert bn254.to_ints(bn254.mul(a, b)) == [x * y % P for x in edge]


def test_scale_neg_select():
    rng = random.Random(2)
    xs = _rand(rng, 16)
    a = bn254.from_ints(xs)
    c = rng.randrange(P)
    assert bn254.to_ints(bn254.scale(a, c)) == [x * c % P for x in xs]
    assert bn254.to_ints(bn254.neg(a)) == [(-x) % P for x in xs]


def test_backend_digest_and_mle():
    rng = random.Random(3)
    v = 4
    xs = _rand(rng, 1 << v)
    T = BE.from_ints(xs)
    got = BE.digest_value(BE.sum_digest(T))
    assert got == sum(xs) % P
    point = [(rng.randrange(P),) for _ in range(v)]
    assert mle.evaluate(BE, T, point) == mle.eval_host(SPEC, xs, point)


def test_bn254_sumcheck_roundtrip():
    rng = random.Random(4)
    v = 3
    d0, d1 = _rand(rng, 1 << v), _rand(rng, 1 << v)
    expr = sc.SumcheckExpr([sc.Term(None, (0, 1))], 2)
    claim = SPEC.ext(sum(a * b for a, b in zip(d0, d1)) % P)
    tw = TranscriptWriter(SPEC)
    fclaim, point, fevals = sc.prove_sum_check(
        BE, expr, [], claim, [BE.from_ints(d0), BE.from_ints(d1)], tw
    )
    assert fevals[0] == mle.eval_host(SPEC, d0, point)
    tr = TranscriptReader(SPEC, tw.into_proof())
    vclaim, vpoint = sc.verify_sum_check(SPEC, 2, v, claim, tr)
    assert vclaim == fclaim and vpoint == point


def test_bn254_root_of_unity_and_ntt():
    from hypergreco_tpu.ops import ntt

    # generator-derived root has exact order
    L = 16
    w = SPEC.root_of_unity(L)
    assert pow(w, L, P) == 1 and pow(w, L // 2, P) != 1

    rng = random.Random(5)
    xs = [rng.randrange(P) for _ in range(L)]
    fwd = ntt.ntt(BE, BE.from_ints(xs))
    want = [
        sum(x * pow(w, j * k, P) for j, x in enumerate(xs)) % P
        for k in range(L)
    ]
    assert bn254.to_ints(fwd) == want
    back = bn254.to_ints(ntt.ntt(BE, fwd, inverse=True))
    assert back == xs


def test_bn254_lasso_polynomialize_paths():
    """Field-generic dims extraction + counters + E gather on BN254."""
    from hypergreco_tpu.lasso.node import _dims_jit, _as_gl
    import jax.numpy as jnp

    rng = random.Random(6)
    vals = [rng.randrange(1 << 60) for _ in range(8)]
    fr = BE.from_ints(vals)
    chunks = _dims_jit("bn254", 3, 4)(fr)
    for c in range(4):
        got = [int(x) for x in chunks[c]]
        assert got == [(v >> (16 * c)) & 0xFFFF for v in vals], c
    import numpy as np

    arr = jnp.asarray(np.arange(8, dtype=np.int32))
    assert bn254.to_ints(_as_gl(BE, arr)) == list(range(8))


@pytest.mark.skipif(
    not os.environ.get("HYPERGRECO_BIG_TESTS"),
    reason="~12min of FR-program compiles; set HYPERGRECO_BIG_TESTS=1",
)
def test_bn254_bfv_forward_matches_ct0is():
    """Full BFV circuit forward evaluation over BN254 on the reference
    fixture: the sum node output must equal the ct0is vector."""
    from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
    from hypergreco_tpu.models.bfv.constants import SK_ENC_1024_1x27

    args = load_witness_json(
        "/root/reference/bfv-gkr/src/data/bn254/sk_enc_1024_1x27_65537.json"
    )
    bfv = BfvEncrypt(SK_ENC_1024_1x27, be=BE)
    pk, _ = bfv.setup()
    circuit = bfv._circuit(pk)
    inputs_dense, ct0is_dense = bfv.get_inputs(args)
    values = circuit.evaluate([BE.from_ints(x) for x in inputs_dense])
    assert BE.to_host(values[max(circuit.output_ids())]) == ct0is_dense
