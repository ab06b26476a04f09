"""Device grand-product prover vs host prover: byte-identical transcripts,
and the host verifier accepts device proofs."""

import random

import pytest

from hypergreco_tpu.gkr import dgrand_product as dgp
from hypergreco_tpu.gkr import dtranscript as dt
from hypergreco_tpu.gkr.grand_product import (
    prove_grand_product,
    verify_grand_product,
)
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter


@pytest.mark.parametrize("m,v", [(1, 1), (2, 3), (3, 5)])
def test_device_gp_matches_host(m, v):
    be = get_backend("goldilocks")
    spec = be.spec
    rng = random.Random(100 * m + v)
    leaves_host = [
        [rng.randrange(1, spec.p) for _ in range(1 << v)] for _ in range(m)
    ]

    host_tx = TranscriptWriter(spec)
    prods, hpoint, hclaims = prove_grand_product(
        be, [be.from_ints(t) for t in leaves_host], host_tx
    )
    host_proof = host_tx.into_proof()

    dtx = dt.new_dtx(4096)
    pbuf, dtx = dgp.prove_grand_product_device(
        be, [be.from_ints(t) for t in leaves_host], dtx
    )
    dev_proof = dt.log_to_proof(be, dtx.log_lo, dtx.log_hi, int(dtx.log_len))

    assert dev_proof == host_proof
    got_point = [spec._c(x) for x in be.to_host(pbuf)]
    assert got_point == [spec._c(r) for r in hpoint]

    rd = TranscriptReader(spec, dev_proof)
    vprods, vpoint, vclaims = verify_grand_product(spec, m, v, rd)
    rd.assert_consumed()
    assert [spec._c(p) for p in vprods] == [spec._c(p) for p in prods]


def test_device_gp_ext_leaves():
    be = get_backend("goldilocks")
    spec = be.spec
    rng = random.Random(77)
    m, v = 2, 4
    leaves_host = [
        [(rng.randrange(1, spec.p), rng.randrange(spec.p)) for _ in range(1 << v)]
        for _ in range(m)
    ]
    host_tx = TranscriptWriter(spec)
    prove_grand_product(
        be, [be.from_ints(t, ext=True) for t in leaves_host], host_tx
    )
    dtx = dt.new_dtx(4096)
    _, dtx = dgp.prove_grand_product_device(
        be, [be.from_ints(t, ext=True) for t in leaves_host], dtx
    )
    assert (
        dt.log_to_proof(be, dtx.log_lo, dtx.log_hi, int(dtx.log_len))
        == host_tx.into_proof()
    )
