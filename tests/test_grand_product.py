"""Batched grand-product argument: prove/verify roundtrip + soundness."""

import random

import pytest

from hypergreco_tpu.gkr import grand_product as gp
from hypergreco_tpu.ops import mle
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

BE = get_backend("goldilocks")
SPEC = BE.spec


def _setup(m, v, seed):
    rng = random.Random(seed)
    dense = [
        [rng.randrange(1, SPEC.p) for _ in range(1 << v)] for _ in range(m)
    ]
    leaves = [BE.from_ints(d) for d in dense]
    prods = []
    for d in dense:
        acc = 1
        for x in d:
            acc = acc * x % SPEC.p
        prods.append(SPEC.ext(acc))
    return dense, leaves, prods


@pytest.mark.parametrize("m,v", [(1, 1), (2, 3), (3, 4)])
def test_roundtrip(m, v):
    dense, leaves, prods = _setup(m, v, 100 + m + v)
    tw = TranscriptWriter(SPEC)
    products, point, claims = gp.prove_grand_product(BE, leaves, tw)
    assert products == prods
    assert len(point) == v
    # claims must open the leaf MLEs at the point
    for i, d in enumerate(dense):
        assert claims[i] == mle.eval_host(SPEC, d, point)

    proof = tw.into_proof()
    tr = TranscriptReader(SPEC, proof)
    vproducts, vpoint, vclaims = gp.verify_grand_product(SPEC, m, v, tr)
    tr.assert_consumed()
    assert vproducts == products and vpoint == point and vclaims == claims


def test_corrupted_proof_rejected():
    m, v = 2, 3
    dense, leaves, prods = _setup(m, v, 7)
    tw = TranscriptWriter(SPEC)
    gp.prove_grand_product(BE, leaves, tw)
    proof = bytearray(tw.into_proof())
    # corrupt one of the roots
    proof[5] ^= 0x40
    tr = TranscriptReader(SPEC, bytes(proof))
    with pytest.raises(ValueError):
        gp.verify_grand_product(SPEC, m, v, tr)


def test_wrong_leaf_detected_by_claim_check():
    """A cheating prover that swaps a leaf after computing the tree yields
    claims that do not match the true leaf MLE (the caller's final check)."""
    m, v = 1, 3
    dense, leaves, prods = _setup(m, v, 8)
    tw = TranscriptWriter(SPEC)
    _, point, claims = gp.prove_grand_product(BE, leaves, tw)
    tampered = list(dense[0])
    tampered[3] = (tampered[3] + 1) % SPEC.p
    assert claims[0] != mle.eval_host(SPEC, tampered, point)
