"""LassoNode end-to-end: batched range lookups prove/verify + soundness."""

import random

import pytest

from hypergreco_tpu.lasso.node import LassoNode
from hypergreco_tpu.lasso.tables import LassoPreprocessing, RangeLookup
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

BE = get_backend("goldilocks")
SPEC = BE.spec
M = 1 << 16

BOUNDS = [39, 3, 82638181]  # mixed: two single-chunk + one two-chunk
NUM_VARS = 5  # 32 rows: 8 + 8 + 16


def _build(seed, tamper=False):
    rng = random.Random(seed)
    pp = LassoPreprocessing.preprocess(
        [RangeLookup(b) for b in BOUNDS], C=4, M=M
    )
    lookups = (
        [RangeLookup.id_for(39)] * 8
        + [RangeLookup.id_for(3)] * 8
        + [RangeLookup.id_for(82638181)] * 16
    )
    values = (
        [rng.randrange(39) for _ in range(8)]
        + [rng.randrange(3) for _ in range(8)]
        + [rng.randrange(82638181) for _ in range(16)]
    )
    if tamper:
        # beyond the lookup's ENFORCED range: the bound-subtable semantics
        # (range.rs:58-72, mirrored) enforce value < cutoff * M^num_full,
        # which has slack over the nominal bound; 63845*2^16 is the first
        # rejected top-chunk for bound 82638181.
        values[20] = 63845 << 16
    node = LassoNode(BE, pp, NUM_VARS, lookups)
    inputs = BE.from_ints(values)
    return node, inputs


def _vnode(node):
    vpp = node.pp.to_verifier_preprocessing()
    return LassoNode(BE, vpp, NUM_VARS, node.lookups)


def test_roundtrip():
    node, inputs = _build(3)
    tw = TranscriptWriter(SPEC)
    claims = node.prove_claim_reduction(inputs, tw)
    proof = tw.into_proof()

    vnode = _vnode(node)
    tr = TranscriptReader(SPEC, proof)
    vclaims = vnode.verify_claim_reduction(tr)
    tr.assert_consumed()
    assert vclaims == claims
    # the exported claim opens the input MLE (GKR's final check upstream)
    from hypergreco_tpu.ops import mle

    r, val = claims[0]
    assert val == mle.evaluate(BE, inputs, r)


def test_out_of_range_value_rejected():
    node, inputs = _build(4, tamper=True)
    tw = TranscriptWriter(SPEC)
    node.prove_claim_reduction(inputs, tw)
    vnode = _vnode(node)
    tr = TranscriptReader(SPEC, tw.into_proof())
    with pytest.raises(ValueError):
        vnode.verify_claim_reduction(tr)


def test_corrupted_proof_rejected():
    node, inputs = _build(5)
    tw = TranscriptWriter(SPEC)
    node.prove_claim_reduction(inputs, tw)
    proof = bytearray(tw.into_proof())
    proof[-9] ^= 0x10
    vnode = _vnode(node)
    tr = TranscriptReader(SPEC, bytes(proof))
    with pytest.raises(ValueError):
        vnode.verify_claim_reduction(tr)
