"""Multi-device sumcheck: shard-count-invariant transcripts (SURVEY.md §4).

Runs on the virtual 8-device CPU mesh from conftest; the sharded prover must
produce byte-identical proofs to the single-device engine."""

import random

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from hypergreco_tpu.gkr import sumcheck as sc
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

BE = get_backend("goldilocks")
SPEC = BE.spec


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_sharded_proof_matches_unsharded(ndev):
    rng = random.Random(50 + ndev)
    v = 7
    n = 1 << v
    d0 = [rng.randrange(SPEC.p) for _ in range(n)]
    d1 = [rng.randrange(SPEC.p) for _ in range(n)]
    expr = sc.SumcheckExpr([sc.Term(None, (0, 1))], 2)
    claim = SPEC.ext(sum(a * b for a, b in zip(d0, d1)) % SPEC.p)

    tw1 = TranscriptWriter(SPEC)
    out1 = sc.prove_sum_check(
        BE, expr, [], claim, [BE.from_ints(d0), BE.from_ints(d1)], tw1
    )

    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("hc",))
    tw2 = TranscriptWriter(SPEC)
    out2 = sc.prove_sum_check(
        BE,
        expr,
        [],
        claim,
        [BE.from_ints(d0), BE.from_ints(d1)],
        tw2,
        mesh=mesh,
    )
    assert tw1.into_proof() == tw2.into_proof()
    assert out1 == out2

    # and it still verifies
    tr = TranscriptReader(SPEC, tw2.into_proof())
    vclaim, vpoint = sc.verify_sum_check(SPEC, expr.degree, v, claim, tr)
    assert vclaim == out2[0] and vpoint == out2[1]
