"""Checkpoint/resume: interrupted proving resumes to a byte-identical proof
(SURVEY.md §5.4 — the reference has none; added for multi-hour TPU proofs)."""

import pickle
import random

from hypergreco_tpu.gkr.circuit import (
    Circuit,
    FftNode,
    InputNode,
    VanillaGate,
    VanillaNode,
    prove_gkr,
    verify_gkr,
)
from hypergreco_tpu.ops import mle
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

BE = get_backend("goldilocks")
SPEC = BE.spec
P = SPEC.p


def _circuit():
    v = 3
    n = 1 << v
    c = Circuit(BE)
    a = c.insert(InputNode(v))
    b = c.insert(InputNode(v))
    fa = c.insert(FftNode.forward(v))
    fb = c.insert(FftNode.forward(v))
    c.connect(a, fa)
    c.connect(b, fb)
    prod = c.insert(
        VanillaNode(2, v, [VanillaGate.mul((0, j), (1, j)) for j in range(n)])
    )
    c.connect(fa, prod)
    c.connect(fb, prod)
    inv = c.insert(FftNode.inverse_node(v))
    c.connect(prod, inv)
    return c, v


def test_resume_reproduces_proof():
    rng = random.Random(77)
    circuit, v = _circuit()
    n = 1 << v
    da = [rng.randrange(P) for _ in range(n)]
    db = [rng.randrange(P) for _ in range(n)]
    inputs = [BE.from_ints(da), BE.from_ints(db)]
    values = circuit.evaluate(inputs)
    out_id = circuit.output_ids()[0]
    pt = [(rng.randrange(P), rng.randrange(P)) for _ in range(v)]
    out_claims = [(pt, mle.evaluate(BE, values[out_id], pt))]

    # uninterrupted proof
    tw = TranscriptWriter(SPEC)
    prove_gkr(circuit, values, out_claims, tw)
    proof_a = tw.into_proof()

    # interrupted: capture checkpoints, keep the middle one (pickled, as a
    # crash-recovery file would be)
    snaps = []
    tw2 = TranscriptWriter(SPEC)
    prove_gkr(circuit, values, out_claims, tw2, checkpoint_cb=snaps.append)
    assert len(snaps) >= 2
    blob = pickle.dumps(snaps[1])

    # fresh circuit + values (as after a restart), resume from the snapshot
    circuit2, _ = _circuit()
    values2 = circuit2.evaluate([BE.from_ints(da), BE.from_ints(db)])
    tw3 = TranscriptWriter(SPEC)
    prove_gkr(
        circuit2, values2, out_claims, tw3, resume=pickle.loads(blob)
    )
    proof_b = tw3.into_proof()
    assert proof_a == proof_b

    tr = TranscriptReader(SPEC, proof_b)
    verify_gkr(circuit2, out_claims, tr)
    tr.assert_consumed()
