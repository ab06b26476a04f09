"""GKR circuit runtime: evaluate + prove/verify over vanilla & FFT nodes."""

import random

import pytest

from hypergreco_tpu.gkr import circuit as gc
from hypergreco_tpu.gkr.circuit import (
    Circuit,
    FftNode,
    InputNode,
    VanillaGate,
    VanillaNode,
    prove_gkr,
    verify_gkr,
    relay_add_const,
    relay_mul_const,
)
from hypergreco_tpu.ops import mle, ntt
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

BE = get_backend("goldilocks")
SPEC = BE.spec
P = SPEC.p


def _rand_point(rng, v):
    return [(rng.randrange(P), rng.randrange(P)) for _ in range(v)]


def _run(circuit, input_dense, seed=9):
    rng = random.Random(seed)
    inputs = [BE.from_ints(d) for d in input_dense]
    values = circuit.evaluate(inputs)

    out_ids = circuit.output_ids()
    out_claims = []
    for oid in out_ids:
        v = circuit.nodes[oid].log2_output_size()
        pt = _rand_point(rng, v)
        out_claims.append((pt, mle.evaluate(BE, values[oid], pt)))

    tw = TranscriptWriter(SPEC)
    in_claims = prove_gkr(circuit, values, out_claims, tw)
    proof = tw.into_proof()

    tr = TranscriptReader(SPEC, proof)
    vin_claims = verify_gkr(circuit, out_claims, tr)
    tr.assert_consumed()
    assert vin_claims == in_claims

    # final GKR check: every input claim opens the input MLE
    for dense, claims in zip(input_dense, in_claims):
        for pt, val in claims:
            assert val == mle.eval_host(SPEC, dense, pt)
    return proof, out_claims


def test_relay_scale_sum_node():
    """Two inputs -> linear vanilla node (relay + mul-const + add-const)."""
    rng = random.Random(1)
    v = 3
    n = 1 << v
    circuit = Circuit(BE)
    a = circuit.insert(InputNode(v))
    b = circuit.insert(InputNode(v))
    gates = [
        VanillaGate.new(7, [(3, (0, j)), (None, (1, n - 1 - j))], [])
        for j in range(n)
    ]
    s = circuit.insert(VanillaNode(2, v, gates))
    circuit.connect(a, s)
    circuit.connect(b, s)
    da = [rng.randrange(P) for _ in range(n)]
    db = [rng.randrange(P) for _ in range(n)]
    _run(circuit, [da, db])


def test_mul_gates_two_phase():
    """Quadratic gates exercise the two-phase reduction."""
    rng = random.Random(2)
    v = 3
    n = 1 << v
    circuit = Circuit(BE)
    a = circuit.insert(InputNode(v))
    b = circuit.insert(InputNode(v))
    gates = [VanillaGate.mul((0, j), (1, j)) for j in range(n)]
    m = circuit.insert(VanillaNode(2, v, gates))
    circuit.connect(a, m)
    circuit.connect(b, m)
    da = [rng.randrange(P) for _ in range(n)]
    db = [rng.randrange(P) for _ in range(n)]
    _run(circuit, [da, db])


def test_reps_and_replication():
    """num_reps > 1: per-rep input slices (the r2i_cyclo pattern)."""
    rng = random.Random(3)
    v, reps = 2, 4
    n = 1 << v
    circuit = Circuit(BE)
    a = circuit.insert(InputNode(v, reps))  # size reps * n
    # per rep: [x0.. x_{n-2}, 0, x0..x_{n-2}, 0] (cyclo-style wiring)
    gates = (
        [VanillaGate.relay((0, i)) for i in range(n - 1)]
        + [VanillaGate.constant(0)]
        + [VanillaGate.relay((0, i)) for i in range(n - 1)]
        + [VanillaGate.constant(0)]
    )
    node = circuit.insert(VanillaNode(1, v, gates, reps))
    circuit.connect(a, node)
    da = [rng.randrange(P) for _ in range(n * reps)]
    _run(circuit, [da])


def test_fft_chain_with_mul():
    """FFT(a) . FFT(b) -> IFFT == polynomial product (the ai*s pattern)."""
    rng = random.Random(4)
    v = 3
    n = 1 << v
    circuit = Circuit(BE)
    a = circuit.insert(InputNode(v))
    b = circuit.insert(InputNode(v))
    fa = circuit.insert(FftNode.forward(v))
    fb = circuit.insert(FftNode.forward(v))
    circuit.connect(a, fa)
    circuit.connect(b, fb)
    gates = [VanillaGate.mul((0, j), (1, j)) for j in range(n)]
    prod = circuit.insert(VanillaNode(2, v, gates))
    circuit.connect(fa, prod)
    circuit.connect(fb, prod)
    inv = circuit.insert(FftNode.inverse_node(v))
    circuit.connect(prod, inv)

    h = n // 2
    da = [rng.randrange(P) for _ in range(h)] + [0] * h
    db = [rng.randrange(P) for _ in range(h)] + [0] * h
    _run(circuit, [da, db])

    # forward values really are the cyclic convolution
    inputs = [BE.from_ints(da), BE.from_ints(db)]
    values = circuit.evaluate(inputs)
    got = BE.to_host(values[inv])
    want = [0] * n
    for i in range(h):
        for j in range(h):
            want[(i + j) % n] = (want[(i + j) % n] + da[i] * db[j]) % P
    assert got == want


def test_multi_claim_fanout():
    """One node consumed by two consumers -> multiple claims get RLC'd."""
    rng = random.Random(5)
    v = 3
    n = 1 << v
    circuit = Circuit(BE)
    a = circuit.insert(InputNode(v))
    r1 = circuit.insert(
        VanillaNode(1, v, [VanillaGate.relay((0, j)) for j in range(n)])
    )
    r2 = circuit.insert(
        VanillaNode(1, v, [relay_mul_const((0, j), 5) for j in range(n)])
    )
    circuit.connect(a, r1)
    circuit.connect(a, r2)
    da = [rng.randrange(P) for _ in range(n)]
    _run(circuit, [da])


def test_tampered_proof_rejected():
    rng = random.Random(6)
    v = 3
    n = 1 << v
    circuit = Circuit(BE)
    a = circuit.insert(InputNode(v))
    b = circuit.insert(InputNode(v))
    gates = [VanillaGate.mul((0, j), (1, j)) for j in range(n)]
    m = circuit.insert(VanillaNode(2, v, gates))
    circuit.connect(a, m)
    circuit.connect(b, m)
    da = [rng.randrange(P) for _ in range(n)]
    db = [rng.randrange(P) for _ in range(n)]
    proof, out_claims = _run(circuit, [da, db])
    bad = bytearray(proof)
    bad[7] ^= 2
    tr = TranscriptReader(SPEC, bytes(bad))
    with pytest.raises(ValueError):
        verify_gkr(circuit, out_claims, tr)
