"""Keccak + Fiat-Shamir transcript tests."""

from hypergreco_tpu.fields import BN254_FR, GOLDILOCKS
from hypergreco_tpu.utils import keccak
from hypergreco_tpu.utils.keccak import _PyKeccak, keccak256
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

# Known keccak-256 vectors (original keccak, not SHA3)
VECTORS = [
    (b"", "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"),
    (b"abc", "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"),
    (
        b"The quick brown fox jumps over the lazy dog",
        "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15",
    ),
    (b"\x00" * 200, keccak256(b"\x00" * 200).hex()),  # multi-block self-check below
]


def test_keccak_known_vectors():
    for msg, hexdigest in VECTORS[:3]:
        assert keccak256(msg).hex() == hexdigest


def test_python_vs_native_keccak():
    native = keccak.new_keccak256()
    py = _PyKeccak()
    msgs = [b"", b"a", b"x" * 135, b"y" * 136, b"z" * 137, b"w" * 1000]
    for m in msgs:
        native.update(m)
        py.update(m)
    assert native.finalize_reset() == py.finalize_reset()
    # reset semantics: both fresh again
    native.update(b"abc")
    py.update(b"abc")
    assert native.finalize_reset() == py.finalize_reset() == keccak256(b"abc")


def test_transcript_prover_verifier_agree():
    for spec in (GOLDILOCKS, BN254_FR):
        w = TranscriptWriter(spec)
        c0 = w.squeeze_challenge()
        w.write_felt(12345)
        w.write_felt_ext(spec.ext(7, 9) if spec.ext_degree == 2 else spec.ext(7))
        c1 = w.squeeze_challenges(3)
        w.common_felt(42)
        c2 = w.squeeze_challenge()
        proof = w.into_proof()

        r = TranscriptReader(spec, proof)
        assert r.squeeze_challenge() == c0
        assert r.read_felt() == 12345
        got_ext = r.read_felt_ext()
        assert got_ext == (spec.ext(7, 9) if spec.ext_degree == 2 else spec.ext(7))
        assert r.squeeze_challenges(3) == c1
        r.common_felt(42)
        assert r.squeeze_challenge() == c2
        r.assert_consumed()


def test_transcript_binds_written_data():
    spec = GOLDILOCKS
    w1 = TranscriptWriter(spec)
    w1.write_felt(1)
    w2 = TranscriptWriter(spec)
    w2.write_felt(2)
    assert w1.squeeze_challenge() != w2.squeeze_challenge()


def test_transcript_rejects_noncanonical():
    spec = GOLDILOCKS
    bad = (spec.p).to_bytes(8, "little")
    r = TranscriptReader(spec, bad)
    try:
        r.read_felt()
        assert False, "expected rejection"
    except ValueError:
        pass


def test_rng_transcript_roundtrip():
    """Dev transcript (transcript.rs:23-69 parity): seeded challenges, no
    absorbing — a prove/verify pair with the same seed agrees."""
    import random

    from hypergreco_tpu.gkr.sumcheck import (
        SumcheckExpr,
        Term,
        prove_sum_check,
        verify_sum_check,
    )
    from hypergreco_tpu.ops.fe import get_backend
    from hypergreco_tpu.utils.transcript import (
        RngTranscriptReader,
        RngTranscriptWriter,
    )

    be = get_backend("goldilocks")
    spec = be.spec
    rng = random.Random(4)
    v = 4
    tabs_host = [[rng.randrange(spec.p) for _ in range(1 << v)] for _ in range(2)]
    expr = SumcheckExpr([Term(None, (0, 1))], 2)
    claim = spec.zero
    for x in range(1 << v):
        claim = spec.eadd(
            claim,
            spec.emul(spec.ext(tabs_host[0][x]), spec.ext(tabs_host[1][x])),
        )
    tw = RngTranscriptWriter(spec, seed=9)
    fclaim, pt, fevals = prove_sum_check(
        be, expr, [], claim, [be.from_ints(t) for t in tabs_host], tw
    )
    proof = tw.into_proof()
    tr = RngTranscriptReader(spec, proof, seed=9)
    vclaim, vpt = verify_sum_check(spec, 2, v, claim, tr)
    assert vpt == pt
    assert vclaim == spec.emul(spec._c(fevals[0]), spec._c(fevals[1]))
    # different seed -> different challenges -> mismatch
    tr2 = RngTranscriptReader(spec, proof, seed=10)
    vclaim2, vpt2 = verify_sum_check(spec, 2, v, claim, tr2)
    assert vpt2 != pt
