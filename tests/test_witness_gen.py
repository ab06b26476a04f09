"""Witness generator: encryption identity + reference-constants parity."""

from hypergreco_tpu.models.bfv.constants import SK_ENC_1024_1x27
from hypergreco_tpu.models.bfv.witness_gen import generate_witness

P = (1 << 64) - (1 << 32) + 1


def test_constants_match_reference_1024():
    _, consts = generate_witness(1024, [82638181], seed=1)
    ref = SK_ENC_1024_1x27
    assert consts.R1_BOUNDS == ref.R1_BOUNDS
    assert consts.R2_BOUNDS == ref.R2_BOUNDS
    assert consts.K0IS == ref.K0IS
    assert consts.K1_BOUND == ref.K1_BOUND
    assert consts.E_BOUND == ref.E_BOUND


def test_encryption_identity_mod_p():
    """ct0i == ai*s + e + k1*k0i + r1i*qi + r2i*cyclo over Z_p
    (circuit_sk.py:366-370 sanity)."""
    n, qi = 64, 82638181
    args, consts = generate_witness(n, [qi], seed=3)

    def ints(v):
        return [int(x) for x in v]

    s, e, k1 = ints(args["s"]), ints(args["e"]), ints(args["k1"])
    ai = ints(args["ais"][0])
    r1i, r2i = ints(args["r1is"][0]), ints(args["r2is"][0])
    ct0i = ints(args["ct0is"][0])
    k0i = consts.K0IS[0]

    # polynomial product mod p, highest-first
    def mul(a, b):
        out = [0] * (len(a) + len(b) - 1)
        for i, x in enumerate(a):
            for j, y in enumerate(b):
                out[i + j] = (out[i + j] + x * y) % P
        return out

    def add(a, b):
        la, lb = len(a), len(b)
        m = max(la, lb)
        out = [0] * m
        for i, x in enumerate(a):
            out[m - la + i] = (out[m - la + i] + x) % P
        for i, x in enumerate(b):
            out[m - lb + i] = (out[m - lb + i] + x) % P
        return out

    cyclo = [1] + [0] * (n - 1) + [1]
    rhs = add(
        add(mul(ai, s), add(e, [c * k0i % P for c in k1])),
        add([c * qi % P for c in r1i], mul(r2i, cyclo)),
    )
    while len(rhs) > n and rhs[0] == 0:
        rhs = rhs[1:]
    assert rhs == ct0i


def test_witness_schema_matches_reference_fixture():
    args, _ = generate_witness(64, [82638181, 82638183], seed=5)
    assert set(args) == {"s", "e", "k1", "r2is", "r1is", "ais", "ct0is"}
    assert len(args["s"]) == 64
    assert len(args["r2is"]) == 2 and len(args["r2is"][0]) == 63
    assert len(args["r1is"][0]) == 127
    assert all(isinstance(x, str) for x in args["s"])
