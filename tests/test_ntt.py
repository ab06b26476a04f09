"""NTT kernel vs host DFT oracle; convolution and claim-reduction identities."""

import random

from hypergreco_tpu.ops import mle, ntt
from hypergreco_tpu.ops.fe import get_backend

BE = get_backend("goldilocks")
SPEC = BE.spec
P = SPEC.p


def _host_ntt(xs, inverse=False):
    L = len(xs)
    w = SPEC.root_of_unity(L)
    if inverse:
        w = pow(w, P - 2, P)
    out = []
    for k in range(L):
        acc = 0
        for j, x in enumerate(xs):
            acc = (acc + x * pow(w, j * k, P)) % P
        out.append(acc)
    if inverse:
        li = pow(L, P - 2, P)
        out = [x * li % P for x in out]
    return out


def test_ntt_matches_host_dft():
    rng = random.Random(1)
    L = 16
    xs = [rng.randrange(P) for _ in range(L)]
    got = BE.to_host(ntt.ntt(BE, BE.from_ints(xs)))
    assert got == _host_ntt(xs)


def test_intt_inverts():
    rng = random.Random(2)
    L = 32
    xs = [rng.randrange(P) for _ in range(L)]
    fwd = ntt.ntt(BE, BE.from_ints(xs))
    back = BE.to_host(ntt.ntt(BE, fwd, inverse=True))
    assert back == xs


def test_convolution_via_ntt():
    """INTT(NTT(a) . NTT(b)) = cyclic convolution = poly product when padded."""
    rng = random.Random(3)
    n = 8
    L = 2 * n
    a = [rng.randrange(P) for _ in range(n)] + [0] * n
    b = [rng.randrange(P) for _ in range(n)] + [0] * n
    fa = ntt.ntt(BE, BE.from_ints(a))
    fb = ntt.ntt(BE, BE.from_ints(b))
    prod = BE.mul(fa, fb)
    c = BE.to_host(ntt.ntt(BE, prod, inverse=True))
    want = [0] * L
    for i in range(n):
        for j in range(n):
            want[(i + j) % L] = (want[(i + j) % L] + a[i] * b[j]) % P
    assert c == want


def test_dft_row_mle_reduction_identity():
    """out~(r) == sum_j d_r[j] * in[j] for out = NTT(in) (both directions)."""
    rng = random.Random(4)
    logl = 4
    L = 1 << logl
    xs = [rng.randrange(P) for _ in range(L)]
    for inverse in (False, True):
        out = BE.to_host(ntt.ntt(BE, BE.from_ints(xs), inverse=inverse))
        r = [(rng.randrange(P), rng.randrange(P)) for _ in range(logl)]
        want = mle.eval_host(SPEC, out, r)
        d = BE.to_host(ntt.dft_row_mle(BE, [r], [SPEC.one], logl, inverse))
        acc = SPEC.zero
        for j in range(L):
            acc = SPEC.eadd(acc, SPEC.emul(d[j], SPEC.ext(xs[j])))
        assert acc == want, inverse
