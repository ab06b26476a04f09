"""BFV sk-encryption witness generator (scripts/circuit_sk.py parity).

Runs the off-circuit encryption + quotient derivation natively (no bfv-py
dependency): samples (s, e, m), encrypts in every CRT basis, derives the
r1i/r2i quotients by exact polynomial division, centers everything into Z_p,
and emits the witness dict in the reference JSON schema plus the derived
parameter set (circuit_sk.py:23-134, 296-344, 399-439).

Conventions (match the reference exactly):
- coefficient lists are HIGHEST-degree-first;
- cyclo = X^n + 1;
- ct0i = [ai*s + e + k0i*k1 mod cyclo] centered mod qi, with
  k0i = (-t)^-1 mod qi;
- negative values are assigned as p - z (utils.py:4-18);
- bounds: E = 19 (6 sigma), K1 = (t-1)/2, R2[i] = (qi-1)/2,
  R1[i] = ((n+2)(qi-1)/2 + B + (t-1)/2*|k0i|) / qi.
"""

from __future__ import annotations

import json
import random
from typing import List, Sequence

from .constants import BfvSkEncryptConstants

SIGMA = 3.2
E_BOUND = 19  # 6*sigma upper bound used by the reference's sampler


def _center(x: int, q: int) -> int:
    """Representative of x mod q in (-q/2, q/2]."""
    x %= q
    if x > q // 2:
        x -= q
    return x


def _poly_mul(a: List[int], b: List[int]) -> List[int]:
    """Integer polynomial product (highest-degree-first).

    Fast path when one operand has tiny coefficients (the ternary secret):
    split the big side into signed 29-bit limbs and use exact int64 numpy
    convolutions — required for n >= 16384 where the schoolbook Python loop
    would take minutes."""
    import numpy as np

    small, big = (a, b) if max(map(abs, a), default=0) <= 4 else (b, a)
    if (
        len(small) * len(big) >= 1 << 18
        and max(map(abs, small), default=0) <= 4
        and max(map(abs, big), default=0) < 1 << 58
    ):
        s = np.asarray(small, dtype=np.int64)
        lo = np.asarray([x & ((1 << 29) - 1) for x in big], dtype=np.int64)
        hi = np.asarray([x >> 29 for x in big], dtype=np.int64)
        c_lo = np.convolve(lo, s)
        c_hi = np.convolve(hi, s)
        return [int(x) + (int(y) << 29) for x, y in zip(c_lo, c_hi)]

    out = [0] * (len(a) + len(b) - 1)
    bnz = [(j, bj) for j, bj in enumerate(b) if bj != 0]
    for i, ai in enumerate(a):
        if ai == 0:
            continue
        for j, bj in bnz:
            out[i + j] += ai * bj
    return out


def _poly_add(a: List[int], b: List[int]) -> List[int]:
    la, lb = len(a), len(b)
    n = max(la, lb)
    out = [0] * n
    for i, x in enumerate(a):
        out[n - la + i] += x
    for i, x in enumerate(b):
        out[n - lb + i] += x
    return out


def _reduce_cyclo(a: List[int], n: int) -> List[int]:
    """a mod (X^n + 1), integer coefficients (highest-first), O(len)."""
    L = len(a)
    by_deg = [0] * max(L, n)
    for i, c in enumerate(a):
        by_deg[L - 1 - i] += c
    # X^(d) = -X^(d-n) for d >= n, applied high-to-low (deg < 2n expected,
    # but cascade correctly for any length)
    for d in range(len(by_deg) - 1, n - 1, -1):
        if by_deg[d]:
            by_deg[d - n] -= by_deg[d]
            by_deg[d] = 0
    return [by_deg[n - 1 - i] for i in range(n)]


def _divmod_cyclo(num: List[int], n: int):
    """Exact division of num by X^n + 1 (highest-first), O(len)."""
    L = len(num)
    dmax = L - 1
    nq = [0] * (dmax + 1)
    for i, c in enumerate(num):
        nq[dmax - i] += c
    if dmax < n:
        rem = [c for c in num]
        while rem and rem[0] == 0:
            rem = rem[1:]
        return [], rem
    dq = dmax - n
    q = [0] * (dq + 1)
    for d in range(dmax, n - 1, -1):
        q[d - n] = nq[d] - (q[d] if d <= dq else 0)
    rem_by_deg = [nq[d] - (q[d] if d <= dq else 0) for d in range(n)]
    q_hf = [q[dq - i] for i in range(dq + 1)]
    rem = [rem_by_deg[n - 1 - i] for i in range(n)]
    while rem and rem[0] == 0:
        rem = rem[1:]
    return q_hf, rem


def _sample_gaussian(rng: random.Random) -> int:
    while True:
        x = round(rng.gauss(0.0, SIGMA))
        if abs(x) <= E_BOUND:
            return int(x)


def generate_witness(
    n: int,
    qis: Sequence[int],
    t: int = 65537,
    p: int = (1 << 64) - (1 << 32) + 1,
    seed: int | None = None,
):
    """Returns (args_dict, BfvSkEncryptConstants). args_dict matches the
    reference witness JSON schema (decimal strings, highest-degree-first)."""
    rng = random.Random(seed)
    qis = list(qis)
    q = 1
    for qi in qis:
        q *= qi

    s = [rng.choice((-1, 0, 1)) for _ in range(n)]
    e = [_sample_gaussian(rng) for _ in range(n)]
    m = [_center(rng.randrange(t), t) for _ in range(n)]
    k1 = [_center(c * q, t) for c in m]

    k1_bound = (t - 1) // 2
    assert all(abs(c) <= k1_bound for c in k1)

    r1_bounds, r2_bounds, k0is = [], [], []
    ais, r1is, r2is, ct0is = [], [], [], []

    for qi in qis:
        ai = [_center(rng.randrange(qi), qi) for _ in range(n)]
        k0i = pow(-t, -1, qi)

        # ct0i_hat = ai*s + e + k0i*k1 (degree 2n-2, integer coeffs)
        ct0i_hat = _poly_add(
            _poly_mul(ai, s), _poly_add(e, [c * k0i for c in k1])
        )
        assert len(ct0i_hat) == 2 * n - 1

        # ct0i = ct0i_hat mod cyclo, centered mod qi
        ct0i = [_center(c, qi) for c in _reduce_cyclo(ct0i_hat, n)]

        # r2i = (ct0i - ct0i_hat mod qi-centered) / cyclo
        num = _poly_add(ct0i, [-c for c in ct0i_hat])
        num = [_center(c, qi) for c in num]
        r2i, rem = _divmod_cyclo(num, n)
        assert rem == [], "cyclo division must be exact"
        assert len(r2i) == n - 1

        # r1i = (ct0i - ct0i_hat - r2i*cyclo) / qi
        cyclo = [1] + [0] * (n - 1) + [1]
        num = _poly_add(
            _poly_add(ct0i, [-c for c in ct0i_hat]),
            [-c for c in _poly_mul(r2i, cyclo)],
        )
        assert all(c % qi == 0 for c in num), "qi division must be exact"
        r1i = [c // qi for c in num]
        # strip to degree 2n-2 (leading zeros kept by construction)
        while len(r1i) > 2 * n - 1:
            assert r1i[0] == 0
            r1i = r1i[1:]

        # the encryption identity over Z (hence over Z_p):
        # ct0i == ct0i_hat + r1i*qi + r2i*cyclo
        lhs = _poly_add(
            ct0i_hat,
            _poly_add([c * qi for c in r1i], _poly_mul(r2i, cyclo)),
        )
        lhs = [c for c in lhs]
        while len(lhs) > n and lhs[0] == 0:
            lhs = lhs[1:]
        assert lhs == ct0i, "encryption identity failed"

        r2i_bound = (qi - 1) // 2
        assert all(abs(c) <= r2i_bound for c in r2i)
        # NB: the reference uses the POSITIVE residue k0i in this bound
        # (circuit_sk.py:331-334)
        r1i_bound = int(
            ((qi - 1) // 2 * (n + 2) + E_BOUND + (t - 1) // 2 * k0i) / qi
        )
        assert all(abs(c) <= r1i_bound for c in r1i), (r1i_bound,)

        ais.append(ai)
        r1is.append(r1i)
        r2is.append(r2i)
        ct0is.append(ct0i)
        k0is.append(k0i)
        r1_bounds.append(r1i_bound)
        r2_bounds.append(r2i_bound)

    def assign(vals):
        return [str(v % p) for v in vals]

    args = {
        "s": assign(s),
        "e": assign(e),
        "k1": assign(k1),
        "r2is": [assign(v) for v in r2is],
        "r1is": [assign(v) for v in r1is],
        "ais": [assign(v) for v in ais],
        "ct0is": [assign(v) for v in ct0is],
    }
    consts = BfvSkEncryptConstants(
        name=f"sk_enc_{n}_{len(qis)}x{max(qis).bit_length()}_{t}",
        N=n,
        K=len(qis),
        E_BOUND=E_BOUND,
        S_BOUND=1,
        K1_BOUND=k1_bound,
        R1_BOUNDS=tuple(r1_bounds),
        R2_BOUNDS=tuple(r2_bounds),
        QIS=tuple(qis),
        K0IS=tuple(k0is),
    )
    return args, consts


def write_witness_json(path: str, args: dict):
    with open(path, "w") as f:
        json.dump(args, f)
