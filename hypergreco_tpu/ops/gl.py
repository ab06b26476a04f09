"""Goldilocks field (p = 2^64 - 2^32 + 1) as branch-free uint32-pair vector ops.

Device representation: ``GL(lo, hi)`` — two uint32 arrays, value = hi*2^32 + lo,
kept canonical (< p). All arithmetic is wrap-around uint32 with explicit carry
detection so the identical code runs under XLA on TPU/CPU and inside Pallas
kernels (Mosaic has no 64-bit integers).

Host-side scalar math uses plain Python ints mod P (see bottom).

Reference parity: plays the role of the `goldilocks` crate (fork
`nulltea/goldilocks`) used by the reference (Cargo.toml:67-68); reduction
algorithm is the standard Goldilocks reduce128 (2^64 ≡ 2^32-1, 2^96 ≡ -1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

P = (1 << 64) - (1 << 32) + 1
EPS = (1 << 32) - 1  # 2^64 mod p
P_LO = np.uint32(1)
P_HI = np.uint32(0xFFFFFFFF)

_U32 = jnp.uint32


class GL(NamedTuple):
    """A vector of Goldilocks elements (canonical, < p)."""

    lo: jnp.ndarray  # uint32
    hi: jnp.ndarray  # uint32

    @property
    def shape(self):
        return self.lo.shape

    def __len__(self):
        return self.lo.shape[0]


def _u32(x):
    return jnp.asarray(x, dtype=_U32)


def _addc(a, b):
    """uint32 wrapping add with carry-out (0/1 uint32)."""
    s = a + b
    return s, (s < a).astype(_U32)


def _add64(alo, ahi, blo, bhi):
    """64-bit add on uint32 pairs -> (lo, hi, carry)."""
    lo, c0 = _addc(alo, blo)
    t, c1 = _addc(ahi, bhi)
    hi, c2 = _addc(t, c0)
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """64-bit subtract on uint32 pairs -> (lo, hi, borrow)."""
    lo = alo - blo
    b0 = (alo < blo).astype(_U32)
    hi = ahi - bhi - b0
    br = ((ahi < bhi) | ((ahi == bhi) & (b0 == 1))).astype(_U32)
    return lo, hi, br


def _mul32(u, v):
    """32x32 -> 64 multiply via 16-bit partial products -> (lo, hi)."""
    u0 = u & 0xFFFF
    u1 = u >> 16
    v0 = v & 0xFFFF
    v1 = v >> 16
    p00 = u0 * v0
    p01 = u0 * v1
    p10 = u1 * v0
    p11 = u1 * v1
    mid, cm = _addc(p01, p10)
    lo, cl = _addc(p00, mid << 16)
    hi = p11 + (mid >> 16) + (cm << 16) + cl
    return lo, hi


def _mul64(alo, ahi, blo, bhi):
    """64x64 -> 128 multiply -> four uint32 words (x0..x3, little-endian)."""
    m0l, m0h = _mul32(alo, blo)
    m1l, m1h = _mul32(alo, bhi)
    m2l, m2h = _mul32(ahi, blo)
    m3l, m3h = _mul32(ahi, bhi)
    x0 = m0l
    x1, c1 = _addc(m0h, m1l)
    x1, c2 = _addc(x1, m2l)
    t, ca = _addc(m1h, m2h)
    x2, cb = _addc(t, m3l)
    x2, cc = _addc(x2, c1 + c2)
    x3 = m3h + ca + cb + cc
    return x0, x1, x2, x3


def _cond_sub_p(lo, hi):
    """Reduce a value < 2^64 to canonical (< p) with one conditional subtract."""
    ge = (hi > P_HI) | ((hi == P_HI) & (lo >= P_LO))
    m = ge.astype(_U32)
    slo, shi, _ = _sub64(lo, hi, m * P_LO, m * P_HI)
    return slo, shi


def _reduce128(x0, x1, x2, x3):
    """value = x + x1*2^32 + x2*2^64 + x3*2^96 ≡ (x1,x0) + x2*(2^32-1) - x3."""
    # a = x2 * (2^32 - 1) = (x2 << 32) - x2
    nz = (x2 != 0).astype(_U32)
    a_lo = _u32(0) - x2
    a_hi = x2 - nz
    tlo, thi, c = _add64(x0, x1, a_lo, a_hi)
    # carry: add 2^64 ≡ EPS (cannot re-carry; see DESIGN.md)
    tlo, cc = _addc(tlo, c * _u32(EPS))
    thi = thi + cc
    # subtract x3
    slo, shi, br = _sub64(tlo, thi, x3, jnp.zeros_like(x3))
    # borrow: subtract EPS (== add p mod 2^64; cannot re-borrow)
    b0 = (slo < br * _u32(EPS)).astype(_U32)
    slo = slo - br * _u32(EPS)
    shi = shi - b0
    return _cond_sub_p(slo, shi)


# ---------------------------------------------------------------------------
# public field ops (elementwise, broadcastable)
# ---------------------------------------------------------------------------


def add(a: GL, b: GL) -> GL:
    lo, hi, c = _add64(a.lo, a.hi, b.lo, b.hi)
    lo, cc = _addc(lo, c * _u32(EPS))
    hi = hi + cc
    return GL(*_cond_sub_p(lo, hi))


def sub(a: GL, b: GL) -> GL:
    lo, hi, br = _sub64(a.lo, a.hi, b.lo, b.hi)
    b0 = (lo < br * _u32(EPS)).astype(_U32)
    lo = lo - br * _u32(EPS)
    hi = hi - b0
    return GL(lo, hi)


def neg(a: GL) -> GL:
    z = jnp.zeros_like(a.lo)
    return sub(GL(z, z), a)


def mul(a: GL, b: GL) -> GL:
    x0, x1, x2, x3 = _mul64(a.lo, a.hi, b.lo, b.hi)
    return GL(*_reduce128(x0, x1, x2, x3))


def sqr(a: GL) -> GL:
    return mul(a, a)


def mul_pow2_32(a: GL) -> GL:
    """Multiply by 2^32 (used by reduction-free shifts if ever needed)."""
    # a * 2^32 = (a.hi * 2^64 + a.lo * 2^32) ≡ a.hi*(2^32-1) + a.lo*2^32
    return _reduce_from_words(jnp.zeros_like(a.lo), a.lo, a.hi, jnp.zeros_like(a.lo))


def _reduce_from_words(x0, x1, x2, x3):
    return GL(*_reduce128(x0, x1, x2, x3))


def zeros(shape) -> GL:
    z = jnp.zeros(shape, dtype=_U32)
    return GL(z, z)


def ones(shape) -> GL:
    return GL(jnp.ones(shape, dtype=_U32), jnp.zeros(shape, dtype=_U32))


def full(shape, value: int) -> GL:
    value %= P
    return GL(
        jnp.full(shape, value & 0xFFFFFFFF, dtype=_U32),
        jnp.full(shape, value >> 32, dtype=_U32),
    )


def select(mask, a: GL, b: GL) -> GL:
    """Elementwise: mask ? a : b (mask is a bool array)."""
    return GL(jnp.where(mask, a.lo, b.lo), jnp.where(mask, a.hi, b.hi))


def scale(a: GL, c: int) -> GL:
    """Multiply by a host scalar (Python int mod p)."""
    c %= P
    return mul(a, GL(jnp.asarray(c & 0xFFFFFFFF, _U32), jnp.asarray(c >> 32, _U32)))


def pow_const(a: GL, e: int) -> GL:
    """a^e for a host-int exponent (unrolled square & multiply)."""
    result = ones(a.lo.shape)
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


def inv(a: GL) -> GL:
    """Batched inverse via Fermat (a^(p-2)); a must be nonzero."""
    return pow_const(a, P - 2)


def from_digest_lanes(dlo, dhi) -> GL:
    """32-byte keccak digest (4 LE uint64 lanes as uint32 pairs) -> 0-d GL:
    int.from_bytes(digest, 'little') % p (fe_mod_from_le_bytes parity,
    transcript.rs:202). Used by the device transcript's squeeze."""
    acc = None
    for i in range(4):
        li = GL(*_cond_sub_p(dlo[i], dhi[i]))
        term = li if i == 0 else mul(li, scalar(pow(2, 64 * i, P)))
        acc = term if acc is None else add(acc, term)
    return acc


def from_digest_half(dlo, dhi, half: int) -> GL:
    """One 16-byte half of a keccak digest -> 0-d GL (LE int mod p).

    Protocol v2.1: a GL2 challenge takes BOTH coefficients from ONE digest
    (c0 = bytes 0..15, c1 = bytes 16..31) instead of one finalize-permute
    per coefficient — halves the serial keccak chain that dominates device
    proving (PROTOCOL.md 'challenge squeezing')."""
    b = 2 * half
    l0 = GL(*_cond_sub_p(dlo[b], dhi[b]))
    l1 = GL(*_cond_sub_p(dlo[b + 1], dhi[b + 1]))
    return add(l0, mul(l1, scalar(pow(2, 64, P))))


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------


def from_u64(x) -> GL:
    """From a numpy uint64 array / list of Python ints (< p)."""
    x = np.asarray(x, dtype=np.uint64)
    return GL(
        jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )


def from_ints(xs) -> GL:
    # NB: avoid np.asarray on raw Python ints — values >= 2^63 silently become
    # float64 and lose low bits. Flatten manually and build uint64 directly.
    def _flatten(v):
        if isinstance(v, (list, tuple)):
            out = []
            for item in v:
                out.extend(_flatten(item))
            return out
        return [int(v) % P]

    if isinstance(xs, np.ndarray):
        shape = xs.shape
        flat = [int(v) % P for v in xs.ravel().tolist()]
    else:
        shape = np.shape(xs)
        flat = _flatten(xs)
    arr = np.array(flat, dtype=np.uint64).reshape(shape)
    return from_u64(arr)


def to_u64(a: GL) -> np.ndarray:
    lo = np.asarray(a.lo, dtype=np.uint64)
    hi = np.asarray(a.hi, dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def to_ints(a: GL) -> list:
    return [int(v) for v in to_u64(a).ravel()]


def scalar(value: int) -> GL:
    """A 0-d GL scalar for broadcasting against vectors."""
    value %= P
    return GL(jnp.asarray(value & 0xFFFFFFFF, _U32), jnp.asarray(value >> 32, _U32))


# ---------------------------------------------------------------------------
# host scalar field (Python ints)
# ---------------------------------------------------------------------------


def fadd(a: int, b: int) -> int:
    return (a + b) % P


def fsub(a: int, b: int) -> int:
    return (a - b) % P


def fmul(a: int, b: int) -> int:
    return (a * b) % P


def finv(a: int) -> int:
    return pow(a, P - 2, P)


def fpow(a: int, e: int) -> int:
    return pow(a, e, P)


# multiplicative generator of F_p^* (same as plonky2 / goldilocks crate)
GENERATOR = 7
TWO_ADICITY = 32


def root_of_unity(order: int) -> int:
    """Primitive `order`-th root of unity (order must divide 2^32)."""
    assert order & (order - 1) == 0 and order <= (1 << TWO_ADICITY)
    g = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)  # 2^32-th root
    k = (1 << TWO_ADICITY) // order
    return pow(g, k, P)
