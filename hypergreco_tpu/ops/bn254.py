"""BN254 scalar field Fr as uint32-limb device kernels.

p = 21888242871839275222246405745257275088548364400416034343698204186575808495617
(254 bits). Device representation: ``FR`` — eight uint32 limb planes
(little-endian 32-bit limbs), value kept canonical (< p), in the NATURAL
domain (Montgomery form is used only transiently inside ``mul``).

Multiplication: Montgomery CIOS with 16-bit digits (base 2^16, 16 digits).
All intermediate accumulators stay below 2^32 (each step adds at most two
16-bit quantities plus a small carry), so the same branch-free uint32 code
runs under XLA on CPU/TPU and later inside Pallas kernels. Deep carry
chains get ``fusion_break``-style identity gathers every few digits (see
ops/fe.py) to keep compile time linear.

Reference parity: `halo2curves` BN254 Fr (Cargo.toml:29-31); the extension
field is Fr itself (degree 1 — sk_encryption_circuit.rs:554-626 BN254
configs use E = F).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
DIGITS = 16  # 16-bit digits
_B = 16
_MASK = (1 << 16) - 1

# p in 16-bit digits (little-endian)
_P_DIGITS = [(P >> (16 * i)) & _MASK for i in range(DIGITS)]
# -p^-1 mod 2^16 (Montgomery n0')
_N0 = (-pow(P, -1, 1 << 16)) % (1 << 16)
# R = 2^256 mod p, R^2 mod p (for to/from Montgomery)
_R = (1 << 256) % P
_R2 = (_R * _R) % P

_U32 = jnp.uint32


class FR(NamedTuple):
    """Vector of BN254 Fr elements: 8 little-endian uint32 limb planes."""

    l0: jnp.ndarray
    l1: jnp.ndarray
    l2: jnp.ndarray
    l3: jnp.ndarray
    l4: jnp.ndarray
    l5: jnp.ndarray
    l6: jnp.ndarray
    l7: jnp.ndarray

    @property
    def shape(self):
        return self.l0.shape

    def __len__(self):
        return self.l0.shape[0]


def _brk(x):
    idx = jnp.arange(x.shape[-1], dtype=jnp.int32) if x.ndim else None
    return x[..., idx] if idx is not None else x


def _digits_of(fr: FR):
    """FR -> 16 uint32 digit planes (each < 2^16)."""
    out = []
    for limb in fr:
        out.append(limb & _MASK)
        out.append(limb >> 16)
    return out


def _fr_from_digits(digs):
    """16 digit planes (< 2^16) -> FR."""
    limbs = []
    for i in range(0, 2 * DIGITS // 2, 2):
        limbs.append(digs[i] | (digs[i + 1] << 16))
    return FR(*limbs)


def _carry_norm(cols, out_digits: int):
    """Columns (uint32, < 2^32 - headroom) -> digits < 2^16 via a sequential
    carry chain; returns out_digits digits (the final carry must vanish —
    guaranteed by the callers' bounds)."""
    digs = []
    carry = None
    for i in range(out_digits):
        v = cols[i] if i < len(cols) else jnp.zeros_like(cols[0])
        if carry is not None:
            v = v + carry
        digs.append(v & _MASK)
        carry = v >> 16
        if (i + 1) % 6 == 0:
            carry = _brk(carry)
    return digs, carry


def _ge_digits(a, b_const):
    """a >= b (b_const: python digit list), lexicographic from the top."""
    gt = None
    eq = None
    for i in reversed(range(DIGITS)):
        bi = np.uint32(b_const[i])
        di_gt = a[i] > bi
        di_eq = a[i] == bi
        if gt is None:
            gt, eq = di_gt, di_eq
        else:
            gt = gt | (eq & di_gt)
            eq = eq & di_eq
    return gt | eq


def _sub_digits(a, b_const, mask):
    """a - b_const where mask (bool) selects subtraction; digit borrow chain."""
    out = []
    borrow = jnp.zeros_like(a[0])
    m = mask.astype(_U32)
    for i in range(DIGITS):
        bi = m * np.uint32(b_const[i]) + borrow
        v = a[i] - bi
        borrow = (a[i] < bi).astype(_U32)
        out.append(v & _MASK)
        if (i + 1) % 6 == 0:
            borrow = _brk(borrow)
    return out


def _cond_sub_p(digs):
    return _sub_digits(digs, _P_DIGITS, _ge_digits(digs, _P_DIGITS))


def add(a: FR, b: FR) -> FR:
    da, db = _digits_of(a), _digits_of(b)
    cols = [x + y for x, y in zip(da, db)]
    digs, carry = _carry_norm(cols, DIGITS)
    # a + b < 2p < 2^255: the carry out of digit 15 is 0 (2p < 2^256) but a
    # value in [p, 2p) needs one conditional subtract
    return _fr_from_digits(_cond_sub_p(digs))


def sub(a: FR, b: FR) -> FR:
    """a - b: digit borrow chain; on net borrow, add p back."""
    da, db = _digits_of(a), _digits_of(b)
    out = []
    borrow = jnp.zeros_like(da[0])
    for i in range(DIGITS):
        need = db[i] + borrow  # <= 2^16
        t = da[i] - need  # uint32 wraparound
        borrow = (da[i] < need).astype(_U32)
        out.append(t & _MASK)
        if (i + 1) % 6 == 0:
            borrow = _brk(borrow)
    # add p where borrow == 1 (result then lands in [0, p))
    m = borrow
    cols = [o + m * np.uint32(pi) for o, pi in zip(out, _P_DIGITS)]
    digs, carry = _carry_norm(cols, DIGITS)
    return _fr_from_digits(digs)


def _mont_mul_digits(da, db):
    """Montgomery product digits: returns (a*b*R^-1 mod p)-ish digits plus a
    final conditional subtract. CIOS, base 2^16.

    The outer digit loop runs as a lax.scan (carry = the t accumulator
    stack): a fully unrolled CIOS is ~256 mul-add-carry steps and XLA's
    compile time on programs with several such muls was minutes; the scan
    body is one outer iteration (~32 steps) regardless of DIGITS."""
    shape = jnp.broadcast_shapes(da[0].shape, db[0].shape)
    zeros = jnp.zeros(shape, dtype=_U32)
    tstk = jnp.stack([zeros] * (DIGITS + 2))
    astk = jnp.stack([jnp.broadcast_to(d, shape) for d in da])

    def body(tstk, ai):
        t = [tstk[k] for k in range(DIGITS + 2)]
        # t += ai * b
        carry = zeros
        for j in range(DIGITS):
            prod = ai * db[j]  # < 2^32
            v = t[j] + (prod & _MASK) + carry  # < 2^16 + 2^16 + 2^17 < 2^18
            t[j] = v & _MASK
            carry = (v >> 16) + (prod >> 16)  # < 2^2 + 2^16 < 2^17
        v = t[DIGITS] + carry
        t[DIGITS] = v & _MASK
        t[DIGITS + 1] = t[DIGITS + 1] + (v >> 16)
        # m = t0 * n0' mod 2^16
        m = (t[0] * np.uint32(_N0)) & _MASK
        # t += m * p, then shift right one digit
        prod = m * np.uint32(_P_DIGITS[0])
        v = t[0] + (prod & _MASK)
        carry = (v >> 16) + (prod >> 16)
        for j in range(1, DIGITS):
            prod = m * np.uint32(_P_DIGITS[j])
            v = t[j] + (prod & _MASK) + carry
            t[j - 1] = v & _MASK
            carry = (v >> 16) + (prod >> 16)
        v = t[DIGITS] + carry
        t[DIGITS - 1] = v & _MASK
        t[DIGITS] = t[DIGITS + 1] + (v >> 16)
        t[DIGITS + 1] = zeros
        return jnp.stack(t), None

    tstk, _ = jax.lax.scan(body, tstk, astk)
    # t < 2p (CIOS invariant); conditional subtract
    digs = [tstk[k] for k in range(DIGITS)]
    # the potential extra digit t[DIGITS] is 0 after the loop shifts
    # (CIOS guarantees t < 2p < 2^255)
    return _cond_sub_p(digs)


def neg(a: FR) -> FR:
    return sub(zeros(a.l0.shape), a)


def sqr(a: FR) -> FR:
    return mul(a, a)


def mul_base(a: FR, b: FR) -> FR:
    return mul(a, b)  # degree-1 "extension": ext == base


def from_base(a: FR) -> FR:
    return a


def zeros(shape) -> FR:
    z = jnp.zeros(shape, dtype=_U32)
    return FR(*([z] * 8))


def ones(shape) -> FR:
    o = jnp.ones(shape, dtype=_U32)
    z = jnp.zeros(shape, dtype=_U32)
    return FR(o, z, z, z, z, z, z, z)


def full(shape, value: int) -> FR:
    value %= P
    return FR(
        *[
            jnp.full(shape, (value >> (32 * i)) & 0xFFFFFFFF, dtype=_U32)
            for i in range(8)
        ]
    )


def splat(shape, c) -> FR:
    if isinstance(c, tuple):
        c = c[0]
    return full(shape, int(c))


def select(mask, a: FR, b: FR) -> FR:
    return FR(*[jnp.where(mask, x, y) for x, y in zip(a, b)])


def scalar(c) -> FR:
    if isinstance(c, tuple):
        c = c[0]
    return full((), int(c))


def scale(a: FR, c: int) -> FR:
    if isinstance(c, tuple):
        c = c[0]
    return mul(a, splat((), int(c)))


def from_ints(xs) -> FR:
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
        if isinstance(xs, (list, tuple)):
            # ext_degree == 1: unwrap 1-tuples so shapes stay flat
            xs = [
                x[0] if isinstance(x, tuple) and len(x) == 1 else x
                for x in xs
            ]
        shape = np.shape(xs)
        flat = _flatten(xs)
    limbs = []
    for i in range(8):
        limbs.append(
            np.array(
                [(v >> (32 * i)) & 0xFFFFFFFF for v in flat], dtype=np.uint32
            ).reshape(shape)
        )
    return FR(*[jnp.asarray(l) for l in limbs])


def to_ints(a: FR) -> list:
    planes = [np.asarray(l, dtype=np.uint64).ravel() for l in a]
    out = []
    for k in range(planes[0].size):
        v = 0
        for i in range(8):
            v |= int(planes[i][k]) << (32 * i)
        out.append(v)
    return out


def to_tuples(a: FR) -> list:
    return [(v,) for v in to_ints(a)]


def mul(a: FR, b: FR) -> FR:
    """Natural-domain product: Mont(Mont(a, b), R^2) = a*b mod p."""
    da, db = _digits_of(a), _digits_of(b)
    ab = _mont_mul_digits(da, db)  # = a*b*R^-1
    r2 = [jnp.full_like(da[0], (_R2 >> (16 * i)) & _MASK) for i in range(DIGITS)]
    return _fr_from_digits(_mont_mul_digits(ab, r2))


def from_digest_lanes(dlo, dhi) -> FR:
    """32-byte keccak digest (4 LE uint64 lanes as uint32 pairs) -> 0-d FR:
    int.from_bytes(digest, 'little') % p (fe_mod_from_le_bytes parity,
    transcript.rs:202). Used by the device transcript's squeeze; the
    256-bit value is folded lane-by-lane through the Montgomery modmul
    (lane_i * (2^(64 i) mod p))."""
    acc = None
    for i in range(4):
        z = jnp.zeros_like(dlo[i])
        li = FR(dlo[i], dhi[i], z, z, z, z, z, z)
        term = li if i == 0 else mul(li, scalar(pow(2, 64 * i, P)))
        acc = term if acc is None else add(acc, term)
    return acc
