"""Keccak-f[1600] + keccak-256 sponge as traced JAX ops (uint32 lane pairs).

Purpose: run the Fiat-Shamir transcript ON DEVICE so an entire sumcheck
(hundreds of absorb/squeeze rounds) executes inside one compiled program with
zero host round trips — the round-1 prover paid one device->host transfer per
round for the challenge squeeze, which dominated proving time on the TPU
tunnel (~430 rounds x 10-100 ms; BENCH_r01).

Semantics are byte-identical to the host sponge (utils/keccak.py, mirroring
the reference transcript's hash usage, bfv-gkr/src/transcript.rs:198-209):
original-keccak 0x01 padding, rate 136, finalize-reset-then-reabsorb-digest.

State representation: two uint32[25] planes (lo, hi) per 64-bit lane — Mosaic
and XLA:TPU have no 64-bit integers. The permutation is written with
vectorized theta/chi (5- and 25-lane arrays), a gather for pi, and
per-lane-constant elementwise shifts for rho, so one permutation traces to
~1k vector ops (unrolled 24 rounds).

Position invariant: this transcript only ever absorbs field elements whose
canonical encodings are multiples of 8 bytes, so the sponge position is
tracked in LANES (0..16), never split mid-lane.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROT = [0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43,
        25, 39, 41, 45, 15, 21, 8, 18, 2, 61, 56, 14]

RATE_LANES = 17  # 136-byte rate

# rho shift decomposition: per source lane, m = ROT % 32, swap = ROT >= 32
_RHO_M = np.asarray([r % 32 for r in _ROT], dtype=np.uint32)
_RHO_SWAP = np.asarray([r >= 32 for r in _ROT], dtype=bool)
_RHO_M0 = np.asarray([(r % 32) == 0 for r in _ROT], dtype=bool)
_RHO_MS = np.asarray([(32 - (r % 32)) & 31 for r in _ROT], dtype=np.uint32)
# pi: tmp[dst] = rot(st[src]); SRC_OF[dst] = src
_PI_SRC = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y


class Sponge(NamedTuple):
    """Keccak-256 sponge state: 25 uint32-pair lanes + lane position."""

    lo: jnp.ndarray  # uint32[25]
    hi: jnp.ndarray  # uint32[25]
    pos: jnp.ndarray  # int32 scalar, lanes absorbed into current block


def new_sponge() -> Sponge:
    z = jnp.zeros((25,), dtype=_U32)
    return Sponge(z, z, jnp.int32(0))


def _rotl64_vec(lo, hi, m, swap, m0, ms):
    """Per-lane rotl by static amounts (arrays m/swap/m0/ms over lanes)."""
    a = jnp.where(swap, hi, lo)
    b = jnp.where(swap, lo, hi)
    olo = jnp.where(m0, a, (a << m) | (b >> ms))
    ohi = jnp.where(m0, b, (b << m) | (a >> ms))
    return olo, ohi


_RC_LO = np.asarray([rc & 0xFFFFFFFF for rc in _RC], dtype=np.uint32)
_RC_HI = np.asarray([rc >> 32 for rc in _RC], dtype=np.uint32)


def _keccak_round(lo, hi, rcl, rch):
    """One keccak-f round; rcl/rch: uint32 scalars (iota constant)."""
    # theta
    l5 = lo.reshape(5, 5)
    h5 = hi.reshape(5, 5)
    bcl = l5[0] ^ l5[1] ^ l5[2] ^ l5[3] ^ l5[4]
    bch = h5[0] ^ h5[1] ^ h5[2] ^ h5[3] ^ h5[4]
    r1l = (bcl << 1) | (bch >> 31)
    r1h = (bch << 1) | (bcl >> 31)
    tl = jnp.roll(bcl, 1) ^ jnp.roll(r1l, -1)
    th = jnp.roll(bch, 1) ^ jnp.roll(r1h, -1)
    lo = lo ^ jnp.tile(tl, 5)
    hi = hi ^ jnp.tile(th, 5)
    # rho (per-lane rot) + pi (lane permutation)
    rl, rh = _rotl64_vec(lo, hi, _RHO_M, _RHO_SWAP, _RHO_M0, _RHO_MS)
    lo = rl[_PI_SRC]
    hi = rh[_PI_SRC]
    # chi
    l5 = lo.reshape(5, 5)
    h5 = hi.reshape(5, 5)
    lo = (l5 ^ ((~jnp.roll(l5, -1, axis=1)) & jnp.roll(l5, -2, axis=1))).reshape(25)
    hi = (h5 ^ ((~jnp.roll(h5, -1, axis=1)) & jnp.roll(h5, -2, axis=1))).reshape(25)
    # iota
    lo = lo.at[0].set(lo[0] ^ rcl)
    hi = hi.at[0].set(hi[0] ^ rch)
    return lo, hi


def keccak_f(lo, hi):
    """One keccak-f[1600] permutation on uint32[25] lane planes.

    On TPU backends this dispatches to the Pallas kernel
    (ops/keccak_pallas.py): the lax.scan form costs ~155-185 us per
    permutation (per-iteration loop overhead on tiny arrays), the Pallas
    scalar-unrolled kernel ~30 us — and the serial Fiat-Shamir chain of
    ~1,700 permutations was the whole prover bottleneck (round-5 VERDICT
    weak #7).

    The scan fallback stays for CPU (no Mosaic): an unrolled XLA
    permutation compiled to 2.87 MB of TPU code PER INLINE SITE, and the
    prover's ~22 programs with several sites each totalled ~600 MB of
    executable — past the device code arena, so every dispatch re-uploaded
    executables over the TPU tunnel (~83 ms per dispatch; measured, see
    scratch/t_poison*.py history)."""
    from . import keccak_pallas

    if keccak_pallas.enabled():
        return keccak_pallas._pallas_fn()(lo, hi)

    def body(carry, rc):
        return _keccak_round(carry[0], carry[1], rc[0], rc[1]), None

    (lo, hi), _ = jax.lax.scan(
        body, (lo, hi), (jnp.asarray(_RC_LO), jnp.asarray(_RC_HI))
    )
    return lo, hi


def absorb_lanes(sp: Sponge, lanes_lo, lanes_hi) -> Sponge:
    """Absorb k (static, 1 <= k <= 17) 8-byte lanes (LE uint32 pairs).

    At most one rate boundary can be crossed per call; callers with longer
    messages split statically. Matches streaming xor-into-state absorption
    (native/keccak.cpp hg_keccak_update)."""
    k = lanes_lo.shape[0]
    assert 1 <= k <= RATE_LANES
    lo, hi, pos = sp
    idx = pos + jnp.arange(k, dtype=jnp.int32)
    buf_lo = jnp.zeros((2 * RATE_LANES,), dtype=_U32).at[idx].set(lanes_lo)
    buf_hi = jnp.zeros((2 * RATE_LANES,), dtype=_U32).at[idx].set(lanes_hi)
    pad = jnp.zeros((25 - RATE_LANES,), dtype=_U32)
    lo = lo ^ jnp.concatenate([buf_lo[:RATE_LANES], pad])
    hi = hi ^ jnp.concatenate([buf_hi[:RATE_LANES], pad])
    crossed = pos + k >= RATE_LANES

    def perm(args):
        return keccak_f(*args)

    lo, hi = jax.lax.cond(crossed, perm, lambda a: a, (lo, hi))
    lo = lo ^ jnp.concatenate([buf_lo[RATE_LANES:], pad])
    hi = hi ^ jnp.concatenate([buf_hi[RATE_LANES:], pad])
    pos = pos + k - jnp.where(crossed, RATE_LANES, 0).astype(jnp.int32)
    return Sponge(lo, hi, pos)


def absorb_lanes_stream(sp: Sponge, lanes_lo, lanes_hi) -> Sponge:
    """Absorb any (static) number of lanes via a lax.scan over rate-sized
    chunks — the bulk path for long messages (e.g. binding a 2^11-felt
    public statement). A Python loop of absorb_lanes unrolls one full
    keccak-f per 17 lanes into the trace (~1k ops each) and explodes XLA
    compile time; the scan compiles the permutation once."""
    n = lanes_lo.shape[0]
    q, r = divmod(n, RATE_LANES)
    if q:
        def body(carry, chunk):
            nsp = absorb_lanes(Sponge(*carry), chunk[0], chunk[1])
            return tuple(nsp), None
        chunks = (
            lanes_lo[: q * RATE_LANES].reshape(q, RATE_LANES),
            lanes_hi[: q * RATE_LANES].reshape(q, RATE_LANES),
        )
        carry, _ = jax.lax.scan(body, tuple(sp), chunks)
        sp = Sponge(*carry)
    if r:
        sp = absorb_lanes(sp, lanes_lo[q * RATE_LANES:],
                          lanes_hi[q * RATE_LANES:])
    return sp


def finalize_reset(sp: Sponge):
    """0x01/0x80 pad, permute, emit the 32-byte digest (4 lanes), reset the
    sponge and re-absorb the digest (transcript.rs squeeze semantics).

    Returns (digest_lo[4], digest_hi[4], new_sponge)."""
    lo, hi, pos = sp
    lane_ids = jnp.arange(25, dtype=jnp.int32)
    lo = lo ^ jnp.where(lane_ids == pos, np.uint32(1), np.uint32(0))
    hi = hi.at[16].set(hi[16] ^ np.uint32(0x80000000))
    lo, hi = keccak_f(lo, hi)
    dlo, dhi = lo[:4], hi[:4]
    z = jnp.zeros((21,), dtype=_U32)
    nlo = jnp.concatenate([dlo, z])
    nhi = jnp.concatenate([dhi, z])
    return dlo, dhi, Sponge(nlo, nhi, jnp.int32(4))


# ---------------------------------------------------------------------------
# host <-> device sponge state conversion (canonical = xor-in-place + pos,
# the native keccak.cpp layout; utils/keccak.py snapshots use it too)
# ---------------------------------------------------------------------------


def sponge_from_snapshot(blob: bytes) -> Sponge:
    """208-byte host snapshot (25 x u64 LE + u64 byte-pos) -> device Sponge.
    The byte position must be lane-aligned (felt-only transcripts)."""
    assert len(blob) == 208
    st = np.frombuffer(blob[:200], dtype="<u8")
    pos = int.from_bytes(blob[200:], "little")
    assert pos % 8 == 0, "sponge position not lane-aligned"
    return Sponge(
        jnp.asarray((st & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((st >> 32).astype(np.uint32)),
        jnp.int32(pos // 8),
    )


def sponge_to_snapshot(sp: Sponge) -> bytes:
    lo = np.asarray(sp.lo, dtype=np.uint64)
    hi = np.asarray(sp.hi, dtype=np.uint64)
    st = (lo | (hi << np.uint64(32))).astype("<u8")
    pos = int(sp.pos) * 8
    return st.tobytes() + pos.to_bytes(8, "little")
