"""Device-resident Fiat-Shamir transcript (the round-2 perf keystone).

The round-1 prover squeezed every sumcheck challenge on the host: one
device->host transfer per round, ~430 rounds per proof, 10-100 ms each over
the TPU tunnel (BENCH_r01: 20.9 s vs the reference's 103 ms). This module
keeps the transcript ON DEVICE so the whole prover becomes an async pipeline
of enqueued programs: the host never reads a device value until the final
proof-felt log fetch.

Byte semantics are identical to the host transcript (utils/transcript.py,
mirroring bfv-gkr/src/transcript.rs): absorb = streaming keccak update of
the canonical little-endian felt bytes; squeeze = finalize_reset, re-absorb
digest, map digest to the field (fe_mod_from_le_bytes parity). The proof
stream is reconstructed on the host from the felt log (same bytes the device
absorbed), so TranscriptReader verifies device-built proofs unchanged.

DTx pytree:
  sponge    : keccak_jax.Sponge (uint32[25] lane planes + lane pos)
  log_lo/hi : uint32[cap] proof-felt lanes (a Goldilocks felt = 1 lane;
              a BN254 felt = 4 lanes)
  log_len   : int32 lanes written so far

Only lane-multiple encodings are supported (GL: 8 bytes, BN254 Fr: 32).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import keccak_jax as kj
from ..ops.fe import Backend


class DTx(NamedTuple):
    sponge: kj.Sponge
    log_lo: jnp.ndarray
    log_hi: jnp.ndarray
    log_len: jnp.ndarray  # int32


def new_dtx(cap_lanes: int, host_snapshot: bytes | None = None) -> DTx:
    sp = (
        kj.sponge_from_snapshot(host_snapshot)
        if host_snapshot is not None
        else kj.new_sponge()
    )
    z = jnp.zeros((cap_lanes,), dtype=jnp.uint32)
    return DTx(sp, z, z, jnp.int32(0))


# ---------------------------------------------------------------------------
# felt <-> lane packing (per backend)
# ---------------------------------------------------------------------------


def _felt_lanes(be: Backend, x) -> tuple:
    """Base-field device element(s) -> (lanes_lo, lanes_hi) flat uint32[n].

    x is a base-field pytree whose leaves are little-endian uint32 limbs
    (GL: 2 limbs = 1 lane; BN254 FR: 8 limbs = 4 lanes). Leaves may be 0-d
    or [k]-shaped (k felts absorbed in element order)."""
    leaves = [jnp.atleast_1d(a) for a in jax.tree.leaves(x)]
    nl = be.limbs_per_base
    assert len(leaves) % nl == 0
    lanes_lo, lanes_hi = [], []
    for base in range(0, len(leaves), nl):
        for j in range(0, nl, 2):
            # felt-major order: felt k's lanes must be consecutive
            lanes_lo.append(jnp.stack([leaves[base + j]], axis=-1))
            lanes_hi.append(jnp.stack([leaves[base + j + 1]], axis=-1))
    # each entry is [k, 1]; concat along lane axis then flatten felt-major
    lo = jnp.concatenate(lanes_lo, axis=-1).reshape(-1)
    hi = jnp.concatenate(lanes_hi, axis=-1).reshape(-1)
    return lo, hi


def _ext_lanes(be: Backend, x) -> tuple:
    """Ext-field element(s) -> lanes in coefficient order (transcript.rs
    parity: DEGREE base felts per ext felt)."""
    if be.ext_cls is be.base_cls:
        return _felt_lanes(be, x)
    # GL2(a0, a1): leaves are [a0.lo, a0.hi, a1.lo, a1.hi] and
    # coefficient-major == leaf order handled by _felt_lanes
    return _felt_lanes(be, x)


def _absorb(sponge, lo, hi):
    """Absorb n (static) lanes: unrolled for short messages (the per-round
    common case — scan carry plumbing costs more than it saves), lax.scan
    chunking for long ones (compile-time explosion otherwise)."""
    n = lo.shape[0]
    if n > 4 * kj.RATE_LANES:
        return kj.absorb_lanes_stream(sponge, lo, hi)
    for s in range(0, n, kj.RATE_LANES):
        e = min(s + kj.RATE_LANES, n)
        sponge = kj.absorb_lanes(sponge, lo[s:e], hi[s:e])
    return sponge


def common_ext(be: Backend, dtx: DTx, x) -> DTx:
    """Absorb ext element(s) without writing to the proof stream."""
    lo, hi = _ext_lanes(be, x)
    return DTx(_absorb(dtx.sponge, lo, hi), dtx.log_lo, dtx.log_hi, dtx.log_len)


def common_lanes(dtx: DTx, lo, hi) -> DTx:
    """Absorb raw uint32 lane pairs (e.g. a 32-byte statement digest from
    the host transcript's common_statement) without writing to the proof
    stream."""
    return DTx(
        _absorb(dtx.sponge, lo, hi), dtx.log_lo, dtx.log_hi, dtx.log_len
    )


def digest_to_lanes(digest: bytes):
    """32-byte host digest -> (lo[4], hi[4]) uint32 device lane planes."""
    lanes = np.frombuffer(digest, dtype="<u8")
    return (
        jnp.asarray((lanes & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((lanes >> np.uint64(32)).astype(np.uint32)),
    )


def write_ext(be: Backend, dtx: DTx, x) -> DTx:
    """Absorb ext element(s) AND append them to the proof-felt log."""
    lo, hi = _ext_lanes(be, x)
    sponge = _absorb(dtx.sponge, lo, hi)
    n = lo.shape[0]
    idx = dtx.log_len + jnp.arange(n, dtype=jnp.int32)
    return DTx(
        sponge,
        dtx.log_lo.at[idx].set(lo),
        dtx.log_hi.at[idx].set(hi),
        dtx.log_len + n,
    )


def squeeze_base(be: Backend, dtx: DTx):
    """finalize_reset + digest-to-field. Returns (base 0-d element, DTx)."""
    dlo, dhi, sponge = kj.finalize_reset(dtx.sponge)
    val = be.base.from_digest_lanes(dlo, dhi)
    return val, DTx(sponge, dtx.log_lo, dtx.log_hi, dtx.log_len)


def squeeze_challenge(be: Backend, dtx: DTx):
    """Ext challenge from ONE digest (protocol v2.1): degree-2 coefficients
    come from the digest's 16-byte halves — one finalize permutation per
    challenge instead of one per coefficient, halving the serial keccak
    chain. Returns (ext 0-d, DTx)."""
    if be.spec.ext_degree == 1:
        return squeeze_base(be, dtx)
    assert be.spec.ext_degree == 2
    dlo, dhi, sponge = kj.finalize_reset(dtx.sponge)
    c0 = be.base.from_digest_half(dlo, dhi, 0)
    c1 = be.base.from_digest_half(dlo, dhi, 1)
    return be.ext_cls(c0, c1), DTx(
        sponge, dtx.log_lo, dtx.log_hi, dtx.log_len
    )


def squeeze_challenges(be: Backend, dtx: DTx, n: int):
    """n ext challenges -> stacked [n] ext device vector."""
    outs = []
    for _ in range(n):
        c, dtx = squeeze_challenge(be, dtx)
        outs.append(c)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    return stacked, dtx


# ---------------------------------------------------------------------------
# host-side finish: proof-felt log -> byte stream
# ---------------------------------------------------------------------------


def log_to_proof(be: Backend, log_lo, log_hi, log_len: int) -> bytes:
    """Fetch the felt log (ONE transfer) and serialize the proof stream."""
    if log_len > log_lo.shape[0]:
        raise ValueError(
            f"device proof log overflow: {log_len} lanes written into a "
            f"{log_lo.shape[0]}-lane buffer (XLA clamps out-of-bounds "
            "scatters, so the log is corrupt) — raise the dtx capacity"
        )
    lo = np.asarray(log_lo[:log_len], dtype=np.uint64)
    hi = np.asarray(log_hi[:log_len], dtype=np.uint64)
    lanes = (lo | (hi << np.uint64(32))).astype("<u8")
    return lanes.tobytes()


@jax.jit
def _pack_log(log_lo, log_hi, log_len):
    """[2, n+1] uint32: row packing so the whole proof log plus its length
    counter comes back in ONE device->host transfer (each transfer over the
    TPU tunnel costs 10-100 ms; the round-2 fetch made several and moved the
    full oversized capacity buffer: 625 ms of the 780 ms gl1024 prove)."""
    n = log_lo.shape[0]
    ll = jnp.asarray(log_len, dtype=jnp.uint32).reshape(1)
    return jnp.stack(
        [jnp.concatenate([log_lo, ll]), jnp.concatenate([log_hi, ll])]
    )


def fetch_proof(dtx: DTx, expect_lanes: int | None = None) -> bytes:
    """Proof bytes from a device transcript in ONE transfer.

    expect_lanes: known proof length in lanes (deterministic per circuit) —
    the log buffer is sliced to it on device before the transfer. Pass None
    on the first prove of a config; the caller should cache the returned
    length for subsequent proves."""
    lo, hi, ln = dtx.log_lo, dtx.log_hi, dtx.log_len
    if expect_lanes is not None and expect_lanes < lo.shape[0]:
        lo = jax.lax.slice_in_dim(lo, 0, expect_lanes)
        hi = jax.lax.slice_in_dim(hi, 0, expect_lanes)
    packed = np.asarray(_pack_log(lo, hi, ln))
    log_len = int(packed[0, -1])
    if log_len > dtx.log_lo.shape[0]:
        raise ValueError(
            f"device proof log overflow: {log_len} lanes written into a "
            f"{dtx.log_lo.shape[0]}-lane buffer — raise the dtx capacity"
        )
    if expect_lanes is not None and log_len != expect_lanes:
        raise ValueError(
            f"proof log length {log_len} != expected {expect_lanes}"
        )
    lo64 = packed[0, :log_len].astype(np.uint64)
    hi64 = packed[1, :log_len].astype(np.uint64)
    return (lo64 | (hi64 << np.uint64(32))).astype("<u8").tobytes()
