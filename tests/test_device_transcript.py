"""Device (JAX) keccak sponge + transcript vs the host oracle.

The device transcript must be byte/challenge-identical to the host
TranscriptWriter (utils/transcript.py), which itself mirrors the reference's
Keccak256Transcript (bfv-gkr/src/transcript.rs:198-209)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypergreco_tpu.gkr import dtranscript as dt
from hypergreco_tpu.ops import keccak_jax as kj
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.keccak import _PyKeccak, keccak256, new_keccak256
from hypergreco_tpu.utils.transcript import TranscriptWriter


def _dev_digest(data: bytes) -> bytes:
    assert len(data) % 8 == 0
    sp = kj.new_sponge()
    lanes = np.frombuffer(data, dtype="<u8")
    lo = jnp.asarray((lanes & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((lanes >> 32).astype(np.uint32))
    for s in range(0, len(lanes), kj.RATE_LANES):
        e = min(s + kj.RATE_LANES, len(lanes))
        sp = kj.absorb_lanes(sp, lo[s:e], hi[s:e])
    dlo, dhi, _ = kj.finalize_reset(sp)
    out = np.asarray(dlo, dtype=np.uint64) | (
        np.asarray(dhi, dtype=np.uint64) << np.uint64(32)
    )
    return out.astype("<u8").tobytes()


def test_device_keccak_matches_host():
    rng = random.Random(7)
    for n_lanes in [0, 1, 4, 16, 17, 18, 34, 40, 100]:
        data = bytes(rng.randrange(256) for _ in range(8 * n_lanes))
        assert _dev_digest(data) == keccak256(data), n_lanes


def test_device_keccak_stream_matches_host():
    """Bulk lax.scan absorption (absorb_lanes_stream) == host keccak,
    across chunk-boundary and mid-block starting positions."""
    rng = random.Random(9)
    for pre_lanes, n_lanes in [(0, 17), (0, 34), (0, 129), (3, 2048),
                               (5, 40), (16, 100)]:
        pre = bytes(rng.randrange(256) for _ in range(8 * pre_lanes))
        data = bytes(rng.randrange(256) for _ in range(8 * n_lanes))
        sp = kj.new_sponge()
        if pre_lanes:
            lanes = np.frombuffer(pre, dtype="<u8")
            sp = kj.absorb_lanes(
                sp,
                jnp.asarray((lanes & 0xFFFFFFFF).astype(np.uint32)),
                jnp.asarray((lanes >> 32).astype(np.uint32)),
            )
        lanes = np.frombuffer(data, dtype="<u8")
        sp = kj.absorb_lanes_stream(
            sp,
            jnp.asarray((lanes & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((lanes >> 32).astype(np.uint32)),
        )
        dlo, dhi, _ = kj.finalize_reset(sp)
        out = np.asarray(dlo, dtype=np.uint64) | (
            np.asarray(dhi, dtype=np.uint64) << np.uint64(32)
        )
        assert out.astype("<u8").tobytes() == keccak256(pre + data), (
            pre_lanes, n_lanes,
        )


def test_pykeccak_native_snapshot_portable():
    """Canonical 208-byte snapshots interchange between backends (ADVICE r1)."""
    py = _PyKeccak()
    py.update(b"x" * 24)
    other = new_keccak256()
    blob = py.snapshot()
    assert len(blob) == 208
    other.restore(blob)
    ref = _PyKeccak()
    ref.restore(blob)
    other.update(b"tail")
    ref.update(b"tail")
    assert other.finalize_reset() == ref.finalize_reset()


def test_device_transcript_matches_host_gl():
    be = get_backend("goldilocks")
    spec = be.spec
    rng = random.Random(11)

    host = TranscriptWriter(spec)
    dtx = dt.new_dtx(64)

    felts = [rng.randrange(spec.p) for _ in range(6)]
    exts = [(rng.randrange(spec.p), rng.randrange(spec.p)) for _ in range(4)]

    host.write_felts(felts)
    dtx = dt.write_ext(be, dtx, be.from_ints(felts))
    c_host = host.squeeze_challenge()
    c_dev, dtx = dt.squeeze_challenge(be, dtx)

    host.write_felts_ext(exts)
    dtx = dt.write_ext(be, dtx, be.from_ints(exts, ext=True))
    c2_host = host.squeeze_challenges(3)
    c2_dev, dtx = dt.squeeze_challenges(be, dtx, 3)

    assert tuple(spec._c(c_host)) == tuple(
        be.to_host(jax.tree.map(lambda a: a.reshape(1), c_dev))[0]
    )
    got = be.to_host(c2_dev)
    assert [spec._c(c) for c in c2_host] == [spec._c(g) for g in got]

    proof = dt.log_to_proof(be, dtx.log_lo, dtx.log_hi, int(dtx.log_len))
    assert proof == host.into_proof()

    # sponge state handoff: host snapshot -> device -> identical challenge
    dtx2 = dt.new_dtx(8, host_snapshot=host._hash.snapshot())
    ch, _ = dt.squeeze_challenge(be, dtx2)
    assert tuple(host.squeeze_challenge()) == tuple(
        be.to_host(jax.tree.map(lambda a: a.reshape(1), ch))[0]
    )


def test_device_transcript_common_vs_write():
    be = get_backend("goldilocks")
    spec = be.spec
    host = TranscriptWriter(spec)
    dtx = dt.new_dtx(16)
    host.common_felt(12345)
    dtx = dt.common_ext(be, dtx, be.from_ints([12345]))
    assert int(dtx.log_len) == 0
    c_dev, dtx = dt.squeeze_challenge(be, dtx)
    assert tuple(host.squeeze_challenge()) == tuple(
        be.to_host(jax.tree.map(lambda a: a.reshape(1), c_dev))[0]
    )
