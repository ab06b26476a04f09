"""keccak-f[1600] as a single Pallas TPU kernel.

The device Fiat-Shamir transcript chains ~1,700 serial keccak permutations
per proof (absorb/squeeze per sumcheck round). As traced XLA ops the
permutation costs ~155 us (measured round-5: the 24-round lax.scan pays
per-iteration loop overhead on tiny (25,) arrays), which made the keccak
chain THE prover bottleneck — ~260 ms of the 273 ms gl1024 steady prove.

The kernel is fully SCALAR-UNROLLED: the 50 uint32 half-lanes live in
SSA values across all 24 rounds, the rho rotations and pi permutation are
static Python-level wiring (they fold to register moves), and every round
constant is an immediate. This avoids two Mosaic limitations at once —
captured array constants are rejected by pallas_call, and (25,)-gathers
(the pi step of the vector form) do not lower. ~10k scalar ALU ops ≈ a few
us per permutation, and ONE custom call in the enclosing HLO (no code-size
explosion — the round-2 fully-unrolled XLA version hit 2.87 MB of TPU code
per inline site, keccak_jax.py:118).

Semantics are bit-identical to ops/keccak_jax.keccak_f (cross-checked in
tests/test_device_transcript.py); the (lo, hi) uint32[25] lane-plane
representation is shared so the two are drop-in swappable. `keccak_f`
auto-selects: Pallas on TPU backends, the lax.scan fallback elsewhere
(XLA:CPU has no Mosaic)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from . import keccak_jax as kj

_U32 = jnp.uint32


def _rotl(l, h, r: int):
    """Static 64-bit rotl on a uint32 (lo, hi) pair."""
    if r >= 32:
        l, h = h, l
        r -= 32
    if r == 0:
        return l, h
    return (l << r) | (h >> (32 - r)), (h << r) | (l >> (32 - r))


def _kernel(lo_ref, hi_ref, olo_ref, ohi_ref):
    L = [lo_ref[i] for i in range(25)]
    H = [hi_ref[i] for i in range(25)]
    for rnd in range(24):
        # theta
    # (x + 5y lane layout, FIPS-202 orientation as in keccak_jax/_keccak_round)
        bl = [L[x] ^ L[x + 5] ^ L[x + 10] ^ L[x + 15] ^ L[x + 20] for x in range(5)]
        bh = [H[x] ^ H[x + 5] ^ H[x + 10] ^ H[x + 15] ^ H[x + 20] for x in range(5)]
        for x in range(5):
            rl, rh = _rotl(bl[(x + 1) % 5], bh[(x + 1) % 5], 1)
            tl = bl[(x + 4) % 5] ^ rl
            th = bh[(x + 4) % 5] ^ rh
            for y in range(5):
                L[x + 5 * y] = L[x + 5 * y] ^ tl
                H[x + 5 * y] = H[x + 5 * y] ^ th
        # rho + pi (static wiring)
        RL, RH = [None] * 25, [None] * 25
        for i in range(25):
            RL[i], RH[i] = _rotl(L[i], H[i], kj._ROT[i])
        L = [RL[kj._PI_SRC[i]] for i in range(25)]
        H = [RH[kj._PI_SRC[i]] for i in range(25)]
        # chi
        NL, NH = [None] * 25, [None] * 25
        for y in range(0, 25, 5):
            for x in range(5):
                NL[y + x] = L[y + x] ^ (~L[y + (x + 1) % 5] & L[y + (x + 2) % 5])
                NH[y + x] = H[y + x] ^ (~H[y + (x + 1) % 5] & H[y + (x + 2) % 5])
        L, H = NL, NH
        # iota
        L[0] = L[0] ^ _U32(int(kj._RC_LO[rnd]))
        H[0] = H[0] ^ _U32(int(kj._RC_HI[rnd]))
    for i in range(25):
        olo_ref[i] = L[i]
        ohi_ref[i] = H[i]


@functools.cache
def _pallas_fn():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((25,), _U32),
            jax.ShapeDtypeStruct((25,), _U32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )


@functools.cache
def enabled() -> bool:
    """Pallas keccak is used on TPU backends unless disabled by env."""
    flag = os.environ.get("HYPERGRECO_PALLAS_KECCAK", "auto")
    if flag == "0":
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if flag == "1":
        return True
    return platform not in ("cpu",)


def keccak_f(lo, hi):
    if enabled():
        return _pallas_fn()(lo, hi)
    return kj.keccak_f(lo, hi)
