"""Device-resident batched grand-product prover.

The ENTIRE product-tree argument — tree build, root/W1 messages, every
layer's batched sumcheck, all transcript absorbs/squeezes — runs in ONE
compiled program (a fori_loop over layers with the fused traced-round-count
sumcheck inside). Transcript messages are bit-identical to the host prover
(gkr/grand_product.py), so verify_grand_product verifies unchanged.

Reference parity: prove_grand_product (memory_checking/prover.rs:158-295,
SURVEY.md §2.5), re-architected for TPU: zero host round trips instead of
one challenge transfer per sumcheck round per layer.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..ops.fe import Backend, get_backend
from ..ops import mle
from . import dsumcheck as dsc
from . import dtranscript as dt
from .grand_product import _gp_expr


#: grand-product layer band length: layers l in a band share one buffer of
#: the band's maximum width, so tree storage is ~2*2^v instead of v*2^(v-1)
#: (the single full-width LVL buffer was 4.2 GB at the gl16384 rw tree and
#: OOMed the 16 GB v5e once banding added working copies), and each band's
#: layer sumchecks run at the band width instead of the full buffer (the
#: full-width fori was 9.9 s of the 25 s gl16384 prove).
GP_BAND = 4

#: per-band tree-buffer byte budget: wide top bands are split so a single
#: band buffer never exceeds this (the 4-layer top band of the gl32768 rw
#: tree was [4, 100, 2^20] — several GB — and OOMed the 16 GB chip)
GP_BAND_BYTES = 1 << 30


def _gp_bands(v: int, rows: int = 0, elem_bytes: int = 8):
    """[(lo, hi)] ascending; band k covers layers l in [lo, hi),
    1 <= l <= v-1; band buffer width = 2^(hi-1), buffer shape
    [hi-lo, rows, 2^(hi-1)]. Bands hold at most GP_BAND layers AND at most
    GP_BAND_BYTES of buffer (planned top-down)."""
    bands = []
    hi = v
    while hi > 1:
        W = 1 << (hi - 1)
        nl = GP_BAND
        if rows:
            nl = max(1, min(nl, GP_BAND_BYTES // max(rows * W * elem_bytes, 1)))
        lo = max(1, hi - nl)
        bands.append((lo, hi))
        hi = lo
    return list(reversed(bands))


def gp_tree_build(be: Backend, leaves):
    """Traceable product-tree build over m equal-length [2^v] leaf vectors
    (base or ext). Returns (BANDS, w1): BANDS[k] is a [hi-lo, 2m, 2^(hi-1)]
    stacked ext buffer for band (lo, hi) = _gp_bands(v)[k] — row index
    (hi-1-l) <-> layer l, L/R interleaved per instance, zero-padded to the
    band width; w1 = m [2] ext vectors (the two level-1 values).

    All slicing is STATIC (the active width of layer l is 2^l, known at
    trace time) — no masks, shifts or scans. The tree stays in the LEAVES'
    field (base for the default insecure-gamma/tau path — half the bytes of
    the old ext storage; the layer sumcheck lifts rows when stacking).

    Kept SEPARATE from the layer-sumcheck loop: fusing the build into the
    loop program explodes XLA compile time (verify-skill hazard 8)."""
    m = len(leaves)
    v = mle.num_vars(be, leaves[0])
    cur = jax.tree.map(
        lambda *rows: jnp.stack(rows), *leaves
    )  # [m, 2^v], V_v (leaves' field)
    if v == 1:
        return [], [be.index(cur, i) for i in range(m)]

    elem_bytes = 4 * len(jax.tree.leaves(be.index(cur, (0, 0))))
    bands = _gp_bands(v, rows=2 * m, elem_bytes=elem_bytes)
    band_bufs = [None] * len(bands)
    for bi in range(len(bands) - 1, -1, -1):
        lo, hi = bands[bi]
        W = 1 << (hi - 1)
        layers = []
        for l in range(hi - 1, lo - 1, -1):
            w = 1 << l
            A = jax.tree.map(lambda a: a[:, :w], cur)
            B = jax.tree.map(lambda a: a[:, w : 2 * w], cur)
            pair = jax.tree.map(
                lambda a_, b_: jnp.stack([a_, b_], axis=1).reshape(
                    2 * m, w
                ),
                A, B,
            )
            if w != W:
                pair = jax.tree.map(
                    lambda a: jnp.pad(
                        a, [(0, 0)] * (a.ndim - 1) + [(0, W - a.shape[-1])]
                    ),
                    pair,
                )
            layers.append(pair)
            cur = be.mul(A, B)  # V_l, [m, 2^l]
        band_bufs[bi] = jax.tree.map(
            lambda *rows: jnp.stack(rows), *layers
        )
    # cur is now V_1: [m, 2]
    w1 = [jax.tree.map(lambda a, i=i: a[i, :2], cur) for i in range(m)]
    return band_bufs, w1


def gp_layer_rounds(be: Backend, BANDS, w1, v: int, dtx):
    """Traceable grand-product transcript phase: roots/W1 messages plus the
    per-layer batched sumcheck loop over the pre-built band buffers.
    Returns (pbuf [v] ext point buffer, dtx)."""
    m = len(w1)
    # w1 may be base-typed (the tree stays in the leaves' field): lift so
    # the transcript messages keep their DEGREE-felt encoding
    w1 = [be.lift(T) for T in w1]
    roots = [be.mul(be.index(T, 0), be.index(T, 1)) for T in w1]

    # ---- roots + alpha ----
    dtx = dt.write_ext(be, dtx, dsc._stack_scalars(be, roots))
    alpha, dtx = dt.squeeze_challenge(be, dtx)

    # ---- layer 0: W1 values (L_i, R_i interleaved), squeeze mu ----
    lr = []
    for T in w1:
        lr.append(be.index(T, 0))
        lr.append(be.index(T, 1))
    dtx = dt.write_ext(be, dtx, dsc._stack_scalars(be, lr))
    mu, dtx = dt.squeeze_challenge(be, dtx)

    pbuf = be.zeros((v,), ext=True)
    pbuf = jax.tree.map(
        lambda p, mv: p.at[0].set(mv), pbuf, mu
    )
    if v == 1:
        return pbuf, dtx

    # ---- layers l = 1..v-1: batched deg-3 sumchecks, processed in SIZE
    # BANDS: band (lo, hi) runs a fori over its layers on its own
    # [hi-lo, 2m, 2^(hi-1)] buffer (layer l's active prefix is 2^l). The
    # old single full-width fori made every small layer cost a full
    # 2^(v-1)-wide round (9.9 s of the 25 s gl16384 prove) ----
    cdev = dsc.powers(be, alpha, m, trailing_one=True)
    expr_key = _gp_expr(m).key()

    def make_band_body(band_buf, lo: int, hi: int):
        logw = hi - 1
        W = 1 << logw
        ones_row = be.ext.ones((1, W))

        def layer_body(l, carry):
            dtx, pbuf = carry
            jl = (hi - 1) - l  # row index within the band buffer
            tabs = be.lift(
                jax.tree.map(lambda a: a[jl], band_buf)
            )  # [2m, W] ext
            eq = dsc.eq_table_dyn(be, pbuf, logw, l)
            stk = jax.tree.map(
                lambda e, t, o: jnp.concatenate([e[None], t, o]),
                eq, tabs, ones_row,
            )
            chal, fevals, dtx = dsc.rounds(
                be, expr_key, m, logw, stk, cdev, dtx, l,
                jnp.left_shift(1, l),
            )
            dtx = dt.write_ext(
                be, dtx, jax.tree.map(lambda a: a[1:], fevals)
            )
            mu, dtx = dt.squeeze_challenge(be, dtx)
            # pbuf[0:l] = chal[0:l]; pbuf[l] = mu
            idx = jnp.arange(v, dtype=jnp.int32)
            chal_pad = jax.tree.map(
                lambda c: jnp.concatenate(
                    [c, jnp.zeros((v - logw,) + c.shape[1:], dtype=c.dtype)]
                )
                if logw < v
                else c[:v],
                chal,
            )
            pbuf = jax.tree.map(
                lambda p, c, mv: jnp.where(
                    idx < l, c, jnp.where(idx == l, mv, p)
                ),
                pbuf, chal_pad, mu,
            )
            return dtx, pbuf

        return layer_body

    carry = (dtx, pbuf)
    for band_buf in BANDS:
        # band boundaries recovered from the buffer shape ([nl, 2m, W]):
        # hi = log2(W)+1, lo = hi-nl — no separate plan to keep in sync
        shape = jax.tree.leaves(band_buf)[0].shape
        hi = shape[-1].bit_length()  # log2(W) + 1
        lo = hi - shape[0]
        carry = jax.lax.fori_loop(
            lo, hi, make_band_body(band_buf, lo, hi), carry
        )
    dtx, pbuf = carry
    return pbuf, dtx


def gp_rounds(be: Backend, leaves, dtx):
    """Traceable one-piece grand-product prover (build + loop). Only for
    SMALL trees (tests, few levels): at real sizes trace the two halves as
    separate programs (gp_tree_build / gp_layer_rounds) via
    prove_grand_product_device."""
    v = mle.num_vars(be, leaves[0])
    LVL, w1 = gp_tree_build(be, leaves)
    return gp_layer_rounds(be, LVL, w1, v, dtx)


@lru_cache(maxsize=None)
def _gp_build_jit(be_name: str, m: int, logl: int, ext_in: bool):
    be = get_backend(be_name)
    return jax.jit(lambda leaves: gp_tree_build(be, leaves))


@lru_cache(maxsize=None)
def _gp_loop_jit(be_name: str, m: int, logl: int, cap: int):
    be = get_backend(be_name)
    return jax.jit(
        lambda LVL, w1, dtx: gp_layer_rounds(be, LVL, w1, logl, dtx)
    )


def prove_grand_product_device(be: Backend, leaves, dtx):
    """Two-program dispatch wrapper (tree build, then transcript loop) —
    still zero host round trips: the device transcript flows between the
    enqueued programs. Returns (pbuf [v] ext device, dtx)."""
    m = len(leaves)
    v = mle.num_vars(be, leaves[0])
    ext_in = be._mod(leaves[0]) is be.ext
    cap = dtx.log_lo.shape[0]
    LVL, w1 = _gp_build_jit(be.spec.name, m, v, ext_in)(leaves)
    return _gp_loop_jit(be.spec.name, m, v, cap)(LVL, w1, dtx)
