"""Number-theoretic transform (cyclic DFT at 2^k roots) for any backend.

Semantics: NTT(x)[k] = sum_j x[j] * w^(jk), INTT = inverse with w^-1 and
1/L scaling — the size-preserving DFT behind the reference's FftNode
(sk_encryption_circuit.rs:224-260: polynomial products as
FFT -> pointwise mul -> IFFT on 2n-padded coefficient vectors).

Device mapping: bit-reverse permutation + log2(L) butterfly stages, each a
single formula new[i] = x[p0[i]] + tw[i] * x[p1[i]] with HOST-precomputed
static index/twiddle arrays (subtraction is folded into the twiddle sign).
Pure gather + mul + add — no concatenate/dynamic_slice, which XLA:CPU's
fusion emitter handles pathologically (see gkr/sumcheck.py).

Also provides the DFT-row MLE table d_r[j] = prod_b ((1-r_b) + r_b*w^(j 2^b))
used by the FftNode claim reduction: out~(r) = sum_j d_r(j) * in(j).

Works for Goldilocks (2-adicity 32) and BN254 Fr (2-adicity 28); roots come
from the FieldSpec's generator convention.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .fe import Backend, get_backend


@lru_cache(maxsize=None)
def _plan(be_name: str, L: int, inverse: bool):
    """Host-side butterfly plan: (bitrev idx, [(p0, p1, tw_device)] stages)."""
    be = get_backend(be_name)
    p = be.spec.p
    logl = L.bit_length() - 1
    assert 1 << logl == L
    w = be.spec.root_of_unity(L)
    if inverse:
        w = pow(w, p - 2, p)

    bitrev = np.zeros(L, dtype=np.int32)
    for i in range(L):
        bitrev[i] = int(format(i, f"0{logl}b")[::-1], 2) if logl else 0

    stages = []
    for s in range(1, logl + 1):
        m = 1 << s
        half = m // 2
        wm = pow(w, L // m, p)
        p0 = np.zeros(L, dtype=np.int32)
        p1 = np.zeros(L, dtype=np.int32)
        tw = [0] * L
        for i in range(L):
            j = i & (m - 1)
            if j < half:
                p0[i] = i
                p1[i] = i + half
                tw[i] = pow(wm, j, p)
            else:
                p0[i] = i - half
                p1[i] = i
                tw[i] = p - pow(wm, j - half, p)
        stages.append((p0, p1, be.from_ints(tw)))
    return bitrev, stages


@lru_cache(maxsize=None)
def _plan_dev(be_name: str, L: int, inverse: bool):
    """Device-resident butterfly plan (bitrev + stacked per-stage index and
    twiddle arrays), uploaded once. Passed as ARGUMENTS to the stage scan —
    embedding them as program constants made each NTT executable ~L*logl*16
    bytes (16 MB at 2^16), which overflowed the TPU code arena."""
    bitrev, stages = _plan(be_name, L, inverse)
    BR = jnp.asarray(bitrev)
    P0 = jnp.asarray(np.stack([s[0] for s in stages])) if stages else None
    P1 = jnp.asarray(np.stack([s[1] for s in stages])) if stages else None
    TW = (
        jax.tree.map(lambda *ls: jnp.stack(ls), *[s[2] for s in stages])
        if stages
        else None
    )
    return BR, P0, P1, TW


def ntt_body(be: Backend, x, plan, logl: int, inverse: bool):
    """Traceable NTT core over a device plan (plan arrays are arguments)."""
    BR, P0, P1, TW = plan
    L = 1 << logl
    linv = pow(L, be.spec.p - 2, be.spec.p)
    x = jax.tree.map(lambda a: a[..., BR], x)
    if logl:
        # Stage loop as lax.scan over stacked [logl, L] index/twiddle
        # arrays: compile cost is ONE butterfly stage regardless of logl.
        def body(acc, st):
            p0, p1, twid = st
            lo = jax.tree.map(lambda a: a[..., p0], acc)
            hi = jax.tree.map(lambda a: a[..., p1], acc)
            return be.add(lo, be.mul(twid, hi)), None

        x, _ = jax.lax.scan(body, x, (P0, P1, TW))
    if inverse:
        x = be.scale(x, linv)
    return x


@lru_cache(maxsize=None)
def _ntt_jit(be_name: str, logl: int, inverse: bool, ext: bool):
    be = get_backend(be_name)

    def run(x, plan):
        return ntt_body(be, x, plan, logl, inverse)

    return jax.jit(run)


def ntt(be: Backend, x, inverse: bool = False):
    """Cyclic NTT/INTT of a field vector; length 2^k within the 2-adicity."""
    n = be.length(x)
    logl = n.bit_length() - 1
    assert 1 << logl == n
    assert logl <= be.spec.two_adicity
    plan = _plan_dev(be.spec.name, n, inverse)
    return _ntt_jit(be.spec.name, logl, inverse, be._mod(x) is be.ext)(x, plan)


# ---------------------------------------------------------------------------
# DFT-row MLE tables for the FftNode claim reduction
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _wpow_table(be_name: str, L: int, inverse: bool):
    be = get_backend(be_name)
    p = be.spec.p
    w = be.spec.root_of_unity(L)
    if inverse:
        w = pow(w, p - 2, p)
    pows = []
    acc = 1
    for _ in range(L):
        pows.append(acc)
        acc = acc * w % p
    return be.from_ints(pows)


def dft_rows(be: Backend, points, wtab, logl: int, n: int):
    """d_i(x) = prod_b ((1-r_ib) + r_ib * w^(x 2^b)) as an [n, 2^logl] ext
    table; points: [n, logl] ext device. The bit loop is vectorized over the
    point axis (code size independent of n)."""
    L = 1 << logl
    prod = None
    for b in range(logl):
        # (j << b) mod L as a generated iota (L is a power of two) — a
        # numpy index array here would embed logl*L*4 bytes of constants
        # into every FFT program
        idx = (jnp.arange(L, dtype=jnp.uint32) << b) & (L - 1)
        wb = jax.tree.map(lambda a: a[None, idx], wtab)  # [1, L]
        rb = jax.tree.map(lambda a: a[:, b : b + 1], points)  # [n, 1]
        factor = be.add(
            be.sub(be.ext.ones((n, 1)), rb), be.mul(rb, wb)
        )  # [n, L]
        prod = factor if prod is None else be.mul(prod, factor)
        if (b + 1) % 3 == 0:
            prod = be.fusion_break(prod)
    if prod is None:
        prod = be.ext.ones((n, L))
    return prod


def _dft_row_1d(be: Backend, points, i: int, wtab, logl: int):
    """One DFT row as a 1-D [2^logl] chain (the CPU-safe pattern — see
    dsumcheck.batched_rows_ok)."""
    L = 1 << logl
    prod = None
    for b in range(logl):
        idx = (jnp.arange(L, dtype=jnp.uint32) << b) & (L - 1)
        wb = jax.tree.map(lambda a: a[idx], wtab)
        rb = be.index(points, (i, b))
        factor = be.add(be.sub(be.ext.ones((L,)), rb), be.mul(rb, wb))
        prod = factor if prod is None else be.mul(prod, factor)
        if (b + 1) % 3 == 0:
            prod = be.fusion_break(prod)
    if prod is None:
        prod = be.ext.ones((L,))
    return prod


def dft_row_mle_body(be: Backend, points, alphas, wtab, logl: int,
                     inverse: bool, npoints: int):
    """Traceable core: d(x) = sum_i alpha_i * prod_b ((1-r_ib) + r_ib *
    w^(x 2^b)), the alpha-combined DFT-row MLE table (1/L-scaled for
    inverse). points: [npoints, logl] ext device; alphas: [npoints] ext."""
    from ..gkr import dsumcheck as dsc

    if dsc.batched_rows_ok():
        rows = dft_rows(be, points, wtab, logl, npoints)
        wr = be.mul(jax.tree.map(lambda a: a[:, None], alphas), rows)
        acc = dsc.fold_sum_rows(be, wr, npoints)
    else:
        acc = None
        for i in range(npoints):
            term = be.mul(
                be.index(alphas, i), _dft_row_1d(be, points, i, wtab, logl)
            )
            acc = be.fusion_break(
                term if acc is None else be.add(acc, term)
            )
    if inverse:
        acc = be.scale(acc, pow(1 << logl, be.spec.p - 2, be.spec.p))
    return acc


def dft_row_mle_grouped(be: Backend, points, alphas, wtab, logl: int,
                        inverse: bool, B: int, npts: int):
    """Per-instance combined d tables [B, 2^logl]: points [B, npts, logl]
    ext, alphas [B*npts] ext (b-major)."""
    from ..gkr import dsumcheck as dsc

    L = 1 << logl
    flat = jax.tree.map(
        lambda a: a.reshape((B * npts, logl) + a.shape[3:]), points
    )
    if dsc.batched_rows_ok():
        rows = dft_rows(be, flat, wtab, logl, B * npts)
        wr = be.mul(jax.tree.map(lambda a: a[:, None], alphas), rows)
        grp = jax.tree.map(lambda a: a.reshape((B, npts) + a.shape[1:]), wr)
        acc = jax.tree.map(lambda a: a[:, 0], grp)
        for i in range(1, npts):
            acc = be.add(acc, jax.tree.map(lambda a, i=i: a[:, i], grp))
    else:
        rows = []
        for b in range(B):
            row = None
            for i in range(npts):
                term = be.mul(
                    be.index(alphas, b * npts + i),
                    _dft_row_1d(be, flat, b * npts + i, wtab, logl),
                )
                row = be.fusion_break(
                    term if row is None else be.add(row, term)
                )
            rows.append(row)
        acc = jax.tree.map(lambda *rs: jnp.stack(rs), *rows)
    if inverse:
        acc = be.scale(acc, pow(L, be.spec.p - 2, be.spec.p))
    return acc


@lru_cache(maxsize=None)
def _dr_jit(be_name: str, logl: int, inverse: bool, npoints: int):
    be = get_backend(be_name)

    def run(points, alphas, wtab):
        return dft_row_mle_body(be, points, alphas, wtab, logl, inverse, npoints)

    return jax.jit(run)


def dft_row_mle(be: Backend, points, alphas, logl: int, inverse: bool):
    """points: list of ext points (each LSB-first, len logl); alphas: list of
    ext scalars. Returns the combined d table as an ext device vector [2^logl].
    """
    spec = be.spec
    pts = be.from_ints(
        [spec._c(r) for pt in points for r in pt], ext=True
    )
    pts = be.reshape(pts, (len(points), logl))
    al = be.from_ints([spec._c(a) for a in alphas], ext=True)
    wtab = _wpow_table(spec.name, 1 << logl, inverse)
    return _dr_jit(spec.name, logl, inverse, len(points))(pts, al, wtab)
