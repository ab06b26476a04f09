"""Fused device-resident sumcheck prover.

Plays ALL rounds of a sumcheck inside one traced program: per round it
evaluates the round polynomial (stride-fold fixed-buffer layout, identical
math and transcript messages to gkr/sumcheck.py), absorbs the evals into the
on-device Fiat-Shamir transcript (dtranscript.py), squeezes the challenge
and folds — zero host involvement. The round count `v` is a TRACED int32 so
one compiled program per (expression, buffer-size) serves every active size
(grand-product tree layers l = 1..v-1 share one compile).

`rounds()` is a plain traceable function so node-level provers can inline it
into larger single-dispatch programs; `prove()` is the standalone jitted
wrapper (used by tests and simple callers).

Protocol/messages: identical to sumcheck.prove_sum_check — the host
TranscriptReader verifies unchanged. Reference parity: the same
`prove_sum_check` role as the external gkr crate (SURVEY.md §2.2).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..ops.fe import Backend, get_backend
from ..ops import mle
from . import dtranscript as dt
from .sumcheck import (
    _TERM_BLOCK,
    _eval_points,
    _expr_layout,
    _kinds,
    _stack_jit,
    SumcheckExpr,
)


def field_sum(be: Backend, x):
    """Field-sum a small [m] vector -> 0-d, padding to a power of two.

    For in-program digest finishes (m = flattened-size / 2^15 chunks, m is
    small); the halving tree runs over materialized reduce outputs so the
    XLA:CPU producer re-execution pathology (fe.Backend.sum docstring) is
    bounded."""
    m = be.length(x)
    M = 1 << (m - 1).bit_length() if m > 1 else 1
    if M != m:
        pad = be.zeros((M - m,), ext=be._mod(x) is be.ext)
        x = be.concat([x, pad])
    while M > 1:
        lo, hi = be.halves(x)
        x = be.add(lo, hi)
        M //= 2
    return be.index(x, 0)


def digest_scalar(be: Backend, prod):
    """Masked [b, N] field vector -> 0-d field element, on device.

    sum_digest's native uint32 16-bit-column reduction (fusion-safe) followed
    by an in-program modular finish — the device twin of
    Backend.digest_value."""
    dg = be.sum_digest(prod)
    leaves = jax.tree.leaves(dg)
    nl = be.limbs_per_base
    coeffs = []
    for i in range(0, len(leaves), nl):
        acc = None
        for j in range(nl):
            d = leaves[i + j]  # [m, 2] uint32: (lo16-sum, hi16-sum) chunks
            lov = be.from_u32(d[:, 0])
            hiv = be.from_u32(d[:, 1])
            limb = be.base.add(lov, be.base.scale(hiv, 1 << 16))
            s = field_sum(be, limb)
            if j:
                s = be.base.scale(s, (1 << (32 * j)) % be.spec.p)
            acc = s if acc is None else be.base.add(acc, s)
        coeffs.append(acc)
    if len(coeffs) == 1:
        return coeffs[0]
    return be.ext_cls(*coeffs)


def _field_sum_rows(be: Backend, x, m: int):
    """Row-wise field sum of a [P, m] element -> [P], halving on axis 1."""
    M = 1 << (m - 1).bit_length() if m > 1 else 1
    if M != m:
        pad = be.zeros((jax.tree.leaves(x)[0].shape[0], M - m),
                       ext=be._mod(x) is be.ext)
        x = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=1), x, pad
        )
    while M > 1:
        lo = jax.tree.map(lambda a: a[:, : M // 2], x)
        hi = jax.tree.map(lambda a: a[:, M // 2 :], x)
        x = be.add(lo, hi)
        M //= 2
    return jax.tree.map(lambda a: a[:, 0], x)


def digest_batch(be: Backend, prod, npts: int):
    """Masked [P, b, N] field vector -> [P] field element, on device.

    The batched twin of digest_scalar: one reduction program for every
    round-polynomial eval point (the per-point unroll emitted the full
    digest machinery deg+1 times and dominated the round program's code
    size — see keccak_f's docstring for why code size is the TPU-tunnel
    bottleneck)."""
    def leaf(a):
        a = a.reshape(npts, -1)
        n = a.shape[1]
        # chunk length: largest power-of-two divisor of n, capped at
        # _DIGEST_CHUNK (keeps 16-bit-half column sums below 2^32)
        clen = min(be._DIGEST_CHUNK, n & -n)
        a = a.reshape(npts, n // clen, clen)
        lo = jnp.sum(a & 0xFFFF, axis=2, dtype=jnp.uint32)
        hi = jnp.sum(a >> 16, axis=2, dtype=jnp.uint32)
        return lo, hi  # [P, m] each

    leaves = jax.tree.leaves(prod)
    nl = be.limbs_per_base
    coeffs = []
    for i in range(0, len(leaves), nl):
        acc = None
        for j in range(nl):
            lo, hi = leaf(leaves[i + j])
            m = lo.shape[1]
            limb = be.base.add(
                be.from_u32(lo), be.base.scale(be.from_u32(hi), 1 << 16)
            )
            s = _field_sum_rows(be, limb, m)
            if j:
                s = be.base.scale(s, (1 << (32 * j)) % be.spec.p)
            acc = s if acc is None else be.base.add(acc, s)
        coeffs.append(acc)
    if len(coeffs) == 1:
        return coeffs[0]
    return be.ext_cls(*coeffs)


def _stack_scalars(be: Backend, scalars):
    """List of 0-d ext elements -> [n] ext device vector."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scalars)


#: column-chunk the round body when the stacked buffer exceeds this many
#: bytes: the monolithic body's even/odd strided gathers materialize many
#: full-half copies ([81, 2^20] u32 x ~20 at the gl32768 rw sumcheck =
#: 23.6 GB requested on a 15.75 GB chip). Buffers below the threshold
#: (incl. every gl16384 program and the gl32768 GP bands/collation, which
#: compile and fit) keep the simpler monolithic body.
_CHUNK_BYTES = 1 << 31
#: pair-axis chunk length for the chunked body
_CHUNK_COLS = 1 << 17


def _round_body_chunked(be: Backend, expr_key: tuple, num_coeffs: int,
                        W: int, l_act, chal_off: int):
    """Column-chunked round body for HUGE buffers: the round-polynomial
    digests accumulate in the FIELD domain over a lax.scan of pair-axis
    chunks (digest_batch already returns modular field coefficients, so
    cross-chunk accumulation is exact), then a second chunk scan folds.
    Peak temporaries are per-chunk instead of per-half."""
    num_tables, terms = expr_key
    degree = max(len(f) for _, f in terms)
    ts = _eval_points(degree)
    fidx, cidx = _expr_layout(expr_key, num_coeffs, degree)
    nterms = len(terms)
    npts = len(ts)
    C = min(_CHUNK_COLS, W // 2)
    nch = (W // 2) // C

    def body(j, carry, cdev, tdev):
        stk, dtx, chal = carry
        stk3 = jax.tree.map(lambda a: a.reshape(a.shape[:-1] + (nch, 2 * C)), stk)

        def digest_chunk(acc, ch):
            blk = jax.tree.map(lambda a: a[..., ch, :], stk3)  # [T+1, 2C]
            even = jax.tree.map(lambda a: a[..., 0::2], blk)
            odd = jax.tree.map(lambda a: a[..., 1::2], blk)
            diffs = be.sub(odd, even)
            x = ch * C + jnp.arange(C, dtype=jnp.int32)
            mask = (x < jnp.maximum(l_act >> (j + 1), 1))[None, None, :]
            TB = be.add(
                jax.tree.map(lambda a: a[None], even),
                be.mul(tdev, jax.tree.map(lambda a: a[None], diffs)),
            )
            part = None
            for lo_i in range(0, nterms, _TERM_BLOCK):
                sl = slice(lo_i, min(lo_i + _TERM_BLOCK, nterms))
                prod = jax.tree.map(lambda a: a[:, fidx[0][sl], :], TB)
                for k in range(1, degree):
                    prod = be.mul(
                        prod,
                        jax.tree.map(lambda a: a[:, fidx[k][sl], :], TB),
                    )
                ci_blk = cidx[sl]
                cs = jax.tree.map(lambda a: a[None, ci_blk, None], cdev)
                prod = be.mul(prod, cs)
                b = sl.stop - sl.start
                prod = be.select(mask, prod, be.ext.zeros((npts, b, C)))
                d = digest_batch(be, prod, npts)
                part = d if part is None else be.add(part, d)
            return be.add(acc, part), None

        acc0 = be.ext.zeros((npts,))
        ev, _ = jax.lax.scan(
            digest_chunk, acc0, jnp.arange(nch, dtype=jnp.int32)
        )
        dtx = dt.write_ext(be, dtx, ev)
        r, dtx = dt.squeeze_challenge(be, dtx)

        def fold_chunk(_, ch):
            blk = jax.tree.map(lambda a: a[..., ch, :], stk3)
            even = jax.tree.map(lambda a: a[..., 0::2], blk)
            odd = jax.tree.map(lambda a: a[..., 1::2], blk)
            return None, be.add(even, be.mul(r, be.sub(odd, even)))

        _, folded = jax.lax.scan(
            fold_chunk, None, jnp.arange(nch, dtype=jnp.int32)
        )
        # folded: [nch, T+1, C] -> [T+1, W/2] -> zero-pad to [T+1, W]
        stk = jax.tree.map(
            lambda f: jnp.pad(
                jnp.moveaxis(f, 0, -2).reshape(f.shape[1:-1] + (W // 2,)),
                [(0, 0)] * (f.ndim - 2) + [(0, W // 2)],
            ),
            folded,
        )
        chal = jax.tree.map(
            lambda c, rv: c.at[chal_off + j].set(rv), chal, r
        )
        return stk, dtx, chal

    return body


def _round_body_maker(be: Backend, expr_key: tuple, num_coeffs: int,
                      W: int, l_act, chal_len: int, chal_off: int = 0):
    """One sumcheck round over a [T+1, W] buffer (W static): returns a
    fori-compatible body(j, (stk, dtx, chal)). j is the round index
    RELATIVE to the buffer width (pairs active: l_act >> (j+1)); the bound
    challenge is written to chal[chal_off + j]. Switches to the
    column-chunked variant when the buffer exceeds _CHUNK_BYTES."""
    num_tables, terms = expr_key
    if W > 2 * _CHUNK_COLS:
        # estimate bytes: rows x W x 4 bytes per uint32 leaf
        sample_leaves = 4 * be.spec.ext_degree * (
            2 if be.spec.name == "goldilocks" else be.limbs_per_base
        )
        if (num_tables + 1) * W * sample_leaves > _CHUNK_BYTES:
            return _round_body_chunked(
                be, expr_key, num_coeffs, W, l_act, chal_off
            )
    num_tables, terms = expr_key
    degree = max(len(f) for _, f in terms)
    ts = _eval_points(degree)
    fidx, cidx = _expr_layout(expr_key, num_coeffs, degree)
    nterms = len(terms)
    npts = len(ts)

    x = jnp.arange(W // 2, dtype=jnp.int32) if W > 1 else jnp.zeros(
        (1,), jnp.int32
    )

    def body(j, carry, cdev, tdev):
        stk, dtx, chal = carry
        even = jax.tree.map(lambda a: a[..., 0::2], stk)  # [T+1, W/2]
        odd = jax.tree.map(lambda a: a[..., 1::2], stk)
        diffs = be.sub(odd, even)
        # pairs active this round: l_act >> (j+1)
        mask = (x < jnp.maximum(l_act >> (j + 1), 1))[None, None, :]
        TB = be.add(
            jax.tree.map(lambda a: a[None], even),
            be.mul(tdev, jax.tree.map(lambda a: a[None], diffs)),
        )  # [P, T+1, W/2]
        acc = None
        for lo_i in range(0, nterms, _TERM_BLOCK):
            sl = slice(lo_i, min(lo_i + _TERM_BLOCK, nterms))
            prod = jax.tree.map(lambda a: a[:, fidx[0][sl], :], TB)
            for k in range(1, degree):
                prod = be.mul(
                    prod, jax.tree.map(lambda a: a[:, fidx[k][sl], :], TB)
                )
            ci_blk = cidx[sl]
            cs = jax.tree.map(lambda a: a[None, ci_blk, None], cdev)
            prod = be.mul(prod, cs)
            b = sl.stop - sl.start
            prod = be.select(mask, prod, be.ext.zeros((npts, b, W // 2)))
            d = digest_batch(be, prod, npts)
            acc = d if acc is None else be.add(acc, d)
        ev = acc  # [P] ext, in ts order
        dtx = dt.write_ext(be, dtx, ev)
        r, dtx = dt.squeeze_challenge(be, dtx)
        folded = be.add(even, be.mul(r, diffs))  # [T+1, W/2]
        # zero-pad back to [T+1, W] via the HLO pad op — a concatenate here
        # explodes XLA:CPU's fusion-emitter compile time inside fori_loop
        # bodies (measured 57 s at logl=9; hazard 8)
        stk = jax.tree.map(
            lambda f: jnp.pad(
                f, [(0, 0)] * (f.ndim - 1) + [(0, f.shape[-1])]
            ),
            folded,
        )
        chal = jax.tree.map(
            lambda c, rv: c.at[chal_off + j].set(rv), chal, r
        )
        return stk, dtx, chal

    return body


def _stage_plan(logn: int):
    """Staged-compaction schedule: stage k plays s_k rounds, then the
    buffer is statically sliced by 2^(s_k). [2, 2, rest] captures ~all of
    the compaction saving (geometric decay: 2N + N/2 + (v-4)N/16 ~ 3.4N
    field ops vs v*N unstaged at v=19) while emitting only THREE copies of
    the round body — a uniform 3-round plan emitted ceil(v/3) copies and
    blew the MC executables to 66-91 MB, which re-thrashed the device code
    arena."""
    if logn <= 4:
        return [logn] if logn else []
    return [2, 2, logn - 4]


def rounds(be: Backend, expr_key: tuple, num_coeffs: int, logn: int,
           stk, cdev, dtx, v, l_act):
    """Traced fused sumcheck with STAGED COMPACTION: v rounds (v may be a
    traced int32 <= logn) over the stacked [T+1, 2^logn] ext buffer `stk`
    (last row ones). The compaction fold writes the surviving half to the
    buffer front, so after every STAGE_ROUNDS rounds the buffer is
    statically sliced in half; stages past v execute zero rounds.

    Returns (chal [logn] ext buffer — rows >= v are garbage, final_evals
    [T] ext, dtx)."""
    num_tables, _ = expr_key
    degree = max(len(f) for _, f in expr_key[1])
    ts = _eval_points(degree)
    N = 1 << logn
    chal = be.zeros((logn,), ext=True)
    # eval points as a [P, 1, 1] field broadcast: T_t = stk + t * diffs is
    # computed for ALL points in one batched expression, so the term-product
    # and digest code is emitted ONCE instead of deg+1 times (the unrolled
    # form made this program ~11 MB of TPU code — see keccak_f's docstring
    # for why executable size is the TPU-tunnel bottleneck)
    tdev = be.reshape(be.from_ints(list(ts), ext=True), (len(ts), 1, 1))
    done = 0
    for n_st in _stage_plan(logn):
        W = N >> done
        mk = _round_body_maker(
            be, expr_key, num_coeffs, W,
            jax.lax.shift_right_logical(
                jnp.asarray(l_act, dtype=jnp.int32), done
            ),
            logn, chal_off=done,
        )
        n_exec = jnp.clip(jnp.asarray(v, dtype=jnp.int32) - done, 0, n_st)
        stk, dtx, chal = jax.lax.fori_loop(
            0, n_exec, lambda j, c, mk=mk: mk(j, c, cdev, tdev),
            (stk, dtx, chal),
        )
        done += n_st
        if done < logn:
            keep = W >> n_st
            stk = jax.tree.map(lambda a: a[..., :keep], stk)
    final = jax.tree.map(lambda a: a[:num_tables, 0], stk)
    return chal, final, dtx


def rounds_static(be: Backend, expr_key: tuple, num_coeffs: int, logn: int,
                  stk, cdev, dtx):
    """rounds() for the common fully-active case v == logn."""
    return rounds(
        be, expr_key, num_coeffs, logn, stk, cdev, dtx,
        jnp.int32(logn), jnp.int32(1 << logn),
    )


@lru_cache(maxsize=None)
def _prove_jit(be_name: str, expr_key: tuple, num_coeffs: int, logn: int):
    be = get_backend(be_name)

    def run(stk, cdev, dtx, v, l_act):
        return rounds(be, expr_key, num_coeffs, logn, stk, cdev, dtx, v, l_act)

    return jax.jit(run)


def eq_table_dyn(be: Backend, pbuf, bufv: int, plen):
    """eq(pbuf[:plen], x) over a [2^bufv] buffer, traced plen (factors
    j >= plen forced to one). pbuf: [>=bufv] ext point buffer. The traced
    twin of grand_product._eq_dyn_jit."""
    N = 1 << bufv
    x = jnp.arange(N, dtype=jnp.uint32)
    prod = None
    for j in range(bufv):
        rj = be.index(pbuf, j)
        one_minus = be.sub(be.ext.ones(()), rj)
        f = be.select(((x >> j) & 1) == 1, rj, one_minus)
        f = be.select(jnp.asarray(j) < plen, f, be.ext.ones((N,)))
        prod = f if prod is None else be.mul(prod, f)
        if (j + 1) % 3 == 0:
            prod = be.fusion_break(prod)
    return prod


def batched_rows_ok() -> bool:
    """Whether [n, N] broadcast-built row tables are safe on this backend.

    XLA:CPU (jaxlib 0.9.0) DEADLOCKS at runtime when slices of a fused 2-D
    broadcast product chain are added (reproduced: dft_row_mle npts=2,
    scratch/t_dft_b3.py — every fold variant incl. optimization_barrier
    hangs; the [n,N] producer alone is fine). On TPU the batched form works
    and keeps generated code size independent of the instance count, which
    is the point (per-instance unrolls made grouped programs scale
    linearly in B). CPU falls back to per-point 1-D chains."""
    return jax.default_backend() != "cpu"


def eq_rows(be: Backend, pts, v: int, n: int):
    """eq(pts[i], x) rows as an [n, 2^v] ext table; pts: [n, v] ext device.
    Bit loop vectorized over the point axis (TPU-only form, see
    batched_rows_ok)."""
    N = 1 << v
    x = jnp.arange(N, dtype=jnp.uint32)
    prod = None
    for b in range(v):
        rb = jax.tree.map(lambda a: a[:, b : b + 1], pts)  # [n, 1]
        bit = (((x >> b) & 1) == 1)[None, :]  # [1, N]
        one_minus = be.sub(be.ext.ones((n, 1)), rb)
        f = be.select(bit, rb, one_minus)  # [n, N] broadcast
        prod = f if prod is None else be.mul(prod, f)
        if (b + 1) % 3 == 0:
            prod = be.fusion_break(prod)
    if prod is None:
        prod = be.ext.ones((n, N))
    return prod


def _eq_row_1d(be: Backend, pts, i: int, v: int):
    """One eq row as a 1-D [2^v] chain (the CPU-safe pattern)."""
    N = 1 << v
    x = jnp.arange(N, dtype=jnp.uint32)
    prod = None
    for b in range(v):
        rb = be.index(pts, (i, b))
        one_minus = be.sub(be.ext.ones(()), rb)
        f = be.select(((x >> b) & 1) == 1, rb, one_minus)
        prod = f if prod is None else be.mul(prod, f)
        if (b + 1) % 3 == 0:
            prod = be.fusion_break(prod)
    if prod is None:
        prod = be.ext.ones((N,))
    return prod


def fold_sum_rows(be: Backend, x, n: int):
    """Modular sum over a SMALL leading axis: [n, ...] -> [...] via
    unrolled static-index adds (n is an instance/point count, a handful of
    rows). Only safe where batched_rows_ok() holds."""
    acc = jax.tree.map(lambda a: a[0], x)
    for i in range(1, n):
        acc = be.add(acc, jax.tree.map(lambda a, i=i: a[i], x))
        if i % 3 == 0:
            acc = be.fusion_break(acc)
    return acc


def eq_rlc(be: Backend, pts, alphas, v: int, npts: int):
    """sum_i alphas[i] * eq(pts[i], x) as a [2^v] ext table; pts: [npts, v]
    ext device, alphas: [npts] ext device."""
    if batched_rows_ok():
        rows = eq_rows(be, pts, v, npts)
        wr = be.mul(jax.tree.map(lambda a: a[:, None], alphas), rows)
        return fold_sum_rows(be, wr, npts)
    acc = None
    for i in range(npts):
        term = be.mul(be.index(alphas, i), _eq_row_1d(be, pts, i, v))
        acc = be.fusion_break(term if acc is None else be.add(acc, term))
    return acc


def eq_rlc_grouped(be: Backend, pts, alphas, v: int, B: int, npts: int):
    """Per-instance alpha-combined eq tables [B, 2^v]: pts [B, npts, v] ext,
    alphas [B*npts] ext (b-major). Eq_b = sum_i alphas[b*npts+i] *
    eq(pts[b,i], x)."""
    if batched_rows_ok():
        flat = jax.tree.map(
            lambda a: a.reshape((B * npts, v) + a.shape[3:]), pts
        )
        rows = eq_rows(be, flat, v, B * npts)  # [B*npts, N]
        wr = be.mul(jax.tree.map(lambda a: a[:, None], alphas), rows)
        grp = jax.tree.map(
            lambda a: a.reshape((B, npts) + a.shape[1:]), wr
        )
        # modular sum over the small npts axis
        acc = jax.tree.map(lambda a: a[:, 0], grp)
        for i in range(1, npts):
            acc = be.add(acc, jax.tree.map(lambda a, i=i: a[:, i], grp))
        return acc  # [B, N]
    flat = jax.tree.map(lambda a: a.reshape((B * npts, v) + a.shape[3:]), pts)
    rows = []
    for b in range(B):
        acc = None
        for i in range(npts):
            term = be.mul(
                be.index(alphas, b * npts + i),
                _eq_row_1d(be, flat, b * npts + i, v),
            )
            acc = be.fusion_break(
                term if acc is None else be.add(acc, term)
            )
        rows.append(acc)
    return jax.tree.map(lambda *rs: jnp.stack(rs), *rows)


def powers(be: Backend, x, n: int, trailing_one: bool = False):
    """[x^0, .., x^(n-1)] (+ optional trailing 1) as a stacked ext vector,
    from a 0-d ext device scalar."""
    one = be.ext.ones(())
    outs = [one]
    cur = one
    for _ in range(1, n):
        cur = be.mul(cur, x)
        outs.append(cur)
    if trailing_one:
        outs.append(one)
    return _stack_scalars(be, outs)


def coeffs_device(be: Backend, coeffs_host):
    """Static host coeffs (+ the implicit trailing one) -> ext device [k+1]."""
    spec = be.spec
    return be.from_ints([spec._c(c) for c in coeffs_host] + [spec.one], ext=True)


def prove_sum_check_device(be, expr: SumcheckExpr, cdev, tables, dtx,
                           num_vars=None):
    """Standalone fused sumcheck dispatch.

    cdev: ext device [len(coeffs)+1] (coeffs_device for static hosts coeffs,
    or challenge-derived powers built on device). Returns
    (chal_buf [bufv] ext device, final_evals [T] ext device, dtx)."""
    bv = mle.num_vars(be, tables[0])
    v = bv if num_vars is None else num_vars
    assert 1 <= v <= bv
    assert len(tables) == expr.num_tables
    stk = _stack_jit(be.spec.name, len(tables), bv, _kinds(be, tables))(tables)
    ncoeffs = be.length(cdev) - 1
    fn = _prove_jit(be.spec.name, expr.key(), ncoeffs, bv)
    return fn(stk, cdev, dtx, jnp.int32(v), jnp.int32(1 << v))
