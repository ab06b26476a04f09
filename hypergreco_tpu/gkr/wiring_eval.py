"""Closed-form wiring-MLE evaluation for the host verifier.

The VanillaNode verifier must evaluate, at the sumcheck's final point u,

    A_p~(u)   = sum_y Eq(y) * lincoef(y) * eq(u, src_local(y))
    W_q~(v2)  = sum_y Eq(y) * qcoef(y) * eq(u, a_local(y)) * eq(v2, b_local(y))
    <Eq, c>   = sum_y Eq(y) * const(y)

where Eq(y) = sum_i alpha_i eq(pt_i, y). The round-2 verifier recomputed
these with O(Y) device scatters — ~50 TPU-tunnel round trips per proof
(VERDICT r2 #3). Here they are evaluated on the host in closed form:

1. The wiring arrays decompose into AFFINE RUNS: maximal intervals of y
   where the coefficient is constant and every referenced index advances by
   one (src(y) = y + off). Real circuit layers (relays, per-rep scalings,
   block re-chunkings, structured cyclo wiring) produce O(reps) runs.

2. Over one run, sum_y prod_p eq(point_p, y + off_p) splits into dyadic
   blocks [x, x + 2^j) aligned so that each (y + off_p) is 2^j-aligned at
   the block start; within a block the low j bits sum to a closed product
     prod_{b<j} ( prod_p point_p[b] + prod_p (1 - point_p[b]) )
   and the high bits contribute per-pair bit factors of the block base.
   Each run costs O(v) blocks of O(v) ext mults — microseconds on the host.

This is the TPU-framework analog of the reference's succinct VanillaGate
wiring predicates (the external gkr crate's VanillaNode claim reduction,
SURVEY.md §2.2): the verifier never touches dense tables.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..fields import FieldSpec


def _v2(x: int, cap: int) -> int:
    """2-adic valuation of x, capped (v2(0) = cap)."""
    if x == 0:
        return cap
    return min((x & -x).bit_length() - 1, cap)


def eq_affine_sum(spec: FieldSpec, pairs, lo: int, hi: int):
    """sum_{y in [lo, hi)} prod_p eq(point_p, y + off_p).

    pairs: [(point, off)]; point is an LSB-first list of ext scalars; off an
    int with 0 <= y + off < 2^len(point) for every y in the interval."""
    if lo >= hi:
        return spec.zero
    pts = [[spec._c(r) for r in pt] for pt, _ in pairs]
    offs = [off for _, off in pairs]

    from ..utils import nverifier

    if (
        spec.name == "goldilocks"
        and nverifier.available(spec)
        and len(pairs) <= 64
    ):
        return nverifier.eq_affine_sum(
            list(zip(pts, offs)), lo, hi
        )
    one = spec.one
    minlen = min(len(pt) for pt in pts)

    # lowpref[j] = prod_{b<j} (prod_p pt_p[b] + prod_p (1-pt_p[b]))
    lowpref = [one]
    for b in range(minlen):
        t = one
        s = one
        for pt in pts:
            t = spec.emul(t, pt[b])
            s = spec.emul(s, spec.esub(one, pt[b]))
        lowpref.append(spec.emul(lowpref[-1], spec.eadd(t, s)))

    acc = spec.zero
    x = lo
    while x < hi:
        j = (hi - x).bit_length() - 1  # block fits the interval
        j = min(j, minlen)
        for pt, off in zip(pts, offs):
            j = min(j, _v2(x + off, j))
        blk = lowpref[j]
        for pt, off in zip(pts, offs):
            base = x + off
            f = one
            for b in range(j, len(pt)):
                f = spec.emul(f, pt[b] if (base >> b) & 1 else spec.esub(one, pt[b]))
            blk = spec.emul(blk, f)
        acc = spec.eadd(acc, blk)
        x += 1 << j
    return acc


# ---------------------------------------------------------------------------
# run extraction from dense wiring arrays
# ---------------------------------------------------------------------------


def const_runs(const: np.ndarray) -> List[Tuple[int, int, int]]:
    """(y0, y1, value) maximal runs of equal nonzero constants."""
    Y = const.shape[0]
    if Y == 0:
        return []
    brk = np.flatnonzero(const[1:] != const[:-1]) + 1
    starts = np.concatenate([[0], brk])
    ends = np.concatenate([brk, [Y]])
    return [
        (int(a), int(b), int(const[a]))
        for a, b in zip(starts, ends)
        if const[a] != 0
    ]


def affine_runs(
    coef: np.ndarray, *idx_arrays: np.ndarray
) -> List[Tuple[int, int, int, Tuple[int, ...]]]:
    """(y0, y1, coef, (idx0_at_y0, ...)) maximal runs where coef is constant
    and nonzero and every index array advances by exactly one per step."""
    Y = coef.shape[0]
    if Y == 0:
        return []
    brk = coef[1:] != coef[:-1]
    for a in idx_arrays:
        brk = brk | (a[1:] != a[:-1] + 1)
    brk = np.flatnonzero(brk) + 1
    starts = np.concatenate([[0], brk])
    ends = np.concatenate([brk, [Y]])
    return [
        (int(a), int(b), int(coef[a]), tuple(int(arr[a]) for arr in idx_arrays))
        for a, b in zip(starts, ends)
        if coef[a] != 0
    ]


def split_runs_by_block(runs, block: int):
    """Split affine runs so no run's FIRST index array crosses a multiple of
    `block` (per-poly slicing of the flat src space)."""
    out = []
    for y0, y1, c, bases in runs:
        a = y0
        src = bases[0]
        while a < y1:
            src_a = src + (a - y0)
            room = block - (src_a % block)
            b = min(y1, a + room)
            out.append((a, b, c, tuple(s + (a - y0) for s in bases)))
            a = b
    return out
