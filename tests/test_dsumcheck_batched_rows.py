"""CPU parity for the BATCHED [n, N] row-table kernels.

Production grouped programs on TPU run eq_rows/dft_rows in batched form
(dsumcheck.batched_rows_ok), but CPU CI always took the 1-D fallback, so
the batched forms had zero automated parity coverage (ADVICE r4). The
known XLA:CPU hazard is slicing+adding FUSED 2-D broadcast chains inside
fold bodies (dsumcheck.py:415-420); materializing the alpha-combined
TABLES directly, as these tests do, is safe — the [n, N] producer alone
never deadlocked (scratch/t_dft_b3.py history)."""

import random

import jax
import numpy as np
import pytest

from hypergreco_tpu.gkr import dsumcheck as dsc
from hypergreco_tpu.ops import ntt
from hypergreco_tpu.ops.fe import get_backend

BE = get_backend("goldilocks")
SPEC = BE.spec


def _pts_dev(points):
    v = len(points[0])
    pts = BE.from_ints([SPEC._c(r) for pt in points for r in pt], ext=True)
    return BE.reshape(pts, (len(points), v))


def _al_dev(alphas):
    return BE.from_ints([SPEC._c(a) for a in alphas], ext=True)


def _ext_host(x):
    return [tuple(int(c) for c in t) if isinstance(t, tuple) else t
            for t in BE.to_host(x)]


@pytest.mark.parametrize("npts", [1, 2])
def test_eq_rlc_batched_vs_fallback(monkeypatch, npts):
    rng = random.Random(31)
    v = 5
    points = [
        [(rng.randrange(SPEC.p), rng.randrange(SPEC.p)) for _ in range(v)]
        for _ in range(npts)
    ]
    alphas = [(rng.randrange(SPEC.p), rng.randrange(SPEC.p)) for _ in range(npts)]
    pts, al = _pts_dev(points), _al_dev(alphas)

    monkeypatch.setattr(dsc, "batched_rows_ok", lambda: False)
    base = jax.block_until_ready(dsc.eq_rlc(BE, pts, al, v, npts))
    monkeypatch.setattr(dsc, "batched_rows_ok", lambda: True)
    batched = jax.block_until_ready(dsc.eq_rlc(BE, pts, al, v, npts))
    assert _ext_host(base) == _ext_host(batched)


@pytest.mark.parametrize("B,npts", [(2, 1), (3, 2)])
def test_eq_rlc_grouped_batched_vs_fallback(monkeypatch, B, npts):
    rng = random.Random(32)
    v = 4
    points = [
        [(rng.randrange(SPEC.p), rng.randrange(SPEC.p)) for _ in range(v)]
        for _ in range(B * npts)
    ]
    alphas = [
        (rng.randrange(SPEC.p), rng.randrange(SPEC.p)) for _ in range(B * npts)
    ]
    pts = BE.reshape(_pts_dev(points), (B, npts, v))
    al = _al_dev(alphas)

    monkeypatch.setattr(dsc, "batched_rows_ok", lambda: False)
    base = jax.block_until_ready(dsc.eq_rlc_grouped(BE, pts, al, v, B, npts))
    monkeypatch.setattr(dsc, "batched_rows_ok", lambda: True)
    batched = jax.block_until_ready(
        dsc.eq_rlc_grouped(BE, pts, al, v, B, npts)
    )
    for b in range(B):
        row_a = jax.tree.map(lambda a, b=b: a[b], base)
        row_b = jax.tree.map(lambda a, b=b: a[b], batched)
        assert _ext_host(row_a) == _ext_host(row_b)


@pytest.mark.parametrize("npts,inverse", [(1, False), (2, True)])
def test_dft_row_mle_batched_vs_fallback(monkeypatch, npts, inverse):
    rng = random.Random(33)
    logl = 4
    points = [
        [(rng.randrange(SPEC.p), rng.randrange(SPEC.p)) for _ in range(logl)]
        for _ in range(npts)
    ]
    alphas = [(rng.randrange(SPEC.p), rng.randrange(SPEC.p)) for _ in range(npts)]
    pts, al = _pts_dev(points), _al_dev(alphas)
    wtab = ntt._wpow_table(SPEC.name, 1 << logl, inverse)

    monkeypatch.setattr(dsc, "batched_rows_ok", lambda: False)
    base = jax.block_until_ready(
        ntt.dft_row_mle_body(BE, pts, al, wtab, logl, inverse, npts)
    )
    monkeypatch.setattr(dsc, "batched_rows_ok", lambda: True)
    batched = jax.block_until_ready(
        ntt.dft_row_mle_body(BE, pts, al, wtab, logl, inverse, npts)
    )
    assert _ext_host(base) == _ext_host(batched)
