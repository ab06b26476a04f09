"""Closed-form wiring evaluation vs brute-force oracles."""

import random

import numpy as np
import pytest

from hypergreco_tpu.fields import BN254_FR, GOLDILOCKS
from hypergreco_tpu.gkr import wiring_eval as we
from hypergreco_tpu.ops import mle


def _rand_ext(spec, rng):
    return tuple(rng.randrange(spec.p) for _ in range(spec.ext_degree))


def _rand_point(spec, rng, v):
    return [_rand_ext(spec, rng) for _ in range(v)]


def _brute(spec, pairs, lo, hi):
    acc = spec.zero
    for y in range(lo, hi):
        term = spec.one
        for pt, off in pairs:
            bits = [spec.ext((y + off) >> b & 1) for b in range(len(pt))]
            term = spec.emul(term, mle.eq_eval(spec, pt, bits))
        acc = spec.eadd(acc, term)
    return acc


@pytest.mark.parametrize("spec", [GOLDILOCKS, BN254_FR], ids=["gl", "bn254"])
def test_eq_affine_sum_oracle(spec):
    rng = random.Random(11)
    cases = [
        # (point lens, offsets, lo, hi)
        ([5], [0], 0, 32),
        ([5], [0], 3, 29),
        ([5, 4], [0, -8], 8, 24),  # second point shorter, shifted
        ([6, 6], [0, 16], 5, 37),
        ([6, 5, 5], [0, -4, 12], 4, 20),
        ([4], [7], 0, 9),  # odd offset: degenerate single blocks
        ([3], [0], 0, 1),
        ([0], [0], 0, 1),  # empty point
    ]
    for lens, offs, lo, hi in cases:
        pairs = [(_rand_point(spec, rng, v), off) for v, off in zip(lens, offs)]
        # keep args in range
        ok = all(
            0 <= y + off < (1 << len(pt))
            for pt, off in pairs
            for y in range(lo, hi)
        )
        assert ok, (lens, offs, lo, hi)
        got = we.eq_affine_sum(spec, pairs, lo, hi)
        assert got == _brute(spec, pairs, lo, hi), (lens, offs, lo, hi)


def test_runs_extraction():
    coef = np.array([0, 1, 1, 1, 2, 2, 0, 5], dtype=np.uint64)
    src = np.array([9, 4, 5, 6, 7, 8, 0, 3], dtype=np.int64)
    runs = we.affine_runs(coef, src)
    assert runs == [(1, 4, 1, (4,)), (4, 6, 2, (7,)), (7, 8, 5, (3,))]

    const = np.array([0, 3, 3, 7, 0, 0, 2, 2], dtype=np.uint64)
    assert we.const_runs(const) == [(1, 3, 3), (3, 4, 7), (6, 8, 2)]


def test_split_runs_by_block():
    # one run crossing a block boundary at multiples of 4 in src space
    runs = [(10, 16, 1, (2, 100))]
    out = we.split_runs_by_block(runs, 4)
    assert out == [
        (10, 12, 1, (2, 100)),
        (12, 16, 1, (4, 102)),
    ]
    # non-crossing run unchanged
    assert we.split_runs_by_block([(0, 4, 9, (4,))], 4) == [(0, 4, 9, (4,))]
