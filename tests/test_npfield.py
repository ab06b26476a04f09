"""Oracle tests: numpy host field ops vs Python-int arithmetic."""

import random

import numpy as np
import pytest

from hypergreco_tpu.fields import BN254_FR, GOLDILOCKS
from hypergreco_tpu.ops import mle
from hypergreco_tpu.utils.npfield import NpField


@pytest.mark.parametrize("spec", [GOLDILOCKS, BN254_FR], ids=["gl", "bn254"])
def test_base_ops_oracle(spec):
    f = NpField.for_spec(spec)
    rng = random.Random(7)
    p = spec.p
    edge = [0, 1, p - 1, p - 2, (1 << 32) - 1, 1 << 32, (1 << 63)]
    xs = [e % p for e in edge] + [rng.randrange(p) for _ in range(200)]
    ys = [e % p for e in reversed(edge)] + [rng.randrange(p) for _ in range(200)]
    a = f.base.from_ints(xs)
    b = f.base.from_ints(ys)
    assert f.base.to_ints(f.base.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert f.base.to_ints(f.base.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert f.base.to_ints(f.base.mul(a, b)) == [(x * y) % p for x, y in zip(xs, ys)]
    assert f.base.to_ints(f.base.neg(a)) == [(-x) % p for x in xs]
    assert f.base.to_ints(f.base.scale(a, 7)) == [7 * x % p for x in xs]
    assert f.base.sum(a) == sum(xs) % p


@pytest.mark.parametrize("spec", [GOLDILOCKS, BN254_FR], ids=["gl", "bn254"])
def test_ext_ops_oracle(spec):
    f = NpField.for_spec(spec)
    rng = random.Random(8)
    xs = [tuple(rng.randrange(spec.p) for _ in range(spec.ext_degree)) for _ in range(64)]
    ys = [tuple(rng.randrange(spec.p) for _ in range(spec.ext_degree)) for _ in range(64)]
    a = f.ext_from_tuples(xs)
    b = f.ext_from_tuples(ys)
    got_mul = [f.base.to_ints(c) for c in f.emul(a, b)]
    got_add = [f.base.to_ints(c) for c in f.eadd(a, b)]
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert tuple(c[i] for c in got_mul) == spec.emul(x, y)
        assert tuple(c[i] for c in got_add) == spec.eadd(x, y)
    assert f.esum(a) == _sum_ext(spec, xs)


def _sum_ext(spec, xs):
    acc = spec.zero
    for x in xs:
        acc = spec.eadd(acc, x)
    return acc


@pytest.mark.parametrize("spec", [GOLDILOCKS, BN254_FR], ids=["gl", "bn254"])
def test_eq_table_and_mle_eval(spec):
    f = NpField.for_spec(spec)
    rng = random.Random(9)
    v = 5
    point = [
        tuple(rng.randrange(spec.p) for _ in range(spec.ext_degree))
        for _ in range(v)
    ]
    eq = [f.base.to_ints(c) for c in f.eq_table(point)]
    for x in [0, 1, 17, 31]:
        want = mle.eq_eval(spec, point, [spec.ext(int(b)) for b in _bits(x, v)])
        assert tuple(c[x] for c in eq) == want
    dense = [rng.randrange(spec.p) for _ in range(1 << v)]
    got = f.mle_eval_ints(dense, point)
    assert got == mle.eval_host(spec, dense, point)


def _bits(x, v):
    return [(x >> i) & 1 for i in range(v)]


@pytest.mark.parametrize("spec", [GOLDILOCKS, BN254_FR], ids=["gl", "bn254"])
@pytest.mark.parametrize("inverse", [False, True])
def test_d_table_matches_definition(spec, inverse):
    """d(j) = sum_i alpha_i prod_b ((1-r_ib) + r_ib w^(j 2^b)) (scaled)."""
    f = NpField.for_spec(spec)
    rng = random.Random(10)
    logl = 4
    L = 1 << logl
    p = spec.p
    pts = [
        [tuple(rng.randrange(p) for _ in range(spec.ext_degree)) for _ in range(logl)]
        for _ in range(2)
    ]
    alphas = [
        tuple(rng.randrange(p) for _ in range(spec.ext_degree)) for _ in range(2)
    ]
    got = [f.base.to_ints(c) for c in f.d_table(pts, alphas, logl, inverse)]
    w = spec.root_of_unity(L)
    if inverse:
        w = pow(w, p - 2, p)
    for j in range(L):
        acc = spec.zero
        for pt, al in zip(pts, alphas):
            prod = spec.one
            for b in range(logl):
                wjb = pow(w, (j << b) % L, p)
                prod = spec.emul(
                    prod,
                    spec.eadd(
                        spec.esub(spec.one, pt[b]), spec.escale(pt[b], wjb)
                    ),
                )
            acc = spec.eadd(acc, spec.emul(al, prod))
        if inverse:
            acc = spec.escale(acc, pow(L, p - 2, p))
        assert tuple(c[j] for c in got) == acc
