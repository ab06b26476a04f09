"""Field kernel oracles: uint32-limb device ops vs Python-int ground truth."""

import random

import numpy as np

from hypergreco_tpu.ops import gl, glext
from hypergreco_tpu.ops.gl import P


def _rand_elems(n, rng):
    edge = [0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32, (1 << 32) + 1,
            P - (1 << 32), 0xFFFFFFFF_FFFFFFFF % P, (1 << 63) % P]
    vals = edge + [rng.randrange(P) for _ in range(n - len(edge))]
    return vals[:n]


def test_gl_add_sub_mul_vs_ints():
    rng = random.Random(0)
    n = 256
    xs = _rand_elems(n, rng)
    ys = list(reversed(_rand_elems(n, rng)))
    a = gl.from_ints(xs)
    b = gl.from_ints(ys)

    assert gl.to_ints(gl.add(a, b)) == [(x + y) % P for x, y in zip(xs, ys)]
    assert gl.to_ints(gl.sub(a, b)) == [(x - y) % P for x, y in zip(xs, ys)]
    assert gl.to_ints(gl.mul(a, b)) == [(x * y) % P for x, y in zip(xs, ys)]
    assert gl.to_ints(gl.neg(a)) == [(-x) % P for x in xs]
    assert gl.to_ints(gl.sqr(a)) == [(x * x) % P for x in xs]


def test_gl_scale_pow_inv():
    rng = random.Random(1)
    xs = [rng.randrange(1, P) for _ in range(32)]
    a = gl.from_ints(xs)
    c = rng.randrange(P)
    assert gl.to_ints(gl.scale(a, c)) == [(x * c) % P for x in xs]
    assert gl.to_ints(gl.pow_const(a, 5)) == [pow(x, 5, P) for x in xs]
    assert gl.to_ints(gl.inv(a)) == [pow(x, P - 2, P) for x in xs]


def test_gl_roots_of_unity():
    for order in [2, 8, 1 << 12]:
        w = gl.root_of_unity(order)
        assert pow(w, order, P) == 1
        assert pow(w, order // 2, P) == P - 1  # primitive


def _emul_int(x, y):
    return ((x[0] * y[0] + 7 * x[1] * y[1]) % P, (x[0] * y[1] + x[1] * y[0]) % P)


def test_gl2_ops_vs_ints():
    rng = random.Random(2)
    n = 64
    xs = [(rng.randrange(P), rng.randrange(P)) for _ in range(n)]
    ys = [(rng.randrange(P), rng.randrange(P)) for _ in range(n)]
    a = glext.from_ints(xs)
    b = glext.from_ints(ys)

    got = glext.to_tuples(glext.mul(a, b))
    exp = [_emul_int(x, y) for x, y in zip(xs, ys)]
    assert got == exp

    got = glext.to_tuples(glext.add(a, b))
    assert got == [((x[0] + y[0]) % P, (x[1] + y[1]) % P) for x, y in zip(xs, ys)]

    # host scalar ext ops agree with device
    for x, y in zip(xs[:8], ys[:8]):
        assert glext.emul(x, y) == _emul_int(x, y)
        xi = glext.einv(x)
        assert glext.emul(x, xi) == (1, 0)
    # epow
    x = xs[0]
    acc = (1, 0)
    for _ in range(7):
        acc = glext.emul(acc, x)
    assert glext.epow(x, 7) == acc


def test_gl2_mul_base_and_promote():
    rng = random.Random(3)
    xs = [(rng.randrange(P), rng.randrange(P)) for _ in range(16)]
    bs = [rng.randrange(P) for _ in range(16)]
    a = glext.from_ints(xs)
    b = gl.from_ints(bs)
    got = glext.to_tuples(glext.mul_base(a, b))
    assert got == [((x[0] * c) % P, (x[1] * c) % P) for x, c in zip(xs, bs)]

    pb = glext.from_base(b)
    assert glext.to_tuples(pb) == [(c, 0) for c in bs]


def test_from_u64_roundtrip():
    xs = np.array([0, 1, P - 1, 12345678901234567], dtype=np.uint64)
    a = gl.from_u64(xs)
    assert list(gl.to_u64(a)) == list(xs)
