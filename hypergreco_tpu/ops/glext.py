"""GoldilocksExt2 = GF(p^2) = F[w] / (w^2 - 7).

Same tower as the reference's `goldilocks` crate (GoldilocksExt2) and plonky2.
Device representation: ``GL2(a0, a1)`` with each coefficient a ``GL`` pair.
Host scalars: 2-tuples of Python ints.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import gl
from .gl import GL, P

W = 7  # non-residue: w^2 = 7
DEGREE = 2


class GL2(NamedTuple):
    a0: GL
    a1: GL

    @property
    def shape(self):
        return self.a0.lo.shape

    def __len__(self):
        return self.a0.lo.shape[0]


def from_base(a: GL) -> GL2:
    return GL2(a, gl.zeros(a.lo.shape))


def add(x: GL2, y: GL2) -> GL2:
    return GL2(gl.add(x.a0, y.a0), gl.add(x.a1, y.a1))


def sub(x: GL2, y: GL2) -> GL2:
    return GL2(gl.sub(x.a0, y.a0), gl.sub(x.a1, y.a1))


def neg(x: GL2) -> GL2:
    return GL2(gl.neg(x.a0), gl.neg(x.a1))


def mul(x: GL2, y: GL2) -> GL2:
    # Karatsuba: t0 = a0*b0, t1 = a1*b1, t2 = (a0+a1)(b0+b1)
    t0 = gl.mul(x.a0, y.a0)
    t1 = gl.mul(x.a1, y.a1)
    t2 = gl.mul(gl.add(x.a0, x.a1), gl.add(y.a0, y.a1))
    c0 = gl.add(t0, gl.scale(t1, W))
    c1 = gl.sub(t2, gl.add(t0, t1))
    return GL2(c0, c1)


def mul_base(x: GL2, b: GL) -> GL2:
    return GL2(gl.mul(x.a0, b), gl.mul(x.a1, b))


def sqr(x: GL2) -> GL2:
    return mul(x, x)


def zeros(shape) -> GL2:
    return GL2(gl.zeros(shape), gl.zeros(shape))


def ones(shape) -> GL2:
    return GL2(gl.ones(shape), gl.zeros(shape))


def select(mask, x: GL2, y: GL2) -> GL2:
    return GL2(gl.select(mask, x.a0, y.a0), gl.select(mask, x.a1, y.a1))


def scale(x: GL2, c) -> GL2:
    """Multiply by a host scalar: int (base) or (int, int) ext tuple."""
    if isinstance(c, tuple):
        return mul(x, splat(x.shape, c))
    return GL2(gl.scale(x.a0, c), gl.scale(x.a1, c))


def splat(shape, c) -> GL2:
    c0, c1 = _as_ext(c)
    return GL2(gl.full(shape, c0), gl.full(shape, c1))


def scalar(c) -> GL2:
    c0, c1 = _as_ext(c)
    return GL2(gl.scalar(c0), gl.scalar(c1))


def from_ints(xs) -> GL2:
    """From a list of (a0, a1) int tuples (or plain ints = base elements)."""
    pairs = [_as_ext(x) for x in xs]
    return GL2(gl.from_ints([p[0] for p in pairs]), gl.from_ints([p[1] for p in pairs]))


def to_tuples(x: GL2) -> list:
    lo = gl.to_ints(x.a0)
    hi = gl.to_ints(x.a1)
    return list(zip(lo, hi))


def _as_ext(c):
    if isinstance(c, tuple):
        return (c[0] % P, c[1] % P)
    return (int(c) % P, 0)


# ---------------------------------------------------------------------------
# host scalar ext field: elements are (a0, a1) int tuples
# ---------------------------------------------------------------------------

EXT_ZERO = (0, 0)
EXT_ONE = (1, 0)


def eadd(x, y):
    x, y = _as_ext(x), _as_ext(y)
    return ((x[0] + y[0]) % P, (x[1] + y[1]) % P)


def esub(x, y):
    x, y = _as_ext(x), _as_ext(y)
    return ((x[0] - y[0]) % P, (x[1] - y[1]) % P)


def emul(x, y):
    x, y = _as_ext(x), _as_ext(y)
    return (
        (x[0] * y[0] + W * x[1] * y[1]) % P,
        (x[0] * y[1] + x[1] * y[0]) % P,
    )


def eneg(x):
    x = _as_ext(x)
    return ((-x[0]) % P, (-x[1]) % P)


def einv(x):
    # (a0 + a1 w)^-1 = (a0 - a1 w) / (a0^2 - 7 a1^2)
    x = _as_ext(x)
    d = (x[0] * x[0] - W * x[1] * x[1]) % P
    di = pow(d, P - 2, P)
    return ((x[0] * di) % P, (-x[1] * di) % P)


def epow(x, e: int):
    r = EXT_ONE
    b = _as_ext(x)
    while e > 0:
        if e & 1:
            r = emul(r, b)
        e >>= 1
        b = emul(b, b)
    return r
