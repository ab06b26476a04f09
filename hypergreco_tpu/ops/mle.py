"""Dense multilinear-extension (MLE) tables on device.

Conventions (DESIGN.md §2, matching the reference's succinct subtable MLEs,
lasso/src/table/range.rs:19-26):
- A v-variable MLE is a length-2^v device vector; index bit i (LSB = bit 0)
  is variable i.
- Points are LSB-first lists of host ext scalars: point[i] <-> variable i.
- `evaluate` folds the MSB (top variable) first so each step operates on
  contiguous halves — the TPU-friendly layout.

Reference parity: `BoxMultilinearPoly` / `box_dense_poly` /
`MultilinearPoly::{num_vars, evaluate}` and `MultilinearPolynomial::eq_xy`
(SURVEY.md §2.2 "MLE poly library", "plonkish utilities").
"""

from __future__ import annotations

from functools import lru_cache

import jax

from .fe import Backend, get_backend


def num_vars(be: Backend, table) -> int:
    n = be.length(table)
    assert n & (n - 1) == 0
    return n.bit_length() - 1


def _point_to_device(be: Backend, point):
    """Host LSB-first point -> device ext vector of shape [len(point)]."""
    return be.from_ints([be.spec._c(r) for r in point], ext=True)


@lru_cache(maxsize=None)
def _dot_digest_jit(be_name: str, v: int, ext: bool):
    be = get_backend(be_name)

    def run(eq, table):
        return be.sum_digest(be.mul(eq, table))

    return jax.jit(run)


def evaluate(be: Backend, table, point) -> tuple:
    """Evaluate an MLE at an ext point; returns a host ext tuple.

    Computed as <eq(point, .), T> with a digest reduction: the naive
    fold-halving chain compiles pathologically on both XLA:CPU and the TPU
    backend (deep fused mul chains — see Backend.fusion_break), while the
    eq table and dot programs are shared and compile-bounded."""
    v = num_vars(be, table)
    assert len(point) == v, (len(point), v)
    if v == 0:
        val = be.to_host_scalar(table)
        return be.spec._c(val)
    eq = eq_table(be, point)
    dg = _dot_digest_jit(be.spec.name, v, be._mod(table) is be.ext)(eq, table)
    return be.spec._c(be.digest_value(dg))


@lru_cache(maxsize=None)
def _eq_table_jit(be_name: str, v: int):
    be = get_backend(be_name)
    N = 1 << v

    def run(point):
        import jax.numpy as jnp

        x = jnp.arange(N, dtype=jnp.uint32)
        prod = None
        # bit-product form: eq[x] = prod_j (x_j ? r_j : 1-r_j); fusion breaks
        # keep XLA:CPU compile time linear (see Backend.fusion_break)
        for j in range(v):
            r = be.index(point, j)
            one_minus = be.sub(be.ext.ones(()), r)
            f = be.select(((x >> j) & 1) == 1, r, one_minus)
            prod = f if prod is None else be.mul(prod, f)
            if (j + 1) % 3 == 0:
                prod = be.fusion_break(prod)
        return prod

    return jax.jit(run)


def eq_table(be: Backend, point):
    """eq(point, x) as a dense 2^v ext table (x in LSB-first index order)."""
    v = len(point)
    if v == 0:
        return be.from_ints([be.spec.one], ext=True)
    return _eq_table_jit(be.spec.name, v)(_point_to_device(be, point))


@lru_cache(maxsize=None)
def _fold_jit(be_name: str, v: int, ext: bool):
    be = get_backend(be_name)

    def run(table, r):
        lo, hi = be.halves(table)
        return be.add(lo, be.mul(r, be.sub(hi, lo)))

    return jax.jit(run)


def fold(be: Backend, table, r):
    """Bind the TOP variable (MSB) to host ext scalar r; halves the table."""
    v = num_vars(be, table)
    assert v >= 1
    rdev = be.scalar(be.spec._c(r), ext=True)
    return _fold_jit(be.spec.name, v, be._mod(table) is be.ext)(table, rdev)


def eval_host(spec, dense: list, point: list):
    """Host-side oracle: evaluate an int/ext-coefficient MLE at `point`."""
    vals = [spec._c(x) for x in dense]
    for r in reversed(point):
        r = spec._c(r)
        h = len(vals) // 2
        vals = [
            spec.eadd(vals[i], spec.emul(r, spec.esub(vals[h + i], vals[i])))
            for i in range(h)
        ]
    return vals[0]


def eq_eval(spec, x: list, y: list):
    """Host eq(x, y) = prod_i (x_i y_i + (1-x_i)(1-y_i))."""
    from ..utils import nverifier

    if nverifier.available(spec):
        return nverifier.eq_eval_spec(
            spec, [spec._c(c) for c in x], [spec._c(c) for c in y]
        )
    acc = spec.one
    for xi, yi in zip(x, y):
        xi, yi = spec._c(xi), spec._c(yi)
        t = spec.emul(xi, yi)
        u = spec.emul(spec.esub(spec.one, xi), spec.esub(spec.one, yi))
        acc = spec.emul(acc, spec.eadd(t, u))
    return acc
