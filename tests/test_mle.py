"""MLE table ops vs host-int oracles (SURVEY.md §4: kernel-oracle pattern)."""

import random

from hypergreco_tpu.ops import mle
from hypergreco_tpu.ops.fe import get_backend

BE = get_backend("goldilocks")
SPEC = BE.spec


def rand_ext(rng):
    return (rng.randrange(SPEC.p), rng.randrange(SPEC.p))


def test_evaluate_base_table_matches_host():
    rng = random.Random(1)
    v = 5
    dense = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    point = [rand_ext(rng) for _ in range(v)]
    table = BE.from_ints(dense)
    got = mle.evaluate(BE, table, point)
    want = mle.eval_host(SPEC, dense, point)
    assert got == want


def test_evaluate_ext_table_matches_host():
    rng = random.Random(2)
    v = 4
    dense = [rand_ext(rng) for _ in range(1 << v)]
    point = [rand_ext(rng) for _ in range(v)]
    table = BE.from_ints(dense, ext=True)
    assert mle.evaluate(BE, table, point) == mle.eval_host(SPEC, dense, point)


def test_evaluate_at_boolean_point_indexes_table():
    rng = random.Random(3)
    v = 6
    dense = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    table = BE.from_ints(dense)
    idx = rng.randrange(1 << v)
    # LSB-first: point[i] = bit i of idx
    point = [SPEC.ext((idx >> i) & 1) for i in range(v)]
    assert mle.evaluate(BE, table, point) == SPEC.ext(dense[idx])


def test_eq_table_matches_pointwise_eq():
    rng = random.Random(4)
    v = 4
    r = [rand_ext(rng) for _ in range(v)]
    tab = mle.eq_table(BE, r)
    vals = BE.to_host(tab)
    for x in range(1 << v):
        xbits = [SPEC.ext((x >> i) & 1) for i in range(v)]
        assert vals[x] == mle.eq_eval(SPEC, r, xbits), x


def test_eq_table_inner_product_evaluates_mle():
    """<eq(r, .), T> == T~(r) — the identity sumcheck relies on."""
    rng = random.Random(5)
    v = 5
    dense = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    r = [rand_ext(rng) for _ in range(v)]
    eq_vals = BE.to_host(mle.eq_table(BE, r))
    acc = SPEC.zero
    for x in range(1 << v):
        acc = SPEC.eadd(acc, SPEC.emul(eq_vals[x], SPEC.ext(dense[x])))
    assert acc == mle.eval_host(SPEC, dense, r)


def test_fold_binds_msb():
    rng = random.Random(6)
    v = 5
    dense = [rng.randrange(SPEC.p) for _ in range(1 << v)]
    point = [rand_ext(rng) for _ in range(v)]
    table = BE.from_ints(dense)
    # fold binds the top variable; remaining point is point[:-1]
    folded = mle.fold(BE, table, point[-1])
    assert mle.evaluate(BE, folded, point[:-1]) == mle.eval_host(
        SPEC, dense, point
    )


def test_backend_sum():
    rng = random.Random(7)
    dense = [rng.randrange(SPEC.p) for _ in range(64)]
    table = BE.from_ints(dense)
    got = BE.to_host_scalar(BE.sum(table))
    assert got == sum(dense) % SPEC.p
