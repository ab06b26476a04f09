"""Batched grand-product argument (GKR product tree, Thaler'13 style).

Proves, for M same-length leaf vectors v_i of size L = 2^(num_vars), the
products P_i = prod_x v_i(x), reducing to a single claimed evaluation of
each leaf MLE at a common point.

Tree orientation: layer l has 2^l values per memory;
    W_l(x) = W_{l+1}(x || 0) * W_{l+1}(x || 1)
with the split bit appended as the new MSB (reference parity: the claim
point grows by `x.push(mu)` — memory_checking/prover.rs:261-263; here points
are LSB-first lists so appending mu at the END is the new top variable).

Protocol per tree (self-defined message format; the reference fork is
offline — SURVEY.md §2.2 ⚠):
 1. prover writes the M roots; squeeze batching challenge alpha.
 2. layer 0: prover writes (W_1,i(0), W_1,i(1)) per memory; verifier checks
    root_i = L_i * R_i; squeeze mu; claims c_i = L_i + mu*(R_i - L_i),
    point = [mu].
 3. layer l = 1..num_vars-1: batched degree-3 sumcheck of
        sum_i alpha^i c_i = sum_x eq(r_l, x) * sum_i alpha^i L_i(x) R_i(x)
    via the generic engine; prover then writes the 2M final evals
    (L_i(s), R_i(s)); verifier recomputes eq(r_l, s) and checks the claim;
    squeeze mu; fold claims; point = s || mu.
 4. returns (products, point, per-memory leaf-MLE claims).

TPU mapping: every layer's sumcheck runs in shared padded buffers of size
L/2 with the engine's active-prefix mechanism, so the whole tree costs ONE
compiled round-program per memory count M. The tree itself is built in one
jitted program whose per-level outputs are materialized (returning each
level defeats XLA's exponential producer re-execution, see sumcheck.py).

Reference parity: prove_grand_product / verify_grand_product
(memory_checking/prover.rs:158-295, verifier.rs:130-235, SURVEY.md §2.5).
"""

from __future__ import annotations

from functools import lru_cache

import jax

from ..fields import FieldSpec
from ..ops import mle
from ..ops.fe import Backend, get_backend
from .sumcheck import SumcheckExpr, Term, prove_sum_check, verify_sum_check


@lru_cache(maxsize=None)
def _build_layers_jit(be_name: str, m: int, logl: int, ext: bool):
    """leaves list [M x [L]] -> (levels, roots): levels[j] = list of M [2^l]
    arrays for l = logl-1 .. 1; roots = M scalars. Each level is an output,
    hence materialized."""
    be = get_backend(be_name)

    def run(leaves):
        levels = []
        cur = leaves
        size = 1 << logl
        while size > 2:
            size //= 2
            cur = [
                be.mul(
                    jax.tree.map(lambda a: a[:size], T),
                    jax.tree.map(lambda a: a[size:], T),
                )
                for T in cur
            ]
            levels.append(cur)
        roots = [be.mul(be.index(T, 0), be.index(T, 1)) for T in cur]
        return levels, roots

    return jax.jit(run)


@lru_cache(maxsize=None)
def _pad_jit(be_name: str, n: int, target: int, ext: bool):
    be = get_backend(be_name)

    def run(T):
        z = (be.ext if ext else be.base).zeros((target - n,))
        return be.concat([T, z])

    return jax.jit(run)


def _pad_to(be: Backend, T, target: int):
    n = be.length(T)
    if n == target:
        return T
    return _pad_jit(be.spec.name, n, target, be._mod(T) is be.ext)(T)


def _gp_expr(m: int) -> SumcheckExpr:
    # tables: [eq, L_0, R_0, .., L_{m-1}, R_{m-1}]; term i: alpha^i eq L_i R_i
    return SumcheckExpr(
        [Term(i, (0, 2 * i + 1, 2 * i + 2)) for i in range(m)], 2 * m + 1
    )


def prove_grand_product(be: Backend, leaves, transcript):
    """leaves: list of M device vectors, all length L = 2^v, v >= 1.
    Returns (products, point, claims): per-memory leaf-MLE eval claims at
    `point` (LSB-first, length v). Claims/products are host ext tuples."""
    spec = be.spec
    m = len(leaves)
    v = mle.num_vars(be, leaves[0])
    assert v >= 1
    assert all(mle.num_vars(be, T) == v for T in leaves)

    levels, roots_dev = _build_layers_jit(
        spec.name, m, v, be._mod(leaves[0]) is be.ext
    )(leaves)
    # levels[j] has per-memory size 2^(v-1-j); reorder as W_l by l
    by_l = {v - 1 - j: lvl for j, lvl in enumerate(levels)}
    by_l[v] = leaves

    products = [spec._c(be.to_host_scalar(be.reshape(r, (1,)))) for r in roots_dev]
    transcript.write_felts_ext(products)
    alpha = transcript.squeeze_challenge()

    # layer 0: W_1 values directly (W_1 = by_l[1]; for v == 1, leaves)
    w1 = by_l[1]
    lr = []
    for T in w1:
        tv = be.to_host(T)
        lr.append((spec._c(tv[0]), spec._c(tv[1])))
    for l_, r_ in lr:
        transcript.write_felt_ext(l_)
        transcript.write_felt_ext(r_)
    mu = transcript.squeeze_challenge()
    claims = [
        spec.eadd(l_, spec.emul(mu, spec.esub(r_, l_))) for (l_, r_) in lr
    ]
    point = [mu]

    expr = _gp_expr(m)
    buf = 1 << max(v - 1, 1)
    for l in range(1, v):
        alphas = [spec.epow(alpha, i) for i in range(m)]
        batched = spec.zero
        for i in range(m):
            batched = spec.eadd(batched, spec.emul(alphas[i], claims[i]))
        eq = _pad_to(be, mle.eq_table(be, point), buf)
        tables = [eq]
        for T in by_l[l + 1]:
            half = 1 << l
            lo = jax.tree.map(lambda a: a[:half], T)
            hi = jax.tree.map(lambda a: a[half:], T)
            tables.append(_pad_to(be, lo, buf))
            tables.append(_pad_to(be, hi, buf))
        fclaim, s, fevals = prove_sum_check(
            be, expr, alphas, batched, tables, transcript, num_vars=l
        )
        transcript.write_felts_ext(fevals[1:])  # L_i, R_i; eq is recomputable
        mu = transcript.squeeze_challenge()
        claims = [
            spec.eadd(
                spec._c(fevals[1 + 2 * i]),
                spec.emul(
                    mu,
                    spec.esub(
                        spec._c(fevals[2 + 2 * i]), spec._c(fevals[1 + 2 * i])
                    ),
                ),
            )
            for i in range(m)
        ]
        point = s + [mu]

    return products, point, claims


def verify_grand_product(spec: FieldSpec, m: int, num_vars: int, transcript):
    """Mirror of prove_grand_product. Returns (products, point, claims).
    Raises ValueError on any inconsistency."""
    v = num_vars
    products = transcript.read_felts_ext(m)
    alpha = transcript.squeeze_challenge()

    lr = [
        (transcript.read_felt_ext(), transcript.read_felt_ext())
        for _ in range(m)
    ]
    for i, (l_, r_) in enumerate(lr):
        if spec.emul(l_, r_) != spec._c(products[i]):
            raise ValueError(f"grand product: root {i} mismatch")
    mu = transcript.squeeze_challenge()
    claims = [spec.eadd(l_, spec.emul(mu, spec.esub(r_, l_))) for (l_, r_) in lr]
    point = [mu]

    for l in range(1, v):
        alphas = [spec.epow(alpha, i) for i in range(m)]
        batched = spec.zero
        for i in range(m):
            batched = spec.eadd(batched, spec.emul(alphas[i], claims[i]))
        fclaim, s = verify_sum_check(spec, 3, l, batched, transcript)
        evals = transcript.read_felts_ext(2 * m)
        eq = mle.eq_eval(spec, point, s)
        acc = spec.zero
        for i in range(m):
            acc = spec.eadd(
                acc,
                spec.emul(
                    alphas[i],
                    spec.emul(eq, spec.emul(evals[2 * i], evals[2 * i + 1])),
                ),
            )
        if acc != fclaim:
            raise ValueError(f"grand product: layer {l} claim mismatch")
        mu = transcript.squeeze_challenge()
        claims = [
            spec.eadd(
                evals[2 * i],
                spec.emul(mu, spec.esub(evals[2 * i + 1], evals[2 * i])),
            )
            for i in range(m)
        ]
        point = s + [mu]

    return products, point, claims
