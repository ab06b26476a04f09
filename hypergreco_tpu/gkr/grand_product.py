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
    """leaves list [M x [L]] -> (levels, roots): levels[j] = list of M arrays
    for l = logl-1 .. 1, each PRE-PADDED to the shared sumcheck buffer size
    L/2 (padding is a jit-output materialization boundary — cheap); roots =
    M scalars."""
    be = get_backend(be_name)
    import jax.numpy as jnp

    buf = 1 << max(logl - 1, 1)

    def pad(T, size):
        if size == buf:
            return T
        return jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((buf - size,), dtype=a.dtype)]
            ),
            T,
        )

    def run(leaves):
        # layers[j] = [(L_i, R_i) padded to buf] for l = logl-1 down to 1,
        # where (L, R) are the halves of W_{l+1}
        layers = []
        cur = leaves
        size = 1 << logl
        while size > 2:
            half = size // 2
            Ls = [jax.tree.map(lambda a: a[:half], T) for T in cur]
            Rs = [jax.tree.map(lambda a: a[half:], T) for T in cur]
            layers.append(
                [(pad(L, half), pad(R, half)) for L, R in zip(Ls, Rs)]
            )
            cur = [be.mul(L, R) for L, R in zip(Ls, Rs)]
            size = half
        w1 = cur  # W_1: two values per memory
        roots = [be.mul(be.index(T, 0), be.index(T, 1)) for T in cur]
        return layers, w1, roots

    return jax.jit(run)


@lru_cache(maxsize=None)
def _eq_dyn_jit(be_name: str, bufv: int):
    """eq(point[:plen], x) over the first 2^plen entries of a [2^bufv]
    buffer (garbage beyond — the engine masks): one program for ALL layer
    sizes. Factors j >= plen are forced to 1 via a traced comparison."""
    be = get_backend(be_name)
    import jax.numpy as jnp

    N = 1 << bufv

    def run(point, plen):
        x = jnp.arange(N, dtype=jnp.uint32)
        prod = None
        for j in range(bufv):
            rj = be.index(point, j)
            one_minus = be.sub(be.ext.ones(()), rj)
            f = be.select(((x >> j) & 1) == 1, rj, one_minus)
            f = be.select(jnp.asarray(j) < plen, f, be.ext.ones((N,)))
            prod = f if prod is None else be.mul(prod, f)
            if (j + 1) % 3 == 0:
                prod = be.fusion_break(prod)
        return prod

    return jax.jit(run)


def _eq_dyn(be: Backend, point, bufv: int):
    import jax.numpy as jnp

    spec = be.spec
    padded = list(point) + [spec.zero] * (bufv - len(point))
    pts = be.from_ints([spec._c(r) for r in padded], ext=True)
    return _eq_dyn_jit(spec.name, bufv)(pts, jnp.int32(len(point)))


def _gp_expr(m: int) -> SumcheckExpr:
    # tables: [eq, L_0, R_0, .., L_{m-1}, R_{m-1}]; term i: alpha^i eq L_i R_i
    return SumcheckExpr(
        [Term(i, (0, 2 * i + 1, 2 * i + 2)) for i in range(m)], 2 * m + 1
    )


def prove_grand_product(be: Backend, leaves, transcript, mesh=None):
    """leaves: list of M device vectors, all length L = 2^v, v >= 1.
    Returns (products, point, claims): per-memory leaf-MLE eval claims at
    `point` (LSB-first, length v). Claims/products are host ext tuples."""
    spec = be.spec
    m = len(leaves)
    v = mle.num_vars(be, leaves[0])
    assert v >= 1
    assert all(mle.num_vars(be, T) == v for T in leaves)

    layers, w1, roots_dev = _build_layers_jit(
        spec.name, m, v, be._mod(leaves[0]) is be.ext
    )(leaves)
    # layers[j] = per-memory (L, R) halves of W_{l+1} for l = v-1-j
    by_l = {v - 1 - j: lvl for j, lvl in enumerate(layers)}

    products = [spec._c(be.to_host_scalar(be.reshape(r, (1,)))) for r in roots_dev]
    transcript.write_felts_ext(products)
    alpha = transcript.squeeze_challenge()

    # layer 0: W_1 values directly
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

    from ..runtime import sanity_enabled

    if sanity_enabled():  # root cross-check (prover.rs:207-211 parity)
        for i, (l_, r_) in enumerate(lr):
            if spec.emul(l_, r_) != products[i]:
                raise AssertionError(
                    f"sanity: grand-product root {i} != W1(0)*W1(1)"
                )

    expr = _gp_expr(m)
    bufv = max(v - 1, 1)
    alphas = spec.epowers(alpha, m)
    for l in range(1, v):
        batched = spec.zero
        for i in range(m):
            batched = spec.eadd(batched, spec.emul(alphas[i], claims[i]))
        tables = [_eq_dyn(be, point, bufv)]
        for lo, hi in by_l[l]:
            tables.append(lo)
            tables.append(hi)
        fclaim, s, fevals = prove_sum_check(
            be, expr, alphas, batched, tables, transcript, num_vars=l,
            mesh=mesh,
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

    alphas = spec.epowers(alpha, m)

    from ..utils import nverifier

    ops = nverifier.gp_ops(spec)
    if ops is not None and hasattr(transcript, "read_felts_np"):
        # native fast path: the 6m scalar ext muls per layer (batching, the
        # layer claim check and the next-claim mix) run in C over the m
        # instances; transcript schedule is identical to the scalar path
        al = ops.pack([spec._c(a) for a in alphas])
        cl = ops.pack([spec._c(c) for c in claims])
        for l in range(1, v):
            batched = ops.dot(al, cl)
            fclaim, s = verify_sum_check(spec, 3, l, batched, transcript)
            ev = transcript.read_felts_np(2 * m * spec.ext_degree)
            eq = mle.eq_eval(spec, point, s)
            acc = spec.emul(eq, ops.dot3(al, ev))
            if acc != fclaim:
                raise ValueError(f"grand product: layer {l} claim mismatch")
            mu = transcript.squeeze_challenge()
            cl = ops.mix(ev, mu)
            point = s + [mu]
        claims = ops.unpack(cl)
        return products, point, claims

    for l in range(1, v):
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
