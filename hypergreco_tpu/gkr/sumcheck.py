"""Generic batched sumcheck engine.

Proves claims of the form

    claim = sum_{x in {0,1}^v}  sum_t  c_t * prod_{k in S_t} T_k(x)

for dense device tables T_k and host ext coefficients c_t (degree = max |S_t|).

Protocol (self-consistent; the reference's engine crate is offline so the
exact message format of `gkr::sum_check::prove_sum_check` — SURVEY.md §2.2 ⚠ —
is replaced by this documented scheme):

Per round j = 0..v-1 (variable j — the LSB of the remaining hypercube — is
bound in round j):
  - prover writes S_j(t) for t in {0, 2, 3, ..., d}   (d ext felts)
  - verifier derives S_j(1) = claim_j - S_j(0), interpolates the degree-d
    round polynomial through {0..d}, squeezes r_j, sets
    claim_{j+1} = S_j(r_j)
  - prover folds every table with r_j.
After v rounds the prover holds the final table evals; the opening point is
`point = [r_0, .., r_{v-1}]`, already LSB-first (point[i] <-> variable i,
DESIGN.md §2).

TPU/XLA mapping (each choice below was forced by measurement, see
.claude/skills/verify/SKILL.md):
  - Tables live in FIXED [2^v] buffers; after k folds the active values sit
    at stride 2^k (a fold combines T[i] and T[i+s] in place via one dynamic
    rotation gather). ONE compiled program serves every round (3 variants:
    round-0 no-fold, round-1 base->ext fold, steady-state ext) instead of
    one per shape — cold compiles cost seconds-to-minutes on the TPU tunnel.
    Earlier variants using concatenate re-padding or dynamic_slice made
    XLA:CPU's fusion emitter (jaxlib 0.9.0) generate multi-MB kernels with
    minutes-long compiles and runaway execution; the stride/gather layout
    avoids both op kinds entirely in the hot program.
  - Round-poly points t = 2..d come from an add-chain (T_{t+1} = T_t + diff),
    not scalar multiplication — cheaper and avoids the same deadlock.
  - The modular sum over the hypercube is NOT a halving add-tree (XLA re-runs
    the fused producer chain per tree level: 30s instead of 12ms at 2^16) but
    a native-reduce digest: 16-bit limb columns jnp.sum'ed in uint32 chunks,
    finished mod p on the host (Backend.sum_digest / digest_value).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..fields import FieldSpec
from ..ops.fe import Backend, get_backend
from ..ops import mle


class Term(NamedTuple):
    """c[coeff_idx] * prod(tables[k] for k in factors); coeff None = 1."""

    coeff_idx: Optional[int]
    factors: Tuple[int, ...]


class SumcheckExpr:
    def __init__(self, terms: Sequence[Term], num_tables: int):
        self.terms = [Term(t[0], tuple(t[1])) for t in terms]
        self.num_tables = num_tables
        for t in self.terms:
            assert len(t.factors) >= 1
            assert all(0 <= k < num_tables for k in t.factors)
        self.degree = max(len(t.factors) for t in self.terms)
        assert 1 <= self.degree <= 4, "supported sumcheck degree is 1..4"

    def key(self) -> tuple:
        return (
            self.num_tables,
            tuple((t.coeff_idx, t.factors) for t in self.terms),
        )

    def eval_host(self, spec: FieldSpec, coeffs, table_evals):
        """Evaluate the expression at scalar table evals (verifier's check)."""
        acc = spec.zero
        for t in self.terms:
            prod = spec.one if t.coeff_idx is None else spec._c(coeffs[t.coeff_idx])
            for k in t.factors:
                prod = spec.emul(prod, spec._c(table_evals[k]))
            acc = spec.eadd(acc, prod)
        return acc


@lru_cache(maxsize=None)
def _lagrange_den_invs(p: int, n: int) -> tuple:
    """Inverse denominators prod_{j!=i} (i-j)^-1 for nodes 0..n-1."""
    out = []
    for i in range(n):
        den = 1
        for j in range(n):
            if j != i:
                den *= i - j
        out.append(pow(den % p, p - 2, p))
    return tuple(out)


def lagrange_interp_eval(spec: FieldSpec, ys, r):
    """Evaluate the poly through points (i, ys[i]), i = 0..len-1, at ext r."""
    n = len(ys)
    r = spec._c(r)
    dinv = _lagrange_den_invs(spec.p, n)
    # prefix/suffix products of (r - j): num_i = pre[i] * suf[i+1]
    diffs = [spec.esub(r, spec.ext(j)) for j in range(n)]
    pre = [spec.one]
    for d in diffs:
        pre.append(spec.emul(pre[-1], d))
    suf = [spec.one] * (n + 1)
    for j in range(n - 1, -1, -1):
        suf[j] = spec.emul(suf[j + 1], diffs[j])
    acc = spec.zero
    for i in range(n):
        li = spec.escale(spec.emul(pre[i], suf[i + 1]), dinv[i])
        acc = spec.eadd(acc, spec.emul(spec._c(ys[i]), li))
    return acc


def _eval_points(degree: int):
    return [0] + list(range(2, degree + 1))


def _shift_cols(T, s, n: int):
    """out[.., i] = T[.., (i + s) & (n-1)] — one dynamic gather per limb
    leaf. Concatenate/dynamic_slice variants blow up XLA:CPU's fusion
    emitter into multi-MB kernels (see module docstring)."""
    idx = (jnp.arange(n, dtype=jnp.int32) + s) & (n - 1)
    return jax.tree.map(lambda a: a[..., idx], T)


def _rows(T, idx):
    """Static row gather of a stacked [T, N] pytree."""
    return jax.tree.map(lambda a: a[idx, :], T)


# terms per product block: bounds the [block, N] intermediate and keeps one
# digest per block (host sums them — digests are additive)
_TERM_BLOCK = 16


def _expr_layout(expr_key: tuple, num_coeffs: int, degree: int):
    """Per factor position, the table-row index of each term (ones row =
    num_tables); per term, its coeff index (one slot = num_coeffs)."""
    import numpy as np

    num_tables, terms = expr_key
    fidx = [[] for _ in range(degree)]
    cidx = []
    for ci, factors in terms:
        fs = list(factors) + [num_tables] * (degree - len(factors))
        for k in range(degree):
            fidx[k].append(fs[k])
        cidx.append(ci if ci is not None else num_coeffs)
    return (
        [np.asarray(f, dtype=np.int32) for f in fidx],
        np.asarray(cidx, dtype=np.int32),
    )


@lru_cache(maxsize=None)
def _stack_jit(be_name: str, n_tables: int, logn: int, kinds: tuple):
    """tables list -> one ext-lifted stacked [T+1, N] array (last row ones).
    Stack/concat happens only here, at a materialization boundary."""
    be = get_backend(be_name)
    N = 1 << logn

    def run(tables):
        lifted = [be.lift(T) for T in tables]
        lifted.append(be.ext.ones((N,)))
        return jax.tree.map(lambda *rows: jnp.stack(rows), *lifted)

    return jax.jit(run)


@lru_cache(maxsize=None)
def _round_jit(be_name: str, expr_key: tuple, num_coeffs: int, logn: int, fold: bool):
    """One sumcheck round in a single dispatch.

    Stride layout over a stacked [T+1, 2^logn] ext buffer: after k folds the
    active values sit at indices that are multiples of 2^k (within the first
    `l_act` entries); a fold with stride s combines T[.., i] and T[.., i+s]
    in place. Op count is O(degree * num_term_blocks), independent of the
    table count — per-table unstacked variants made XLA:CPU compile time
    explode with the number of tables."""
    be = get_backend(be_name)
    num_tables, terms = expr_key
    degree = max(len(f) for _, f in terms)
    ts = _eval_points(degree)
    N = 1 << logn
    fidx, cidx = _expr_layout(expr_key, num_coeffs, degree)
    nterms = len(terms)

    def run(stk, coeffs1, r, sc, l_act):
        # sc: active stride for THIS round's evals (2^rnd); the entry fold
        # (rounds >= 1) uses stride sc//2. l_act = 2^active_vars.
        # The ones row is invariant under folds: 1 + r*(1-1) = 1.
        if fold:
            hi = _shift_cols(stk, sc // 2, N)
            stk = be.add(stk, be.mul(r, be.sub(hi, stk)))
        his = _shift_cols(stk, sc, N)
        diffs = be.sub(his, stk)
        x = jnp.arange(N, dtype=jnp.int32)
        mask = (((x & (2 * sc - 1)) == 0) & (x < l_act))[None, :]
        digests = []
        cur = his
        for t in ts:
            if t == 0:
                tabs = stk
            else:
                # add-chain: cur(t) = cur(t-1) + diff, starting at his (t=1)
                cur = be.add(cur, diffs)
                tabs = cur
            blk_digests = []
            for lo in range(0, nterms, _TERM_BLOCK):
                sl = slice(lo, min(lo + _TERM_BLOCK, nterms))
                prod = _rows(tabs, fidx[0][sl])
                for k in range(1, degree):
                    prod = be.mul(prod, _rows(tabs, fidx[k][sl]))
                ci_blk = cidx[sl]
                cs = jax.tree.map(lambda a: a[ci_blk, None], coeffs1)
                prod = be.mul(prod, cs)
                b = sl.stop - sl.start
                prod = be.select(mask, prod, be.ext.zeros((b, N)))
                blk_digests.append(be.sum_digest(prod))
            digests.append(blk_digests)
        return stk, digests

    return jax.jit(run)


@lru_cache(maxsize=None)
def _pack_jit(be_name: str):
    be = get_backend(be_name)
    return jax.jit(be.pack_digests)


_MESH_REG = {}


def _mesh_key(mesh):
    """Structural mesh identity: two meshes over the same devices with the
    same axes share compiled programs (keying on id(mesh) forced a full
    recompile for every caller that constructed its own mesh)."""
    key = (
        tuple(mesh.axis_names),
        mesh.devices.shape,
        tuple(d.id for d in mesh.devices.flat),
    )
    _MESH_REG[key] = mesh
    return key


@lru_cache(maxsize=None)
def _round_sharded_jit(
    be_name: str, expr_key: tuple, num_coeffs: int, logn: int, fold: bool, mkey
):
    """The round program under shard_map: columns sharded over mesh axis
    "hc". Valid while 2*sc <= the per-shard column count (folds/evals are
    then shard-local: active pairs sit inside 2sc-aligned blocks). Digests
    come back per-shard (leading axis) and the host finish sums them, so the
    transcript is bit-identical to the unsharded engine."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    be = get_backend(be_name)
    mesh = _MESH_REG[mkey]
    ndev = mesh.shape["hc"]
    num_tables, terms = expr_key
    degree = max(len(f) for _, f in terms)
    ts = _eval_points(degree)
    N = 1 << logn
    NL = N // ndev
    fidx, cidx = _expr_layout(expr_key, num_coeffs, degree)
    nterms = len(terms)

    def local(stk, coeffs1, r, sc, l_act):
        col0 = jax.lax.axis_index("hc") * NL
        if fold:
            hi = _shift_cols(stk, sc // 2, NL)
            stk = be.add(stk, be.mul(r, be.sub(hi, stk)))
        his = _shift_cols(stk, sc, NL)
        diffs = be.sub(his, stk)
        x = col0 + jnp.arange(NL, dtype=jnp.int32)
        mask = (((x & (2 * sc - 1)) == 0) & (x < l_act))[None, :]
        digests = []
        cur = his
        for t in ts:
            if t == 0:
                tabs = stk
            else:
                cur = be.add(cur, diffs)
                tabs = cur
            blk_digests = []
            for lo in range(0, nterms, _TERM_BLOCK):
                sl = slice(lo, min(lo + _TERM_BLOCK, nterms))
                prod = _rows(tabs, fidx[0][sl])
                for k in range(1, degree):
                    prod = be.mul(prod, _rows(tabs, fidx[k][sl]))
                ci_blk = cidx[sl]
                cs = jax.tree.map(lambda a: a[ci_blk, None], coeffs1)
                prod = be.mul(prod, cs)
                b = sl.stop - sl.start
                prod = be.select(mask, prod, be.ext.zeros((b, NL)))
                blk_digests.append(
                    jax.tree.map(lambda a: a[None], be.sum_digest(prod))
                )
            digests.append(blk_digests)
        return stk, digests

    def wrapped(stk, coeffs1, r, sc, l_act):
        stk2, digests = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, "hc"), P(), P(), P(), P()),
            out_specs=(P(None, "hc"), P("hc")),
        )(stk, coeffs1, r, sc, l_act)
        return stk2, digests

    return jax.jit(wrapped)


@lru_cache(maxsize=None)
def _final_fold_jit(be_name: str, n_tables: int, logn: int):
    """Bind the last challenge (active pair at 0 and s); emit final evals."""
    be = get_backend(be_name)

    def run(stk, r, s):
        e = jax.tree.map(lambda a: a[:n_tables, 0], stk)
        o = jax.tree.map(lambda a: a[:n_tables, s], stk)
        return be.add(e, be.mul(r, be.sub(o, e)))

    return jax.jit(run)


def _kinds(be: Backend, tables) -> tuple:
    return tuple(be._mod(T) is be.ext for T in tables)


def prove_sum_check(
    be, expr, coeffs, claim, tables, transcript, num_vars=None, mesh=None
):
    """Returns (final_claim, point_lsb_first, final_table_evals).

    `tables` may be base- or ext-field device vectors of equal power-of-two
    length 2^V, V >= 1; they are consumed (buffers reused across rounds).

    `num_vars` (default: buffer vars V) declares the ACTIVE var count v <= V:
    the sum ranges over the first 2^v entries and v rounds are played, but
    the buffers keep their padded size — so callers with many differently
    sized instances (e.g. grand-product tree layers) share ONE compiled
    program per expression. Padding values beyond the first 2^v entries are
    arbitrary: sums are masked and active lanes never read them.

    `mesh` (optional jax Mesh with an "hc" axis): shards the buffer columns
    across devices; rounds run shard-local while the stride fits the shard
    width, then the table is gathered and the tail runs replicated. The
    transcript is identical to the unsharded prover (digests are exact).
    """
    spec = be.spec
    bv = mle.num_vars(be, tables[0])
    assert all(mle.num_vars(be, T) == bv for T in tables)
    v = bv if num_vars is None else num_vars
    assert 1 <= v <= bv
    assert len(tables) == expr.num_tables
    cdev = be.from_ints([spec._c(c) for c in coeffs] + [spec.one], ext=True)
    ekey = expr.key()
    degree = expr.degree

    stk = _stack_jit(spec.name, len(tables), bv, _kinds(be, tables))(tables)

    ndev = mesh.shape["hc"] if mesh is not None else 1
    n_local = (1 << bv) // ndev if mesh is not None else 0
    sharded = mesh is not None and ndev > 1 and n_local >= 4
    multihost = sharded and len(
        {d.process_index for d in mesh.devices.flat}
    ) > 1

    def _fetch_packed(packed):
        """Packed digests -> host numpy. Under a multi-HOST mesh the shard
        axis is not fully addressable: replicate via a jitted identity
        (inserts the cross-process all-gather) so every host fetches and
        finishes the identical transcript."""
        import numpy as np

        if multihost:
            from jax.sharding import NamedSharding, PartitionSpec as P

            packed = jax.jit(
                lambda a: a, out_shardings=NamedSharding(mesh, P())
            )(packed)
        return np.asarray(packed)

    def _g(x):
        """Process-local value -> fully-replicated GLOBAL array (multi-host
        jit inputs must be global; every process holds the identical copy
        because the transcript is host-replicated)."""
        if not multihost:
            return x
        import numpy as np
        from jax.experimental import multihost_utils as mh
        from jax.sharding import PartitionSpec as P

        return jax.tree.map(
            lambda a: mh.host_local_array_to_global_array(
                np.asarray(a), mesh, P()
            ),
            x,
        )

    def _reshard(x, spec_):
        """Resharding via a jitted identity (out_shardings): plain
        device_put cannot reshard across processes."""
        from jax.sharding import NamedSharding

        sh = NamedSharding(mesh, spec_)
        if multihost:
            return jax.jit(lambda a: a, out_shardings=sh)(x)
        return jax.tree.map(lambda a: jax.device_put(a, sh), x)

    if sharded:
        from jax.sharding import PartitionSpec as P

        mkey = _mesh_key(mesh)
        stk = _reshard(_g(stk), P(None, "hc"))
        cdev = _g(cdev)

    r = be.scalar(spec.zero, ext=True)  # unused in round 0
    claim = spec._c(claim)
    l_act = jnp.int32(1 << v)
    challenges = []
    for rnd in range(v):
        sc = jnp.int32(1 << rnd)  # active stride for this round's evals
        if sharded and 2 * (1 << rnd) > n_local:
            # stride reached the shard width: gather, continue replicated
            from jax.sharding import PartitionSpec as P

            stk = _reshard(stk, P(None, None))
            sharded = False
        if sharded:
            fn = _round_sharded_jit(
                spec.name, ekey, len(coeffs), bv, rnd > 0, mkey
            )
        else:
            fn = _round_jit(spec.name, ekey, len(coeffs), bv, fold=rnd > 0)
        if multihost:
            r, sc, l_act = _g(r), _g(sc), _g(l_act)
        stk, digests = fn(stk, cdev, r, sc, l_act)
        packed = _pack_jit(spec.name)(digests)
        evals = [
            spec._c(v)
            for v in be.packed_digest_values(_fetch_packed(packed))
        ]
        transcript.write_felts_ext(evals)
        rj = transcript.squeeze_challenge()
        challenges.append(rj)
        ys = _round_ys(spec, claim, evals, degree)
        claim = lagrange_interp_eval(spec, ys, rj)
        r = be.scalar(rj, ext=True)

    if sharded:
        from jax.sharding import PartitionSpec as P

        stk = _reshard(stk, P(None, None))
    final_dev = _final_fold_jit(spec.name, len(tables), bv)(
        stk, _g(r) if multihost else r, _g(jnp.int32(1 << (v - 1)))
    )
    final_evals = [spec._c(x) for x in be.to_host(final_dev)]
    return claim, challenges, final_evals


def _round_ys(spec: FieldSpec, claim, evals, degree: int):
    """Assemble S(0..d) from the transmitted evals at {0, 2..d}."""
    s0 = spec._c(evals[0])
    s1 = spec.esub(spec._c(claim), s0)
    return [s0, s1] + [spec._c(e) for e in evals[1:]]


def verify_sum_check(spec: FieldSpec, degree: int, num_vars: int, claim, transcript):
    """Returns (final_claim, point_lsb_first). Caller must check final_claim
    against the expression evaluated at the claimed final table evals."""
    claim = spec._c(claim)
    native = getattr(transcript, "native_sumcheck", None)
    if native is not None:
        return native(degree, num_vars, claim)
    npts = len(_eval_points(degree))
    challenges = []
    for _ in range(num_vars):
        evals = transcript.read_felts_ext(npts)
        rj = transcript.squeeze_challenge()
        challenges.append(rj)
        ys = _round_ys(spec, claim, evals, degree)
        claim = lagrange_interp_eval(spec, ys, rj)
    return claim, challenges
