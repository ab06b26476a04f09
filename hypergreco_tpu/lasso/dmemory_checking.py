"""Device-resident offline memory checking prover.

Covers: fingerprint leaf construction, BOTH grand-product trees
(reads||writes, inits||finals), the read/write leaf-consistency sumcheck
(challenge-derived coefficient vector built on device) and the final_cts
openings — transcript messages bit-identical to the host prover
(lasso/memory_checking.py), so verify_memory_checking verifies unchanged.

The prover is a PIPELINE of a few separately-compiled programs (leaves +
tree builds | transcript loops | sumchecks) rather than one fused program:
fusing the unrolled tree builds with the fori_loop sumcheck phases explodes
XLA compile time (verify-skill hazard 8/10). The device transcript flows
between programs, so there are still ZERO host round trips — `mc_rounds`
keeps the one-piece traceable form for small trees/tests.

Reference parity: MemoryCheckingProver::prove
(memory_checking/prover.rs:35-295), re-architected with the on-device
Fiat-Shamir pipeline.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..gkr import dsumcheck as dsc
from ..gkr import dtranscript as dt
from ..gkr.dgrand_product import (
    gp_layer_rounds,
    gp_rounds,
    gp_tree_build,
)
from ..gkr.sumcheck import SumcheckExpr, Term
from ..ops import mle
from ..ops.fe import Backend, get_backend


def _gt_cast(be: Backend, gamma, tau, secure_gamma_tau: bool):
    """gamma/tau handling: the default path preserves the reference's
    insecure base-field quirk (prover.rs:36-39) — leaves stay base-typed;
    secure mode keeps everything in the extension field. Returns
    (gk, tk, g2k, onek) for leaf math and ext (g, t, g2) for coefficients."""
    has_ext = be.ext_cls is not be.base_cls
    if secure_gamma_tau:
        gk, tk = gamma, tau
        onek = be.ext.ones(())
    else:
        gk = gamma.a0 if has_ext else gamma
        tk = tau.a0 if has_ext else tau
        onek = be.base.ones(())
    g2k = be.mul(gk, gk)
    g = be.lift(gk) if not secure_gamma_tau else gk
    t = be.lift(tk) if not secure_gamma_tau else tk
    g2 = be.mul(g, g)
    return gk, tk, g2k, onek, g, t, g2


def rw_leaves(be: Backend, witnesses, gamma, tau,
              secure_gamma_tau: bool = False):
    """Traceable read/write fingerprint leaves (selector-masked)."""
    gk, tk, g2k, onek, _, _, _ = _gt_cast(be, gamma, tau, secure_gamma_tau)
    reads, writes = [], []
    for w in witnesses:
        h = be.sub(
            be.add(
                w["dim"],
                be.add(be.mul(gk, w["e"]), be.mul(g2k, w["read_ts"])),
            ),
            tk,
        )
        sel = w["sel_dense"]
        reads.append(be.add(be.mul(sel, be.sub(h, onek)), onek))
        hw = be.add(h, g2k)
        writes.append(be.add(be.mul(sel, be.sub(hw, onek)), onek))
    return reads + writes


def if_leaves(be: Backend, witnesses, gamma, tau, logm: int,
              secure_gamma_tau: bool = False):
    """Traceable init/final fingerprint leaves."""
    gk, tk, g2k, _, _, _, _ = _gt_cast(be, gamma, tau, secure_gamma_tau)
    # address vector 0..M-1 as a generated iota, not an embedded constant
    mk = be.from_u32 or (
        lambda col: be.base_cls(col, jnp.zeros_like(col))
    )
    a = mk(jnp.arange(1 << logm, dtype=jnp.uint32))
    inits, finals = [], []
    for w in witnesses:
        hi = be.sub(be.add(a, be.mul(gk, w["subtable"])), tk)
        inits.append(hi)
        finals.append(be.add(hi, be.mul(g2k, w["final_cts"])))
    return inits + finals


def rw_sumcheck(be: Backend, witnesses, chunk_of, dims_by_chunk, z1,
                gamma, tau, dtx, secure_gamma_tau: bool = False):
    """Traceable read/write leaf-consistency sumcheck: squeezes its own
    batching alpha first (transcript order: right after tree 1)."""
    M = len(witnesses)
    _, _, _, _, g, t, g2 = _gt_cast(be, gamma, tau, secure_gamma_tau)
    logl = mle.num_vars(be, witnesses[0]["e"])
    one = be.ext.ones(())

    alpha, dtx = dt.squeeze_challenge(be, dtx)
    num_chunks = len(dims_by_chunk)
    tables = [dsc.eq_table_dyn(be, z1, logl, jnp.int32(logl))]
    tables.extend([be.lift(d) for d in dims_by_chunk])
    for w in witnesses:
        tables.extend(
            [be.lift(w["sel_dense"]), be.lift(w["e"]), be.lift(w["read_ts"])]
        )

    apow = dsc.powers(be, alpha, 2 * M)
    mone = be.scalar(be.spec.ext(be.spec.p - 1), ext=True)
    nt_m1 = be.add(be.neg(t), mone)
    terms = []
    coeff_scalars = []
    for m in range(M):
        am = be.index(apow, m)
        bm = be.index(apow, M + m)
        w_m = be.add(am, bm)
        sel = 1 + num_chunks + 3 * m
        e = sel + 1
        ts_i = sel + 2
        dim = 1 + chunk_of[m]
        base = len(coeff_scalars)
        coeff_scalars.extend(
            [
                w_m,
                be.mul(g, w_m),
                be.mul(g2, w_m),
                be.add(be.mul(am, nt_m1), be.mul(bm, be.add(g2, nt_m1))),
                w_m,
            ]
        )
        terms.append(Term(base + 0, (0, sel, dim)))
        terms.append(Term(base + 1, (0, sel, e)))
        terms.append(Term(base + 2, (0, sel, ts_i)))
        terms.append(Term(base + 3, (0, sel)))
        terms.append(Term(base + 4, (0,)))
    expr = SumcheckExpr(terms, len(tables))
    cdev = dsc._stack_scalars(be, coeff_scalars + [one])

    stk = jax.tree.map(
        lambda *rows: jnp.stack(rows),
        *([be.lift(T) for T in tables] + [be.ext.ones((1 << logl,))]),
    )
    x_chal, fevals, dtx = dsc.rounds_static(
        be, expr.key(), len(coeff_scalars), logl, stk, cdev, dtx
    )
    layout = list(range(1, 1 + num_chunks))
    for m in range(M):
        sel = 1 + num_chunks + 3 * m
        layout.extend([sel + 1, sel + 2])
    lay = np.asarray(layout, dtype=np.int32)
    return dt.write_ext(be, dtx, jax.tree.map(lambda a: a[lay], fevals))


def fc_openings(be: Backend, witnesses, z2, logm: int, dtx):
    """Traceable final_cts openings at the tree-2 point."""
    eqz2 = dsc.eq_table_dyn(be, z2, logm, jnp.int32(logm))
    fc_opens = [
        dsc.digest_scalar(be, be.mul(eqz2, w["final_cts"])) for w in witnesses
    ]
    return dt.write_ext(be, dtx, dsc._stack_scalars(be, fc_opens))


def mc_rounds(
    be: Backend,
    witnesses,
    chunk_of: List[int],
    dims_by_chunk,
    gamma,
    tau,
    dtx,
    secure_gamma_tau: bool = False,
):
    """One-piece traceable MC prover (small trees / tests; the production
    path is mc_prove_device). witnesses: list of per-memory dicts of device
    arrays (witness_dict form); gamma/tau: 0-d ext device scalars (already
    squeezed by the caller). Returns dtx."""
    logm = mle.num_vars(be, witnesses[0]["final_cts"])
    z1, dtx = gp_rounds(be, rw_leaves(be, witnesses, gamma, tau,
                                      secure_gamma_tau), dtx)
    dtx = rw_sumcheck(be, witnesses, chunk_of, dims_by_chunk, z1,
                      gamma, tau, dtx, secure_gamma_tau)
    z2, dtx = gp_rounds(be, if_leaves(be, witnesses, gamma, tau, logm,
                                      secure_gamma_tau), dtx)
    return fc_openings(be, witnesses, z2, logm, dtx)


# ---------------------------------------------------------------------------
# production pipeline: separately-compiled programs, shared device transcript
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _progs(be_name: str, M: int, logl: int, logm: int, num_chunks: int,
           chunk_of: tuple, secure: bool):
    be = get_backend(be_name)

    def build1(wds, gamma, tau):
        return gp_tree_build(be, rw_leaves(be, wds, gamma, tau, secure))

    def loop1(LVL, w1, dtx):
        return gp_layer_rounds(be, LVL, w1, logl, dtx)

    def sc(wds, dims, z1, gamma, tau, dtx):
        return rw_sumcheck(be, wds, list(chunk_of), dims, z1, gamma, tau,
                           dtx, secure)

    def build2(wds, gamma, tau):
        return gp_tree_build(be, if_leaves(be, wds, gamma, tau, logm, secure))

    def loop2(LVL, w1, wds, dtx):
        z2, dtx = gp_layer_rounds(be, LVL, w1, logm, dtx)
        return fc_openings(be, wds, z2, logm, dtx)

    return tuple(jax.jit(f) for f in (build1, loop1, sc, build2, loop2))


def mc_prove_device(
    be: Backend,
    witnesses,
    chunk_of: List[int],
    dims_by_chunk,
    gamma,
    tau,
    dtx,
    secure_gamma_tau: bool = False,
):
    """Pipelined MC prover: 5 enqueued programs, transcript on device
    throughout, bytes identical to mc_rounds / the host prover."""
    import os

    from ..utils.tracing import span

    sync = (
        jax.block_until_ready
        if os.environ.get("HYPERGRECO_SYNC_SPANS") == "1"
        else (lambda x: x)
    )
    M = len(witnesses)
    logl = mle.num_vars(be, witnesses[0]["e"])
    logm = mle.num_vars(be, witnesses[0]["final_cts"])
    build1, loop1, sc, build2, loop2 = _progs(
        be.spec.name, M, logl, logm, len(dims_by_chunk), tuple(chunk_of),
        secure_gamma_tau,
    )
    with span("mc::build1"):
        LVL1, w1 = build1(witnesses, gamma, tau)
        sync(w1)
    with span("mc::loop1"):
        z1, dtx = loop1(LVL1, w1, dtx)
        sync(dtx.log_len)
    with span("mc::rw_sumcheck"):
        dtx = sc(witnesses, dims_by_chunk, z1, gamma, tau, dtx)
        sync(dtx.log_len)
    with span("mc::build2"):
        LVL2, w2 = build2(witnesses, gamma, tau)
        sync(w2)
    with span("mc::loop2"):
        z2dtx = loop2(LVL2, w2, witnesses, dtx)
        sync(z2dtx.log_len)
    return z2dtx


def witness_dict(w) -> dict:
    """memory_checking.MemoryWitness -> jit-friendly array pytree."""
    return {
        "dim": w.dim,
        "e": w.e,
        "read_ts": w.read_ts,
        "final_cts": w.final_cts,
        "subtable": w.subtable,
        "sel_dense": w.sel_dense,
    }
