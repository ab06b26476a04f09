"""Offline memory checking via batched grand products (Lasso's core check).

Proves, for each memory m = (subtable T_m, chunk dimension c(m)), that the
E-polynomial is consistent with table reads:
    for every selected row x:  E_m(x) = T_m[dim_{c(m)}(x)]
using the multiset-hash identity  init * writes == reads * finals  with
fingerprint h(a, v, t) = a + v*gamma + t*gamma^2 - tau
(memory_checking/prover.rs:44).

Differences from the reference (documented in PROTOCOL.md):
- PUBLIC row selectors: rows not using memory m contribute the neutral
  element 1 instead of a bogus fingerprint — the reference feeds every row's
  (dim, 0, shared_ts) into every memory's multiset (prover.rs:70-73), which
  does not balance for circuits mixing lookup types on one chunk. The
  selector is public circuit structure, so the verifier evaluates its MLE
  itself (selectors.py).
- PER-MEMORY counters (read_ts/final_cts), not per-chunk shared
  (lasso.rs:317-319): shared counters are only coherent when all memories of
  a chunk are accessed by exactly the same rows.
- Because the read/write leaves sel*(h-1)+1 are quadratic in witness polys,
  one extra batched degree-3 "leaf consistency" sumcheck reduces the
  read/write tree's bottom claims to openings of dim/E/read_ts. The
  init/final leaves stay affine, so their bottom claims are checked directly
  from a final_cts opening plus verifier-computed a~ and T~ (closed-form
  subtable MLE, verifier.rs:61-95 parity).
- gamma/tau are cast to the BASE field before fingerprinting, preserving the
  reference's insecure quirk (prover.rs:36-39, README.md:108) so behavior is
  comparable; secure_gamma_tau=True keeps them in the extension field.

Transcript order: GP(reads||writes) -> alpha -> leaf sumcheck -> openings
(dim, E, ts per memory) -> GP(inits||finals) -> openings (final_cts) ->
[verifier: fingerprint + product-balance checks].
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Callable, List

import jax

from ..fields import FieldSpec
from ..gkr.grand_product import prove_grand_product, verify_grand_product
from ..gkr.sumcheck import SumcheckExpr, Term, prove_sum_check, verify_sum_check
from ..ops import mle
from ..ops.fe import Backend, get_backend
from .selectors import RowSelector


@dataclass
class MemoryWitness:
    """Prover-side device arrays for one memory (all base-field).

    dim may be shared (same object) across memories of one chunk."""

    dim: object  # [L] addresses as field elements
    e: object  # [L] read values
    read_ts: object  # [L]
    final_cts: object  # [M_table]
    subtable: object  # [M_table] dense table values
    selector: RowSelector  # public rows using this memory
    sel_dense: object  # [L] 0/1 field vector (device)


@dataclass
class MemoryShape:
    """Verifier-side description of one memory."""

    selector: RowSelector
    table_mle: Callable  # (spec, point) -> ext eval of T_m
    chunk_index: int


def _hash_terms(spec, gamma, tau):
    g = spec._c(gamma)
    g2 = spec.emul(g, g)
    t = spec._c(tau)
    return g, g2, t


@lru_cache(maxsize=None)
def _leaves_jit(be_name: str, num_memories: int, logl: int, logm: int,
                ext_scalars: bool = False):
    """Build all 4*num_memories fingerprint leaf vectors in one dispatch.
    ext_scalars: gamma/tau are extension-field (secure mode) — leaves come
    out ext-typed via the backend's promotion."""
    be = get_backend(be_name)

    def run(dims, es, tss, finals, subtables, sels, gamma, gamma2, tau, one):
        reads, writes, inits, finals_out = [], [], [], []
        a = be.from_ints(list(range(1 << logm)))
        for i in range(num_memories):
            h = be.sub(
                be.add(
                    dims[i],
                    be.add(be.mul(gamma, es[i]), be.mul(gamma2, tss[i])),
                ),
                tau,
            )
            # sel*(h-1)+1 ; write adds gamma^2 to the timestamp
            reads.append(
                be.add(be.mul(sels[i], be.sub(h, one)), one)
            )
            hw = be.add(h, gamma2)
            writes.append(be.add(be.mul(sels[i], be.sub(hw, one)), one))
            hi = be.sub(be.add(a, be.mul(gamma, subtables[i])), tau)
            inits.append(hi)
            finals_out.append(be.add(hi, be.mul(gamma2, finals[i])))
        return reads, writes, inits, finals_out

    return jax.jit(run)


def prove_memory_checking(
    be: Backend,
    witnesses: List[MemoryWitness],
    chunk_of: List[int],
    dims_by_chunk: List[object],
    gamma,
    tau,
    transcript,
    secure_gamma_tau: bool = False,
    mesh=None,
):
    """Returns dict of opening claims (for caller-side sanity/debug)."""
    spec = be.spec
    M = len(witnesses)
    if not secure_gamma_tau:
        gamma = spec.ext(spec._c(gamma)[0])  # base-field cast (ref quirk)
        tau = spec.ext(spec._c(tau)[0])
    g, g2, t = _hash_terms(spec, gamma, tau)

    logl = mle.num_vars(be, witnesses[0].e)
    logm = mle.num_vars(be, witnesses[0].final_cts)

    # secure mode keeps gamma/tau (and hence the leaves) in the extension
    # field; the default path preserves the reference's base-field quirk
    # (ADVICE r1: the old secure path silently dropped the ext coefficient)
    fn = _leaves_jit(spec.name, M, logl, logm, ext_scalars=secure_gamma_tau)
    gdev = be.scalar(g, ext=secure_gamma_tau)
    g2dev = be.scalar(g2, ext=secure_gamma_tau)
    tdev = be.scalar(t, ext=secure_gamma_tau)
    onedev = be.scalar(spec.ext(1) if secure_gamma_tau else 1,
                       ext=secure_gamma_tau)
    reads, writes, inits, finals = fn(
        [w.dim for w in witnesses],
        [w.e for w in witnesses],
        [w.read_ts for w in witnesses],
        [w.final_cts for w in witnesses],
        [w.subtable for w in witnesses],
        [w.sel_dense for w in witnesses],
        gdev,
        g2dev,
        tdev,
        onedev,
    )

    # --- tree 1: reads || writes ---
    prods_rw, z1, claims_rw = prove_grand_product(
        be, reads + writes, transcript, mesh=mesh
    )
    alpha = transcript.squeeze_challenge()

    expr, coeffs, tables, openings_layout = _rw_sumcheck_parts(
        be, spec, witnesses, chunk_of, dims_by_chunk, alpha, g, g2, t, z1
    )
    alphas = spec.epowers(alpha, 2 * M)
    batched = spec.zero
    for i in range(2 * M):
        batched = spec.eadd(
            batched, spec.emul(alphas[i], spec._c(claims_rw[i]))
        )
    fclaim, x, fevals = prove_sum_check(
        be, expr, coeffs, batched, tables, transcript, mesh=mesh
    )
    # openings: dim_c~(x) per chunk, then (e_m~(x), ts_m~(x)) per memory
    openings = [fevals[i] for i in openings_layout]
    transcript.write_felts_ext(openings)

    # --- tree 2: inits || finals ---
    prods_if, z2, claims_if = prove_grand_product(
        be, inits + finals, transcript, mesh=mesh
    )
    final_cts_openings = [
        mle.evaluate(be, w.final_cts, z2) for w in witnesses
    ]
    transcript.write_felts_ext(final_cts_openings)

    from ..runtime import sanity_enabled

    if sanity_enabled():  # multiset-hash balance (prover.rs:136-141 parity):
        # prod(init) * prod(writes) == prod(reads) * prod(final) per memory
        for i in range(M):
            lhs = spec.emul(spec._c(prods_if[i]), spec._c(prods_rw[M + i]))
            rhs = spec.emul(spec._c(prods_rw[i]), spec._c(prods_if[M + i]))
            if lhs != rhs:
                raise AssertionError(
                    f"sanity: multiset hash imbalance in memory {i}"
                )

    return {
        "z1": z1,
        "x": x,
        "z2": z2,
        "rw_openings": openings,
        "final_cts_openings": final_cts_openings,
        "products_rw": prods_rw,
        "products_if": prods_if,
    }


def _rw_sumcheck_parts(
    be, spec, witnesses, chunk_of, dims_by_chunk, alpha, g, g2, t, z1
):
    """Assemble the leaf-consistency sumcheck for the reads||writes tree."""
    M = len(witnesses)
    num_chunks = len(dims_by_chunk)
    # tables: 0 = eq(z1), 1..num_chunks = dims, then per-memory sel, e, ts
    tables = [mle.eq_table(be, z1)]
    tables.extend(dims_by_chunk)
    for w in witnesses:
        tables.extend([w.sel_dense, w.e, w.read_ts])

    terms = []
    coeffs = []
    mone = spec.p - 1
    alphas = spec.epowers(alpha, 2 * M)
    for m in range(M):
        am = alphas[m]
        bm = alphas[M + m]
        w_m = spec.eadd(am, bm)
        sel = 1 + num_chunks + 3 * m
        e = sel + 1
        ts = sel + 2
        dim = 1 + chunk_of[m]
        base = len(coeffs)
        coeffs.extend(
            [
                w_m,
                spec.emul(g, w_m),
                spec.emul(g2, w_m),
                spec.eadd(
                    spec.emul(am, spec.eadd(spec.eneg(t), spec.ext(mone))),
                    spec.emul(
                        bm,
                        spec.eadd(g2, spec.eadd(spec.eneg(t), spec.ext(mone))),
                    ),
                ),
                w_m,
            ]
        )
        terms.append(Term(base + 0, (0, sel, dim)))
        terms.append(Term(base + 1, (0, sel, e)))
        terms.append(Term(base + 2, (0, sel, ts)))
        terms.append(Term(base + 3, (0, sel)))
        terms.append(Term(base + 4, (0,)))
    expr = SumcheckExpr(terms, len(tables))
    # openings to publish: dims (per chunk), then e, ts per memory
    layout = list(range(1, 1 + num_chunks))
    for m in range(M):
        sel = 1 + num_chunks + 3 * m
        layout.extend([sel + 1, sel + 2])
    return expr, coeffs, tables, layout


def verify_memory_checking(
    spec: FieldSpec,
    shapes: List[MemoryShape],
    num_chunks: int,
    logl: int,
    logm: int,
    gamma,
    tau,
    transcript,
    secure_gamma_tau: bool = False,
):
    """Mirrors prove_memory_checking; raises ValueError on failure.
    Returns dict with the opening claims (including E openings at x)."""
    M = len(shapes)
    if not secure_gamma_tau:
        gamma = spec.ext(spec._c(gamma)[0])
        tau = spec.ext(spec._c(tau)[0])
    g, g2, t = _hash_terms(spec, gamma, tau)
    mone = spec.p - 1

    prods_rw, z1, claims_rw = verify_grand_product(spec, 2 * M, logl, transcript)
    alpha = transcript.squeeze_challenge()

    alphas = spec.epowers(alpha, 2 * M)
    batched = spec.zero
    for i in range(2 * M):
        batched = spec.eadd(
            batched, spec.emul(alphas[i], spec._c(claims_rw[i]))
        )
    fclaim, x = verify_sum_check(spec, 3, logl, batched, transcript)
    openings = transcript.read_felts_ext(num_chunks + 2 * M)
    dim_open = openings[:num_chunks]
    e_open = [openings[num_chunks + 2 * m] for m in range(M)]
    ts_open = [openings[num_chunks + 2 * m + 1] for m in range(M)]

    # recompute the leaf-consistency expression at the final point
    eq_eval = mle.eq_eval(spec, z1, x)
    acc = spec.zero
    for m, sh in enumerate(shapes):
        am = alphas[m]
        bm = alphas[M + m]
        w_m = spec.eadd(am, bm)
        sel_eval = sh.selector.evaluate_mle(spec, x)
        hterm = spec.eadd(
            spec._c(dim_open[sh.chunk_index]),
            spec.eadd(
                spec.emul(g, spec._c(e_open[m])),
                spec.emul(g2, spec._c(ts_open[m])),
            ),
        )
        c3 = spec.eadd(
            spec.emul(am, spec.eadd(spec.eneg(t), spec.ext(mone))),
            spec.emul(bm, spec.eadd(g2, spec.eadd(spec.eneg(t), spec.ext(mone)))),
        )
        contrib = spec.eadd(
            spec.emul(w_m, spec.emul(sel_eval, hterm)),
            spec.eadd(spec.emul(c3, sel_eval), w_m),
        )
        acc = spec.eadd(acc, spec.emul(eq_eval, contrib))
    if acc != fclaim:
        raise ValueError("memory checking: read/write leaf claim mismatch")

    prods_if, z2, claims_if = verify_grand_product(spec, 2 * M, logm, transcript)
    final_cts_open = transcript.read_felts_ext(M)

    # init/final leaves are affine: check directly
    a_eval = spec.zero
    for i in range(logm):
        a_eval = spec.eadd(a_eval, spec.escale(spec._c(z2[i]), 1 << i))
    for m, sh in enumerate(shapes):
        t_eval = sh.table_mle(spec, z2)
        init_expect = spec.esub(spec.eadd(a_eval, spec.emul(g, t_eval)), t)
        if spec._c(claims_if[m]) != init_expect:
            raise ValueError(f"memory checking: init leaf claim mismatch ({m})")
        fin_expect = spec.eadd(
            init_expect, spec.emul(g2, spec._c(final_cts_open[m]))
        )
        if spec._c(claims_if[M + m]) != fin_expect:
            raise ValueError(f"memory checking: final leaf claim mismatch ({m})")

    # product balance: init * writes == reads * finals, per memory
    for m in range(M):
        lhs = spec.emul(spec._c(prods_if[m]), spec._c(prods_rw[M + m]))
        rhs = spec.emul(spec._c(prods_rw[m]), spec._c(prods_if[M + m]))
        if lhs != rhs:
            raise ValueError(f"memory checking: multiset imbalance ({m})")

    return {
        "z1": z1,
        "x": x,
        "z2": z2,
        "dim_openings": dim_open,
        "e_openings": e_open,
        "ts_openings": ts_open,
        "final_cts_openings": final_cts_open,
    }
