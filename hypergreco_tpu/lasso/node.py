"""LassoNode: batched range-lookup argument as a GKR claim-reduction node.

Protocol (lasso.rs:57-139 parity, with documented fixes):
 prove(inputs):
   1. polynomialize: dims (limb extraction), per-memory read/final counters,
      E-polys — all on device (the reference's sequential counter loop,
      lasso.rs:181-196, becomes stable-argsort + rank-in-group + scatter).
   2. squeeze r (num_vars ext challenges); write claimed_sum = inputs~(r).
   3. collation sumcheck:
        inputs~(r) = sum_x eq(r,x) * sum_m M^dim(m) * S_m(x) * E_m(x)
      with PUBLIC memory selectors S_m (the reference drops flags and
      weights by flat memory index, lasso.rs:463-470 — wrong for circuits
      whose lookups don't map to prefix memories; see PROTOCOL.md).
      Prover then writes the E_m openings at the sumcheck point.
   4. squeeze gamma, tau; memory checking (memory_checking.py).
   5. returns the input eval claim [(r, claimed_sum)].
 verify mirrors, evaluating eq/S_m MLEs itself and the subtable MLEs in
 closed form (verifier-side preprocessing has no materialized tables).

Current scope: M = 2^16, C <= 4 (the 64-bit Goldilocks value fits in 4
limbs; matches the reference's LIMB_BITS=16, C=4 constants,
sk_encryption_circuit.rs:29-31).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldSpec
from ..gkr.sumcheck import SumcheckExpr, Term, prove_sum_check, verify_sum_check
from ..ops import mle
from ..ops.fe import Backend, get_backend
from ..ops.gl import GL
from . import memory_checking as mc
from ..utils.tracing import span
from .selectors import RowSelector
from .tables import LassoPreprocessing


def lookups_to_selectors(lookup_ids: List[str], num_vars: int):
    """Row->lookup-id list (public) -> per-lookup-id RowSelector."""
    runs = {}
    i = 0
    n = len(lookup_ids)
    while i < n:
        j = i
        while j < n and lookup_ids[j] == lookup_ids[i]:
            j += 1
        runs.setdefault(lookup_ids[i], []).append((i, j))
        i = j
    return {
        lid: RowSelector.from_intervals(num_vars, ivs)
        for lid, ivs in runs.items()
    }


@lru_cache(maxsize=None)
def _dims_jit(be_name: str, logl: int, num_chunks: int):
    """Field inputs [L] -> per-chunk int32 addresses (16-bit limb
    extraction from the little-endian uint32 limb leaves — field-generic:
    chunk c lives in limb c//2)."""

    def run(inputs):
        leaves = jax.tree.leaves(inputs)
        chunks = []
        for c in range(num_chunks):
            limb = leaves[c // 2]
            chunks.append(
                ((limb >> (16 * (c % 2))) & 0xFFFF).astype(jnp.int32)
            )
        return chunks

    return jax.jit(run)


@lru_cache(maxsize=None)
def _counters_jit(be_name: str, logl: int, logm: int):
    """(addr int32 [L], sel int32 [L]) -> (read_ts int32 [L], final int32 [M]).

    read_ts[j] = #{j' < j : sel[j'] and addr[j'] == addr[j]} for selected j;
    equals the reference's sequential per-address counter (lasso.rs:181-196),
    computed as stable-argsort by address + rank within equal-address group."""
    L = 1 << logl
    M = 1 << logm

    def run(addr, sel):
        key = jnp.where(sel > 0, addr, M)  # sentinel for unselected rows
        order = jnp.argsort(key, stable=True)
        skey = key[order]
        first = jnp.searchsorted(skey, skey, side="left")
        ranks = jnp.arange(L, dtype=jnp.int32) - first.astype(jnp.int32)
        read_ts = jnp.zeros(L, dtype=jnp.int32).at[order].set(ranks)
        read_ts = jnp.where(sel > 0, read_ts, 0)
        final = (
            jnp.zeros(M + 1, dtype=jnp.int32)
            .at[key]
            .add(1, mode="drop")[:M]
        )
        return read_ts, final

    return jax.jit(run)


@lru_cache(maxsize=None)
def _epoly_jit(be_name: str, logl: int, logm: int):
    """E[j] = sel[j] ? T[addr[j]] : 0 (gather + mask)."""
    be = get_backend(be_name)

    def run(addr, sel, table):
        g = jax.tree.map(lambda a: a[addr], table)
        return be.select(sel > 0, g, be.zeros(addr.shape))

    return jax.jit(run)


@lru_cache(maxsize=None)
def _int_to_base_jit(be_name: str, shape_key: tuple):
    be = get_backend(be_name)

    def run(x):
        u = x.astype(jnp.uint32)
        if be.from_u32 is not None:
            return be.from_u32(u)
        return GL(u, jnp.zeros_like(u))

    return jax.jit(run)


def _as_gl(be, x):
    """int32/uint32 array of small values -> base field vector."""
    return _int_to_base_jit(be.spec.name, tuple(x.shape))(x)


class LassoNode:
    """One batched lookup node (reference: LassoNode<F,E,C,M>, lasso.rs:31)."""

    def __init__(
        self,
        be: Backend,
        pp: LassoPreprocessing,
        num_vars: int,
        lookups: List[str],
    ):
        assert pp.M == 1 << 16, "current device path assumes 16-bit limbs"
        assert len(lookups) <= 1 << num_vars
        self.be = be
        self.pp = pp
        self.num_vars = num_vars
        self.logm = pp.M.bit_length() - 1
        self.lookups = lookups
        self.num_chunks = (
            max(pp.memory_to_dimension_index) + 1 if pp.num_memories else 0
        )
        assert self.num_chunks <= 4

        lookup_sels = lookups_to_selectors(lookups, num_vars)
        self.memory_selectors = []
        for m in range(pp.num_memories):
            users = [
                lid
                for li, lid in enumerate(pp.lookup_ids)
                if m in pp.lookup_to_memory_indices[li] and lid in lookup_sels
            ]
            sels = [lookup_sels[lid] for lid in users]
            if sels:
                self.memory_selectors.append(RowSelector.union(sels))
            else:
                self.memory_selectors.append(
                    RowSelector.from_intervals(num_vars, [])
                )
        self.weights = [pp.weight(m) for m in range(pp.num_memories)]

    # ------------------------------------------------------------------
    # witness generation (device)
    # ------------------------------------------------------------------

    def _static_dev(self):
        """Device-resident static data (subtables, selectors): built ONCE —
        round-2 polynomialize re-uploaded the 5x65536 subtables every prove
        (131 ms of the 780 ms gl1024 TPU prove)."""
        sd = getattr(self, "_static_dev_cache", None)
        if sd is None:
            be = self.be
            sub_dev = [be.from_ints(t) for t in self.pp.materialized]
            sel_int = [
                jnp.asarray(np.asarray(s.dense(), dtype=np.int32))
                for s in self.memory_selectors
            ]
            jax.block_until_ready(jax.tree.leaves((sub_dev, sel_int)))
            sd = self._static_dev_cache = (sub_dev, sel_int)
        return sd

    def _poly_prog(self):
        """ONE fused program for the whole polynomialize phase (the per-
        memory counters/epoly/cast dispatch pipeline cost ~20 round trips)."""
        fn = getattr(self, "_poly_prog_cache", None)
        if fn is not None:
            return fn
        be = self.be
        pp = self.pp
        L = 1 << self.num_vars
        M = 1 << self.logm
        num_chunks = self.num_chunks
        mem_chunk = list(pp.memory_to_dimension_index)
        mem_sub = list(pp.memory_to_subtable_index)

        def to_base(x):
            u = x.astype(jnp.uint32)
            if be.from_u32 is not None:
                return be.from_u32(u)
            return GL(u, jnp.zeros_like(u))

        def run(inputs, sub_dev, sel_int):
            leaves = jax.tree.leaves(inputs)
            dims_int = [
                ((leaves[c // 2] >> (16 * (c % 2))) & 0xFFFF).astype(jnp.int32)
                for c in range(num_chunks)
            ]
            dims_gl = [to_base(d) for d in dims_int]
            # ONE stable sort per chunk (not per memory): memories sharing a
            # chunk reuse the chunk's (addr, row)-order; each memory's
            # selector-masked read counters come from a segmented exclusive
            # cumsum of its selector in that order (the per-memory argsort
            # made polynomialize ~25% of the gl16384 prove).
            chunk_sorted = []
            for c in range(num_chunks):
                addr = dims_int[c]
                order = jnp.argsort(addr, stable=True)
                saddr = addr[order]
                first = jnp.searchsorted(saddr, saddr, side="left")
                chunk_sorted.append((order, first))
            wits = []
            for m in range(len(mem_chunk)):
                c = mem_chunk[m]
                addr = dims_int[c]
                sel = sel_int[m]
                order, first = chunk_sorted[c]
                sel_sorted = (sel[order] > 0).astype(jnp.int32)
                cum = jnp.cumsum(sel_sorted) - sel_sorted  # exclusive
                ranks = cum - cum[first]
                read_ts = jnp.zeros(L, dtype=jnp.int32).at[order].set(ranks)
                read_ts = jnp.where(sel > 0, read_ts, 0)
                key = jnp.where(sel > 0, addr, M)
                final = (
                    jnp.zeros(M + 1, dtype=jnp.int32)
                    .at[key]
                    .add(1, mode="drop")[:M]
                )
                table = sub_dev[mem_sub[m]]
                e = be.select(
                    sel > 0,
                    jax.tree.map(lambda a: a[addr], table),
                    be.zeros(addr.shape),
                )
                wits.append(
                    {
                        "dim": dims_gl[c],
                        "e": e,
                        "read_ts": to_base(read_ts),
                        "final_cts": to_base(final),
                        "subtable": table,
                        "sel_dense": to_base(sel),
                    }
                )
            return wits, dims_gl

        fn = self._poly_prog_cache = jax.jit(run)
        return fn

    def polynomialize(self, inputs):
        """inputs: base-field [2^num_vars] lookup values (shifted, in-range).
        Returns (witnesses, dims_by_chunk) for memory checking + collation.
        One fused dispatch over cached static device data."""
        sub_dev, sel_int = self._static_dev()
        wits, dims_gl = self._poly_prog()(inputs, sub_dev, sel_int)
        witnesses = [
            mc.MemoryWitness(
                dim=w["dim"],
                e=w["e"],
                read_ts=w["read_ts"],
                final_cts=w["final_cts"],
                subtable=w["subtable"],
                selector=self.memory_selectors[m],
                sel_dense=w["sel_dense"],
            )
            for m, w in enumerate(wits)
        ]
        return witnesses, dims_gl

    # ------------------------------------------------------------------
    # collation
    # ------------------------------------------------------------------

    def _collation_expr(self):
        terms = [
            Term(m, (0, 1 + 2 * m, 2 + 2 * m))
            for m in range(self.pp.num_memories)
        ]
        return SumcheckExpr(terms, 1 + 2 * self.pp.num_memories)

    def prove_claim_reduction(self, inputs, transcript, mesh=None):
        """inputs: GL [2^num_vars] (the node's single input MLE).
        Returns [(point, claim)] for the input node."""
        be = self.be
        spec = be.spec
        with span("LassoNode::polynomialize"):
            witnesses, dims_gl = self.polynomialize(inputs)

        r = transcript.squeeze_challenges(self.num_vars)
        claimed_sum = mle.evaluate(be, inputs, r)
        transcript.write_felt_ext(claimed_sum)

        expr = self._collation_expr()
        with span("LassoNode::collation_sum_check"):
            tables = [mle.eq_table(be, r)]
            for m, w in enumerate(witnesses):
                tables.extend([w.sel_dense, w.e])

            from ..runtime import sanity_enabled

            if sanity_enabled():
                # collation claim vs direct evaluation (lasso.rs:265-267
                # parity): sum_m w_m * <eq(r), sel_m . e_m> must equal the
                # input MLE evaluated at r
                acc = spec.zero
                for m, w in enumerate(witnesses):
                    dg = be.sum_digest(
                        be.mul(tables[0], be.mul(w.sel_dense, w.e))
                    )
                    val = spec._c(be.digest_value(dg))
                    acc = spec.eadd(
                        acc, spec.emul(spec._c(self.weights[m]), val)
                    )
                if acc != spec._c(claimed_sum):
                    raise AssertionError(
                        "sanity: collation claim != direct evaluation"
                    )
            fclaim, x, fevals = prove_sum_check(
                be, expr, self.weights, claimed_sum, tables, transcript,
                mesh=mesh,
            )
        e_openings = [fevals[2 + 2 * m] for m in range(self.pp.num_memories)]
        transcript.write_felts_ext(e_openings)

        gamma = transcript.squeeze_challenge()
        tau = transcript.squeeze_challenge()
        with span("LassoNode::memory_checking"):
            return self._prove_mc(
                witnesses, dims_gl, gamma, tau, transcript, r, claimed_sum,
                mesh=mesh,
            )

    def _prove_mc(self, witnesses, dims_gl, gamma, tau, transcript, r,
                  claimed_sum, mesh=None):
        mc.prove_memory_checking(
            self.be,
            witnesses,
            self.pp.memory_to_dimension_index,
            dims_gl,
            gamma,
            tau,
            transcript,
            mesh=mesh,
        )
        return [(r, claimed_sum)]

    # ------------------------------------------------------------------
    # device-resident prove (round-2 fast path): polynomialize dispatches
    # plus ONE fused program for collation + memory checking — transcript
    # bytes identical to prove_claim_reduction
    # ------------------------------------------------------------------

    def prove_claim_reduction_device(self, inputs, dtx):
        """inputs: base [2^num_vars] device vector. Returns (r point buffer
        [num_vars] ext device, dtx).

        Pipeline of enqueued programs (collation | MC tree builds | MC
        transcript loops) — one fused program explodes XLA compile time
        (verify-skill hazard 8/10); the device transcript flows between
        programs so there are still zero host round trips."""
        from ..gkr import dsumcheck as dsc
        from ..gkr import dtranscript as dt
        from . import dmemory_checking as dmc

        be = self.be
        import os

        sync = (
            jax.block_until_ready
            if os.environ.get("HYPERGRECO_SYNC_SPANS") == "1"
            else (lambda x: x)
        )
        with span("LassoNode::polynomialize"):
            witnesses, dims_gl = self.polynomialize(inputs)
            sync(dims_gl)
        wdicts = [dmc.witness_dict(w) for w in witnesses]

        key = "dprove"
        if key not in getattr(self, "_progs", {}):
            if not hasattr(self, "_progs"):
                self._progs = {}
            nv = self.num_vars
            expr = self._collation_expr()
            weights = self.weights

            def collation(inputs, wds, dtx):
                import jax.numpy as jnp

                r, dtx = dt.squeeze_challenges(be, dtx, nv)
                eq_r = dsc.eq_table_dyn(be, r, nv, jnp.int32(nv))
                claimed_sum = dsc.digest_scalar(be, be.mul(eq_r, inputs))
                dtx = dt.write_ext(be, dtx, claimed_sum)

                tables = [eq_r]
                for w in wds:
                    tables.extend(
                        [be.lift(w["sel_dense"]), be.lift(w["e"])]
                    )
                stk = jax.tree.map(
                    lambda *rows: jnp.stack(rows),
                    *(tables + [be.ext.ones((1 << nv,))]),
                )
                cdev = dsc.coeffs_device(be, weights)
                x, fevals, dtx = dsc.rounds_static(
                    be, expr.key(), len(weights), nv, stk, cdev, dtx
                )
                lay = np.asarray(
                    [2 + 2 * m for m in range(len(wds))], dtype=np.int32
                )
                dtx = dt.write_ext(
                    be, dtx, jax.tree.map(lambda a: a[lay], fevals)
                )
                gamma, dtx = dt.squeeze_challenge(be, dtx)
                tau, dtx = dt.squeeze_challenge(be, dtx)
                return r, gamma, tau, dtx

            self._progs[key] = jax.jit(collation)
        with span("LassoNode::collation (device)"):
            r, gamma, tau, dtx = self._progs[key](inputs, wdicts, dtx)
            sync(dtx.log_len)
        with span("LassoNode::memory_checking (device)"):
            dtx = dmc.mc_prove_device(
                be, wdicts, list(self.pp.memory_to_dimension_index),
                dims_gl, gamma, tau, dtx,
            )
        return r, dtx

    def verify_claim_reduction(self, transcript):
        spec = self.be.spec
        pp = self.pp
        r = transcript.squeeze_challenges(self.num_vars)
        claimed_sum = transcript.read_felt_ext()

        fclaim, x = verify_sum_check(
            spec, 3, self.num_vars, claimed_sum, transcript
        )
        e_open = transcript.read_felts_ext(pp.num_memories)
        eq_eval = mle.eq_eval(spec, r, x)
        acc = spec.zero
        for m in range(pp.num_memories):
            sel_eval = self.memory_selectors[m].evaluate_mle(spec, x)
            acc = spec.eadd(
                acc,
                spec.escale(
                    spec.emul(sel_eval, spec._c(e_open[m])), self.weights[m]
                ),
            )
        if spec.emul(eq_eval, acc) != fclaim:
            raise ValueError("lasso: collation claim mismatch")

        gamma = transcript.squeeze_challenge()
        tau = transcript.squeeze_challenge()

        shapes = []
        for m in range(pp.num_memories):
            st = pp.subtables[pp.memory_to_subtable_index[m]]
            shapes.append(
                mc.MemoryShape(
                    selector=self.memory_selectors[m],
                    table_mle=(
                        lambda spec_, point, st_=st: st_.evaluate_mle(
                            spec_, point, pp.M
                        )
                    ),
                    chunk_index=pp.memory_to_dimension_index[m],
                )
            )
        mc.verify_memory_checking(
            spec,
            shapes,
            self.num_chunks,
            self.num_vars,
            self.logm,
            gamma,
            tau,
            transcript,
        )
        return [(r, claimed_sum)]
