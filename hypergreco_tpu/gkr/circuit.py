"""GKR circuit runtime: DAG of claim-reducing nodes.

Reference parity: the external `gkr` crate's circuit layer reconstructed from
its usage (SURVEY.md §2.2): `Circuit::{insert, connect, evaluate}`,
`InputNode`, `VanillaNode`+`VanillaGate`, `FftNode`, `prove_gkr`/`verify_gkr`
(sk_encryption_circuit.rs:86-293, 433-457, 503-516).

Claim-reduction design (self-defined message formats; the fork is offline):

* Multiple claims on one node are merged by an alpha-RLC (squeeze alpha,
  combined value = sum alpha^i v_i, combined eq table Eq = sum alpha^i
  eq(r_i)) — the CombinedEvalClaim analog.

* VanillaNode (out[rep*G + g] = gate_g over per-rep input slices): proven
  Libra-style in TWO batched sumchecks over the per-poly input index space,
  with prover-side O(Y) scatters instead of sparse wiring walks:
    phase 1 (deg 2):  combined - <Eq, const> =
        sum_j [ sum_p A_p(j) in_p(j) + sum_q H_q(j) in_{pa_q}(j) ]
      A_p(j) = sum_y Eq(y) lincoef(y) [src(y) = (p, j)]      (public scatter)
      H_q(j) = sum_y Eq(y) qcoef(y) in(b_q(y)) [a_q(y) = j]  (witness scatter)
    phase 2 (deg 2, only with quadratic gates): claims sum_q beta^q H_q~(u)
      reduce through W_q(k) = sum_y Eq(y) qcoef(y) eq_u(a_q(y)) [b_q(y) = k].
  The verifier recomputes A_p~/W_q~ itself on device from the public wiring
  (device-assisted verifier — the protocol has no succinct-verifier claim
  anyway: the reference verifier already holds all inputs, README.md:15).

* FftNode: out~(r) = sum_j d_r(j) in(j) with the DFT-row MLE table d_r
  (ops/ntt.py) — one deg-2 sumcheck; the verifier recomputes d~(u) on device.

* LassoNode: adapter over lasso/node.py (ignores the incoming claim like the
  reference, lasso.rs:58-63; exports the input claim (r, input~(r))).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mle, ntt
from ..utils.tracing import span
from ..ops.fe import Backend, get_backend
from ..ops.gl import GL
from .sumcheck import SumcheckExpr, Term, prove_sum_check, verify_sum_check


# ---------------------------------------------------------------------------
# gates
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VanillaGate:
    """out = const + sum coef*in(w) + sum coef*in(w0)*in(w1); wires are
    (input_poly, index-within-rep-slice) pairs (VanillaGate parity,
    sk_encryption_circuit.rs:98-114, 525-531)."""

    const: Optional[int] = None
    linear: Tuple = ()  # ((coef|None, (poly, idx)), ...)
    quadratic: Tuple = ()  # ((coef|None, (p0, i0), (p1, i1)), ...)

    @staticmethod
    def relay(w):
        return VanillaGate(None, ((None, w),), ())

    @staticmethod
    def constant(c: int):
        return VanillaGate(c, (), ())

    @staticmethod
    def mul(w0, w1):
        return VanillaGate(None, (), ((None, w0, w1),))

    @staticmethod
    def sum_gate(ws):
        return VanillaGate(None, tuple((None, w) for w in ws), ())

    @staticmethod
    def new(const, linear, quadratic):
        return VanillaGate(const, tuple(linear), tuple(quadratic))


def relay_mul_const(w, c: int) -> VanillaGate:
    return VanillaGate.new(None, [(c, w)], [])


def relay_add_const(w, c: int) -> VanillaGate:
    return VanillaGate.new(c, [(None, w)], [])


# ---------------------------------------------------------------------------
# nodes
# ---------------------------------------------------------------------------


#: compiled programs shared across STRUCTURALLY IDENTICAL node instances
#: (same wiring bytes / FFT shape): e.g. the K=16 sai_eval mul nodes and the
#: K=16 ai_eval FFT nodes each compile once, not 16 times. Keyed by
#: (spec, node-structure digest, program key); closures over identical
#: wiring constants trace to identical jaxprs, so sharing is sound.
_PROG_CACHE: dict = {}


class Node:
    def is_input(self) -> bool:
        return False

    def log2_output_size(self) -> int:
        raise NotImplementedError

    def evaluate(self, be: Backend, inputs: list):
        raise NotImplementedError

    def prove_claim_reduction(self, be, claims, inputs, transcript,
                              mesh=None):
        raise NotImplementedError

    def verify_claim_reduction(self, be, claims, transcript):
        raise NotImplementedError


class InputNode(Node):
    def __init__(self, log2_size: int, num_reps: int = 1):
        self.log2_size = log2_size
        self.num_reps = num_reps

    def is_input(self) -> bool:
        return True

    def log2_output_size(self) -> int:
        return self.log2_size + (self.num_reps.bit_length() - 1)


def _combine_claims(be, claims, transcript):
    """alpha-RLC of (point, value) claims; returns (points, alphas, value)."""
    spec = be.spec
    points = [c[0] for c in claims]
    values = [spec._c(c[1]) for c in claims]
    if len(claims) == 1:
        return points, [spec.one], values[0]
    alpha = transcript.squeeze_challenge()
    alphas = [spec.epow(alpha, i) for i in range(len(claims))]
    combined = spec.zero
    for a, v in zip(alphas, values):
        combined = spec.eadd(combined, spec.emul(a, v))
    return points, alphas, combined


@lru_cache(maxsize=None)
def _eq_rlc_jit(be_name: str, v: int, npts: int):
    """Eq(x) = sum_i alphas[i] * eq(points[i], x) as a dense [2^v] ext table
    (bit-product form: no concatenation)."""
    be = get_backend(be_name)
    N = 1 << v

    def run(points, alphas):
        x = jnp.arange(N, dtype=jnp.uint32)
        acc = None
        for i in range(npts):
            prod = None
            for b in range(v):
                rb = be.index(points, (i, b))
                bit = ((x >> b) & 1) == 1
                one_minus = be.sub(be.ext.ones(()), rb)
                f = be.select(bit, rb, one_minus)
                prod = f if prod is None else be.mul(prod, f)
                if (b + 1) % 3 == 0:
                    prod = be.fusion_break(prod)
            term = be.mul(be.index(alphas, i), prod)
            acc = be.fusion_break(
                term if acc is None else be.add(acc, term)
            )
        return acc

    return jax.jit(run)


def eq_rlc_table(be, points, alphas):
    spec = be.spec
    v = len(points[0])
    assert all(len(p) == v for p in points)
    pts = be.from_ints([spec._c(r) for pt in points for r in pt], ext=True)
    pts = be.reshape(pts, (len(points), v))
    al = be.from_ints([spec._c(a) for a in alphas], ext=True)
    return _eq_rlc_jit(spec.name, v, len(points))(pts, al)


class VanillaNode(Node):
    """Layered gate node (VanillaNode parity). Output
    out[rep*G + g] = gate_g evaluated on wires (p, i) -> in_p[rep*2^sub + i].
    """

    def __init__(self, num_input_polys, log2_sub_input_size, gates, num_reps=1):
        gates = list(gates)
        # pad the gate list to a power of two with constant-zero gates (the
        # reference's lasso_inputs_batched node is 5*2n gates for K=1 and its
        # consumers treat the output as the padded 2^ceil size)
        G = len(gates)
        Gp = 1 if G == 0 else 1 << (G - 1).bit_length()
        gates.extend([VanillaGate.constant(0)] * (Gp - G))
        G = Gp
        assert G & (G - 1) == 0 and G > 0
        assert num_reps & (num_reps - 1) == 0
        self.P = num_input_polys
        self.log2_sub = log2_sub_input_size
        self.gates = list(gates)
        self.R = num_reps
        self.G = G
        self.Y = G * num_reps
        self.S = (1 << log2_sub_input_size) * num_reps  # per-poly input size
        self._wiring = None
        self._wiring_p = None
        self._progs = {}

    def log2_output_size(self) -> int:
        return self.Y.bit_length() - 1

    @classmethod
    def from_wiring(
        cls,
        num_input_polys: int,
        log2_sub_input_size: int,
        num_gates: int,
        num_reps: int = 1,
        *,
        const=None,
        lin=(),
        quad=(),
    ):
        """Vectorized constructor: wiring given directly as flat numpy
        arrays over the padded output index space Y = Gp * num_reps
        (Gp = next power of two >= num_gates) — no per-gate Python objects
        (the per-gate path is ~1M dataclass objects per node at the
        32768_16x59 scale).

        const: u64[Y] (already reduced mod p) or None.
        lin:   iterable of (coef u64[Y], src i64[Y]) linear slots.
        quad:  iterable of (coef u64[Y], a i64[Y], b i64[Y], pa, pb).
        src/a/b are flat input indices poly*S + rep*2^log2_sub + idx;
        coef 0 disables the slot for that gate (use src 0)."""
        self = cls.__new__(cls)
        G = 1 if num_gates == 0 else 1 << (num_gates - 1).bit_length()
        assert num_reps & (num_reps - 1) == 0
        self.P = num_input_polys
        self.log2_sub = log2_sub_input_size
        self.gates = None
        self.R = num_reps
        self.G = G
        self.Y = G * num_reps
        self.S = (1 << log2_sub_input_size) * num_reps
        Y = self.Y

        def _pad(a, fill=0):
            """Arrays may cover just num_gates entries when num_reps == 1;
            the pow-2 padding gates are constant-zero (coef/const 0)."""
            if num_reps == 1 and a.shape == (num_gates,) and num_gates != Y:
                return np.concatenate(
                    [a, np.full(Y - num_gates, fill, dtype=a.dtype)]
                )
            return a

        carr = (
            np.zeros(Y, dtype=np.uint64)
            if const is None
            else _pad(np.asarray(const, dtype=np.uint64))
        )
        assert carr.shape == (Y,)
        lin_list = []
        for coef, src in lin:
            coef = _pad(np.asarray(coef, dtype=np.uint64))
            src = _pad(np.asarray(src, dtype=np.int64))
            assert coef.shape == (Y,) and src.shape == (Y,)
            assert src.min() >= 0 and src.max() < self.P * self.S
            lin_list.append({"coef": coef, "src": src})
        quad_list = []
        for coef, a, b, pa, pb in quad:
            coef = _pad(np.asarray(coef, dtype=np.uint64))
            a = _pad(np.asarray(a, dtype=np.int64), fill=pa * self.S)
            b = _pad(np.asarray(b, dtype=np.int64), fill=pb * self.S)
            assert coef.shape == (Y,) and a.shape == (Y,) and b.shape == (Y,)
            assert (a // self.S == pa).all() and (b // self.S == pb).all()
            quad_list.append(
                {"coef": coef, "a": a, "b": b, "pa": pa, "pb": pb}
            )
        self._wiring = (carr, lin_list, quad_list)
        self._wiring_p = -1  # wiring is pre-reduced; p no longer needed
        self._progs = {}
        return self

    # ----- shared program cache -----

    def _digest(self, p) -> str:
        """Structure digest for the shared program cache: shapes + wiring
        bytes (wiring must be built, so callers pass p)."""
        d = getattr(self, "_digest_val", None)
        if d is None:
            import hashlib

            const, lin, quad = self._build_wiring(p)
            h = hashlib.sha1()
            h.update(
                repr((self.P, self.log2_sub, self.R, self.G)).encode()
            )
            h.update(const.tobytes())
            for sl in lin:
                h.update(sl["coef"].tobytes())
                h.update(sl["src"].tobytes())
            for sq in quad:
                h.update(repr((sq["pa"], sq["pb"])).encode())
                h.update(sq["coef"].tobytes())
                h.update(sq["a"].tobytes())
                h.update(sq["b"].tobytes())
            d = self._digest_val = h.hexdigest()
        return d

    def _get_prog(self, be, key, make):
        if key in self._progs:
            return self._progs[key]
        gkey = (be.spec.name, self._digest(be.spec.p), key)
        fn = _PROG_CACHE.get(gkey)
        if fn is None:
            fn = jax.jit(make())
            _PROG_CACHE[gkey] = fn
        self._progs[key] = fn
        return fn

    # ----- static wiring arrays -----

    def _build_wiring(self, p=None):
        if p is not None and self._wiring_p is None:
            self._wiring_p = p
        if self._wiring is not None:
            return self._wiring
        assert self._wiring_p is not None, "first wiring call must pass p"
        G, R, Y, Ssub = self.G, self.R, self.Y, 1 << self.log2_sub
        L1 = max((len(g.linear) for g in self.gates), default=0)
        L2 = max((len(g.quadratic) for g in self.gates), default=0)
        const = np.zeros(Y, dtype=np.uint64)
        lin = [
            {
                "coef": np.zeros(Y, dtype=np.uint64),
                "src": np.zeros(Y, dtype=np.int64),  # p*S + rep*Ssub + idx
            }
            for _ in range(L1)
        ]
        quad = [
            {
                "coef": np.zeros(Y, dtype=np.uint64),
                "a": np.zeros(Y, dtype=np.int64),
                "b": np.zeros(Y, dtype=np.int64),
                "pa": set(),
                "pb": set(),
            }
            for _ in range(L2)
        ]
        p = self._wiring_p
        for rep in range(R):
            for g, gate in enumerate(self.gates):
                y = rep * G + g
                if gate.const is not None:
                    const[y] = int(gate.const) % p
                for s, (coef, (pl, idx)) in enumerate(gate.linear):
                    lin[s]["coef"][y] = (
                        1 if coef is None else int(coef) % p
                    )
                    lin[s]["src"][y] = pl * self.S + rep * Ssub + idx
                for s, (coef, (pa, ia), (pb, ib)) in enumerate(gate.quadratic):
                    quad[s]["coef"][y] = 1 if coef is None else int(coef) % p
                    quad[s]["a"][y] = pa * self.S + rep * Ssub + ia
                    quad[s]["b"][y] = pb * self.S + rep * Ssub + ib
                    quad[s]["pa"].add(pa)
                    quad[s]["pb"].add(pb)
        for q in quad:
            assert len(q["pa"]) == 1 and len(q["pb"]) == 1, (
                "each quadratic slot must draw each side from one input poly"
            )
            q["pa"] = next(iter(q["pa"]))
            q["pb"] = next(iter(q["pb"]))
        self._wiring = (const, lin, quad)
        return self._wiring

    @staticmethod
    def _const_vec(be, arr_u64):
        """u64 numpy constants -> base field device vector (field-generic:
        lo + 2^32 * hi from two uint32 planes; wiring constants are < 2^64
        after reduction mod p for Goldilocks, and the BFV constants fit u64
        for BN254 as well)."""
        lo = jnp.asarray((arr_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        hi = jnp.asarray((arr_u64 >> np.uint64(32)).astype(np.uint32))
        out = be.from_u32(lo)
        if bool(np.any(arr_u64 >> np.uint64(32))):
            out = be.add(out, be.scale(be.from_u32(hi), 1 << 32))
        return out

    # ----- forward evaluation -----

    def evaluate(self, be: Backend, inputs: list):
        const, lin, quad = self._build_wiring(be.spec.p)

        def make():
            def run(flat):
                out = self._const_vec(be, const)
                for sl in lin:
                    src = sl["src"].astype(np.int32)
                    g = jax.tree.map(lambda a: a[src], flat)
                    out = be.add(out, be.mul(self._const_vec(be, sl["coef"]), g))
                for sq in quad:
                    ga = jax.tree.map(
                        lambda a: a[sq["a"].astype(np.int32)], flat
                    )
                    gb = jax.tree.map(
                        lambda a: a[sq["b"].astype(np.int32)], flat
                    )
                    out = be.add(
                        out,
                        be.mul(
                            self._const_vec(be, sq["coef"]), be.mul(ga, gb)
                        ),
                    )
                return out

            return run

        flat = _concat_flat(be, inputs, self.P, self.S)
        return self._get_prog(be, "eval", make)(flat)

    # ----- claim reduction -----

    def _phase1_parts(self, be, Eq, flat):
        """Prover scatters: A_flat [P*S] and H_q tables [S] per quad slot."""
        const, lin, quad = self._build_wiring(be.spec.p)
        P, S = self.P, self.S

        def make():
            def run(Eq, flat):
                A = None
                for sl in lin:
                    vals = be.mul(Eq, self._const_vec(be, sl["coef"]))
                    part = be.scatter_add_mod(
                        jnp.asarray(sl["src"].astype(np.int32)), vals, P * S
                    )
                    A = part if A is None else be.add(A, part)
                if A is None:
                    A = be.zeros((P * S,), ext=True)
                Hs = []
                for sq in quad:
                    gb = jax.tree.map(
                        lambda a: a[sq["b"].astype(np.int32)], flat
                    )
                    vals = be.mul(
                        be.mul(Eq, self._const_vec(be, sq["coef"])), gb
                    )
                    tgt = (sq["a"] - sq["pa"] * S).astype(np.int32)
                    Hs.append(be.scatter_add_mod(jnp.asarray(tgt), vals, S))
                # dot <Eq, const>
                cdot = be.sum_digest(be.mul(Eq, self._const_vec(be, const)))
                return A, Hs, cdot

            return run

        return self._get_prog(be, "phase1", make)(Eq, flat)

    def _w_tables(self, be, Eq, eq_u):
        const, lin, quad = self._build_wiring(be.spec.p)
        S = self.S

        def make():
            def run(Eq, eq_u):
                Ws = []
                for sq in quad:
                    ga = (sq["a"] - sq["pa"] * S).astype(np.int32)
                    gbt = (sq["b"] - sq["pb"] * S).astype(np.int32)
                    vals = be.mul(
                        be.mul(Eq, self._const_vec(be, sq["coef"])),
                        jax.tree.map(lambda a: a[ga], eq_u),
                    )
                    Ws.append(be.scatter_add_mod(jnp.asarray(gbt), vals, S))
                return Ws

            return run

        return self._get_prog(be, "w", make)(Eq, eq_u)

    def _split_A(self, be, A_flat):
        P, S = self.P, self.S
        return [
            jax.tree.map(lambda a: a[p * S : (p + 1) * S], A_flat)
            for p in range(P)
        ]

    def _phase1_expr(self):
        _, lin, quad = self._build_wiring()
        # tables: [A_0, in_0, A_1, in_1, ..., H_0, H_1, ...]
        terms = [Term(None, (2 * p, 2 * p + 1)) for p in range(self.P)]
        for qi, sq in enumerate(quad):
            terms.append(Term(None, (2 * self.P + qi, 2 * sq["pa"] + 1)))
        return SumcheckExpr(terms, 2 * self.P + len(quad))

    def prove_claim_reduction(self, be, claims, inputs, transcript,
                              mesh=None):
        spec = be.spec
        const, lin, quad = self._build_wiring(be.spec.p)
        points, alphas, combined = _combine_claims(be, claims, transcript)
        Eq = eq_rlc_table(be, points, alphas)
        flat = _concat_flat(be, inputs, self.P, self.S)
        A_flat, Hs, cdot = self._phase1_parts(be, Eq, flat)
        cterm = spec._c(be.digest_value(cdot))
        claim1 = spec.esub(combined, cterm)

        tables = []
        for p, A in enumerate(self._split_A(be, A_flat)):
            tables.extend([A, inputs[p]])
        tables.extend(Hs)
        expr = self._phase1_expr()
        fclaim, u, fevals = prove_sum_check(
            be, expr, [], claim1, tables, transcript, mesh=mesh
        )
        in_evals = [fevals[2 * p + 1] for p in range(self.P)]
        h_evals = [fevals[2 * self.P + qi] for qi in range(len(quad))]
        transcript.write_felts_ext(in_evals + h_evals)

        out_claims = [[(u, in_evals[p])] for p in range(self.P)]

        if quad:
            beta = transcript.squeeze_challenge()
            betas = [spec.epow(beta, i) for i in range(len(quad))]
            claim2 = spec.zero
            for bq, hv in zip(betas, h_evals):
                claim2 = spec.eadd(claim2, spec.emul(bq, spec._c(hv)))
            eq_u = eq_rlc_table(be, [u], [spec.one])
            Ws = self._w_tables(be, Eq, eq_u)
            # tables: [W'_0 .. W'_{nq-1}, in_{pb} uniq...]
            pbs = sorted({sq["pb"] for sq in quad})
            pb_pos = {pb: len(quad) + i for i, pb in enumerate(pbs)}
            tables2 = [be.scale(W, bq) for W, bq in zip(Ws, betas)]
            tables2 += [inputs[pb] for pb in pbs]
            terms2 = [
                Term(None, (qi, pb_pos[sq["pb"]]))
                for qi, sq in enumerate(quad)
            ]
            expr2 = SumcheckExpr(terms2, len(quad) + len(pbs))
            fclaim2, v2, fevals2 = prove_sum_check(
                be, expr2, [], claim2, tables2, transcript, mesh=mesh
            )
            pb_evals = [fevals2[pb_pos[pb]] for pb in pbs]
            transcript.write_felts_ext(pb_evals)
            for pb, ev in zip(pbs, pb_evals):
                out_claims[pb].append((v2, ev))
        return out_claims

    def prove_claim_reduction_device(self, be, claim_pts, inputs, dtx):
        """Device-resident claim reduction: both phases, scatters, fused
        sumchecks and all transcript traffic in ONE compiled program —
        transcript bytes identical to prove_claim_reduction.

        claim_pts: list of [v_out] ext device point buffers. Returns
        (out_claims: per-input list of point buffers, dtx)."""
        from . import dsumcheck as dsc
        from . import dtranscript as dt

        const, lin, quad = self._build_wiring(be.spec.p)
        npts = len(claim_pts)
        flat = _concat_flat(be, inputs, self.P, self.S)

        def make():
            P, S = self.P, self.S
            vout = self.log2_output_size()
            sv = S.bit_length() - 1
            expr = self._phase1_expr()
            pbs = sorted({sq["pb"] for sq in quad})
            pb_pos = {pb: len(quad) + i for i, pb in enumerate(pbs)}

            def run(pts, flat, inputs, dtx):
                if npts > 1:
                    alpha, dtx = dt.squeeze_challenge(be, dtx)
                    alphas = dsc.powers(be, alpha, npts)
                else:
                    alphas = be.ext.ones((1,))
                Eq = dsc.eq_rlc(be, pts, alphas, vout, npts)
                A = None
                for sl in lin:
                    vals = be.mul(Eq, self._const_vec(be, sl["coef"]))
                    part = be.scatter_add_mod(
                        jnp.asarray(sl["src"].astype(np.int32)), vals, P * S
                    )
                    A = part if A is None else be.add(A, part)
                if A is None:
                    A = be.zeros((P * S,), ext=True)
                Hs = []
                for sq in quad:
                    gb = jax.tree.map(
                        lambda a: a[sq["b"].astype(np.int32)], flat
                    )
                    vals = be.mul(
                        be.mul(Eq, self._const_vec(be, sq["coef"])), gb
                    )
                    tgt = (sq["a"] - sq["pa"] * S).astype(np.int32)
                    Hs.append(be.scatter_add_mod(jnp.asarray(tgt), vals, S))
                tables = []
                for p in range(P):
                    tables.append(
                        jax.tree.map(lambda a, p=p: a[p * S : (p + 1) * S], A)
                    )
                    tables.append(be.lift(inputs[p]))
                tables.extend(Hs)
                stk = jax.tree.map(
                    lambda *rows: jnp.stack(rows),
                    *(tables + [be.ext.ones((S,))]),
                )
                cdev = dsc.coeffs_device(be, [])
                u, fevals, dtx = dsc.rounds(
                    be, expr.key(), 0, sv, stk, cdev, dtx,
                    jnp.int32(sv), jnp.int32(S),
                )
                lay = np.asarray(
                    [2 * p + 1 for p in range(P)]
                    + [2 * P + qi for qi in range(len(quad))],
                    dtype=np.int32,
                )
                dtx = dt.write_ext(
                    be, dtx, jax.tree.map(lambda a: a[lay], fevals)
                )
                if not quad:
                    return u, u, dtx
                beta, dtx = dt.squeeze_challenge(be, dtx)
                betas = dsc.powers(be, beta, len(quad))
                eq_u = dsc.eq_rlc(
                    be,
                    jax.tree.map(lambda a: a[None], u),
                    be.ext.ones((1,)),
                    sv,
                    1,
                )
                tables2 = []
                for qi, sq in enumerate(quad):
                    ga = (sq["a"] - sq["pa"] * S).astype(np.int32)
                    gbt = (sq["b"] - sq["pb"] * S).astype(np.int32)
                    vals = be.mul(
                        be.mul(Eq, self._const_vec(be, sq["coef"])),
                        jax.tree.map(lambda a: a[ga], eq_u),
                    )
                    W = be.scatter_add_mod(jnp.asarray(gbt), vals, S)
                    tables2.append(be.mul(W, be.index(betas, qi)))
                tables2 += [be.lift(inputs[pb]) for pb in pbs]
                terms2 = [
                    Term(None, (qi, pb_pos[sq["pb"]]))
                    for qi, sq in enumerate(quad)
                ]
                expr2 = SumcheckExpr(terms2, len(quad) + len(pbs))
                stk2 = jax.tree.map(
                    lambda *rows: jnp.stack(rows),
                    *(tables2 + [be.ext.ones((S,))]),
                )
                v2, fevals2, dtx = dsc.rounds(
                    be, expr2.key(), 0, sv, stk2, cdev, dtx,
                    jnp.int32(sv), jnp.int32(S),
                )
                lay2 = np.asarray([pb_pos[pb] for pb in pbs], dtype=np.int32)
                dtx = dt.write_ext(
                    be, dtx, jax.tree.map(lambda a: a[lay2], fevals2)
                )
                return u, v2, dtx

            return run

        fn = self._get_prog(be, ("dprove", npts), make)
        pts = jax.tree.map(lambda *xs: jnp.stack(xs), *claim_pts)
        u, v2, dtx = fn(pts, flat, inputs, dtx)
        out_claims = [[u] for _ in range(self.P)]
        if quad:
            for pb in sorted({sq["pb"] for sq in quad}):
                out_claims[pb].append(v2)
        return out_claims, dtx

    # ----- host verifier (closed-form wiring evaluation) -----

    def _host_wiring(self):
        """Affine-run decomposition of the wiring for the host verifier
        (wiring_eval module): built once per node."""
        cw = getattr(self, "_host_wiring_cache", None)
        if cw is None:
            from . import wiring_eval as we

            const, lin, quad = self._build_wiring()
            cr = we.const_runs(const)
            lrs = [
                we.split_runs_by_block(
                    we.affine_runs(sl["coef"], sl["src"]), self.S
                )
                for sl in lin
            ]
            qrs = [
                we.affine_runs(sq["coef"], sq["a"], sq["b"]) for sq in quad
            ]
            cw = self._host_wiring_cache = (cr, lrs, qrs)
        return cw

    def _eq_wiring_sum(self, spec, points, alphas, runs_pairs):
        """sum_i alpha_i sum_{y in [y0,y1)} eq(pt_i, y) * prod extra eqs."""
        from . import wiring_eval as we

        acc = spec.zero
        for pt, al in zip(points, alphas):
            for (y0, y1), extra in runs_pairs:
                v = we.eq_affine_sum(spec, [(pt, 0)] + extra, y0, y1)
                acc = spec.eadd(acc, spec.emul(al, v))
        return acc

    def verify_claim_reduction(self, be, claims, transcript):
        """Pure-host verifier: the wiring MLEs A_p~(u), W_q~(v2) and
        <Eq, const> are evaluated in closed form over the affine-run
        decomposition (O(runs * v^2) scalar ext ops) — no device programs,
        no transfers (the round-2 device-assisted verifier spent seconds on
        TPU-tunnel round trips; the reference verifies on CPU in ms)."""
        from . import wiring_eval as we

        spec = be.spec
        const, lin, quad = self._build_wiring(be.spec.p)
        points, alphas, combined = _combine_claims(be, claims, transcript)
        cr, lrs, qrs = self._host_wiring()

        cterm = spec.zero
        for y0, y1, val in cr:
            s = self._eq_wiring_sum(spec, points, alphas, [((y0, y1), [])])
            cterm = spec.eadd(cterm, spec.escale(s, val))
        claim1 = spec.esub(combined, cterm)

        sv = self.S.bit_length() - 1
        expr = self._phase1_expr()
        fclaim, u = verify_sum_check(spec, expr.degree, sv, claim1, transcript)
        evals = transcript.read_felts_ext(self.P + len(quad))
        in_evals = evals[: self.P]
        h_evals = evals[self.P :]

        # A_p~(u) = sum_runs coef * sum_i alpha_i
        #           sum_y eq(pt_i, y) eq(u, y + (local0 - y0))
        a_evals = [spec.zero] * self.P
        for runs in lrs:
            for y0, y1, coef, (src0,) in runs:
                p_idx = src0 // self.S
                local0 = src0 - p_idx * self.S
                s = self._eq_wiring_sum(
                    spec, points, alphas,
                    [((y0, y1), [(u, local0 - y0)])],
                )
                a_evals[p_idx] = spec.eadd(a_evals[p_idx], spec.escale(s, coef))
        acc = spec.zero
        for p in range(self.P):
            acc = spec.eadd(acc, spec.emul(a_evals[p], spec._c(in_evals[p])))
        for qi, sq in enumerate(quad):
            acc = spec.eadd(
                acc,
                spec.emul(spec._c(h_evals[qi]), spec._c(in_evals[sq["pa"]])),
            )
        if acc != fclaim:
            raise ValueError("vanilla node: phase-1 claim mismatch")

        out_claims = [[(u, in_evals[p])] for p in range(self.P)]
        if quad:
            beta = transcript.squeeze_challenge()
            betas = [spec.epow(beta, i) for i in range(len(quad))]
            claim2 = spec.zero
            for bq, hv in zip(betas, h_evals):
                claim2 = spec.eadd(claim2, spec.emul(bq, spec._c(hv)))
            fclaim2, v2 = verify_sum_check(spec, 2, sv, claim2, transcript)
            pbs = sorted({sq["pb"] for sq in quad})
            pb_evals = transcript.read_felts_ext(len(pbs))
            pb_map = dict(zip(pbs, pb_evals))
            acc2 = spec.zero
            for qi, (sq, runs) in enumerate(zip(quad, qrs)):
                wsum = spec.zero
                for y0, y1, coef, (a0, b0) in runs:
                    aloc0 = a0 - sq["pa"] * self.S
                    bloc0 = b0 - sq["pb"] * self.S
                    s = self._eq_wiring_sum(
                        spec, points, alphas,
                        [((y0, y1), [(u, aloc0 - y0), (v2, bloc0 - y0)])],
                    )
                    wsum = spec.eadd(wsum, spec.escale(s, coef))
                acc2 = spec.eadd(
                    acc2,
                    spec.emul(
                        spec.emul(betas[qi], wsum), spec._c(pb_map[sq["pb"]])
                    ),
                )
            if acc2 != fclaim2:
                raise ValueError("vanilla node: phase-2 claim mismatch")
            for pb in pbs:
                out_claims[pb].append((v2, pb_map[pb]))
        return out_claims


@lru_cache(maxsize=None)
def _concat_jit(be_name: str, np_: int, s: int):
    def run(inputs):
        return jax.tree.map(lambda *xs: jnp.concatenate(xs), *inputs)

    return jax.jit(run)


def _concat_flat(be, inputs, P, S):
    assert len(inputs) == P
    for x in inputs:
        assert be.length(x) == S, (be.length(x), S)
    if P == 1:
        return inputs[0]
    return _concat_jit(be.spec.name, P, S)(inputs)


class FftNode(Node):
    def __init__(self, log2_size: int, inverse: bool):
        self.log2_size = log2_size
        self.inverse = inverse

    @staticmethod
    def forward(log2_size: int) -> "FftNode":
        return FftNode(log2_size, False)

    @staticmethod
    def inverse_node(log2_size: int) -> "FftNode":
        return FftNode(log2_size, True)

    def log2_output_size(self) -> int:
        return self.log2_size

    def evaluate(self, be: Backend, inputs: list):
        (x,) = inputs
        return ntt.ntt(be, x, inverse=self.inverse)

    def prove_claim_reduction(self, be, claims, inputs, transcript,
                              mesh=None):
        spec = be.spec
        points, alphas, combined = _combine_claims(be, claims, transcript)
        d = ntt.dft_row_mle(be, points, alphas, self.log2_size, self.inverse)
        expr = SumcheckExpr([Term(None, (0, 1))], 2)
        fclaim, u, fevals = prove_sum_check(
            be, expr, [], combined, [d, inputs[0]], transcript, mesh=mesh
        )
        transcript.write_felt_ext(fevals[1])
        return [[(u, fevals[1])]]

    def prove_claim_reduction_device(self, be, claim_pts, inputs, dtx):
        from . import dsumcheck as dsc
        from . import dtranscript as dt

        npts = len(claim_pts)
        gkey = (
            be.spec.name, "fft", self.log2_size, self.inverse,
            ("dprove", npts),
        )
        fn = _PROG_CACHE.get(gkey)
        if fn is None:
            logl = self.log2_size
            inverse = self.inverse
            wtab = ntt._wpow_table(be.spec.name, 1 << logl, inverse)
            expr = SumcheckExpr([Term(None, (0, 1))], 2)

            def run(pts, x, dtx):
                if npts > 1:
                    alpha, dtx = dt.squeeze_challenge(be, dtx)
                    alphas = dsc.powers(be, alpha, npts)
                else:
                    alphas = be.ext.ones((1,))
                d = ntt.dft_row_mle_body(
                    be, pts, alphas, wtab, logl, inverse, npts
                )
                stk = jax.tree.map(
                    lambda *rows: jnp.stack(rows),
                    d, be.lift(x), be.ext.ones((1 << logl,)),
                )
                cdev = dsc.coeffs_device(be, [])
                u, fevals, dtx = dsc.rounds(
                    be, expr.key(), 0, logl, stk, cdev, dtx,
                    jnp.int32(logl), jnp.int32(1 << logl),
                )
                in_eval = jax.tree.map(lambda a: a[1], fevals)
                dtx = dt.write_ext(be, dtx, in_eval)
                return u, dtx

            fn = _PROG_CACHE[gkey] = jax.jit(run)
        pts = jax.tree.map(lambda *xs: jnp.stack(xs), *claim_pts)
        u, dtx = fn(pts, inputs[0], dtx)
        return [[u]], dtx

    def verify_claim_reduction(self, be, claims, transcript):
        """Host verifier: the combined DFT-row MLE d~(u) is evaluated with
        numpy field vectors (NpField.d_table, ~2*2^logl mults per claim
        point via bit-doubling) — no device involvement."""
        from ..utils.npfield import NpField

        spec = be.spec
        points, alphas, combined = _combine_claims(be, claims, transcript)
        fclaim, u = verify_sum_check(
            spec, 2, self.log2_size, combined, transcript
        )
        in_eval = transcript.read_felt_ext()
        npf = NpField.for_spec(spec)
        d = npf.d_table(
            [[spec._c(r) for r in pt] for pt in points],
            [spec._c(a) for a in alphas],
            self.log2_size,
            self.inverse,
        )
        equ = npf.eq_table([spec._c(r) for r in u])
        d_eval = npf.dot_ext(d, equ)
        if spec.emul(d_eval, spec._c(in_eval)) != fclaim:
            raise ValueError("fft node: claim mismatch")
        return [[(u, in_eval)]]


class LassoCircuitNode(Node):
    """Adapter: lasso/node.py LassoNode as a circuit node. Ignores the
    incoming claim (reference parity, lasso.rs:58-63); output is the scalar
    zero polynomial."""

    def __init__(self, lasso_node):
        self.inner = lasso_node

    def log2_output_size(self) -> int:
        return 0

    def evaluate(self, be: Backend, inputs: list):
        return be.zeros((1,))

    def prove_claim_reduction(self, be, claims, inputs, transcript,
                              mesh=None):
        return [
            self.inner.prove_claim_reduction(inputs[0], transcript, mesh=mesh)
        ]

    def prove_claim_reduction_device(self, be, claim_pts, inputs, dtx):
        r, dtx = self.inner.prove_claim_reduction_device(inputs[0], dtx)
        return [[r]], dtx

    def verify_claim_reduction(self, be, claims, transcript):
        return [self.inner.verify_claim_reduction(transcript)]


# ---------------------------------------------------------------------------
# circuit
# ---------------------------------------------------------------------------


class Circuit:
    def __init__(self, be: Backend):
        self.be = be
        self.nodes: List[Node] = []
        self.node_inputs: List[List[int]] = []

    def insert(self, node: Node) -> int:
        self.nodes.append(node)
        self.node_inputs.append([])
        self._topo = None
        return len(self.nodes) - 1

    def connect(self, src: int, dst: int):
        assert src != dst
        self.node_inputs[dst].append(src)
        self._topo = None

    def input_ids(self) -> List[int]:
        return [i for i, n in enumerate(self.nodes) if n.is_input()]

    def output_ids(self) -> List[int]:
        used = {s for ins in self.node_inputs for s in ins}
        return [i for i in range(len(self.nodes)) if i not in used]

    def topo_order(self) -> List[int]:
        """Deterministic (smallest-id-first) topological order; consumers may
        be inserted before their producers (the reference builder does this
        for sai -> sai_par, sk_encryption_circuit.rs:237-260)."""
        if getattr(self, "_topo", None):
            return self._topo
        import heapq

        n = len(self.nodes)
        indeg = [len(ins) for ins in self.node_inputs]
        consumers = [[] for _ in range(n)]
        for dst, ins in enumerate(self.node_inputs):
            for src in ins:
                consumers[src].append(dst)
        heap = [i for i in range(n) if indeg[i] == 0]
        heapq.heapify(heap)
        order = []
        while heap:
            i = heapq.heappop(heap)
            order.append(i)
            for d in consumers[i]:
                indeg[d] -= 1
                if indeg[d] == 0:
                    heapq.heappush(heap, d)
        assert len(order) == n, "circuit has a cycle"
        self._topo = order
        return order

    def evaluate(self, inputs: list) -> list:
        """inputs: device vectors for the input nodes (insertion order).
        Returns per-node value vectors."""
        it = {i: v for i, v in zip(self.input_ids(), inputs)}
        values: List = [None] * len(self.nodes)
        for i in self.topo_order():
            node = self.nodes[i]
            if node.is_input():
                v = it[i]
                assert self.be.length(v) == 1 << node.log2_output_size()
                values[i] = v
            else:
                values[i] = node.evaluate(
                    self.be, [values[j] for j in self.node_inputs[i]]
                )
        return values


def prove_gkr(
    circuit: Circuit,
    values: list,
    output_claims: list,
    transcript,
    checkpoint_cb=None,
    resume=None,
    mesh=None,
):
    """output_claims: [(point, value)] per output node (insertion order).
    Returns claims per input node.

    Checkpoint/resume (SURVEY.md §5.4: per-GKR-node checkpointing of the
    transcript state + claim frontier for multi-hour proofs):
    - `checkpoint_cb(state)` is invoked after every node reduction with a
      picklable dict (transcript snapshot + claim frontier + node cursor).
    - `resume=state` fast-forwards a FRESH transcript/claims to that point
      (the circuit and `values` are rebuilt by the caller — node values are
      deterministic re-evaluations of the inputs)."""
    be = circuit.be
    claims = [[] for _ in circuit.nodes]
    outs = circuit.output_ids()
    assert len(output_claims) == len(outs)
    for nid, cl in zip(outs, output_claims):
        claims[nid] = [cl]
    order = [
        nid for nid in reversed(circuit.topo_order())
        if not circuit.nodes[nid].is_input()
    ]
    start = 0
    if resume is not None:
        transcript.restore(resume["transcript"])
        claims = [list(c) for c in resume["claims"]]
        start = resume["next_index"]
    for idx, nid in enumerate(order):
        if idx < start:
            continue
        node = circuit.nodes[nid]
        if not claims[nid]:
            continue
        ins = circuit.node_inputs[nid]
        with span(f"{type(node).__name__}[{nid}]::prove_claim_reduction"):
            child = node.prove_claim_reduction(
                be, claims[nid], [values[j] for j in ins], transcript,
                mesh=mesh,
            )
        assert len(child) == len(ins)
        for cid, cls_ in zip(ins, child):
            claims[cid].extend(cls_)
        if checkpoint_cb is not None:
            checkpoint_cb(
                {
                    "next_index": idx + 1,
                    "transcript": transcript.snapshot(),
                    "claims": [list(c) for c in claims],
                }
            )
    return [claims[i] for i in circuit.input_ids()]


def prove_gkr_device(circuit: Circuit, values: list, output_claim_pts: list,
                     dtx):
    """Device-resident GKR prover (the round-2 fast path): same reduction
    walk as prove_gkr but claims are device point buffers and ALL transcript
    traffic stays on device — the host only enqueues per-node programs
    (async) and never reads a device value. Transcript bytes are identical
    to prove_gkr, so verify_gkr verifies the resulting proof unchanged.

    output_claim_pts: per output node, a list of [v] ext device point
    buffers (None for an empty-point claim, e.g. the LassoNode's).
    Returns (per-input-node claim point buffers, dtx)."""
    be = circuit.be
    claims = [[] for _ in circuit.nodes]
    outs = circuit.output_ids()
    assert len(output_claim_pts) == len(outs)
    for nid, cl in zip(outs, output_claim_pts):
        claims[nid] = list(cl)
    import os

    sync_spans = os.environ.get("HYPERGRECO_SYNC_SPANS") == "1"
    for nid in reversed(circuit.topo_order()):
        node = circuit.nodes[nid]
        if node.is_input() or not claims[nid]:
            continue
        ins = circuit.node_inputs[nid]
        with span(f"{type(node).__name__}[{nid}]::dprove"):
            child, dtx = node.prove_claim_reduction_device(
                be, claims[nid], [values[j] for j in ins], dtx
            )
            if sync_spans:  # profiling: attribute async device time per node
                jax.block_until_ready(dtx.log_len)
        assert len(child) == len(ins)
        for cid, cls_ in zip(ins, child):
            claims[cid].extend(cls_)
    return [claims[i] for i in circuit.input_ids()], dtx


def verify_gkr(circuit: Circuit, output_claims: list, transcript):
    be = circuit.be
    claims = [[] for _ in circuit.nodes]
    outs = circuit.output_ids()
    assert len(output_claims) == len(outs)
    for nid, cl in zip(outs, output_claims):
        claims[nid] = [cl]
    for nid in reversed(circuit.topo_order()):
        node = circuit.nodes[nid]
        if node.is_input() or not claims[nid]:
            continue
        ins = circuit.node_inputs[nid]
        with span(f"{type(node).__name__}[{nid}]::verify_claim_reduction"):
            child = node.verify_claim_reduction(be, claims[nid], transcript)
        assert len(child) == len(ins)
        for cid, cls_ in zip(ins, child):
            claims[cid].extend(cls_)
    return [claims[i] for i in circuit.input_ids()]
