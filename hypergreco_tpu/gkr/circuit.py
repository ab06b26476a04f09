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


#: compiled programs shared across SHAPE-COMPATIBLE node instances: wiring
#: (coefficients, source indices, constants) is passed as device-array
#: ARGUMENTS, never embedded as program constants, so one compiled program
#: serves every node with the same (P, log2_sub, R, G, slot-count) shape
#: signature — e.g. all K sai_eval mul nodes, all r2is chunk relays, and the
#: es/k1kis scale nodes share programs. This is the round-4 executable-size
#: keystone: embedded wiring made single node programs tens of MB (the
#: gl32768 phase-1 program killed the tunnel compile service, and the device
#: code arena overflowed so every dispatch re-uploaded executables at
#: ~33 ms each — scratch/prof_sync_r4.log).
_PROG_CACHE: dict = {}

# checkpoint schema (prove_gkr resume=): bump when the cursor layout or
# claim-frontier encoding changes — old checkpoints are rejected loudly
CHECKPOINT_VERSION = 2

# monotonic node identity for device-state cache keys: CPython id() values
# can be REUSED after a node is garbage-collected, which would alias cache
# entries across rebuilt circuits (ADVICE r4)
import itertools as _itertools

_NODE_UIDS = _itertools.count()


def _node_uid(node) -> int:
    uid = getattr(node, "_hg_uid", None)
    if uid is None:
        uid = node._hg_uid = next(_NODE_UIDS)
    return uid


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

    def _maxc(self, p=None) -> tuple:
        """STATIC per-slot scatter collision bounds (max sources per
        target in the public wiring): (lin bounds, quad a-side bounds,
        quad b-side bounds). Drives scatter_add_mod's column width."""
        mc = getattr(self, "_maxc_cache", None)
        if mc is None:
            const, lin, quad = self._build_wiring(p)

            def fan(arr):
                return int(np.bincount(arr.astype(np.int64)).max()) if len(
                    arr
                ) else 1

            mc = self._maxc_cache = (
                tuple(fan(sl["src"]) for sl in lin),
                tuple(fan(sq["a"]) for sq in quad),
                tuple(fan(sq["b"]) for sq in quad),
            )
        return mc

    def _shape_sig(self, p=None) -> tuple:
        """Program-sharing key: everything that shapes the traced program.
        Wiring VALUES are arguments, so nodes with different wiring but the
        same signature share one compiled executable. Collision bounds are
        included (they select the scatter column width)."""
        const, lin, quad = self._build_wiring(p)
        return (
            self.P, self.log2_sub, self.R, self.G,
            len(lin), tuple((sq["pa"], sq["pb"]) for sq in quad),
            self._maxc(p),
        )

    def _get_prog(self, be, key, make):
        if key in self._progs:
            return self._progs[key]
        gkey = (be.spec.name, self._shape_sig(be.spec.p), key)
        fn = _PROG_CACHE.get(gkey)
        if fn is None:
            fn = jax.jit(make())
            _PROG_CACHE[gkey] = fn
        self._progs[key] = fn
        return fn

    def _wiring_dev(self, be):
        """Device-resident wiring (built once per node, uploaded once):
        field-typed coefficient/constant vectors + int32 index arrays.
        Passed as ARGUMENTS to the shared programs."""
        wd = getattr(self, "_wiring_dev_cache", None)
        if wd is None:
            const, lin, quad = self._build_wiring(be.spec.p)
            S = self.S
            wd = {
                "const": self._const_vec(be, const),
                "lin": [
                    {
                        "coef": self._const_vec(be, sl["coef"]),
                        "src": jnp.asarray(sl["src"].astype(np.int32)),
                    }
                    for sl in lin
                ],
                "quad": [
                    {
                        "coef": self._const_vec(be, sq["coef"]),
                        # local (per-poly) and flat (concat-space) indices
                        "a": jnp.asarray(
                            (sq["a"] - sq["pa"] * S).astype(np.int32)
                        ),
                        "b": jnp.asarray(
                            (sq["b"] - sq["pb"] * S).astype(np.int32)
                        ),
                        "a_flat": jnp.asarray(sq["a"].astype(np.int32)),
                        "b_flat": jnp.asarray(sq["b"].astype(np.int32)),
                    }
                    for sq in quad
                ],
            }
            jax.block_until_ready(jax.tree.leaves(wd))
            self._wiring_dev_cache = wd
        return wd

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
        def make():
            def run(flat, wd):
                out = wd["const"]
                for sl in wd["lin"]:
                    g = jax.tree.map(lambda a: a[sl["src"]], flat)
                    out = be.add(out, be.mul(sl["coef"], g))
                for sq in wd["quad"]:
                    ga = jax.tree.map(lambda a: a[sq["a_flat"]], flat)
                    gb = jax.tree.map(lambda a: a[sq["b_flat"]], flat)
                    out = be.add(out, be.mul(sq["coef"], be.mul(ga, gb)))
                return out

            return run

        flat = _concat_flat(be, inputs, self.P, self.S)
        return self._get_prog(be, "eval", make)(flat, self._wiring_dev(be))

    # ----- claim reduction -----

    def _phase1_parts(self, be, Eq, flat):
        """Prover scatters: A_flat [P*S] and H_q tables [S] per quad slot."""
        P, S = self.P, self.S

        mc_lin, mc_a, mc_b = self._maxc(be.spec.p)

        def make():
            def run(Eq, flat, wd):
                A = None
                for si, sl in enumerate(wd["lin"]):
                    vals = be.mul(Eq, sl["coef"])
                    part = be.scatter_add_mod(
                        sl["src"], vals, P * S, max_coll=mc_lin[si]
                    )
                    A = part if A is None else be.add(A, part)
                if A is None:
                    A = be.zeros((P * S,), ext=True)
                Hs = []
                for si, sq in enumerate(wd["quad"]):
                    gb = jax.tree.map(lambda a: a[sq["b_flat"]], flat)
                    vals = be.mul(be.mul(Eq, sq["coef"]), gb)
                    Hs.append(
                        be.scatter_add_mod(
                            sq["a"], vals, S, max_coll=mc_a[si]
                        )
                    )
                # dot <Eq, const>
                cdot = be.sum_digest(be.mul(Eq, wd["const"]))
                return A, Hs, cdot

            return run

        return self._get_prog(be, "phase1", make)(
            Eq, flat, self._wiring_dev(be)
        )

    def _w_tables(self, be, Eq, eq_u):
        S = self.S

        _, mc_a, mc_b = self._maxc(be.spec.p)

        def make():
            def run(Eq, eq_u, wd):
                Ws = []
                for si, sq in enumerate(wd["quad"]):
                    vals = be.mul(
                        be.mul(Eq, sq["coef"]),
                        jax.tree.map(lambda a: a[sq["a"]], eq_u),
                    )
                    Ws.append(
                        be.scatter_add_mod(
                            sq["b"], vals, S, max_coll=mc_b[si]
                        )
                    )
                return Ws

            return run

        return self._get_prog(be, "w", make)(Eq, eq_u, self._wiring_dev(be))

    def _split_A(self, be, A_flat):
        P, S = self.P, self.S
        return [
            jax.tree.map(lambda a: a[p * S : (p + 1) * S], A_flat)
            for p in range(P)
        ]

    def _quad_meta(self, p):
        quad = self._build_wiring(p)[2]
        pa_list = [sq["pa"] for sq in quad]
        pbs = sorted({sq["pb"] for sq in quad})
        return quad, pa_list, pbs

    # ----- grouped claim reduction (protocol v2, PROTOCOL.md "grouped
    # reductions"): B shape-identical independent nodes prove ONE batched
    # two-phase sumcheck; B = 1 reproduces the single-node protocol -----

    @staticmethod
    def _group_phase1_expr(P: int, pa_list, B: int) -> SumcheckExpr:
        """Tables: per instance b a block [A_{b,0}, in_{b,0}, ..,
        A_{b,P-1}, in_{b,P-1}] (offset 2*P*b), then all H_{b,q} b-major."""
        nq = len(pa_list)
        H0 = 2 * P * B
        terms = []
        for b in range(B):
            off = 2 * P * b
            for p in range(P):
                terms.append(Term(None, (off + 2 * p, off + 2 * p + 1)))
            for qi, pa in enumerate(pa_list):
                terms.append(
                    Term(None, (H0 + b * nq + qi, off + 2 * pa + 1))
                )
        return SumcheckExpr(terms, H0 + B * nq)

    @staticmethod
    def prove_group_reduction(be, nodes, claims_list, inputs_list,
                              transcript, mesh=None):
        """Host-path batched reduction over B shape-identical nodes.

        claims_list[b]: the (point, value) claims of node b (equal count
        across members); inputs_list[b]: node b's input tables. Returns
        per-node out_claims (list of per-input-poly claim lists)."""
        spec = be.spec
        node0 = nodes[0]
        B = len(nodes)
        P, S = node0.P, node0.S
        npts = len(claims_list[0])
        assert all(len(c) == npts for c in claims_list)
        quad, pa_list, pbs = node0._quad_meta(spec.p)
        nq = len(quad)

        points = [[c[0] for c in cl] for cl in claims_list]
        values = [[spec._c(c[1]) for c in cl] for cl in claims_list]
        total = B * npts
        alpha = transcript.squeeze_challenge() if total > 1 else spec.one
        alphas = spec.epowers(alpha, total)
        combined = spec.zero
        for b in range(B):
            for i in range(npts):
                combined = spec.eadd(
                    combined, spec.emul(alphas[b * npts + i], values[b][i])
                )

        tables, Hs_all, Eqs = [], [], []
        cterm = spec.zero
        for b, node in enumerate(nodes):
            Eq = eq_rlc_table(
                be, points[b], alphas[b * npts : (b + 1) * npts]
            )
            flat = _concat_flat(be, inputs_list[b], P, S)
            A_flat, Hs, cdot = node._phase1_parts(be, Eq, flat)
            cterm = spec.eadd(cterm, spec._c(be.digest_value(cdot)))
            for p, A in enumerate(node._split_A(be, A_flat)):
                tables.extend([A, inputs_list[b][p]])
            Hs_all.append(Hs)
            Eqs.append(Eq)
        for Hs in Hs_all:
            tables.extend(Hs)
        claim1 = spec.esub(combined, cterm)

        expr = VanillaNode._group_phase1_expr(P, pa_list, B)
        fclaim, u, fevals = prove_sum_check(
            be, expr, [], claim1, tables, transcript, mesh=mesh
        )
        H0 = 2 * P * B
        in_evals = [
            [fevals[2 * P * b + 2 * p + 1] for p in range(P)]
            for b in range(B)
        ]
        h_evals = [
            [fevals[H0 + b * nq + qi] for qi in range(nq)] for b in range(B)
        ]
        wr = []
        for b in range(B):
            wr.extend(in_evals[b])
            wr.extend(h_evals[b])
        transcript.write_felts_ext(wr)

        out_claims = [
            [[(u, in_evals[b][p])] for p in range(P)] for b in range(B)
        ]

        if quad:
            beta = transcript.squeeze_challenge()
            betas = [spec.epow(beta, i) for i in range(B * nq)]
            claim2 = spec.zero
            for b in range(B):
                for qi in range(nq):
                    claim2 = spec.eadd(
                        claim2,
                        spec.emul(
                            betas[b * nq + qi], spec._c(h_evals[b][qi])
                        ),
                    )
            eq_u = eq_rlc_table(be, [u], [spec.one])
            # tables: W_{b,q} (beta-scaled) b-major, then in_{b,pb} b-major
            tables2 = []
            for b, node in enumerate(nodes):
                Ws = node._w_tables(be, Eqs[b], eq_u)
                tables2.extend(
                    be.scale(W, betas[b * nq + qi])
                    for qi, W in enumerate(Ws)
                )
            for b in range(B):
                tables2.extend(inputs_list[b][pb] for pb in pbs)
            Wc = B * nq
            pb_idx = {pb: i for i, pb in enumerate(pbs)}
            terms2 = [
                Term(
                    None,
                    (
                        b * nq + qi,
                        Wc + b * len(pbs) + pb_idx[sq["pb"]],
                    ),
                )
                for b in range(B)
                for qi, sq in enumerate(quad)
            ]
            expr2 = SumcheckExpr(terms2, Wc + B * len(pbs))
            fclaim2, v2, fevals2 = prove_sum_check(
                be, expr2, [], claim2, tables2, transcript, mesh=mesh
            )
            pb_evals = [
                [fevals2[Wc + b * len(pbs) + i] for i in range(len(pbs))]
                for b in range(B)
            ]
            transcript.write_felts_ext(
                [e for row in pb_evals for e in row]
            )
            for b in range(B):
                for i, pb in enumerate(pbs):
                    out_claims[b][pb].append((v2, pb_evals[b][i]))
        return out_claims

    @staticmethod
    def prove_group_reduction_device(be, nodes, claim_pts_list, inputs_list,
                                     dtx):
        """Device-resident batched reduction: B instances' scatters, both
        fused sumchecks and all transcript traffic in ONE compiled program —
        transcript bytes identical to prove_group_reduction. Generated code
        size is INDEPENDENT of B: per-instance work is vectorized over a
        leading instance axis (one flat scatter per wiring slot, grouped eq
        tables, block-reshaped table stacking).

        claim_pts_list[b]: list of [v_out] ext device point buffers for
        node b (equal counts). Returns (per-node out_claims point buffers,
        dtx)."""
        from . import dsumcheck as dsc
        from . import dtranscript as dt

        node0 = nodes[0]
        B = len(nodes)
        npts = len(claim_pts_list[0])
        assert all(len(c) == npts for c in claim_pts_list)
        quad, pa_list, pbs = node0._quad_meta(be.spec.p)
        # static scatter collision bounds (identical across the group —
        # part of the shape signature)
        mc_lin, mc_a, mc_b = node0._maxc(be.spec.p)

        def make():
            P, S = node0.P, node0.S
            vout = node0.log2_output_size()
            sv = S.bit_length() - 1
            nq = len(quad)
            npb = len(pbs)
            expr = VanillaNode._group_phase1_expr(P, pa_list, B)
            total = B * npts

            def run(pts, flat, dtx, wd):
                # pts: [B, npts, vout]; flat: [B, P*S] base; wd: stacked
                # wiring ([B, ...] leaves)
                if total > 1:
                    alpha, dtx = dt.squeeze_challenge(be, dtx)
                    alphas = dsc.powers(be, alpha, total)
                else:
                    alphas = be.ext.ones((1,))
                Eq = dsc.eq_rlc_grouped(be, pts, alphas, vout, B, npts)
                boff_ps = (
                    jnp.arange(B, dtype=jnp.int32) * (P * S)
                )[:, None]
                boff_s = (jnp.arange(B, dtype=jnp.int32) * S)[:, None]
                A = None
                for si, sl in enumerate(wd["lin"]):
                    vals = be.mul(Eq, sl["coef"])  # [B, Y]
                    idx = (sl["src"] + boff_ps).reshape(-1)
                    part = be.scatter_add_mod(
                        idx,
                        jax.tree.map(lambda a: a.reshape(-1), vals),
                        B * P * S,
                        max_coll=mc_lin[si],
                    )
                    A = part if A is None else be.add(A, part)
                if A is None:
                    A = be.zeros((B * P * S,), ext=True)
                Hs = []
                for si, sq in enumerate(wd["quad"]):
                    gb = jax.tree.map(
                        lambda a, i=sq["b_flat"]: jnp.take_along_axis(
                            a, i, axis=1
                        ),
                        flat,
                    )
                    vals = be.mul(be.mul(Eq, sq["coef"]), gb)
                    idx = (sq["a"] + boff_s).reshape(-1)
                    Hs.append(
                        be.scatter_add_mod(
                            idx,
                            jax.tree.map(lambda a: a.reshape(-1), vals),
                            B * S,
                            max_coll=mc_a[si],
                        )
                    )
                # stacked buffer rows: [A_{b,p} | in_{b,p}] interleaved
                # (block reshape, no per-row stacking), then H_{b,q} b-major
                Ablk = be.reshape(A, (B * P, S))
                Inblk = be.lift(be.reshape(flat, (B * P, S)))
                AI = jax.tree.map(
                    lambda a, i: jnp.stack([a, i], axis=1).reshape(
                        2 * B * P, S
                    ),
                    Ablk, Inblk,
                )
                rows = [AI]
                if nq:
                    Hblk = jax.tree.map(
                        lambda *hs: jnp.stack(
                            [h.reshape(B, S) for h in hs], axis=1
                        ).reshape(B * nq, S),
                        *Hs,
                    )
                    rows.append(Hblk)
                rows.append(be.ext.ones((1, S)))
                stk = jax.tree.map(
                    lambda *rs: jnp.concatenate(rs, axis=0), *rows
                )
                cdev = dsc.coeffs_device(be, [])
                u, fevals, dtx = dsc.rounds_static(
                    be, expr.key(), 0, sv, stk, cdev, dtx
                )
                H0 = 2 * P * B
                lay = np.asarray(
                    [
                        j
                        for b in range(B)
                        for j in (
                            [2 * P * b + 2 * p + 1 for p in range(P)]
                            + [H0 + b * nq + qi for qi in range(nq)]
                        )
                    ],
                    dtype=np.int32,
                )
                dtx = dt.write_ext(
                    be, dtx, jax.tree.map(lambda a: a[lay], fevals)
                )
                if not nq:
                    return u, u, dtx
                beta, dtx = dt.squeeze_challenge(be, dtx)
                betas = dsc.powers(be, beta, B * nq)
                betas_r = jax.tree.map(
                    lambda a: a.reshape((B, nq) + a.shape[1:]), betas
                )
                eq_u = dsc.eq_rlc(
                    be,
                    jax.tree.map(lambda a: a[None], u),
                    be.ext.ones((1,)),
                    sv,
                    1,
                )
                Ws = []
                for qi, sq in enumerate(wd["quad"]):
                    ga = jax.tree.map(
                        lambda a, i=sq["a"]: a[i], eq_u
                    )  # [B, Y] gather of the shared [S] table
                    vals = be.mul(be.mul(Eq, sq["coef"]), ga)
                    idx = (sq["b"] + boff_s).reshape(-1)
                    W = be.scatter_add_mod(
                        idx,
                        jax.tree.map(lambda a: a.reshape(-1), vals),
                        B * S,
                        max_coll=mc_b[qi],
                    )
                    Wb = be.reshape(W, (B, S))
                    bq = jax.tree.map(
                        lambda a, qi=qi: a[:, qi : qi + 1], betas_r
                    )
                    Ws.append(be.mul(Wb, bq))
                Wblk = jax.tree.map(
                    lambda *ws: jnp.stack(ws, axis=1).reshape(B * nq, S),
                    *Ws,
                )
                pb_rows = np.asarray(
                    [b * P + pb for b in range(B) for pb in pbs],
                    dtype=np.int32,
                )
                Inpb = jax.tree.map(lambda a: a[pb_rows], Inblk)
                stk2 = jax.tree.map(
                    lambda *rs: jnp.concatenate(rs, axis=0),
                    Wblk, Inpb, be.ext.ones((1, S)),
                )
                Wc = B * nq
                pb_idx = {pb: i for i, pb in enumerate(pbs)}
                terms2 = [
                    Term(
                        None,
                        (b * nq + qi, Wc + b * npb + pb_idx[sq["pb"]]),
                    )
                    for b in range(B)
                    for qi, sq in enumerate(quad)
                ]
                expr2 = SumcheckExpr(terms2, Wc + B * npb)
                v2, fevals2, dtx = dsc.rounds_static(
                    be, expr2.key(), 0, sv, stk2, cdev, dtx
                )
                lay2 = np.asarray(
                    [Wc + b * npb + i for b in range(B) for i in range(npb)],
                    dtype=np.int32,
                )
                dtx = dt.write_ext(
                    be, dtx, jax.tree.map(lambda a: a[lay2], fevals2)
                )
                return u, v2, dtx

            return run

        gkey = (
            be.spec.name, node0._shape_sig(be.spec.p), ("dgroup", B, npts)
        )
        fn = _PROG_CACHE.get(gkey)
        if fn is None:
            fn = _PROG_CACHE[gkey] = jax.jit(make())
        # stacked per-group device state (wiring + inputs + points); the
        # wiring stack is static — cached on the group's first node
        wkey = ("gwd", be.spec.name, tuple(_node_uid(n) for n in nodes))
        wd_stk = getattr(node0, "_group_wd_cache", {}).get(wkey)
        if wd_stk is None:
            wd_stk = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[n._wiring_dev(be) for n in nodes],
            )
            if not hasattr(node0, "_group_wd_cache"):
                node0._group_wd_cache = {}
            node0._group_wd_cache[wkey] = wd_stk
        flats = [
            _concat_flat(be, inputs_list[b], node0.P, node0.S)
            for b in range(B)
        ]
        flat_stk = jax.tree.map(lambda *xs: jnp.stack(xs), *flats)
        pts = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[
                jax.tree.map(lambda *ys: jnp.stack(ys), *cl)
                for cl in claim_pts_list
            ],
        )
        u, v2, dtx = fn(pts, flat_stk, dtx, wd_stk)
        out_claims = [[[u] for _ in range(node0.P)] for _ in range(B)]
        if quad:
            for b in range(B):
                for pb in pbs:
                    out_claims[b][pb].append(v2)
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

    @staticmethod
    def verify_group_reduction(be, nodes, claims_list, transcript):
        """Pure-host batched verifier: per-instance wiring MLEs A~, W~ and
        <Eq, const> are evaluated in closed form over each node's affine-run
        decomposition (O(runs * v^2) scalar ext ops) — no device programs,
        no transfers. Mirrors prove_group_reduction's transcript exactly;
        B = 1 is the plain single-node verification."""
        spec = be.spec
        node0 = nodes[0]
        B = len(nodes)
        P = node0.P
        npts = len(claims_list[0])
        assert all(len(c) == npts for c in claims_list)
        quad, pa_list, pbs = node0._quad_meta(spec.p)
        nq = len(quad)

        points = [[c[0] for c in cl] for cl in claims_list]
        values = [[spec._c(c[1]) for c in cl] for cl in claims_list]
        total = B * npts
        alpha = transcript.squeeze_challenge() if total > 1 else spec.one
        alphas = spec.epowers(alpha, total)
        al_b = [alphas[b * npts : (b + 1) * npts] for b in range(B)]
        combined = spec.zero
        for b in range(B):
            for i in range(npts):
                combined = spec.eadd(
                    combined, spec.emul(al_b[b][i], values[b][i])
                )

        cterm = spec.zero
        for b, node in enumerate(nodes):
            cr, _, _ = node._host_wiring()
            for y0, y1, val in cr:
                s = node._eq_wiring_sum(
                    spec, points[b], al_b[b], [((y0, y1), [])]
                )
                cterm = spec.eadd(cterm, spec.escale(s, val))
        claim1 = spec.esub(combined, cterm)

        sv = node0.S.bit_length() - 1
        fclaim, u = verify_sum_check(spec, 2, sv, claim1, transcript)
        evals = transcript.read_felts_ext(B * (P + nq))
        in_evals = [
            [evals[b * (P + nq) + p] for p in range(P)] for b in range(B)
        ]
        h_evals = [
            [evals[b * (P + nq) + P + qi] for qi in range(nq)]
            for b in range(B)
        ]

        acc = spec.zero
        for b, node in enumerate(nodes):
            _, lrs, _ = node._host_wiring()
            # A_{b,p}~(u) = sum_runs coef * sum_i alpha_i
            #               sum_y eq(pt_i, y) eq(u, y + (local0 - y0))
            a_evals = [spec.zero] * P
            for runs in lrs:
                for y0, y1, coef, (src0,) in runs:
                    p_idx = src0 // node.S
                    local0 = src0 - p_idx * node.S
                    s = node._eq_wiring_sum(
                        spec, points[b], al_b[b],
                        [((y0, y1), [(u, local0 - y0)])],
                    )
                    a_evals[p_idx] = spec.eadd(
                        a_evals[p_idx], spec.escale(s, coef)
                    )
            for p in range(P):
                acc = spec.eadd(
                    acc, spec.emul(a_evals[p], spec._c(in_evals[b][p]))
                )
            for qi, sq in enumerate(quad):
                acc = spec.eadd(
                    acc,
                    spec.emul(
                        spec._c(h_evals[b][qi]),
                        spec._c(in_evals[b][sq["pa"]]),
                    ),
                )
        if acc != fclaim:
            raise ValueError("vanilla node: phase-1 claim mismatch")

        out_claims = [
            [[(u, in_evals[b][p])] for p in range(P)] for b in range(B)
        ]
        if quad:
            beta = transcript.squeeze_challenge()
            betas = [spec.epow(beta, i) for i in range(B * nq)]
            claim2 = spec.zero
            for b in range(B):
                for qi in range(nq):
                    claim2 = spec.eadd(
                        claim2,
                        spec.emul(
                            betas[b * nq + qi], spec._c(h_evals[b][qi])
                        ),
                    )
            fclaim2, v2 = verify_sum_check(spec, 2, sv, claim2, transcript)
            pb_evals = transcript.read_felts_ext(B * len(pbs))
            acc2 = spec.zero
            for b, node in enumerate(nodes):
                _, _, qrs = node._host_wiring()
                pb_map = {
                    pb: pb_evals[b * len(pbs) + i]
                    for i, pb in enumerate(pbs)
                }
                for qi, (sq, runs) in enumerate(zip(quad, qrs)):
                    wsum = spec.zero
                    for y0, y1, coef, (a0, b0) in runs:
                        aloc0 = a0 - sq["pa"] * node.S
                        bloc0 = b0 - sq["pb"] * node.S
                        s = node._eq_wiring_sum(
                            spec, points[b], al_b[b],
                            [((y0, y1), [(u, aloc0 - y0), (v2, bloc0 - y0)])],
                        )
                        wsum = spec.eadd(wsum, spec.escale(s, coef))
                    acc2 = spec.eadd(
                        acc2,
                        spec.emul(
                            spec.emul(betas[b * nq + qi], wsum),
                            spec._c(pb_map[sq["pb"]]),
                        ),
                    )
            if acc2 != fclaim2:
                raise ValueError("vanilla node: phase-2 claim mismatch")
            for b in range(B):
                for i, pb in enumerate(pbs):
                    out_claims[b][pb].append(
                        (v2, pb_evals[b * len(pbs) + i])
                    )
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

    @staticmethod
    def prove_group_reduction(be, nodes, claims_list, inputs_list,
                              transcript, mesh=None):
        """Host-path batched reduction over B same-shape FFT nodes: ONE
        degree-2 sumcheck proves sum_b alpha-block_b <d_b, in_b>; B = 1 is
        the single-node protocol."""
        spec = be.spec
        node0 = nodes[0]
        B = len(nodes)
        logl = node0.log2_size
        npts = len(claims_list[0])
        assert all(len(c) == npts for c in claims_list)
        points = [[c[0] for c in cl] for cl in claims_list]
        values = [[spec._c(c[1]) for c in cl] for cl in claims_list]
        total = B * npts
        alpha = transcript.squeeze_challenge() if total > 1 else spec.one
        alphas = spec.epowers(alpha, total)
        combined = spec.zero
        for b in range(B):
            for i in range(npts):
                combined = spec.eadd(
                    combined, spec.emul(alphas[b * npts + i], values[b][i])
                )
        tables = []
        for b, node in enumerate(nodes):
            d = ntt.dft_row_mle(
                be, points[b], alphas[b * npts : (b + 1) * npts],
                logl, node.inverse,
            )
            tables.extend([d, inputs_list[b][0]])
        expr = SumcheckExpr(
            [Term(None, (2 * b, 2 * b + 1)) for b in range(B)], 2 * B
        )
        fclaim, u, fevals = prove_sum_check(
            be, expr, [], combined, tables, transcript, mesh=mesh
        )
        in_evals = [fevals[2 * b + 1] for b in range(B)]
        transcript.write_felts_ext(in_evals)
        return [[[(u, in_evals[b])]] for b in range(B)]

    @staticmethod
    def prove_group_reduction_device(be, nodes, claim_pts_list, inputs_list,
                                     dtx):
        from . import dsumcheck as dsc
        from . import dtranscript as dt

        node0 = nodes[0]
        B = len(nodes)
        npts = len(claim_pts_list[0])
        assert all(len(c) == npts for c in claim_pts_list)
        gkey = (
            be.spec.name, "fft", node0.log2_size, node0.inverse,
            ("dgroup", B, npts),
        )
        fn = _PROG_CACHE.get(gkey)
        if fn is None:
            logl = node0.log2_size
            inverse = node0.inverse
            total = B * npts
            expr = SumcheckExpr(
                [Term(None, (2 * b, 2 * b + 1)) for b in range(B)], 2 * B
            )

            def run(pts, xs, dtx, wtab):
                # pts: [B, npts, logl]; xs: [B, 2^logl] base
                if total > 1:
                    alpha, dtx = dt.squeeze_challenge(be, dtx)
                    alphas = dsc.powers(be, alpha, total)
                else:
                    alphas = be.ext.ones((1,))
                d = ntt.dft_row_mle_grouped(
                    be, pts, alphas, wtab, logl, inverse, B, npts
                )  # [B, L]
                DX = jax.tree.map(
                    lambda dd, xx: jnp.stack([dd, xx], axis=1).reshape(
                        2 * B, 1 << logl
                    ),
                    d, be.lift(xs),
                )
                stk = jax.tree.map(
                    lambda a, o: jnp.concatenate([a, o], axis=0),
                    DX, be.ext.ones((1, 1 << logl)),
                )
                cdev = dsc.coeffs_device(be, [])
                u, fevals, dtx = dsc.rounds_static(
                    be, expr.key(), 0, logl, stk, cdev, dtx
                )
                lay = np.asarray(
                    [2 * b + 1 for b in range(B)], dtype=np.int32
                )
                dtx = dt.write_ext(
                    be, dtx, jax.tree.map(lambda a: a[lay], fevals)
                )
                return u, dtx

            fn = _PROG_CACHE[gkey] = jax.jit(run)
        pts = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[
                jax.tree.map(lambda *ys: jnp.stack(ys), *cl)
                for cl in claim_pts_list
            ],
        )
        xs = jax.tree.map(
            lambda *x: jnp.stack(x), *[inp[0] for inp in inputs_list]
        )
        wtab = ntt._wpow_table(
            be.spec.name, 1 << node0.log2_size, node0.inverse
        )
        u, dtx = fn(pts, xs, dtx, wtab)
        return [[[u]] for _ in range(B)], dtx

    @staticmethod
    def verify_group_reduction(be, nodes, claims_list, transcript):
        """Host batched verifier: d~_b(u) = <d_b, eq_u> via numpy field
        vectors; per DISTINCT claim point the row table is built once and
        dotted once (grouped nodes usually share their claim point, so the
        B d-tables of the ungrouped verifier collapse to one)."""
        from ..utils.npfield import NpField

        spec = be.spec
        node0 = nodes[0]
        B = len(nodes)
        logl = node0.log2_size
        npts = len(claims_list[0])
        assert all(len(c) == npts for c in claims_list)
        points = [[c[0] for c in cl] for cl in claims_list]
        values = [[spec._c(c[1]) for c in cl] for cl in claims_list]
        total = B * npts
        alpha = transcript.squeeze_challenge() if total > 1 else spec.one
        alphas = spec.epowers(alpha, total)
        combined = spec.zero
        for b in range(B):
            for i in range(npts):
                combined = spec.eadd(
                    combined, spec.emul(alphas[b * npts + i], values[b][i])
                )
        fclaim, u = verify_sum_check(spec, 2, logl, combined, transcript)
        in_evals = transcript.read_felts_ext(B)
        npf = NpField.for_spec(spec)
        equ = npf.eq_table([spec._c(r) for r in u])
        # <d_pt, eq_u> per distinct (point, inverse) — cached across b, i
        dcache = {}

        def d_dot(pt, inverse):
            key = (tuple(spec._c(r) for r in pt), inverse)
            v = dcache.get(key)
            if v is None:
                d = npf.d_table(
                    [[spec._c(r) for r in pt]], [spec.one], logl, inverse
                )
                v = dcache[key] = npf.dot_ext(d, equ)
            return v

        acc = spec.zero
        for b, node in enumerate(nodes):
            db_eval = spec.zero
            for i in range(npts):
                db_eval = spec.eadd(
                    db_eval,
                    spec.emul(
                        alphas[b * npts + i],
                        d_dot(points[b][i], node.inverse),
                    ),
                )
            acc = spec.eadd(
                acc, spec.emul(db_eval, spec._c(in_evals[b]))
            )
        if acc != fclaim:
            raise ValueError("fft node: claim mismatch")
        return [[[(u, in_evals[b])]] for b in range(B)]


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
        self._sched = None
        return len(self.nodes) - 1

    def connect(self, src: int, dst: int):
        assert src != dst
        self.node_inputs[dst].append(src)
        self._topo = None
        self._sched = None

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

    def reduction_schedule(self) -> List[List[int]]:
        """Groups of shape-identical, mutually independent non-input nodes
        in a reverse-topological GROUP order (PROTOCOL.md "grouped
        reductions").

        Nodes are keyed by (type, shape signature, depth) where depth is the
        longest path to an output: equal-depth nodes are never connected, so
        contracting them is cycle-free, and processing groups by ascending
        depth guarantees every member's claims are complete (all consumers
        sit at strictly smaller depth). Deterministic: derived from circuit
        structure only — prover and verifier walk the identical schedule."""
        if getattr(self, "_sched", None) is not None:
            return self._sched
        order = self.topo_order()
        n = len(self.nodes)
        consumers = [[] for _ in range(n)]
        for dst, ins in enumerate(self.node_inputs):
            for src in ins:
                consumers[src].append(dst)
        depth = [0] * n
        for nid in reversed(order):
            depth[nid] = max(
                (depth[c] + 1 for c in consumers[nid]), default=0
            )
        groups: dict = {}
        for nid in range(n):
            node = self.nodes[nid]
            if node.is_input():
                continue
            if isinstance(node, VanillaNode):
                key = ("v", node._shape_sig(self.be.spec.p), depth[nid])
            elif isinstance(node, FftNode):
                key = ("f", node.log2_size, node.inverse, depth[nid])
            else:
                key = ("x", nid)
            groups.setdefault(key, []).append(nid)
        self._sched = [
            sorted(m)
            for m in sorted(
                groups.values(), key=lambda m: (depth[m[0]], min(m))
            )
        ]
        return self._sched


def _group_units(circuit, claims, group):
    """Split a schedule group into batchable units at walk time: members
    with equal claim counts batch together; claimless members are skipped.
    Deterministic given the (deterministic) claim evolution, so prover and
    verifier derive identical units."""
    members = [nid for nid in group if claims[nid]]
    if not members:
        return []
    node0 = circuit.nodes[members[0]]
    if isinstance(node0, (VanillaNode, FftNode)):
        by_cnt: dict = {}
        for m in members:
            by_cnt.setdefault(len(claims[m]), []).append(m)
        return [("group", by_cnt[c]) for c in sorted(by_cnt)]
    return [("single", [m]) for m in members]


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

    Walks the grouped reduction schedule (Circuit.reduction_schedule):
    shape-identical independent nodes prove ONE batched reduction per group.

    Checkpoint/resume (SURVEY.md §5.4: per-GKR-group checkpointing of the
    transcript state + claim frontier for multi-hour proofs):
    - `checkpoint_cb(state)` is invoked after every schedule group with a
      picklable dict (transcript snapshot + claim frontier + group cursor).
    - `resume=state` fast-forwards a FRESH transcript/claims to that point
      (the circuit and `values` are rebuilt by the caller — node values are
      deterministic re-evaluations of the inputs)."""
    be = circuit.be
    claims = [[] for _ in circuit.nodes]
    outs = circuit.output_ids()
    assert len(output_claims) == len(outs)
    for nid, cl in zip(outs, output_claims):
        claims[nid] = [cl]
    sched = circuit.reduction_schedule()
    start = 0
    if resume is not None:
        # `next_index` changed meaning in round 4 (per-node -> per-GROUP
        # cursor); an old-schema checkpoint would silently desync the
        # transcript (ADVICE r4), so version mismatches fail loudly here
        if resume.get("version") != CHECKPOINT_VERSION:
            raise ValueError(
                f"checkpoint schema version {resume.get('version')!r} != "
                f"{CHECKPOINT_VERSION}; re-prove from scratch (the group "
                "cursor layout changed)"
            )
        transcript.restore(resume["transcript"])
        claims = [list(c) for c in resume["claims"]]
        start = resume["next_index"]
    for idx, group in enumerate(sched):
        if idx < start:
            continue
        for kind, members in _group_units(circuit, claims, group):
            nodes = [circuit.nodes[m] for m in members]
            ins_list = [circuit.node_inputs[m] for m in members]
            if kind == "group":
                name = f"{type(nodes[0]).__name__}x{len(members)}{members}"
                with span(f"{name}::prove_group_reduction"):
                    outs_ = type(nodes[0]).prove_group_reduction(
                        be, nodes,
                        [claims[m] for m in members],
                        [[values[j] for j in ins] for ins in ins_list],
                        transcript, mesh=mesh,
                    )
            else:
                m = members[0]
                with span(
                    f"{type(nodes[0]).__name__}[{m}]::prove_claim_reduction"
                ):
                    outs_ = [
                        nodes[0].prove_claim_reduction(
                            be, claims[m],
                            [values[j] for j in ins_list[0]], transcript,
                            mesh=mesh,
                        )
                    ]
            for ins, child in zip(ins_list, outs_):
                assert len(child) == len(ins)
                for cid, cls_ in zip(ins, child):
                    claims[cid].extend(cls_)
        if checkpoint_cb is not None:
            checkpoint_cb(
                {
                    "version": CHECKPOINT_VERSION,
                    "next_index": idx + 1,
                    "transcript": transcript.snapshot(),
                    "claims": [list(c) for c in claims],
                }
            )
    return [claims[i] for i in circuit.input_ids()]


def prove_gkr_device(circuit: Circuit, values: list, output_claim_pts: list,
                     dtx):
    """Device-resident GKR prover: the grouped reduction walk of prove_gkr
    with device claim-point buffers — ALL transcript traffic stays on
    device; the host only enqueues per-group programs (async) and never
    reads a device value. Transcript bytes are identical to prove_gkr, so
    verify_gkr verifies the resulting proof unchanged.

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
    for group in circuit.reduction_schedule():
        for kind, members in _group_units(circuit, claims, group):
            nodes = [circuit.nodes[m] for m in members]
            ins_list = [circuit.node_inputs[m] for m in members]
            if kind == "group":
                name = f"{type(nodes[0]).__name__}x{len(members)}{members}"
                with span(f"{name}::dgroup"):
                    outs_, dtx = type(nodes[0]).prove_group_reduction_device(
                        be, nodes,
                        [claims[m] for m in members],
                        [[values[j] for j in ins] for ins in ins_list],
                        dtx,
                    )
                    if sync_spans:
                        jax.block_until_ready(dtx.log_len)
            else:
                m = members[0]
                with span(f"{type(nodes[0]).__name__}[{m}]::dprove"):
                    child, dtx = nodes[0].prove_claim_reduction_device(
                        be, claims[m],
                        [values[j] for j in ins_list[0]], dtx,
                    )
                    outs_ = [child]
                    if sync_spans:
                        jax.block_until_ready(dtx.log_len)
            for ins, child in zip(ins_list, outs_):
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
    for group in circuit.reduction_schedule():
        for kind, members in _group_units(circuit, claims, group):
            nodes = [circuit.nodes[m] for m in members]
            ins_list = [circuit.node_inputs[m] for m in members]
            if kind == "group":
                name = f"{type(nodes[0]).__name__}x{len(members)}{members}"
                with span(f"{name}::verify_group_reduction"):
                    outs_ = type(nodes[0]).verify_group_reduction(
                        be, nodes, [claims[m] for m in members], transcript
                    )
            else:
                m = members[0]
                with span(
                    f"{type(nodes[0]).__name__}[{m}]::verify_claim_reduction"
                ):
                    outs_ = [
                        nodes[0].verify_claim_reduction(
                            be, claims[m], transcript
                        )
                    ]
            for ins, child in zip(ins_list, outs_):
                assert len(child) == len(ins)
                for cid, cls_ in zip(ins, child):
                    claims[cid].extend(cls_)
    return [claims[i] for i in circuit.input_ids()]
