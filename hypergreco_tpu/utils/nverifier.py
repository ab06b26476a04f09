"""ctypes bindings for the native (C++) verifier core.

`native/nverify.cpp` (Goldilocks/GL2) and `native/nverify_fr.cpp`
(BN254-Fr, 4x64 Montgomery) supply the verifier's hot loops — keccak
transcript reads, the sumcheck round loop, and the O(L) eq/DFT-row table
kernels — at C speed (the pure-Python/numpy counterparts cost ~5 us per
scalar ext mul and ~40 us per numpy dispatch, a 10-50x overhead at the
L <= 2^16 sizes the verifier touches; reference verify is 10.9-529 ms on
an M1, README.md:39-56).

`available(spec)` gates every fast path; the pure-Python
TranscriptReader / NpField paths remain the fallback and the cross-check
oracle (tests/test_nverifier.py, tests/test_nverifier_fr.py).
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..fields import BN254_FR, GOLDILOCKS, FieldSpec
from .keccak import _load_native
from .transcript import TranscriptReader

_u64p = ctypes.POINTER(ctypes.c_uint64)
_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    lib = _load_native()
    if lib is None or not hasattr(lib, "hgv_tr_new"):
        _LIB = None
        return None
    lib.hgv_tr_new.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.hgv_tr_new.restype = ctypes.c_void_p
    lib.hgv_tr_free.argtypes = [ctypes.c_void_p]
    lib.hgv_tr_pos.argtypes = [ctypes.c_void_p]
    lib.hgv_tr_pos.restype = ctypes.c_size_t
    lib.hgv_tr_common.argtypes = [ctypes.c_void_p, _u64p, ctypes.c_size_t]
    lib.hgv_tr_common_bytes.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    lib.hgv_tr_read.argtypes = [ctypes.c_void_p, ctypes.c_size_t, _u64p]
    lib.hgv_tr_read.restype = ctypes.c_int
    lib.hgv_tr_squeeze.argtypes = [ctypes.c_void_p, ctypes.c_size_t, _u64p]
    lib.hgv_tr_squeeze_ext.argtypes = [ctypes.c_void_p, ctypes.c_size_t, _u64p]
    lib.hgv_tr_verify_sumcheck.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        _u64p,
        _u64p,
        _u64p,
    ]
    lib.hgv_tr_verify_sumcheck.restype = ctypes.c_int
    lib.hgv_gl2_eq_table.argtypes = [_u64p, ctypes.c_int, _u64p, _u64p]
    lib.hgv_gl2_d_table.argtypes = [
        _u64p,
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.c_uint64,
        _u64p,
        _u64p,
    ]
    lib.hgv_gl2_dot_base.argtypes = [_u64p, _u64p, _u64p, ctypes.c_size_t, _u64p]
    lib.hgv_gl2_dot_ext.argtypes = [
        _u64p,
        _u64p,
        _u64p,
        _u64p,
        ctypes.c_size_t,
        _u64p,
    ]
    lib.hgv_gl2_eq_eval.argtypes = [_u64p, _u64p, ctypes.c_size_t, _u64p]
    _i64p = ctypes.POINTER(ctypes.c_int64)
    lib.hgv_gl2_eq_affine_sum.argtypes = [
        _u64p,
        _i64p,
        _i64p,
        ctypes.c_size_t,
        ctypes.c_int64,
        ctypes.c_int64,
        _u64p,
    ]
    lib.hgv_gl2_dot_ext_inter.argtypes = [_u64p, _u64p, ctypes.c_size_t, _u64p]
    lib.hgv_gl2_dot3_inter.argtypes = [_u64p, _u64p, ctypes.c_size_t, _u64p]
    lib.hgv_gl2_mix_inter.argtypes = [
        _u64p,
        ctypes.c_size_t,
        _u64p,
        _u64p,
    ]
    lib.hgv_gl2_dot_base_many.argtypes = [
        _u64p,
        _u64p,
        _u64p,
        ctypes.c_size_t,
        ctypes.c_size_t,
        _u64p,
    ]
    # ---- BN254-Fr half (nverify_fr.cpp) ----
    lib.hgv_fr_tr_new.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.hgv_fr_tr_new.restype = ctypes.c_void_p
    lib.hgv_fr_tr_free.argtypes = [ctypes.c_void_p]
    lib.hgv_fr_tr_pos.argtypes = [ctypes.c_void_p]
    lib.hgv_fr_tr_pos.restype = ctypes.c_size_t
    lib.hgv_fr_tr_common.argtypes = [ctypes.c_void_p, _u64p, ctypes.c_size_t]
    lib.hgv_fr_tr_common_bytes.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    lib.hgv_fr_tr_read.argtypes = [ctypes.c_void_p, ctypes.c_size_t, _u64p]
    lib.hgv_fr_tr_read.restype = ctypes.c_int
    lib.hgv_fr_tr_squeeze.argtypes = [ctypes.c_void_p, ctypes.c_size_t, _u64p]
    lib.hgv_fr_tr_verify_sumcheck.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        _u64p,
        _u64p,
        _u64p,
    ]
    lib.hgv_fr_tr_verify_sumcheck.restype = ctypes.c_int
    lib.hgv_fr_eq_table.argtypes = [_u64p, ctypes.c_int, _u64p]
    lib.hgv_fr_d_table.argtypes = [_u64p, ctypes.c_int, _u64p, _u64p, _u64p]
    lib.hgv_fr_dot.argtypes = [_u64p, _u64p, ctypes.c_size_t, _u64p]
    lib.hgv_fr_dot_many.argtypes = [
        _u64p,
        _u64p,
        ctypes.c_size_t,
        ctypes.c_size_t,
        _u64p,
    ]
    lib.hgv_fr_eq_eval.argtypes = [_u64p, _u64p, ctypes.c_size_t, _u64p]
    lib.hgv_fr_gp_dot.argtypes = [_u64p, _u64p, ctypes.c_size_t, _u64p]
    lib.hgv_fr_gp_dot3.argtypes = [_u64p, _u64p, ctypes.c_size_t, _u64p]
    lib.hgv_fr_gp_mix.argtypes = [_u64p, ctypes.c_size_t, _u64p, _u64p]
    for name in ("add", "sub", "mul"):
        getattr(lib, f"hgv_fr_vec_{name}").argtypes = [
            _u64p,
            _u64p,
            ctypes.c_size_t,
            _u64p,
        ]
    lib.hgv_fr_vec_scale.argtypes = [_u64p, _u64p, ctypes.c_size_t, _u64p]
    lib.hgv_fr_vec_neg.argtypes = [_u64p, ctypes.c_size_t, _u64p]
    lib.hgv_fr_vec_sum.argtypes = [_u64p, ctypes.c_size_t, _u64p]
    _LIB = lib
    return lib


def available(spec: FieldSpec) -> bool:
    return (
        spec.name in (GOLDILOCKS.name, BN254_FR.name) and _lib() is not None
    )


# ---------------------------------------------------------------------------
# BN254-Fr limb packing: one felt = 4 LE u64 limbs; arrays are [N, 4]
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1


def fr_pack(ints) -> np.ndarray:
    buf = b"".join(int(x).to_bytes(32, "little") for x in ints)
    return np.frombuffer(buf, dtype=np.uint64).reshape(len(ints), 4).copy()


def fr_pack_one(x: int) -> np.ndarray:
    return np.frombuffer(int(x).to_bytes(32, "little"), dtype=np.uint64).copy()


def fr_unpack(a: np.ndarray) -> list:
    return [int.from_bytes(row.tobytes(), "little") for row in a.reshape(-1, 4)]


def fr_unpack_one(a: np.ndarray) -> int:
    return int.from_bytes(a.tobytes(), "little")


def _np_u64(a) -> np.ndarray:
    out = np.ascontiguousarray(a, dtype=np.uint64)
    return out


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_u64p)


_ERR = {
    1: "transcript: unexpected end of proof stream",
    2: "invalid field element encoding in proof",
    3: "native sumcheck: unsupported degree",
}


class NativeTranscriptReader(TranscriptReader):
    """GL2 TranscriptReader whose absorb/read/squeeze run in C.

    Byte-for-byte identical Fiat-Shamir schedule to TranscriptReader
    (same keccak, same canonical LE encoding) — pinned by
    tests/test_nverifier.py challenge-parity tests."""

    def __init__(self, spec: FieldSpec, proof: bytes):
        assert spec.name == GOLDILOCKS.name and _lib() is not None
        self.spec = spec
        self._proof = proof  # keep alive: C borrows the buffer
        self._h = _lib().hgv_tr_new(proof, len(proof))

    def __del__(self):
        lib = _LIB
        if lib is not None and getattr(self, "_h", None):
            lib.hgv_tr_free(self._h)
            self._h = None

    # -- absorb --

    def common_felt(self, x: int):
        self.common_felts([x])

    def common_felts(self, xs):
        arr = np.asarray([int(x) % self.spec.p for x in xs], dtype=np.uint64)
        _lib().hgv_tr_common(self._h, _ptr(arr), len(arr))

    def common_felt_ext(self, x):
        self.common_felts(self.spec._c(x))

    def common_felts_ext(self, xs):
        flat = []
        for x in xs:
            flat.extend(self.spec._c(x))
        self.common_felts(flat)

    def common_statement(self, xs) -> bytes:
        from .keccak import new_keccak256

        arr = np.asarray(xs, dtype=np.uint64)
        h = new_keccak256()
        h.update(arr.tobytes())  # canonical LE u64 == felt_to_bytes stream
        digest = h.finalize_reset()
        _lib().hgv_tr_common_bytes(self._h, digest, len(digest))
        return digest

    # -- read --

    def read_felt(self) -> int:
        return self.read_felts(1)[0]

    def read_felts(self, n: int) -> list:
        return [int(x) for x in self.read_felts_np(n)]

    def read_felts_np(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.uint64)
        rc = _lib().hgv_tr_read(self._h, n, _ptr(out))
        if rc:
            raise ValueError(_ERR[rc])
        return out

    def read_felt_ext(self) -> tuple:
        return tuple(self.read_felts(self.spec.ext_degree))

    def read_felts_ext(self, n: int) -> list:
        d = self.spec.ext_degree
        flat = self.read_felts(n * d)
        return [tuple(flat[i * d : (i + 1) * d]) for i in range(n)]

    # -- squeeze --

    def squeeze_base(self) -> int:
        out = np.empty(1, dtype=np.uint64)
        _lib().hgv_tr_squeeze(self._h, 1, _ptr(out))
        return int(out[0])

    def squeeze_challenge(self) -> tuple:
        return self.squeeze_challenges(1)[0]

    def squeeze_challenges(self, n: int) -> list:
        # protocol v2.1: one digest per ext challenge (16-byte halves)
        out = np.empty(2 * n, dtype=np.uint64)
        _lib().hgv_tr_squeeze_ext(self._h, n, _ptr(out))
        return [
            (int(out[2 * i]), int(out[2 * i + 1])) for i in range(n)
        ]

    # -- sumcheck round loop (dispatched from gkr.sumcheck.verify_sum_check) --

    def native_sumcheck(self, degree: int, num_vars: int, claim):
        claim = self.spec._c(claim)
        cl = np.asarray(claim, dtype=np.uint64)
        fin = np.empty(2, dtype=np.uint64)
        ch = np.empty(2 * num_vars, dtype=np.uint64)
        rc = _lib().hgv_tr_verify_sumcheck(
            self._h, degree, num_vars, _ptr(cl), _ptr(fin), _ptr(ch)
        )
        if rc:
            raise ValueError(_ERR[rc])
        final = (int(fin[0]), int(fin[1]))
        challenges = [
            (int(ch[2 * i]), int(ch[2 * i + 1])) for i in range(num_vars)
        ]
        return final, challenges

    # -- bookkeeping --

    @property
    def _pos(self):
        return _lib().hgv_tr_pos(self._h)

    def assert_consumed(self):
        pos = _lib().hgv_tr_pos(self._h)
        if pos != len(self._proof):
            raise ValueError(
                f"transcript: {len(self._proof) - pos} unread proof bytes"
            )


# ---------------------------------------------------------------------------
# array kernels (used by NpField fast paths)
# ---------------------------------------------------------------------------


def eq_table(point) -> tuple:
    """point: list of GL2 tuples -> (c0[L], c1[L]) u64 arrays."""
    v = len(point)
    pt = np.asarray([c for r in point for c in r], dtype=np.uint64)
    out0 = np.empty(1 << v, dtype=np.uint64)
    out1 = np.empty(1 << v, dtype=np.uint64)
    _lib().hgv_gl2_eq_table(_ptr(pt), v, _ptr(out0), _ptr(out1))
    return out0, out1


def d_table(point, logl: int, w: int, linv: int) -> tuple:
    """Single-point DFT-row MLE table; w is the (already inverted for
    inverse transforms) L-th root, linv is L^-1 or 1."""
    pt = np.asarray([c for r in point for c in r], dtype=np.uint64)
    out0 = np.empty(1 << logl, dtype=np.uint64)
    out1 = np.empty(1 << logl, dtype=np.uint64)
    _lib().hgv_gl2_d_table(
        _ptr(pt), logl, ctypes.c_uint64(w), ctypes.c_uint64(linv),
        _ptr(out0), _ptr(out1),
    )
    return out0, out1


def dot_base(eq: tuple, tab: np.ndarray) -> tuple:
    out = np.empty(2, dtype=np.uint64)
    _lib().hgv_gl2_dot_base(
        _ptr(eq[0]), _ptr(eq[1]), _ptr(_np_u64(tab)), len(tab), _ptr(out)
    )
    return (int(out[0]), int(out[1]))


def dot_ext(a: tuple, b: tuple) -> tuple:
    out = np.empty(2, dtype=np.uint64)
    _lib().hgv_gl2_dot_ext(
        _ptr(a[0]), _ptr(a[1]), _ptr(b[0]), _ptr(b[1]), len(a[0]), _ptr(out)
    )
    return (int(out[0]), int(out[1]))


def eq_affine_sum(pairs, lo: int, hi: int) -> tuple:
    """sum_{y in [lo,hi)} prod_p eq(point_p, y + off_p); pairs of
    ([(c0,c1), ...] LSB-first GL2 point, off)."""
    pts = np.asarray(
        [c for pt, _ in pairs for r in pt for c in r], dtype=np.uint64
    )
    lens = np.asarray([len(pt) for pt, _ in pairs], dtype=np.int64)
    offs = np.asarray([off for _, off in pairs], dtype=np.int64)
    out = np.empty(2, dtype=np.uint64)
    _lib().hgv_gl2_eq_affine_sum(
        _ptr(pts),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(pairs),
        lo,
        hi,
        _ptr(out),
    )
    return (int(out[0]), int(out[1]))


def eq_eval(x, y) -> tuple:
    """eq(x, y) for two equal-length lists of GL2 tuples."""
    xa = np.asarray([c for t in x for c in t], dtype=np.uint64)
    ya = np.asarray([c for t in y for c in t], dtype=np.uint64)
    out = np.empty(2, dtype=np.uint64)
    _lib().hgv_gl2_eq_eval(_ptr(xa), _ptr(ya), len(x), _ptr(out))
    return (int(out[0]), int(out[1]))


def dot_ext_inter(a: np.ndarray, b: np.ndarray) -> tuple:
    """<a, b> over interleaved (c0,c1) ext arrays of equal length."""
    out = np.empty(2, dtype=np.uint64)
    _lib().hgv_gl2_dot_ext_inter(_ptr(a), _ptr(b), len(a) // 2, _ptr(out))
    return (int(out[0]), int(out[1]))


def dot3_inter(alphas: np.ndarray, ev: np.ndarray) -> tuple:
    """sum_i alphas_i * l_i * r_i; ev = interleaved (l,r) ext pairs [4m]."""
    out = np.empty(2, dtype=np.uint64)
    _lib().hgv_gl2_dot3_inter(_ptr(alphas), _ptr(ev), len(ev) // 4, _ptr(out))
    return (int(out[0]), int(out[1]))


def mix_inter(ev: np.ndarray, mu) -> np.ndarray:
    """l_i + mu*(r_i - l_i) per pair -> interleaved ext array [2m]."""
    m = len(ev) // 4
    muv = np.asarray(mu, dtype=np.uint64)
    out = np.empty(2 * m, dtype=np.uint64)
    _lib().hgv_gl2_mix_inter(_ptr(ev), m, _ptr(muv), _ptr(out))
    return out


def dot_base_many(eq: tuple, tabs: np.ndarray) -> list:
    """tabs: [T, L] u64 -> list of T ext tuples."""
    T, L = tabs.shape
    out = np.empty(2 * T, dtype=np.uint64)
    _lib().hgv_gl2_dot_base_many(
        _ptr(eq[0]), _ptr(eq[1]), _ptr(_np_u64(tabs)), T, L, _ptr(out)
    )
    return [(int(out[2 * t]), int(out[2 * t + 1])) for t in range(T)]


# ---------------------------------------------------------------------------
# BN254-Fr native transcript reader + kernels (nverify_fr.cpp)
# ---------------------------------------------------------------------------


class NativeTranscriptReaderFr(TranscriptReader):
    """bn254 TranscriptReader whose absorb/read/squeeze run in C.

    Byte-identical Fiat-Shamir schedule to TranscriptReader (same keccak,
    same canonical 32-byte LE encoding) — pinned by
    tests/test_nverifier_fr.py."""

    def __init__(self, spec: FieldSpec, proof: bytes):
        assert spec.name == BN254_FR.name and _lib() is not None
        self.spec = spec
        self._proof = proof  # keep alive: C borrows the buffer
        self._h = _lib().hgv_fr_tr_new(proof, len(proof))

    def __del__(self):
        lib = _LIB
        if lib is not None and getattr(self, "_h", None):
            lib.hgv_fr_tr_free(self._h)
            self._h = None

    # -- absorb --

    def common_felt(self, x: int):
        self.common_felts([x])

    def common_felts(self, xs):
        arr = fr_pack([int(x) % self.spec.p for x in xs])
        _lib().hgv_fr_tr_common(self._h, _ptr(arr), len(xs))

    def common_felt_ext(self, x):
        self.common_felts(self.spec._c(x))

    def common_felts_ext(self, xs):
        self.common_felts([self.spec._c(x)[0] for x in xs])

    def common_statement(self, xs) -> bytes:
        from .keccak import new_keccak256

        h = new_keccak256()
        h.update(b"".join(int(x).to_bytes(32, "little") for x in xs))
        digest = h.finalize_reset()
        _lib().hgv_fr_tr_common_bytes(self._h, digest, len(digest))
        return digest

    # -- read --

    def read_felt(self) -> int:
        return self.read_felts(1)[0]

    def read_felts(self, n: int) -> list:
        return fr_unpack(self.read_felts_np(n))

    def read_felts_np(self, n: int) -> np.ndarray:
        out = np.empty((n, 4), dtype=np.uint64)
        rc = _lib().hgv_fr_tr_read(self._h, n, _ptr(out))
        if rc:
            raise ValueError(_ERR[rc])
        return out

    def read_felt_ext(self) -> tuple:
        return (self.read_felt(),)

    def read_felts_ext(self, n: int) -> list:
        return [(x,) for x in self.read_felts(n)]

    # -- squeeze --

    def squeeze_base(self) -> int:
        out = np.empty((1, 4), dtype=np.uint64)
        _lib().hgv_fr_tr_squeeze(self._h, 1, _ptr(out))
        return fr_unpack_one(out[0])

    def squeeze_challenge(self) -> tuple:
        return (self.squeeze_base(),)

    def squeeze_challenges(self, n: int) -> list:
        out = np.empty((n, 4), dtype=np.uint64)
        _lib().hgv_fr_tr_squeeze(self._h, n, _ptr(out))
        return [(x,) for x in fr_unpack(out)]

    # -- sumcheck round loop --

    def native_sumcheck(self, degree: int, num_vars: int, claim):
        claim = self.spec._c(claim)
        cl = fr_pack_one(claim[0])
        fin = np.empty(4, dtype=np.uint64)
        ch = np.empty((num_vars, 4), dtype=np.uint64)
        rc = _lib().hgv_fr_tr_verify_sumcheck(
            self._h, degree, num_vars, _ptr(cl), _ptr(fin), _ptr(ch)
        )
        if rc:
            raise ValueError(_ERR[rc])
        return (fr_unpack_one(fin),), [(x,) for x in fr_unpack(ch)]

    # -- bookkeeping --

    @property
    def _pos(self):
        return _lib().hgv_fr_tr_pos(self._h)

    def assert_consumed(self):
        pos = _lib().hgv_fr_tr_pos(self._h)
        if pos != len(self._proof):
            raise ValueError(
                f"transcript: {len(self._proof) - pos} unread proof bytes"
            )


def reader_for(spec: FieldSpec, proof: bytes):
    """Native TranscriptReader for the spec, or None if unavailable."""
    if _lib() is None:
        return None
    if spec.name == GOLDILOCKS.name:
        return NativeTranscriptReader(spec, proof)
    if spec.name == BN254_FR.name:
        return NativeTranscriptReaderFr(spec, proof)
    return None


def fr_eq_table(point) -> np.ndarray:
    """point: list of (int,) ext tuples -> [2^v, 4] limb array."""
    v = len(point)
    pt = fr_pack([r[0] for r in point])
    out = np.empty((1 << v, 4), dtype=np.uint64)
    _lib().hgv_fr_eq_table(_ptr(pt), v, _ptr(out))
    return out


def fr_d_table(point, logl: int, w: int, linv: int) -> np.ndarray:
    pt = fr_pack([r[0] for r in point])
    wv = fr_pack_one(w)
    lv = fr_pack_one(linv)
    out = np.empty((1 << logl, 4), dtype=np.uint64)
    _lib().hgv_fr_d_table(_ptr(pt), logl, _ptr(wv), _ptr(lv), _ptr(out))
    return out


def fr_dot(a: np.ndarray, b: np.ndarray) -> int:
    out = np.empty(4, dtype=np.uint64)
    _lib().hgv_fr_dot(
        _ptr(np.ascontiguousarray(a)), _ptr(np.ascontiguousarray(b)),
        a.reshape(-1, 4).shape[0], _ptr(out),
    )
    return fr_unpack_one(out)


def fr_eq_eval(x, y) -> int:
    xa = fr_pack([t[0] for t in x])
    ya = fr_pack([t[0] for t in y])
    out = np.empty(4, dtype=np.uint64)
    _lib().hgv_fr_eq_eval(_ptr(xa), _ptr(ya), len(x), _ptr(out))
    return fr_unpack_one(out)


def eq_eval_spec(spec: FieldSpec, x, y):
    """Spec-dispatched host eq(x, y); points as ext tuples."""
    if spec.name == GOLDILOCKS.name:
        return eq_eval(x, y)
    return (fr_eq_eval(x, y),)


# ---------------------------------------------------------------------------
# grand-product layer adapter (spec-dispatched; gkr/grand_product.py)
# ---------------------------------------------------------------------------


class _GlGpOps:
    deg = 2

    @staticmethod
    def pack(exts) -> np.ndarray:
        return np.asarray([c for t in exts for c in t], dtype=np.uint64)

    @staticmethod
    def unpack(a: np.ndarray) -> list:
        return [(int(a[2 * i]), int(a[2 * i + 1])) for i in range(len(a) // 2)]

    @staticmethod
    def dot(a, b) -> tuple:
        return dot_ext_inter(a, b)

    @staticmethod
    def dot3(a, ev) -> tuple:
        return dot3_inter(a, ev)

    @staticmethod
    def mix(ev, mu) -> np.ndarray:
        return mix_inter(ev, mu)


class _FrGpOps:
    deg = 1

    @staticmethod
    def pack(exts) -> np.ndarray:
        return fr_pack([t[0] for t in exts])

    @staticmethod
    def unpack(a: np.ndarray) -> list:
        return [(x,) for x in fr_unpack(a)]

    @staticmethod
    def dot(a, b) -> tuple:
        out = np.empty(4, dtype=np.uint64)
        _lib().hgv_fr_gp_dot(_ptr(a), _ptr(b), a.reshape(-1, 4).shape[0],
                             _ptr(out))
        return (fr_unpack_one(out),)

    @staticmethod
    def dot3(a, ev) -> tuple:
        out = np.empty(4, dtype=np.uint64)
        _lib().hgv_fr_gp_dot3(
            _ptr(a), _ptr(np.ascontiguousarray(ev)),
            a.reshape(-1, 4).shape[0], _ptr(out),
        )
        return (fr_unpack_one(out),)

    @staticmethod
    def mix(ev, mu) -> np.ndarray:
        m = ev.reshape(-1, 4).shape[0] // 2
        muv = fr_pack_one(int(mu[0]) if isinstance(mu, tuple) else int(mu))
        out = np.empty((m, 4), dtype=np.uint64)
        _lib().hgv_fr_gp_mix(_ptr(np.ascontiguousarray(ev)), m, _ptr(muv),
                             _ptr(out))
        return out


def gp_ops(spec: FieldSpec):
    """Per-spec grand-product layer kernels, or None if unavailable."""
    if _lib() is None:
        return None
    if spec.name == GOLDILOCKS.name:
        return _GlGpOps
    if spec.name == BN254_FR.name:
        return _FrGpOps
    return None
