"""ctypes bindings for the native (C++) Goldilocks verifier core.

`native/nverify.cpp` supplies the verifier's hot loops — keccak transcript
reads, the sumcheck round loop, and the O(L) eq/DFT-row table kernels — at
C speed (the pure-Python/numpy counterparts cost ~5 us per scalar ext mul
and ~40 us per numpy dispatch, a 10-50x overhead at the L <= 2^16 sizes the
verifier touches; reference verify is 10.9-107.9 ms on an M1, README.md:39-56).

Everything here is GL/GL2-only. `available()` gates every fast path; the
pure-Python TranscriptReader / NpField paths remain the fallback and the
cross-check oracle (tests/test_nverifier.py).
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..fields import GOLDILOCKS, FieldSpec
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
    _LIB = lib
    return lib


def available(spec: FieldSpec) -> bool:
    return spec.name == GOLDILOCKS.name and _lib() is not None


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
        assert available(spec), "native verifier unavailable"
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
        d = self.spec.ext_degree
        out = np.empty(d, dtype=np.uint64)
        _lib().hgv_tr_squeeze(self._h, d, _ptr(out))
        return tuple(int(x) for x in out)

    def squeeze_challenges(self, n: int) -> list:
        d = self.spec.ext_degree
        out = np.empty(n * d, dtype=np.uint64)
        _lib().hgv_tr_squeeze(self._h, n * d, _ptr(out))
        return [
            tuple(int(x) for x in out[i * d : (i + 1) * d]) for i in range(n)
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
