"""Vectorized host (numpy) field arithmetic for the fast verifier.

The verifier must run WITHOUT any device round trip: over the TPU tunnel a
single dispatch+transfer costs 10-100 ms, and the round-2 device-assisted
verifier spent ~5 s on ~50 of them (VERDICT r2 #3). The reference verifies
on a laptop CPU in ~10 ms (README.md:39-56) using closed-form wiring
predicates; this module supplies the dense-evaluation counterpart: fast
numpy field vectors for eq tables, MLE evaluations and DFT-row tables.

Two backends:
- Goldilocks: u64 arrays with 32-bit-split multiplication and the
  2^64 = 2^32 - 1 reduction; GL2 as coefficient pairs (w^2 = 7).
- Generic odd prime (BN254 Fr): object-dtype arrays of Python ints —
  numpy's C loop over PyLong ops; ~10x slower per element but still far
  below one tunnel round trip for the sizes verified here.

Ext vectors are tuples of `ext_degree` base arrays. Host scalars follow
fields.FieldSpec conventions (ext = tuple of ints).
"""

from __future__ import annotations

import numpy as np

from ..fields import FieldSpec

_M32 = np.uint64(0xFFFFFFFF)
_S32 = np.uint64(32)
GL_P = (1 << 64) - (1 << 32) + 1
_GLP = np.uint64(GL_P)


class _GLOps:
    """Goldilocks base-field ops on u64 numpy arrays (canonical values)."""

    p = GL_P

    @staticmethod
    def from_ints(xs) -> np.ndarray:
        if isinstance(xs, np.ndarray):
            return np.asarray(xs, dtype=np.uint64)
        try:
            a = np.array(xs, dtype=np.uint64)
        except (OverflowError, TypeError, ValueError):
            return np.asarray([int(x) % GL_P for x in xs], dtype=np.uint64)
        if (a >= _GLP).any():
            return np.asarray([int(x) % GL_P for x in xs], dtype=np.uint64)
        return a

    @staticmethod
    def add(a, b):
        s = a + b  # may wrap mod 2^64; wrapped => true value = s + 2^32 - 1
        s = np.where(s < a, s + _M32, s)
        return np.where(s >= _GLP, s - _GLP, s)

    @staticmethod
    def sub(a, b):
        d = a - b  # may wrap; wrapped => true value = d - (2^32 - 1)
        d = np.where(a < b, d - _M32, d)
        return np.where(d >= _GLP, d - _GLP, d)

    @staticmethod
    def mul(a, b):
        a0 = a & _M32
        a1 = a >> _S32
        b0 = b & _M32
        b1 = b >> _S32
        ll = a0 * b0
        hh = a1 * b1
        lh = a0 * b1
        hl = a1 * b0
        mid = lh + hl
        c1 = (mid < lh).astype(np.uint64)  # mid wrapped: adds 2^64 => hi += 2^32
        t = ll + (mid << _S32)
        c2 = (t < ll).astype(np.uint64)
        lo = t
        hi = hh + (mid >> _S32) + (c1 << _S32) + c2
        # x = lo + hi*2^64; 2^64 = 2^32-1, 2^96 = -1 (mod p)
        h0 = hi & _M32
        h1 = hi >> _S32
        t0 = lo - h1
        t0 = np.where(lo < h1, t0 - _M32, t0)  # borrow: -2^64 = -(2^32-1)
        t0 = np.where(t0 >= _GLP, t0 - _GLP, t0)
        t1 = h0 * _M32  # < 2^64
        s = t0 + t1
        w = s < t0
        s = np.where(w, s + _M32, s)
        s = np.where(s >= _GLP, s - _GLP, s)
        return s

    @staticmethod
    def neg(a):
        return np.where(a == 0, a, _GLP - a)

    @classmethod
    def scale(cls, a, c: int):
        return cls.mul(a, np.uint64(c % GL_P))

    @staticmethod
    def zeros(n):
        return np.zeros(n, dtype=np.uint64)

    @staticmethod
    def full(n, v: int):
        return np.full(n, v % GL_P, dtype=np.uint64)

    @staticmethod
    def sum(a) -> int:
        # column sums fit u64 for n <= 2^31
        lo = int(np.sum(a & _M32, dtype=np.uint64))
        hi = int(np.sum(a >> _S32, dtype=np.uint64))
        return (lo + (hi << 32)) % GL_P

    @staticmethod
    def to_ints(a):
        return [int(x) for x in a]


class _ObjOps:
    """Any-prime base-field ops on object-dtype numpy arrays."""

    def __init__(self, p: int):
        self.p = p

    def from_ints(self, xs):
        return np.array([int(x) % self.p for x in xs], dtype=object)

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def mul(self, a, b):
        return (a * b) % self.p

    def neg(self, a):
        return (-a) % self.p

    def scale(self, a, c: int):
        return (a * (c % self.p)) % self.p

    def zeros(self, n):
        return np.zeros(n, dtype=object)

    def full(self, n, v: int):
        return np.full(n, v % self.p, dtype=object)

    def sum(self, a) -> int:
        return int(a.sum()) % self.p

    @staticmethod
    def to_ints(a):
        return [int(x) for x in a]


class _FrNativeOps:
    """BN254-Fr base ops backed by the native core (nverify_fr.cpp).

    One felt = 4 LE u64 limbs; vectors are [N, 4] u64 arrays. Replaces
    _ObjOps (object-dtype numpy = Python-int C loops, ~10x slower per
    element and allocation-heavy) whenever libhg_native is available."""

    def __init__(self, p: int):
        self.p = p
        from . import nverifier as nv

        self._nv = nv
        self._lib = nv._lib()

    def from_ints(self, xs):
        if isinstance(xs, np.ndarray) and xs.dtype == np.uint64 and (
            xs.ndim == 2 and xs.shape[1] == 4
        ):
            return xs
        return self._nv.fr_pack([int(x) % self.p for x in xs])

    def _bin(self, fn, a, b):
        out = np.empty_like(a)
        n = a.shape[0]
        fn(self._nv._ptr(a), self._nv._ptr(b), n, self._nv._ptr(out))
        return out

    def add(self, a, b):
        return self._bin(self._lib.hgv_fr_vec_add, a, b)

    def sub(self, a, b):
        return self._bin(self._lib.hgv_fr_vec_sub, a, b)

    def mul(self, a, b):
        return self._bin(self._lib.hgv_fr_vec_mul, a, b)

    def neg(self, a):
        out = np.empty_like(a)
        self._lib.hgv_fr_vec_neg(
            self._nv._ptr(a), a.shape[0], self._nv._ptr(out)
        )
        return out

    def scale(self, a, c: int):
        out = np.empty_like(a)
        cv = self._nv.fr_pack_one(int(c) % self.p)
        self._lib.hgv_fr_vec_scale(
            self._nv._ptr(a), self._nv._ptr(cv), a.shape[0], self._nv._ptr(out)
        )
        return out

    def zeros(self, n):
        return np.zeros((n, 4), dtype=np.uint64)

    def full(self, n, v: int):
        return np.tile(self._nv.fr_pack_one(int(v) % self.p), (n, 1))

    def sum(self, a) -> int:
        out = np.empty(4, dtype=np.uint64)
        self._lib.hgv_fr_vec_sum(self._nv._ptr(a), a.shape[0], self._nv._ptr(out))
        return self._nv.fr_unpack_one(out)

    def to_ints(self, a):
        return self._nv.fr_unpack(a)


class _FrNpKernels:
    """NpField._nv adapter for bn254 (deg-1 ext = 1-tuples of base arrays)."""

    @staticmethod
    def eq_table(point):
        from . import nverifier as nv

        return (nv.fr_eq_table(point),)

    @staticmethod
    def d_table(pt, logl, w, linv):
        from . import nverifier as nv

        return (nv.fr_d_table(pt, logl, w, linv),)

    @staticmethod
    def dot_base(eq, tab):
        from . import nverifier as nv

        return (nv.fr_dot(eq[0], tab),)

    @staticmethod
    def dot_ext(a, b):
        from . import nverifier as nv

        return (nv.fr_dot(a[0], b[0]),)


class NpField:
    """Ext-field vector ops for one FieldSpec (host verifier workhorse).

    For Goldilocks the O(L) kernels (eq tables, DFT-row tables, MLE dots)
    dispatch to the native C core (utils/nverifier.py) when available —
    numpy's ~40 us fixed cost per array op makes the pure-numpy builds the
    dominant verify cost at L <= 2^16. Tables are memoized per point
    (bounded): grouped nodes and multi-claim inputs share claim points, so
    a verify re-uses most tables several times."""

    _CACHE: dict = {}
    _MEMO_CAP = 128  # eq/d tables are <= 2 * 8 B * 2^16 = 1 MiB each

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.deg = spec.ext_degree
        self.w = spec.ext_nonresidue
        self._eq_memo: dict = {}
        self._d_memo: dict = {}
        from . import nverifier

        if spec.p == GL_P and spec.ext_degree == 2:
            self.base = _GLOps()
            self._nv = nverifier if nverifier.available(spec) else None
        elif spec.name == "bn254" and nverifier.available(spec):
            self.base = _FrNativeOps(spec.p)
            self._nv = _FrNpKernels
        else:
            self.base = _ObjOps(spec.p)
            self._nv = None

    @classmethod
    def for_spec(cls, spec: FieldSpec) -> "NpField":
        f = cls._CACHE.get(spec.name)
        if f is None:
            f = cls._CACHE[spec.name] = cls(spec)
        return f

    # ----- ext vectors: tuples of `deg` base arrays -----

    def ext_zeros(self, n):
        return tuple(self.base.zeros(n) for _ in range(self.deg))

    def ext_splat(self, n, c) -> tuple:
        c = self.spec._c(c)
        return tuple(self.base.full(n, ci) for ci in c)

    def ext_from_tuples(self, xs) -> tuple:
        cs = [self.spec._c(x) for x in xs]
        return tuple(
            self.base.from_ints([c[i] for c in cs]) for i in range(self.deg)
        )

    def lift(self, a) -> tuple:
        """Base array -> ext tuple."""
        if isinstance(a, tuple):
            return a
        return (a,) + tuple(self.base.zeros(a.shape[0]) for _ in range(self.deg - 1))

    def eadd(self, a, b):
        return tuple(self.base.add(x, y) for x, y in zip(a, b))

    def esub(self, a, b):
        return tuple(self.base.sub(x, y) for x, y in zip(a, b))

    def emul(self, a, b):
        if self.deg == 1:
            return (self.base.mul(a[0], b[0]),)
        assert self.deg == 2
        m = self.base.mul
        t0 = m(a[0], b[0])
        t1 = m(a[1], b[1])
        t2 = m(a[0], b[1])
        t3 = m(a[1], b[0])
        return (
            self.base.add(t0, self.base.scale(t1, self.w)),
            self.base.add(t2, t3),
        )

    def emul_base(self, a, b):
        """ext tuple * base array, coefficient-wise."""
        return tuple(self.base.mul(x, b) for x in a)

    def esum(self, a) -> tuple:
        return self.spec.ext(*[self.base.sum(x) for x in a])

    # ----- verifier kernels -----

    def eq_table(self, point) -> tuple:
        """eq(point, x) over x in [0, 2^v), LSB-first, via doubling:
        total mults ~2^v (not 2^v * v). Memoized per point."""
        point = [self.spec._c(r) for r in point]
        key = tuple(point)
        t = self._eq_memo.get(key)
        if t is not None:
            return t
        if self._nv is not None:
            t = self._nv.eq_table(point)
        else:
            t = self.ext_splat(1, self.spec.one)
            for j in range(len(point)):
                r = self.ext_splat(1 << j, point[j])
                hi = self.emul(t, r)
                lo = self.esub(t, hi)  # t*(1-r)
                t = tuple(np.concatenate([l_, h_]) for l_, h_ in zip(lo, hi))
        if len(self._eq_memo) >= self._MEMO_CAP:
            self._eq_memo.clear()
        self._eq_memo[key] = t
        return t

    def mle_eval_ints(self, dense, point) -> tuple:
        """<eq(point), dense> for a base-int table (list or base array)."""
        tab = (
            dense
            if isinstance(dense, np.ndarray)
            else self.base.from_ints(dense)
        )
        n = tab.shape[0]
        assert n == 1 << len(point)
        eq = self.eq_table(point)
        if self._nv is not None and tab.dtype == np.uint64:
            return self._nv.dot_base(eq, tab)
        return self.esum(self.emul_base(eq, tab))

    def d_table(self, points, alphas, logl: int, inverse: bool) -> tuple:
        """alpha-combined DFT-row MLE table (ops/ntt.dft_row_mle parity):
        d(j) = sum_i alpha_i * prod_b ((1-r_ib) + r_ib * w^(j 2^b)),
        1/L-scaled for inverse. Built by bit-doubling: factor b depends on
        j mod 2^(logl-b), so the partial product over b >= k is a table of
        size 2^(logl-k) — total mults ~2*2^logl per point. Per-point tables
        are memoized (claim points recur across grouped nodes)."""
        p = self.spec.p
        L = 1 << logl
        one = self.spec.one
        acc = None
        for pt, al in zip(points, alphas):
            t = self._d_one(tuple(self.spec._c(r) for r in pt), logl, inverse)
            if self.spec._c(al) != one:
                t = self.emul(t, self.ext_splat(L, al))
            acc = t if acc is None else self.eadd(acc, t)
        return acc

    def _d_one(self, pt: tuple, logl: int, inverse: bool) -> tuple:
        """DFT-row MLE table for ONE claim point (1/L-scaled if inverse)."""
        key = (pt, logl, inverse)
        t = self._d_memo.get(key)
        if t is not None:
            return t
        p = self.spec.p
        L = 1 << logl
        w = self.spec.root_of_unity(L)
        if inverse:
            w = pow(w, p - 2, p)
        linv = pow(L, p - 2, p) if inverse else 1
        if self._nv is not None:
            t = self._nv.d_table(pt, logl, w, linv)
        else:
            wp = [1] * L
            for j in range(1, L):
                wp[j] = wp[j - 1] * w % p
            wtab = self.base.from_ints(wp)
            # build from b = logl-1 (table of size 2) down to b = 0
            t = self.ext_splat(1, self.spec.one)
            for b in range(logl - 1, -1, -1):
                size = 1 << (logl - b)
                # factor_b(j) = (1 - r_b) + r_b * w^(j*2^b), j in [0, size)
                idx = (np.arange(size, dtype=np.int64) << b) % L
                wb = wtab[idx]
                r = self.ext_splat(size, pt[b])
                one_minus = self.esub(self.ext_splat(size, self.spec.one), r)
                f = self.eadd(one_minus, self.emul_base(r, wb))
                # expand t (period size/2) to size and multiply
                te = tuple(np.tile(x, 2) for x in t)
                t = self.emul(te, f)
            if inverse:
                t = self.emul_base(t, self.base.full(L, linv))
        if len(self._d_memo) >= self._MEMO_CAP:
            self._d_memo.clear()
        self._d_memo[key] = t
        return t

    def dot_ext(self, a, b) -> tuple:
        """<a, b> for two ext vectors."""
        if self._nv is not None:
            return self._nv.dot_ext(a, b)
        return self.esum(self.emul(a, b))
