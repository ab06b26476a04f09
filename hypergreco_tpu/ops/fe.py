"""Generic device field-element dispatch: base/extension promotion over pytrees.

Every device field element vector is a pytree of uint32 limb arrays (GL, GL2,
later BN254 Fr). This module gives the MLE/sumcheck/GKR layers one generic
API — add/sub/mul/scale/concat/halve/sum — with automatic base→extension
promotion, so the proving engine is written once per protocol, not per field.

Reference parity: the `PrimeField`/`ExtensionField` generic bounds that the
reference's engine crates take everywhere (SURVEY.md §2.2 "Field/extension
traits"); here the dispatch is by runtime pytree type instead of trait monos.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax

from ..fields import FieldSpec, GOLDILOCKS
from . import gl as _gl
from . import glext as _glext
from .gl import GL
from .glext import GL2


@dataclass(frozen=True)
class Backend:
    """Device ops for one (base, extension) field pair."""

    spec: FieldSpec
    base: Any  # module with GL-style ops
    ext: Any  # module with ext ops (== base when ext_degree == 1)
    base_cls: type
    ext_cls: type
    limbs_per_base: int = 2  # uint32 limb leaves per base coefficient
    from_u32: Any = None  # uint32 plane -> base element (value < 2^32)

    # ----- classification / promotion -----

    def is_ext(self, x) -> bool:
        return isinstance(x, self.ext_cls) and not (
            self.ext_cls is self.base_cls
        ) or (self.ext_cls is self.base_cls and isinstance(x, self.base_cls))

    def lift(self, x):
        """Promote a base vector to the extension field."""
        if isinstance(x, self.ext_cls) and self.ext_cls is not self.base_cls:
            return x
        if self.ext_cls is self.base_cls:
            return x
        return self.ext.from_base(x)

    def _mod(self, x):
        if self.ext_cls is not self.base_cls and isinstance(x, self.ext_cls):
            return self.ext
        return self.base

    # ----- arithmetic with promotion -----

    def add(self, x, y):
        mx, my = self._mod(x), self._mod(y)
        if mx is my:
            return mx.add(x, y)
        return self.ext.add(self.lift(x), self.lift(y))

    def sub(self, x, y):
        mx, my = self._mod(x), self._mod(y)
        if mx is my:
            return mx.sub(x, y)
        return self.ext.sub(self.lift(x), self.lift(y))

    def mul(self, x, y):
        mx, my = self._mod(x), self._mod(y)
        if mx is my:
            return mx.mul(x, y)
        # mixed: ext * base via the cheaper coefficient-wise product
        if mx is self.ext:
            return self.ext.mul_base(x, y)
        return self.ext.mul_base(y, x)

    def neg(self, x):
        return self._mod(x).neg(x)

    def select(self, mask, x, y):
        """Elementwise mask ? x : y (same kind)."""
        return self._mod(x).select(mask, x, y)

    def scale(self, x, c):
        """Multiply by a host scalar (int, or ext tuple)."""
        if isinstance(c, tuple) and self.spec.ext_degree > 1 and any(c[1:]):
            return self.mul(self.lift(x), self.ext.splat((), c))
        c0 = c[0] if isinstance(c, tuple) else int(c)
        return self._mod(x).scale(x, c0)

    # ----- constructors -----

    def zeros(self, shape, ext: bool = False):
        return (self.ext if ext else self.base).zeros(shape)

    def scalar(self, c, ext: bool = False):
        if ext:
            return self.ext.scalar(c if isinstance(c, tuple) else self.spec.ext(c))
        return self.base.scalar(c if not isinstance(c, tuple) else c[0])

    def from_ints(self, xs, ext: bool = False):
        return (self.ext if ext else self.base).from_ints(xs)

    def to_host(self, x) -> list:
        """Device vector -> list of host scalars (ints or ext tuples)."""
        if self._mod(x) is self.ext and self.ext_cls is not self.base_cls:
            return self.ext.to_tuples(x)
        return self.base.to_ints(x)

    def to_host_scalar(self, x):
        vals = self.to_host(x)
        assert len(vals) == 1
        return vals[0]

    # ----- shape ops (generic over the limb pytree) -----

    @staticmethod
    def length(x) -> int:
        return jax.tree.leaves(x)[0].shape[0]

    @staticmethod
    def halves(x):
        n = Backend.length(x)
        h = n // 2
        return (
            jax.tree.map(lambda a: a[:h], x),
            jax.tree.map(lambda a: a[h:], x),
        )

    @staticmethod
    def concat(xs):
        import jax.numpy as jnp

        return jax.tree.map(lambda *as_: jnp.concatenate(as_), *xs)

    @staticmethod
    def index(x, i):
        return jax.tree.map(lambda a: a[i], x)

    @staticmethod
    def reshape(x, shape):
        return jax.tree.map(lambda a: a.reshape(shape), x)

    @staticmethod
    def fusion_break(x):
        """Identity gather on every limb leaf — a fusion boundary for
        XLA:CPU's emitter, whose recursive producer inlining makes compile
        time EXPONENTIAL in the depth of unbroken elementwise chains
        (measured: an 11-deep ext-mul chain compiles in minutes; with a
        gather every ~3 muls, in seconds). Use between long mul/add chains."""
        import jax.numpy as jnp

        def leaf(a):
            idx = jnp.arange(a.shape[-1], dtype=jnp.int32)
            return a[..., idx]

        return jax.tree.map(leaf, x)

    def sum(self, x):
        """Field-sum of a [n]-vector -> 0-d element (log-depth halving tree).

        NOTE: only for small one-off reductions. Inside large fused programs
        use sum_digest/digest_value — XLA re-executes the fused producer
        chain at every tree level here (measured 2500x slowdown at 2^16)."""
        n = self.length(x)
        assert n & (n - 1) == 0, "sum requires power-of-two length"
        while n > 1:
            lo, hi = self.halves(x)
            x = self.add(lo, hi)
            n //= 2
        return self.index(x, 0)

    # ----- native-reduce modular sum (device digest + host finish) -----

    _DIGEST_CHUNK = 1 << 15  # 2^15 * (2^16-1) < 2^31: uint32-safe column sums

    def sum_digest(self, x):
        """Device-side partial sum: per uint32 limb leaf, sum the 16-bit
        halves in uint32 chunks via XLA's native reduce. Returns a pytree of
        [m, 2] uint32 arrays; finish with digest_value on the host."""
        import jax.numpy as jnp

        def leaf(a):
            a = a.reshape(-1)  # digest any shape (e.g. stacked [T, N])
            n = a.shape[0]
            a = a.reshape((max(1, n // self._DIGEST_CHUNK), -1))
            lo = jnp.sum(a & 0xFFFF, axis=1, dtype=jnp.uint32)
            hi = jnp.sum(a >> 16, axis=1, dtype=jnp.uint32)
            return jnp.stack([lo, hi], axis=1)

        return jax.tree.map(leaf, x)

    def scatter_add_mod(self, idx, values, size: int, max_coll=None):
        """Field scatter-add: out[t] = sum over j with idx[j]==t of values[j].

        Modular addition cannot use raw uint32 index_add (carries), so each
        uint32 limb is split into bit columns, column-wise index_add'ed and
        recombined mod p with field scale/add. Column width adapts to the
        STATIC collision bound `max_coll` (max sources per target, known
        from the public wiring): 16-bit columns (2 scatters/limb) when
        max_coll <= 2^15, else the conservative 8-bit split (4/limb, safe
        below 2^24 collisions). idx: int32 [n] (entries == size are
        dropped); values: base or ext vector [n]. Leaf convention as in
        digest_value: uint32 limb leaves in little-endian pairs per base
        coefficient."""
        import jax.numpy as jnp

        cb = 16 if max_coll is not None and max_coll <= (1 << 15) else 8
        mask = (1 << cb) - 1
        leaves = jax.tree.leaves(values)
        nl = self.limbs_per_base
        assert len(leaves) % nl == 0
        mk = self.from_u32 or (
            lambda col: self.base_cls(col, jnp.zeros_like(col))
        )
        out_base = []
        for i in range(0, len(leaves), nl):
            acc = None
            for j in range(nl):
                limb = leaves[i + j]
                for s in range(0, 32, cb):
                    c = (limb >> s) & mask
                    col = (
                        jnp.zeros((size + 1,), dtype=jnp.uint32)
                        .at[idx]
                        .add(c, mode="drop")[:size]
                    )
                    v = self.base.scale(
                        mk(col), (1 << (s + 32 * j)) % self.spec.p
                    )
                    acc = v if acc is None else self.base.add(acc, v)
            out_base.append(acc)
        if len(out_base) == 1:
            return out_base[0]
        return self.ext_cls(*out_base)

    def pack_digests(self, dgs):
        """[[pytree digest per block] per eval point] -> ONE uint32 array
        [npts, nblk, nleaves, m, 2] so a round costs a single device->host
        transfer (each tiny transfer over the TPU tunnel has ~10-100ms
        latency; unpacked rounds made ~24 of them)."""
        import jax.numpy as jnp

        # NB: call this on MATERIALIZED digests (its own jit), never inside
        # the producing program — stacking many fused reduce-producer chains
        # re-triggers XLA:CPU's multi-MB concatenate-fusion kernels.
        # Digest chunk counts vary with the (flattened) input size — e.g. a
        # short final term block — so pad rows to the max with zeros (neutral
        # for the additive digest sums).
        leaves = [
            [jax.tree.leaves(dg) for dg in blks] for blks in dgs
        ]
        mmax = max(
            l.shape[-2] for blks in leaves for dg in blks for l in dg
        )

        def pad(a):
            if a.shape[-2] == mmax:
                return a
            width = [(0, 0)] * a.ndim
            width[-2] = (0, mmax - a.shape[-2])
            return jnp.pad(a, width)

        rows = [
            jnp.stack([jnp.stack([pad(l) for l in dgl]) for dgl in blksl])
            for blksl in leaves
        ]
        return jnp.stack(rows)

    def packed_digest_values(self, arr):
        """Host finish of pack_digests output (np array or device array with
        optional extra leading shard axes folded into the block axis).
        Returns one host scalar per eval point."""
        import numpy as np

        arr = np.asarray(arr, dtype=np.uint64)
        # arr: [npts, nblk, nleaves, (extra shard axes...), m, 2]; the limb
        # slice below flattens any extra axes into the summed rows
        nl = self.limbs_per_base
        out = []
        for t in range(arr.shape[0]):
            a = arr[t]  # [nblk, nleaves, m, 2]
            coeffs = []
            for c in range(a.shape[1] // nl):
                acc = 0
                for j in range(nl):
                    d = a[:, c * nl + j].reshape(-1, 2)
                    acc += (
                        int(d[:, 0].sum()) + (int(d[:, 1].sum()) << 16)
                    ) << (32 * j)
                coeffs.append(acc % self.spec.p)
            out.append(tuple(coeffs) if len(coeffs) > 1 else coeffs[0])
        return out

    def digest_value(self, dg):
        """Host-side finish of sum_digest: -> int (base) or ext tuple.

        Leaf convention: tree leaves are uint32 limb arrays, little-endian
        limb order within each base coefficient (GL: [lo, hi]; GL2:
        [a0.lo, a0.hi, a1.lo, a1.hi])."""
        import numpy as np

        leaves = jax.tree.leaves(dg)
        nl = self.limbs_per_base
        vals = []
        for i in range(0, len(leaves), nl):
            acc = 0
            for j in range(nl):
                # [.., m, 2]; extra leading axes (e.g. per-shard digests
                # from shard_map) flatten harmlessly — digests are additive
                d = np.asarray(leaves[i + j], dtype=np.uint64).reshape(-1, 2)
                limb = int(d[:, 0].sum()) + (int(d[:, 1].sum()) << 16)
                acc += limb << (32 * j)
            vals.append(acc % self.spec.p)
        if len(vals) == 1:
            return vals[0]
        return tuple(vals)


def _gl_from_u32(col):
    import jax.numpy as jnp

    return GL(col, jnp.zeros_like(col))


GL_BACKEND = Backend(
    spec=GOLDILOCKS,
    base=_gl,
    ext=_glext,
    base_cls=GL,
    ext_cls=GL2,
    from_u32=_gl_from_u32,
)

_BACKENDS = {"goldilocks": GL_BACKEND}


def _make_bn254_backend():
    from ..fields import BN254_FR
    from . import bn254 as _bn
    import jax.numpy as jnp

    def from_u32(col):
        z = jnp.zeros_like(col)
        return _bn.FR(col, z, z, z, z, z, z, z)

    return Backend(
        spec=BN254_FR,
        base=_bn,
        ext=_bn,
        base_cls=_bn.FR,
        ext_cls=_bn.FR,
        limbs_per_base=8,
        from_u32=from_u32,
    )


def get_backend(name: str) -> Backend:
    if name == "bn254" and name not in _BACKENDS:
        _BACKENDS[name] = _make_bn254_backend()
    return _BACKENDS[name]


def register_backend(name: str, be: Backend):
    _BACKENDS[name] = be
