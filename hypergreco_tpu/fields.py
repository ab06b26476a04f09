"""Field descriptors: host-side scalar math + device module dispatch.

An extension-field scalar on the host is a tuple of ``ext_degree`` Python ints
(mod p). Base-field scalars are plain ints. Device arrays are the limb pytrees
from ops/gl.py / ops/glext.py (ops/bn254.py for the BN254 backend).

Reference parity: the `PrimeField`/`ExtensionField` trait pair
(gkr::ff_ext, SURVEY.md §2.2) — Goldilocks/GoldilocksExt2 and BN254 Fr
(extension degree 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass(frozen=True)
class FieldSpec:
    name: str
    p: int
    repr_bytes: int  # canonical byte length of one base element
    ext_degree: int
    two_adicity: int
    generator: int  # multiplicative generator of the base field
    ext_nonresidue: int  # w^2 = nonresidue (degree-2 towers only)

    # ----- host ext scalar ops (tuples of ints) -----

    def ext(self, *coeffs) -> tuple:
        cs = [int(c) % self.p for c in coeffs]
        cs += [0] * (self.ext_degree - len(cs))
        return tuple(cs)

    @property
    def zero(self) -> tuple:
        return tuple([0] * self.ext_degree)

    @property
    def one(self) -> tuple:
        return tuple([1] + [0] * (self.ext_degree - 1))

    def from_base(self, x: int) -> tuple:
        return self.ext(x)

    def eadd(self, a, b) -> tuple:
        a, b = self._c(a), self._c(b)
        return tuple((x + y) % self.p for x, y in zip(a, b))

    def esub(self, a, b) -> tuple:
        a, b = self._c(a), self._c(b)
        return tuple((x - y) % self.p for x, y in zip(a, b))

    def eneg(self, a) -> tuple:
        a = self._c(a)
        return tuple((-x) % self.p for x in a)

    def emul(self, a, b) -> tuple:
        a, b = self._c(a), self._c(b)
        if self.ext_degree == 1:
            return ((a[0] * b[0]) % self.p,)
        w = self.ext_nonresidue
        return (
            (a[0] * b[0] + w * a[1] * b[1]) % self.p,
            (a[0] * b[1] + a[1] * b[0]) % self.p,
        )

    def einv(self, a) -> tuple:
        a = self._c(a)
        if self.ext_degree == 1:
            return (pow(a[0], self.p - 2, self.p),)
        w = self.ext_nonresidue
        d = (a[0] * a[0] - w * a[1] * a[1]) % self.p
        di = pow(d, self.p - 2, self.p)
        return ((a[0] * di) % self.p, (-a[1] * di) % self.p)

    def epow(self, a, e: int) -> tuple:
        r = self.one
        b = self._c(a)
        while e > 0:
            if e & 1:
                r = self.emul(r, b)
            e >>= 1
            b = self.emul(b, b)
        return r

    def epowers(self, a, n: int) -> list:
        """[1, a, a^2, .., a^(n-1)] via a running product (n-1 muls)."""
        out = [self.one]
        if n > 1:
            a = self._c(a)
            for _ in range(n - 1):
                out.append(self.emul(out[-1], a))
        return out

    def escale(self, a, c: int) -> tuple:
        a = self._c(a)
        c = int(c) % self.p
        return tuple((x * c) % self.p for x in a)

    def _c(self, a) -> tuple:
        if isinstance(a, tuple):
            return a
        return self.from_base(int(a))

    # ----- misc -----

    def root_of_unity(self, order: int) -> int:
        assert order & (order - 1) == 0 and order <= (1 << self.two_adicity)
        g = pow(self.generator, (self.p - 1) >> self.two_adicity, self.p)
        return pow(g, (1 << self.two_adicity) // order, self.p)

    def felt_to_bytes(self, x: int) -> bytes:
        return int(x % self.p).to_bytes(self.repr_bytes, "little")

    def felt_from_bytes(self, b: bytes) -> int:
        x = int.from_bytes(b, "little")
        if x >= self.p:
            raise ValueError("invalid field element encoding in proof")
        return x


GOLDILOCKS = FieldSpec(
    name="goldilocks",
    p=(1 << 64) - (1 << 32) + 1,
    repr_bytes=8,
    ext_degree=2,
    two_adicity=32,
    generator=7,
    ext_nonresidue=7,
)

BN254_FR = FieldSpec(
    name="bn254",
    p=21888242871839275222246405745257275088548364400416034343698204186575808495617,
    repr_bytes=32,
    ext_degree=1,
    two_adicity=28,
    generator=5,
    ext_nonresidue=0,
)

FIELDS = {"goldilocks": GOLDILOCKS, "bn254": BN254_FR}
