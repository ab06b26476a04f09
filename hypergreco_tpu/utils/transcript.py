"""Keccak-256 Fiat-Shamir transcript.

Mirrors the reference scheme (bfv-gkr/src/transcript.rs):
- absorb: streaming keccak update of the element's canonical bytes
- squeeze: digest = finalize_reset(); re-absorb digest; challenge =
  int_from_le_bytes(digest) mod p   (fe_mod_from_le_bytes, transcript.rs:202)
- ext challenges/writes: DEGREE base elements (transcript.rs:149-155)

Deviation (documented in PROTOCOL.md): field elements are absorbed/streamed as
little-endian canonical bytes; the reference streams big-endian (reversed
repr). Self-consistent prover/verifier; golden-transcript parity with the
Rust fork is pinned behind a byte-order flag once golden vectors exist.
"""

from __future__ import annotations

from ..fields import FieldSpec
from .keccak import new_keccak256


class _TranscriptBase:
    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self._hash = new_keccak256()

    # -- absorb-only (no proof stream) --

    def common_felt(self, x: int):
        self._hash.update(self.spec.felt_to_bytes(x))

    def common_felts(self, xs):
        for x in xs:
            self.common_felt(x)

    def common_felt_ext(self, x):
        for b in self.spec._c(x):
            self.common_felt(b)

    def common_felts_ext(self, xs):
        for x in xs:
            self.common_felt_ext(x)

    def common_statement(self, xs) -> bytes:
        """Bind a LARGE public statement (e.g. the dense ct0is vector) by
        absorbing keccak256(canonical felt bytes) instead of the raw
        stream: collision resistance gives the same binding, and the
        device transcript absorbs 32 bytes instead of megabytes (the
        sequential on-device keccak absorb of the 2^18-felt gl16384
        statement cost ~4 s of every prove). Returns the digest so the
        device prover can absorb the identical bytes."""
        h = new_keccak256()
        for x in xs:
            h.update(self.spec.felt_to_bytes(x))
        digest = h.finalize_reset()
        self._hash.update(digest)
        return digest

    # -- challenges --

    def squeeze_base(self) -> int:
        digest = self._hash.finalize_reset()
        self._hash.update(digest)
        return int.from_bytes(digest, "little") % self.spec.p

    def squeeze_challenge(self) -> tuple:
        """Protocol v2.1: a degree-2 challenge takes both coefficients from
        ONE 32-byte digest (16-byte LE halves mod p) — the digest-per-
        coefficient schedule doubled the serial keccak chain that dominates
        device proving (PROTOCOL.md 'challenge squeezing')."""
        if self.spec.ext_degree == 1:
            return (self.squeeze_base(),)
        assert self.spec.ext_degree == 2
        digest = self._hash.finalize_reset()
        self._hash.update(digest)
        p = self.spec.p
        return (
            int.from_bytes(digest[:16], "little") % p,
            int.from_bytes(digest[16:], "little") % p,
        )

    def squeeze_challenges(self, n: int) -> list:
        return [self.squeeze_challenge() for _ in range(n)]


class TranscriptWriter(_TranscriptBase):
    def __init__(self, spec: FieldSpec):
        super().__init__(spec)
        self._stream = bytearray()

    def write_felt(self, x: int):
        x = int(x) % self.spec.p
        self.common_felt(x)
        self._stream.extend(self.spec.felt_to_bytes(x))

    def write_felt_ext(self, x):
        for b in self.spec._c(x):
            self.write_felt(b)

    def write_felts(self, xs):
        for x in xs:
            self.write_felt(x)

    def write_felts_ext(self, xs):
        for x in xs:
            self.write_felt_ext(x)

    def into_proof(self) -> bytes:
        return bytes(self._stream)

    # -- checkpoint/resume (SURVEY.md §5.4: portable transcript state) --

    def snapshot(self) -> dict:
        return {
            "hash": self._hash.snapshot(),
            "stream": bytes(self._stream),
            "spec": self.spec.name,
        }

    def restore(self, snap: dict):
        assert snap["spec"] == self.spec.name
        self._hash.restore(snap["hash"])
        self._stream = bytearray(snap["stream"])


class RngTranscriptWriter(TranscriptWriter):
    """Dev-only transcript whose challenges come from a seeded RNG and
    which does NOT absorb (RngTranscript parity, transcript.rs:23-69):
    deterministic challenge streams for debugging a prover phase in
    isolation — NOT Fiat-Shamir, never sound for real proofs."""

    def __init__(self, spec: FieldSpec, seed: int = 0):
        super().__init__(spec)
        import random

        self._rng = random.Random(seed)

    def common_felt(self, x: int):  # no absorbing
        pass

    def common_statement(self, xs) -> bytes:
        return b"\x00" * 32

    def squeeze_base(self) -> int:
        return self._rng.randrange(self.spec.p)

    def squeeze_challenge(self) -> tuple:  # rng draws, no digest splitting
        return tuple(self.squeeze_base() for _ in range(self.spec.ext_degree))


class TranscriptReader(_TranscriptBase):
    def __init__(self, spec: FieldSpec, proof: bytes):
        super().__init__(spec)
        self._proof = proof
        self._pos = 0

    def read_felt(self) -> int:
        n = self.spec.repr_bytes
        if self._pos + n > len(self._proof):
            raise ValueError("transcript: unexpected end of proof stream")
        x = self.spec.felt_from_bytes(self._proof[self._pos : self._pos + n])
        self._pos += n
        self.common_felt(x)
        return x

    def read_felt_ext(self) -> tuple:
        return tuple(self.read_felt() for _ in range(self.spec.ext_degree))

    def read_felts(self, n: int) -> list:
        return [self.read_felt() for _ in range(n)]

    def read_felts_ext(self, n: int) -> list:
        return [self.read_felt_ext() for _ in range(n)]

    def assert_consumed(self):
        if self._pos != len(self._proof):
            raise ValueError(
                f"transcript: {len(self._proof) - self._pos} unread proof bytes"
            )


class RngTranscriptReader(TranscriptReader):
    """Verifier twin of RngTranscriptWriter: reads the proof stream but
    draws challenges from the same seeded RNG instead of the hash."""

    def __init__(self, spec: FieldSpec, proof: bytes, seed: int = 0):
        super().__init__(spec, proof)
        import random

        self._rng = random.Random(seed)

    def common_felt(self, x: int):
        pass

    def common_statement(self, xs) -> bytes:
        return b"\x00" * 32

    def squeeze_base(self) -> int:
        return self._rng.randrange(self.spec.p)

    def squeeze_challenge(self) -> tuple:  # rng draws, no digest splitting
        return tuple(self.squeeze_base() for _ in range(self.spec.ext_degree))
