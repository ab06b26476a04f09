"""Coefficient-vector parsing/padding conventions (bfv-gkr/src/poly.rs).

Coefficients are stored HIGHEST-degree-first (poly.rs:4-5); all three
constructors mirror the reference exactly:
- new: parse decimal strings mod p (poly.rs:13-18)
- new_padded: zero-pad the TAIL to 2^log2_size (poly.rs:20-28)
- new_shifted: zero-pad the HEAD to `size`, then the tail to the next power
  of two (poly.rs:30-44) — the convolution-alignment layout for e/k1/ct0i.
"""

from __future__ import annotations

from typing import List


def parse_coeffs(strings, p: int) -> List[int]:
    return [int(s) % p for s in strings]


def new(strings, p: int) -> List[int]:
    return parse_coeffs(strings, p)


def new_padded(strings, log2_size: int, p: int) -> List[int]:
    out = parse_coeffs(strings, p)
    assert len(out) <= 1 << log2_size
    out.extend([0] * ((1 << log2_size) - len(out)))
    return out


def _next_pow2(n: int) -> int:
    return 1 if n == 0 else 1 << (n - 1).bit_length()


def new_shifted(strings, size: int, p: int) -> List[int]:
    coeffs = parse_coeffs(strings, p)
    padding = max(size - len(coeffs), 0)
    out = [0] * padding + coeffs
    out.extend([0] * (_next_pow2(size) - len(out)))
    return out
