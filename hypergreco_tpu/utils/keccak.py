"""Keccak-256 streaming sponge with native (C++) fast path.

Semantics mirror the reference transcript's hash usage (transcript.rs:198-209):
streaming ``update``; ``finalize_reset`` applies original-keccak 0x01 padding,
returns the 32-byte digest and resets the state.

The C++ backend (native/keccak.cpp) is compiled on demand with g++; a pure
Python implementation is the fallback (and the cross-check in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libhg_native.so"))
_BUILD_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _load_native():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _BUILD_LOCK:
        if _TRIED:
            return _LIB
        try:
            srcs = [os.path.join(_NATIVE_DIR, "keccak.cpp")]
            for extra in ("parse.cpp", "nverify.cpp", "nverify_fr.cpp"):
                path = os.path.join(_NATIVE_DIR, extra)
                if os.path.exists(path):
                    srcs.append(path)
            stale = not os.path.exists(_SO_PATH) or any(
                os.path.getmtime(s) > os.path.getmtime(_SO_PATH) for s in srcs
            )
            if stale:
                # build to a temp path + atomic rename: another process may
                # be dlopen()ing the .so at this very moment
                tmp = _SO_PATH + f".tmp.{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, *srcs],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, _SO_PATH)
            lib = ctypes.CDLL(_SO_PATH)
            lib.hg_keccak_init.argtypes = [ctypes.c_void_p]
            lib.hg_keccak_update.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            lib.hg_keccak_finalize_reset.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            _LIB = lib
        except Exception:
            _LIB = None
        _TRIED = True
        return _LIB


# ---------------------------------------------------------------------------
# pure-Python keccak-f[1600] (fallback + oracle)
# ---------------------------------------------------------------------------

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROT = [0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43,
        25, 39, 41, 45, 15, 21, 8, 18, 2, 61, 56, 14]
_MASK = (1 << 64) - 1
_RATE = 136


def _rotl(x, n):
    return ((x << n) | (x >> (64 - n))) & _MASK if n else x


def _keccakf(st):
    for rc in _RC:
        bc = [st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20] for i in range(5)]
        for i in range(5):
            t = bc[(i + 4) % 5] ^ _rotl(bc[(i + 1) % 5], 1)
            for j in range(0, 25, 5):
                st[j + i] ^= t
        tmp = [0] * 25
        for x in range(5):
            for y in range(5):
                src = x + 5 * y
                dst = y + 5 * ((2 * x + 3 * y) % 5)
                tmp[dst] = _rotl(st[src], _ROT[src])
        for y in range(0, 25, 5):
            for x in range(5):
                st[y + x] = tmp[y + x] ^ ((~tmp[y + (x + 1) % 5]) & tmp[y + (x + 2) % 5] & _MASK)
        st[0] ^= rc


class _PyKeccak:
    """Streaming xor-into-state sponge. The snapshot format (25 x u64 LE
    lanes with partial-block data already xored in + 8-byte LE position) is
    byte-identical to the native backend's KeccakState, so checkpoints are
    portable across backends."""

    def __init__(self):
        self._st = [0] * 25
        self._pos = 0

    def snapshot(self) -> bytes:
        st = b"".join(x.to_bytes(8, "little") for x in self._st)
        return st + self._pos.to_bytes(8, "little")

    def restore(self, blob: bytes):
        assert len(blob) == 208, "canonical keccak snapshot is 208 bytes"
        self._st = [
            int.from_bytes(blob[8 * i : 8 * i + 8], "little") for i in range(25)
        ]
        self._pos = int.from_bytes(blob[200:], "little")

    def update(self, data: bytes):
        off = 0
        n = len(data)
        while off < n:
            take = min(_RATE - self._pos, n - off)
            for i in range(take):
                j = self._pos + i
                self._st[j // 8] ^= data[off + i] << (8 * (j % 8))
            self._pos += take
            off += take
            if self._pos == _RATE:
                _keccakf(self._st)
                self._pos = 0

    def finalize_reset(self) -> bytes:
        self._st[self._pos // 8] ^= 0x01 << (8 * (self._pos % 8))
        self._st[16] ^= 0x80 << 56
        _keccakf(self._st)
        out = b"".join(self._st[i].to_bytes(8, "little") for i in range(4))
        self._st = [0] * 25
        self._pos = 0
        return out


class _NativeKeccak:
    __slots__ = ("_state", "_lib")

    def __init__(self, lib):
        self._lib = lib
        self._state = ctypes.create_string_buffer(208)  # 25*8 + pos
        lib.hg_keccak_init(self._state)

    def update(self, data: bytes):
        self._lib.hg_keccak_update(self._state, data, len(data))

    def finalize_reset(self) -> bytes:
        out = ctypes.create_string_buffer(32)
        self._lib.hg_keccak_finalize_reset(self._state, out)
        return out.raw

    def snapshot(self) -> bytes:
        return bytes(self._state.raw)

    def restore(self, blob: bytes):
        assert len(blob) == 208
        ctypes.memmove(self._state, blob, 208)


def new_keccak256():
    """Streaming keccak-256 with update()/finalize_reset()."""
    lib = _load_native()
    if lib is not None:
        return _NativeKeccak(lib)
    return _PyKeccak()


def keccak256(data: bytes) -> bytes:
    h = new_keccak256()
    h.update(data)
    return h.finalize_reset()
