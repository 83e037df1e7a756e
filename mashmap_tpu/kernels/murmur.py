"""Vectorized MurmurHash3_x64_128 (low 64 bits) over k-mer windows.

The reference hashes every k-mer (forward and reverse-complement) with
MurmurHash3_x64_128 seeded with 42 and keeps the low 64 bits
(reference: src/common/murmur3.h:226-303 and
src/map/include/commonFunc.hpp:37,138-147). Bit-exact parity here is
mandatory: every downstream decision (sketch membership, index lookups,
tie-breaks) keys on these hash values.

Instead of a byte-serial loop, we hash *all* k-mer windows of a sequence at
once: gather an (N, k) byte matrix, pack little-endian u64 lanes, and run
the (statically unrolled, k is compile-time constant) block+tail rounds in
uint64 vector arithmetic. XLA lowers u64 to u32 pairs on TPU; the math is
exact.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

SEED = 42  # reference: commonFunc.hpp:37

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)
_M5 = np.uint64(5)
_A1 = np.uint64(0x52DCE729)
_A2 = np.uint64(0x38495AB5)

_U64 = jnp.uint64


def _rotl64(x, r: int):
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix64(h):
    h = h ^ (h >> np.uint64(33))
    h = h * _F1
    h = h ^ (h >> np.uint64(33))
    h = h * _F2
    h = h ^ (h >> np.uint64(33))
    return h


def _pack_u64_le(bytes_u8, offset: int, nbytes: int):
    """Pack `nbytes` (<=8) little-endian bytes starting at static `offset`."""
    w = jnp.zeros(bytes_u8.shape[:-1], dtype=_U64)
    for b in range(nbytes):
        w = w | (bytes_u8[..., offset + b].astype(_U64) << np.uint64(8 * b))
    return w


def murmur128_low64(bytes_u8: jax.Array, length: int, seed: int = SEED):
    """Low 64 bits of MurmurHash3_x64_128 over the last axis.

    Args:
      bytes_u8: (..., length) uint8 array of key bytes.
      length: static key length in bytes (== k-mer size).
      seed: hash seed (reference uses 42).

    Returns:
      (...,) uint64 — h1, i.e. the first 8 output bytes, matching the
      reference's ``*((hash_t*)data)`` readout (commonFunc.hpp:138-147).
    """
    h1 = jnp.full(bytes_u8.shape[:-1], np.uint64(seed), dtype=_U64)
    h2 = jnp.full(bytes_u8.shape[:-1], np.uint64(seed), dtype=_U64)

    nblocks = length // 16
    for i in range(nblocks):
        k1 = _pack_u64_le(bytes_u8, i * 16, 8)
        k2 = _pack_u64_le(bytes_u8, i * 16 + 8, 8)
        k1 = k1 * _C1
        k1 = _rotl64(k1, 31)
        k1 = k1 * _C2
        h1 = h1 ^ k1
        h1 = _rotl64(h1, 27)
        h1 = h1 + h2
        h1 = h1 * _M5 + _A1
        k2 = k2 * _C2
        k2 = _rotl64(k2, 33)
        k2 = k2 * _C1
        h2 = h2 ^ k2
        h2 = _rotl64(h2, 31)
        h2 = h2 + h1
        h2 = h2 * _M5 + _A2

    tail = length & 15
    toff = nblocks * 16
    if tail > 8:
        k2 = _pack_u64_le(bytes_u8, toff + 8, tail - 8)
        k2 = k2 * _C2
        k2 = _rotl64(k2, 33)
        k2 = k2 * _C1
        h2 = h2 ^ k2
    if tail > 0:
        k1 = _pack_u64_le(bytes_u8, toff, min(tail, 8))
        k1 = k1 * _C1
        k1 = _rotl64(k1, 31)
        k1 = k1 * _C2
        h1 = h1 ^ k1

    ln = np.uint64(length)
    h1 = h1 ^ ln
    h2 = h2 ^ ln
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    # h2 += h1 would complete the 128-bit state; only h1 is consumed.
    return h1


def _pack_window_word(seq_u8: jax.Array, n: int, offset: int, nbytes: int):
    """u64 word of bytes [offset, offset+nbytes) of every length-k window.

    Gather-free: nbytes static shifted SLICES of the sequence axis. XLA
    lowers slices to cheap static offsets (a windowed gather of the same
    data compiles catastrophically slowly on TPU and runs worse).
    """
    w = jnp.zeros(seq_u8.shape[:-1] + (n,), dtype=_U64)
    for b in range(nbytes):
        w = w | (seq_u8[..., offset + b: offset + b + n].astype(_U64)
                 << np.uint64(8 * b))
    return w


def hash_kmer_windows(seq_u8: jax.Array, k: int, seed: int = SEED):
    """Hash every length-k window of a byte sequence.

    Args:
      seq_u8: (..., L) uint8 ASCII bytes ('A','C','G','T','N').
      k: k-mer size (static).

    Returns:
      (..., L-k+1) uint64 hashes (window i covers seq[i:i+k]).
    """
    L = seq_u8.shape[-1]
    n = L - k + 1
    h1 = jnp.full(seq_u8.shape[:-1] + (n,), np.uint64(seed), dtype=_U64)
    h2 = jnp.full(seq_u8.shape[:-1] + (n,), np.uint64(seed), dtype=_U64)

    nblocks = k // 16
    for i in range(nblocks):
        k1 = _pack_window_word(seq_u8, n, i * 16, 8)
        k2 = _pack_window_word(seq_u8, n, i * 16 + 8, 8)
        k1 = k1 * _C1
        k1 = _rotl64(k1, 31)
        k1 = k1 * _C2
        h1 = h1 ^ k1
        h1 = _rotl64(h1, 27)
        h1 = h1 + h2
        h1 = h1 * _M5 + _A1
        k2 = k2 * _C2
        k2 = _rotl64(k2, 33)
        k2 = k2 * _C1
        h2 = h2 ^ k2
        h2 = _rotl64(h2, 31)
        h2 = h2 + h1
        h2 = h2 * _M5 + _A2

    tail = k & 15
    toff = nblocks * 16
    if tail > 8:
        k2 = _pack_window_word(seq_u8, n, toff + 8, tail - 8)
        k2 = k2 * _C2
        k2 = _rotl64(k2, 33)
        k2 = k2 * _C1
        h2 = h2 ^ k2
    if tail > 0:
        k1 = _pack_window_word(seq_u8, n, toff, min(tail, 8))
        k1 = k1 * _C1
        k1 = _rotl64(k1, 31)
        k1 = k1 * _C2
        h1 = h1 ^ k1

    ln = np.uint64(k)
    h1 = h1 ^ ln
    h2 = h2 ^ ln
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    return h1


# ---------------------------------------------------------------------------
# Pure-Python oracle (used by unit tests only; byte-serial, exact).
# ---------------------------------------------------------------------------

_MASK = (1 << 64) - 1


def _py_rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _MASK


def _py_fmix(h):
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _MASK
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _MASK
    h ^= h >> 33
    return h


def murmur128_low64_py(data: bytes, seed: int = SEED) -> int:
    """Byte-serial MurmurHash3_x64_128 low word; test oracle."""
    length = len(data)
    nblocks = length // 16
    h1 = h2 = seed
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16: i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8: i * 16 + 16], "little")
        k1 = (k1 * c1) & _MASK
        k1 = _py_rotl(k1, 31)
        k1 = (k1 * c2) & _MASK
        h1 ^= k1
        h1 = _py_rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * c2) & _MASK
        k2 = _py_rotl(k2, 33)
        k2 = (k2 * c1) & _MASK
        h2 ^= k2
        h2 = _py_rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    t = length & 15
    if t > 8:
        k2 = int.from_bytes(tail[8:t], "little")
        k2 = (k2 * c2) & _MASK
        k2 = _py_rotl(k2, 33)
        k2 = (k2 * c1) & _MASK
        h2 ^= k2
    if t > 0:
        k1 = int.from_bytes(tail[: min(t, 8)], "little")
        k1 = (k1 * c1) & _MASK
        k1 = _py_rotl(k1, 31)
        k1 = (k1 * c2) & _MASK
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _py_fmix(h1)
    h2 = _py_fmix(h2)
    h1 = (h1 + h2) & _MASK
    return h1
