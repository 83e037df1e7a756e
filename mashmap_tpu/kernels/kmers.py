"""Sequence byte sanitation and canonical k-mer hashing.

Reference semantics reimplemented here:

- ``makeUpperCaseAndValidDNA``: uppercase a-z, then any byte that is not
  one of 'A','C','G','T' becomes 'N' (commonFunc.hpp:75-107).
- canonical hash = min(murmur(kmer), murmur(revcomp(kmer))); k-mers whose
  forward and reverse hashes are equal ("symmetric") are skipped; strand is
  FWD if the forward hash is the smaller one (commonFunc.hpp:225-240).
- ambiguity ('N') masking. The reference has *two different* N rules:
  * query sketching pre-scans the first k-1 bases, so a k-mer is invalid
    iff ANY of its k bases is 'N' (commonFunc.hpp:207-222);
  * reference winnowing (addMinmers) only inspects the last base of each
    window (commonFunc.hpp:412-415), so 'N's within the first k-1 bases of
    a contig do NOT invalidate k-mers. We reproduce both rules
    (``n_invalid_full`` vs ``n_invalid_tail``) for output parity.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .murmur import hash_kmer_windows

# strand labels (reference: base_types.hpp:103-108)
FWD = 1
AMBIG = 0
REV = -1

# --- host-side byte tables -------------------------------------------------

_SANITIZE = np.full(256, ord("N"), dtype=np.uint8)
for _b in b"ACGT":
    _SANITIZE[_b] = _b
    _SANITIZE[_b + 32] = _b  # lowercase

_COMPLEMENT = np.full(256, ord("N"), dtype=np.uint8)
for _x, _y in zip(b"ACGT", b"TGCA"):
    _COMPLEMENT[_x] = _y


def _complement_j(seq_u8: jax.Array) -> jax.Array:
    """Device complement of sanitized bytes without a table gather.

    (A 256-entry LUT gather compiles/runs pathologically on TPU; a
    where-chain is pure elementwise VPU work.)
    """
    out = jnp.full_like(seq_u8, np.uint8(ord("N")))
    for x, y in zip(b"ACGT", b"TGCA"):
        out = jnp.where(seq_u8 == np.uint8(x), np.uint8(y), out)
    return out


def sanitize(seq_bytes: bytes | np.ndarray) -> np.ndarray:
    """Uppercase + non-ACGT -> 'N'. Host-side (numpy)."""
    arr = np.frombuffer(seq_bytes, dtype=np.uint8) if isinstance(
        seq_bytes, (bytes, bytearray)) else np.asarray(seq_bytes, np.uint8)
    return _SANITIZE[arr]


def revcomp_np(seq_u8: np.ndarray) -> np.ndarray:
    """Reverse complement of a sanitized byte array (host)."""
    return _COMPLEMENT[seq_u8][::-1]


# --- device-side canonical hashing ------------------------------------------


def canonical_kmer_hashes(seq_u8: jax.Array, k: int):
    """Canonical hashes + strand + masks for every k-mer window.

    Args:
      seq_u8: (..., L) sanitized uint8 ASCII bytes.
      k: k-mer size (static).

    Returns:
      hashes: (..., L-k+1) uint64 canonical (min of fwd/rev) hashes.
      strand: (..., L-k+1) int8, +1 FWD / -1 REV.
      palindrome: (..., L-k+1) bool, fwd hash == rev hash (skipped kmers).
      has_n: (..., L-k+1) bool, window contains an 'N' (full-window rule).
      has_n_tail: (..., L-k+1) bool, addMinmers rule: an 'N' at a
        *window-end* base position within the window (positions >= k-1).
    """
    L = seq_u8.shape[-1]
    n = L - k + 1
    fwd = hash_kmer_windows(seq_u8, k)

    rc = _complement_j(seq_u8[..., ::-1])
    rc_hashes = hash_kmer_windows(rc, k)
    # rev-hash of window starting at i == hash of rc window starting at L-i-k
    bwd = rc_hashes[..., ::-1]

    palindrome = fwd == bwd
    hashes = jnp.minimum(fwd, bwd)
    strand = jnp.where(fwd < bwd, jnp.int8(FWD), jnp.int8(REV))

    is_n = (seq_u8 == np.uint8(ord("N")))
    # windowed any(): cumulative count difference
    cn = jnp.cumsum(is_n.astype(jnp.int32), axis=-1)
    # count of N in [i, i+k-1] = cn[i+k-1] - cn[i-1]
    left = jnp.concatenate(
        [jnp.zeros(cn.shape[:-1] + (1,), cn.dtype), cn[..., : n - 1]], axis=-1)
    has_n = (cn[..., k - 1:] - left) > 0

    # addMinmers rule: N at position p invalidates k-mers i with
    # max(i, k-1) <= p <= i+k-1, i.e. only p >= k-1 matter.
    is_n_tail = is_n.at[..., : k - 1].set(False)
    cnt = jnp.cumsum(is_n_tail.astype(jnp.int32), axis=-1)
    left_t = jnp.concatenate(
        [jnp.zeros(cnt.shape[:-1] + (1,), cnt.dtype), cnt[..., : n - 1]],
        axis=-1)
    has_n_tail = (cnt[..., k - 1:] - left_t) > 0

    return hashes, strand, palindrome, has_n, has_n_tail
