"""Batched query fragment sketching (bottom-s MinHash of each fragment).

Reference semantics (``CommonFunc::sketchSequence``, commonFunc.hpp:182-288):
for a query fragment, keep the s smallest *distinct* canonical k-mer
hashes; for each kept hash accumulate a strand vote (+1 forward / -1
reverse) over ALL its occurrences; classify votes >0/==0/<0 as
FWD/AMBIG/REV; output is ascending by hash. K-mers containing 'N'
(full-window rule) and palindromic-hash k-mers are skipped.

The reference does this with a heap per fragment; here a whole batch of
fragments is sketched at once: hash all windows, sort each row, take the
first s distinct, and segment-reduce votes — all jit-compiled. Fragments
shorter than the batch length are padded with 'N' bytes, which makes the
padded windows invalid without touching real windows.

Also computes the k-mer complexity estimate
(reference: computeMap.hpp:830-831).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .kmers import canonical_kmer_hashes

UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("k", "s"))
def sketch_fragments(frags: jax.Array, k: int, s: int):
    """Sketch a batch of fragments.

    Args:
      frags: (B, L) uint8 sanitized ASCII bytes ('A','C','G','T','N'),
             'N'-padded to a common length L.
      k: k-mer size.
      s: sketch size.

    Returns:
      hashes: (B, s) uint64 ascending, UMAX-padded.
      strand: (B, s) int8 classified votes (FWD 1 / AMBIG 0 / REV -1).
      count:  (B,) int32 — number of kept sketch hashes (min(s, #distinct)).
      complexity: (B,) float64 k-mer complexity estimate; the denominator
             uses the fragment's true (unpadded) window count, so callers
             must rescale when L differs from the real length — see
             `complexity_rescale`.
    """
    B, L = frags.shape
    n = L - k + 1
    hashes, strand, palin, has_n, _ = canonical_kmer_hashes(frags, k)
    valid = ~palin & ~has_n
    key = jnp.where(valid, hashes, UMAX)

    # fused multi-operand sort (key + strand payload): no argsort-gather
    # (wide gathers/scatters are pathologically slow on some TPU stacks)
    skey, sstr = jax.lax.sort(
        (key, strand.astype(jnp.int32)), dimension=-1, num_keys=1)

    newh = jnp.concatenate(
        [jnp.ones((B, 1), bool), skey[:, 1:] != skey[:, :-1]], axis=-1)
    newh = newh & (skey != UMAX)
    rank = jnp.cumsum(newh.astype(jnp.int32), axis=-1) - 1  # distinct rank

    # index of the r-th distinct hash: first newh position with that
    # rank. ONE sort-compaction per batch — rank is strictly increasing
    # over newh columns, so sorting (rank-or-s, j) moves the group-start
    # positions to the first columns in rank order. The former vmapped
    # row scatter plus per-row binary search for the group ends were the
    # slow op classes on this stack (~100 of sketch_fragments' 117 ms at
    # (1024, 5000); this form runs the whole kernel in ~35 ms).
    Lk = rank.shape[1]
    j_row = jnp.arange(Lk, dtype=jnp.int32)
    # s+1 starts: group r's span ends at group r+1's start, so the vote
    # of group s-1 needs the start of group s when n_distinct > s
    keyr = jnp.where(newh & (rank <= s), rank, s + 1)
    _, r_ext = jax.lax.sort(
        (keyr, jnp.broadcast_to(j_row[None], (B, Lk))),
        dimension=-1, num_keys=1)
    r_ext = r_ext[:, :s + 1]      # garbage beyond n_distinct (masked)
    if r_ext.shape[1] < s + 1:
        # s >= window count (tiny fragments or huge -J): fewer than s+1
        # columns exist; pad like the scatter form's fill so the (B, s)
        # output shape holds
        r_ext = jnp.concatenate(
            [r_ext, jnp.full((B, s + 1 - r_ext.shape[1]), Lk - 1,
                             jnp.int32)], axis=1)
    r_idx = r_ext[:, :s]
    r_idx_c = jnp.minimum(r_idx, L - k)
    out_h = jnp.take_along_axis(skey, r_idx_c, axis=-1)
    n_distinct = rank[:, -1] + 1
    got = jnp.arange(s)[None, :] < n_distinct[:, None]
    out_h = jnp.where(got, out_h, UMAX)

    # per-distinct strand vote: segment sum via cumsum difference
    # between consecutive group starts; group r ends where group r+1
    # begins (no binary search needed), the last live group at Lk
    cs = jnp.cumsum(jnp.where(skey != UMAX, sstr, 0), axis=-1)
    nxt_idx = jnp.where(
        jnp.arange(1, s + 1)[None, :] < n_distinct[:, None],
        r_ext[:, 1:], Lk)
    cs_ext = jnp.concatenate([jnp.zeros((B, 1), cs.dtype), cs], axis=-1)
    # group r spans [r_idx, nxt_idx): vote = cs[nxt-1] - cs[r_idx - 1]
    votes = (jnp.take_along_axis(cs_ext, jnp.minimum(nxt_idx, L - k + 1),
                                 axis=-1)
             - jnp.take_along_axis(cs_ext, r_idx_c, axis=-1))
    votes = jnp.where(got, votes, 0)
    out_strand = jnp.where(
        out_h == UMAX, jnp.int8(0),
        jnp.where(votes > 0, jnp.int8(1),
                  jnp.where(votes < 0, jnp.int8(-1), jnp.int8(0))))

    count = jnp.sum((out_h != UMAX).astype(jnp.int32), axis=-1)
    max_kept = jnp.max(jnp.where(out_h == UMAX, jnp.uint64(0), out_h),
                       axis=-1)
    max01 = max_kept.astype(jnp.float64) / jnp.float64(
        np.float64(2.0) ** 64)
    denom = jnp.float64(2 * n)
    complexity = jnp.where(
        count > 0, (count.astype(jnp.float64) / jnp.maximum(max01, 1e-300))
        / denom, 0.0)
    return out_h, out_strand, count, complexity


def complexity_rescale(complexity: np.ndarray, padded_len: int,
                       true_len: np.ndarray, k: int) -> np.ndarray:
    """Fix the complexity denominator for 'N'-padded fragments.

    complexity = (count / max01) / (2*(len-k+1)); padding inflates len.
    """
    return complexity * (padded_len - k + 1) / (true_len - k + 1)


def sketch_sequence_py(seq_u8: np.ndarray, k: int, s: int):
    """Single-fragment sketch, plain numpy (host fallback / oracle)."""
    from . import murmur, kmers as _k
    n = len(seq_u8) - k + 1
    if n <= 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int8), 0, 0.0)
    h = np.empty(n, np.uint64)
    st = np.empty(n, np.int8)
    ok = np.empty(n, bool)
    rc = _k.revcomp_np(seq_u8)
    is_n = seq_u8 == ord("N")
    cn = np.concatenate(([0], np.cumsum(is_n)))
    for i in range(n):
        f = murmur.murmur128_low64_py(seq_u8[i:i + k].tobytes())
        b = murmur.murmur128_low64_py(rc[len(rc) - i - k: len(rc) - i]
                                      .tobytes())
        h[i] = min(f, b)
        st[i] = 1 if f < b else -1
        ok[i] = (f != b) and (cn[i + k] - cn[i] == 0)
    vh = h[ok]
    if len(vh) == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int8), 0, 0.0)
    uniq = np.unique(vh)[:s]
    votes = np.array([st[ok][vh == u].sum() for u in uniq])
    strand = np.sign(votes).astype(np.int8)
    count = len(uniq)
    max01 = float(uniq[-1]) / float(2.0 ** 64)
    complexity = (count / max01) / (2 * n)
    return uniq, strand, count, complexity
