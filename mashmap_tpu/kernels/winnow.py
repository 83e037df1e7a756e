"""Sliding-window bottom-s threshold (theta) scan for reference winnowing.

The reference builds its minmer index with a sequential deque+heap sweep
over every k-mer of every contig (reference: src/map/include/commonFunc.hpp:301-570).
That algorithm is inherently serial. The TPU formulation used here:

A hash h is in the bottom-s sketch of window W iff
    present(h, W)  AND  h <= theta(W),
where theta(W) is the s-th smallest *distinct* valid hash present in
window W (or +inf when fewer than s distinct hashes are present).

theta is computed for ALL windows at once with the classic two-level
sliding-window decomposition (cf. "Parallel approach to sliding window
sums", PAPERS.md): split the k-mer position axis into blocks of exactly
S_B = window span; every window is the union of a block suffix and the
next block's prefix; bottom-s sketches are mergeable, so

    sketch(W = b*S_B + j) = bottom_s(suffix_sketch(b, j) U prefix_sketch(b+1, j)).

Both sketch families are produced by a `lax.scan` over the S_B in-block
offsets carrying a (num_blocks, s) sorted state — all blocks advance in
lockstep, so the scan is a sequence of wide vector ops (VPU-friendly),
and the total work is O(n_kmers * s) instead of the reference's
O(n_kmers * log s) serial chain.

Membership *events* (the actual minmer intervals) are derived from theta
on the host with O(1) vectorized work per window — see index/builder.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)  # "+inf" hash / invalid marker


def _insert_bottom_s(state: jax.Array, v: jax.Array) -> jax.Array:
    """Insert v into each row's sorted distinct bottom-s set.

    state: (C, s) uint64 sorted ascending, SENTINEL-padded.
    v: (C,) uint64 (SENTINEL = skip).
    """
    s = state.shape[-1]
    is_dup = jnp.any(state == v[:, None], axis=-1)
    skip = is_dup | (v == SENTINEL)
    pos = jnp.sum(state < v[:, None], axis=-1)  # insert position
    idx = jnp.arange(s)[None, :]
    shifted = jnp.concatenate([state[:, :1], state[:, :-1]], axis=-1)
    cand = jnp.where(idx < pos[:, None], state,
                     jnp.where(idx == pos[:, None], v[:, None], shifted))
    return jnp.where(skip[:, None], state, cand)


def _merge_theta(a: jax.Array, b: jax.Array, s: int) -> jax.Array:
    """s-th smallest distinct of two sorted SENTINEL-padded (C, s) sets.

    Scatter/sort-free rank counting (scatters and sorts serialize on the
    VPU; this is pure elementwise + small reductions): for a candidate
    value x, its distinct-union rank is
        f(x) = #A<=x + #B<=x - #dup<=x,
    and theta is the smallest candidate with f(x) == s. The #<=
    counts come from an (C, s, s) comparison cube — s is small, so this
    is cheap dense VPU work.
    """
    valid_a = a != SENTINEL
    valid_b = b != SENTINEL
    # cmp[c, i, j] over candidate i of one set vs elements j of the other
    le_ba = (b[:, None, :] <= a[:, :, None]) & valid_b[:, None, :]
    eq_ba = (b[:, None, :] == a[:, :, None]) & valid_b[:, None, :]
    rB_a = jnp.sum(le_ba, axis=-1)                    # #B <= a_i
    dup_a = jnp.any(eq_ba, axis=-1)                   # a_i in B
    csum_dup_a = jnp.cumsum(dup_a.astype(jnp.int32), axis=-1)
    i = jnp.arange(1, s + 1)[None, :]
    f_a = i + rB_a - csum_dup_a                       # distinct rank of a_i

    le_ab = (a[:, None, :] <= b[:, :, None]) & valid_a[:, None, :]
    eq_ab = (a[:, None, :] == b[:, :, None]) & valid_a[:, None, :]
    rA_b = jnp.sum(le_ab, axis=-1)
    dup_b = jnp.any(eq_ab, axis=-1)
    csum_dup_b = jnp.cumsum(dup_b.astype(jnp.int32), axis=-1)
    f_b = i + rA_b - csum_dup_b

    th_a = jnp.min(jnp.where((f_a == s) & valid_a, a, SENTINEL), axis=-1)
    th_b = jnp.min(jnp.where((f_b == s) & valid_b, b, SENTINEL), axis=-1)
    return jnp.minimum(th_a, th_b)


@functools.partial(jax.jit, static_argnames=("s", "s_b"))
def _theta_chunk(cur: jax.Array, nxt: jax.Array, s: int, s_b: int):
    """theta for all windows starting inside a chunk of blocks.

    Args:
      cur: (C, S_B) uint64 hashes of blocks b (SENTINEL where invalid).
      nxt: (C, S_B) uint64 hashes of blocks b+1.

    Returns:
      theta: (C, S_B) uint64; theta[c, j] for window W = b_c * S_B + j.
    """
    C = cur.shape[0]
    init = jnp.full((C, s), SENTINEL, dtype=jnp.uint64)

    # suffix sketches of `cur`: scan offsets S_B-1 .. 0
    def suf_step(state, v):
        state = _insert_bottom_s(state, v)
        return state, state

    _, suf_rev = jax.lax.scan(suf_step, init, cur[:, ::-1].T)
    suf = suf_rev[::-1]  # suf[j]: (C, s) bottom-s of cur[:, j:]

    # prefix sketches of `nxt` + merge: at step j the carried state is the
    # sketch of nxt[:, :j] (insert AFTER emitting theta_j).
    def pre_step(state, xs):
        suf_j, v = xs
        theta_j = _merge_theta(suf_j, state, s)
        state = _insert_bottom_s(state, v)
        return state, theta_j

    _, theta = jax.lax.scan(pre_step, init, (suf, nxt.T))
    return theta.T  # (C, S_B)


def _default_chunk_bytes() -> int:
    """Pick the suffix-sketch materialization budget by platform."""
    import jax
    try:
        if jax.devices()[0].platform == "cpu":
            return 256 << 20
    except Exception:
        pass
    return 2 << 30  # TPU HBM: bigger chunks => fewer scan iterations


def window_thresholds(
    hashes: np.ndarray,
    valid: np.ndarray,
    s: int,
    window_span: int,
    block_chunk_bytes: int | None = None,
) -> np.ndarray:
    """theta(W) for every window of one contig.

    Args:
      hashes: (n_k,) uint64 canonical k-mer hashes (host array).
      valid: (n_k,) bool (invalid k-mers never enter a window).
      s: sketch size.
      window_span: S_B = windowSize - k + 1 (k-mer positions per window).

    Returns:
      (n_w,) uint64 with n_w = n_k - S_B + 1; SENTINEL where a window holds
      fewer than s distinct valid hashes.
    """
    if block_chunk_bytes is None:
        block_chunk_bytes = _default_chunk_bytes()
    n_k = int(hashes.shape[0])
    s_b = int(window_span)
    n_w = n_k - s_b + 1
    if n_w <= 0:
        return np.empty((0,), dtype=np.uint64)

    h = np.where(valid, hashes, SENTINEL).astype(np.uint64)
    n_blocks = -(-n_k // s_b)
    pad = n_blocks * s_b - n_k
    if pad:
        h = np.concatenate([h, np.full(pad, SENTINEL, np.uint64)])
    blocks = h.reshape(n_blocks, s_b)
    # block of SENTINELs serves as "next" for the last block
    blocks_next = np.concatenate(
        [blocks[1:], np.full((1, s_b), SENTINEL, np.uint64)], axis=0)

    chunk = max(1, block_chunk_bytes // (s_b * max(s, 1) * 8))
    out = np.empty((n_blocks, s_b), dtype=np.uint64)
    for c0 in range(0, n_blocks, chunk):
        c1 = min(c0 + chunk, n_blocks)
        cur = jnp.asarray(blocks[c0:c1])
        nxt = jnp.asarray(blocks_next[c0:c1])
        out[c0:c1] = np.asarray(_theta_chunk(cur, nxt, s, s_b))
    return out.reshape(-1)[:n_w]


def window_thresholds_bruteforce(
    hashes: np.ndarray, valid: np.ndarray, s: int, window_span: int
) -> np.ndarray:
    """O(n_w * S_B log) brute-force theta — test oracle only."""
    n_k = len(hashes)
    n_w = n_k - window_span + 1
    out = np.full(max(n_w, 0), SENTINEL, dtype=np.uint64)
    for w in range(max(n_w, 0)):
        vals = np.unique(hashes[w:w + window_span][valid[w:w + window_span]])
        if len(vals) >= s:
            out[w] = vals[s - 1]
    return out
