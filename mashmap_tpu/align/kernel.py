"""Batched banded unit-cost edit-distance DP (device kernel).

The alignment driver decomposes every mapping into small independent
pieces (inter-anchor gaps, free-start heads, free-end tails). Each piece
is a banded Needleman-Wunsch/Sellers DP over unit costs. This module
computes, for a batch of pieces at once, every DP row inside the band so
the host can trace back a path.

TPU formulation
---------------
The classic DP has a horizontal (within-row) dependency
``D[i][j] = min(..., D[i][j-1] + 1)`` that looks serial. With unit costs
it is a min-plus prefix scan:

    D[i][j] = min_{j' <= j} ( M[i][j'] + (j - j') )

where ``M[i][j] = min(diag, up)`` depends only on row ``i-1``. So each
row is: elementwise candidates from the previous row, then a cumulative
minimum of ``M - j`` (``jax.lax.cummin``), then ``+ j``. Rows advance
under ``lax.scan``; the batch axis vectorizes on the VPU. Everything is
static-shaped: pieces are bucketed by (padded query length P, band width
W) before reaching the kernel.

Band coordinates: cell (i, j) lives at band column ``c = j - i - lo``,
i.e. ``j = i + lo + c`` — the band slides along the main diagonal, with
per-piece offset ``lo`` (covering diagonals ``lo .. lo+W-1``).

Equivalent reference computation: edlib's banded Myers bit-vector DP
(src/common/edlib.hxx), which is word-serial per block and
shape-hostile for a vector unit; the scan/cummin form above is the
TPU-idiomatic equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.int32(1 << 20)
# row values are returned as uint16; anything >= CAP means "unreachable"
CAP = (1 << 16) - 1


@functools.partial(jax.jit, static_argnames=("p_len", "width"))
def banded_dp_rows(
    q: jax.Array,          # (B, P) uint8 query bytes, padded
    r: jax.Array,          # (B, R) uint8 target bytes, padded
    n: jax.Array,          # (B,) int32 true query lengths (<= P)
    m: jax.Array,          # (B,) int32 true target lengths (<= R)
    lo: jax.Array,         # (B,) int32 lowest band diagonal (j - i)
    free_start: jax.Array,  # (B,) bool: row 0 all-zero (free target prefix)
    *,
    p_len: int,
    width: int,
) -> jax.Array:
    """All DP rows for a batch of banded alignment pieces.

    Returns (B, P+1, W) uint16: rows[i, c] = D[i][j=i+lo+c], saturated at
    CAP; cells outside [0, m] or otherwise unreachable hold >= CAP.
    """
    B = q.shape[0]
    c_idx = jnp.arange(width, dtype=jnp.int32)          # (W,)

    # row 0: j = lo + c
    j0 = lo[:, None] + c_idx[None, :]                   # (B, W)
    valid0 = (j0 >= 0) & (j0 <= m[:, None])
    row0 = jnp.where(
        valid0,
        jnp.where(free_start[:, None], jnp.int32(0), j0),
        INF)

    rr = r.astype(jnp.int32)

    def step(prev, i):
        # prev: (B, W) int32 = D[i-1]; compute D[i]
        j = i + lo[:, None] + c_idx[None, :]            # (B, W)
        valid = (j >= 1) & (j <= m[:, None])            # diag needs j-1 >= 0
        # target byte at j-1 (gather along the length axis)
        rj = jnp.take_along_axis(
            rr, jnp.clip(j - 1, 0, rr.shape[1] - 1), axis=1)
        qi = q[:, i - 1].astype(jnp.int32)[:, None]     # (B, 1)
        sub = (qi != rj).astype(jnp.int32)
        diag = prev + sub                                # same band column
        up = jnp.concatenate(
            [prev[:, 1:], jnp.full((B, 1), INF)], axis=1) + 1
        M = jnp.minimum(diag, up)
        # j == 0 boundary: only reachable via up-moves; diag/left invalid.
        at_j0 = (j == 0)
        M = jnp.where(at_j0, up, M)
        M = jnp.where(valid | at_j0, M, INF)
        # left pass: D[c] = min_{c'<=c} M[c'] + (c - c')
        t = jax.lax.cummin(M - c_idx[None, :], axis=1)
        row = jnp.minimum(t + c_idx[None, :], INF)
        row = jnp.where((j >= 0) & (j <= m[:, None]), row, INF)
        return row, jnp.minimum(row, CAP).astype(jnp.uint16)

    rows_i = jnp.arange(1, p_len + 1, dtype=jnp.int32)
    _, rows = jax.lax.scan(step, row0, rows_i)
    rows = jnp.concatenate(
        [jnp.minimum(row0, CAP).astype(jnp.uint16)[None], rows], axis=0)
    return jnp.transpose(rows, (1, 0, 2))               # (B, P+1, W)


def banded_dp_rows_host(q, r, n, m, lo, free_start, *, p_len, width):
    """numpy twin of `banded_dp_rows` (bit-identical rows).

    The device kernel's output must cross back to the host for the
    traceback; on links where that transfer is the bottleneck (tunneled
    TPU: ~4-17 MB/s) this vectorized host sweep wins outright. The
    driver times both on the first batch and picks one.
    """
    B = q.shape[0]
    INF32 = np.int32(1 << 20)
    rows = np.empty((B, p_len + 1, width), np.uint16)
    c = np.arange(width, dtype=np.int32)
    j0 = lo[:, None] + c
    row = np.where((j0 >= 0) & (j0 <= m[:, None]),
                   np.where(free_start[:, None], 0, j0),
                   INF32).astype(np.int32)
    rows[:, 0] = np.minimum(row, CAP)
    bidx = np.arange(B)[:, None]
    rr = r.astype(np.int32)
    for i in range(1, p_len + 1):
        j = i + lo[:, None] + c
        rj = rr[bidx, np.clip(j - 1, 0, r.shape[1] - 1)]
        sub = (q[:, i - 1][:, None] != rj).astype(np.int32)
        diag = row + sub
        up = np.concatenate(
            [row[:, 1:], np.full((B, 1), INF32)], axis=1) + 1
        M = np.minimum(diag, up)
        at_j0 = j == 0
        M = np.where(at_j0, up, M)
        valid = (j >= 1) & (j <= m[:, None])
        M = np.where(valid | at_j0, M, INF32)
        t = np.minimum.accumulate(M - c, axis=1)
        row = np.minimum(t + c, INF32)
        row = np.where((j >= 0) & (j <= m[:, None]), row, INF32)
        rows[:, i] = np.minimum(row, CAP)
    return rows


# ---------------------------------------------------------------------------
# host-side reference DP + traceback
# ---------------------------------------------------------------------------


def full_dp_host(q: np.ndarray, r: np.ndarray,
                 free_start: bool) -> np.ndarray:
    """Unbanded host DP (numpy, O(nm)) — oracle for kernel tests and
    fallback for pieces whose band would exceed the largest bucket.

    Uses the same min-plus prefix-scan row update as the device kernel:
    D[i][j] = min_{j'<=j} (cand[j'] + j - j') with cand[0] = D[i][0].
    """
    n, m = len(q), len(r)
    jj = np.arange(m + 1, dtype=np.int32)
    D = np.zeros((n + 1, m + 1), dtype=np.int32)
    D[0, :] = 0 if free_start else jj
    for i in range(1, n + 1):
        prev = D[i - 1]
        sub = (q[i - 1] != r).astype(np.int32)
        cand = np.minimum(prev[:-1] + sub, prev[1:] + 1)   # cols 1..m
        ext = np.concatenate(([prev[0] + 1], cand))        # col 0 = up move
        D[i] = np.minimum.accumulate(ext - jj) + jj
    return D


def traceback_batch(rows, q, r, n, m, lo, free_start, end_j):
    """Vectorized traceback for a whole bucket batch at once.

    Walks every piece's band in lockstep (the per-piece python walk was
    the align stage's bottleneck at production scale). Preference order
    matches `traceback_band`: diagonal (match/sub), then up (query-only,
    'I'), then left (target-only, 'D').

    Returns (ops_list, start_j_array): ops in forward order per piece.
    """
    B, _, W = rows.shape
    maxlen = rows.shape[1] + W + 1
    bidx = np.arange(B)
    i = n.astype(np.int64).copy()
    j = end_j.astype(np.int64).copy()
    ops_rev = np.full((B, maxlen), 255, np.uint8)
    pos = np.zeros(B, np.int64)
    rr = r.astype(np.int16)
    qq = q.astype(np.int16)

    for _ in range(maxlen):
        active = i > 0
        if not active.any():
            break
        a = np.nonzero(active)[0]
        ia, ja = i[a], j[a]
        c = (ja - ia - lo[a]).astype(np.int64)
        v = rows[a, ia, c].astype(np.int32)
        jpos = np.maximum(ja - 1, 0)
        sub = (qq[a, ia - 1] != rr[a, jpos]).astype(np.int32)
        dv = rows[a, ia - 1, c].astype(np.int32)
        diag = (ja >= 1) & (dv + sub == v)
        cu = np.minimum(c + 1, W - 1)
        uv = rows[a, ia - 1, cu].astype(np.int32)
        up = ~diag & (c + 1 < W) & (uv + 1 == v)
        cl = np.maximum(c - 1, 0)
        lv = rows[a, ia, cl].astype(np.int32)
        left = ~diag & ~up & (c >= 1) & (ja >= 1) & (lv + 1 == v)
        if not (diag | up | left).all():
            bad = a[~(diag | up | left)]
            raise AssertionError(
                f"traceback dead end in pieces {bad[:4]} (band too "
                f"narrow?)")
        op = np.where(diag, np.where(sub == 1, OP_SUB, OP_MATCH),
                      np.where(up, OP_INS, OP_DEL)).astype(np.uint8)
        ops_rev[a, pos[a]] = op
        pos[a] += 1
        i[a] = ia - (diag | up)
        j[a] = ja - (diag | left)

    ops_list = []
    for b in range(B):
        o = ops_rev[b, :pos[b]][::-1]
        if not free_start[b] and j[b] > 0:
            o = np.concatenate(
                [np.full(j[b], OP_DEL, np.uint8), o])
            j[b] = 0
        ops_list.append(np.ascontiguousarray(o))
    return ops_list, j.astype(np.int64)


# op codes, matching edlib's move codes (src/common/edlib.h:69-72).
# Letter semantics verified EMPIRICALLY against the reference binary's
# output (the edlib.h comments invert them): in the emitted CIGAR,
# 'I' consumes the QUERY only and 'D' consumes the TARGET only — the
# standard SAM convention.
OP_MATCH = 0      # consumes query + target
OP_INS = 1        # 'I': consumes QUERY only
OP_DEL = 2        # 'D': consumes TARGET only
OP_SUB = 3        # mismatch, consumes both


def traceback_band(rows: np.ndarray, q: np.ndarray, r: np.ndarray,
                   n: int, m: int, lo: int, free_start: bool,
                   end_j: int) -> tuple[np.ndarray, int]:
    """Trace one piece's path from (n, end_j) back to row 0.

    Args:
      rows: (P+1, W) uint16 band rows from the kernel (piece's slice).
      end_j: target end column to start from (== m for global pieces; the
        argmin over row n for free-end pieces).

    Returns:
      (ops, start_j): ops is the edit path as op codes in forward order;
      start_j is the target column where the path enters row 0 (> 0 only
      meaningful for free_start pieces; global pieces reach j=0).
    """
    W = rows.shape[1]
    ops = []
    i, j = n, end_j
    while i > 0:
        c = j - i - lo
        assert 0 <= c < W, (i, j, lo, W)
        v = int(rows[i, c])
        # candidate predecessors (preference: diag-match, diag-sub, up, left)
        if j >= 1 and 0 <= c < W:
            dv = int(rows[i - 1, c]) if 0 <= c < W else CAP
            sub = int(q[i - 1] != r[j - 1])
            if dv + sub == v:
                ops.append(OP_MATCH if sub == 0 else OP_SUB)
                i, j = i - 1, j - 1
                continue
        uc = c + 1
        if uc < W and int(rows[i - 1, uc]) + 1 == v:
            ops.append(OP_INS)      # up move: query base, no target base
            i -= 1
            continue
        lc = c - 1
        if lc >= 0 and j >= 1 and int(rows[i, lc]) + 1 == v:
            ops.append(OP_DEL)      # left move: target base, no query base
            j -= 1
            continue
        raise AssertionError(
            f"traceback dead end at i={i} j={j} v={v} (band too narrow?)")
    if not free_start:
        # consume remaining target prefix
        ops.extend([OP_DEL] * j)
        start_j = 0
    else:
        start_j = j
    ops.reverse()
    return np.asarray(ops, dtype=np.uint8), start_j
