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
offsets carrying a (num_blocks, s) sorted state — all blocks of ALL
contigs advance in lockstep, so each scan step is one wide vector op.

Performance-critical representation choice: 64-bit hash values are
rank-reduced to dense int32 ranks on the host (one global np.unique)
before touching the device. All device comparisons are then native
int32 (XLA lowers u64 to slow 32-bit pair arithmetic on TPU), and theta
ranks are mapped back to u64 hashes at the end. Orderings are identical
by construction.

Membership *events* (the actual minmer intervals) are derived from theta
on the host with O(1) vectorized work per window — see index/builder.py.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)  # "+inf" hash / invalid marker
RSENT = np.int32(np.iinfo(np.int32).max)  # "+inf" rank


def _insert_bottom_s(state: jax.Array, v: jax.Array) -> jax.Array:
    """Insert v into each row's sorted distinct bottom-s set.

    state: (C, s) int32 ranks sorted ascending, RSENT-padded.
    v: (C,) int32 (RSENT = skip).
    """
    s = state.shape[-1]
    is_dup = jnp.any(state == v[:, None], axis=-1)
    skip = is_dup | (v == RSENT)
    pos = jnp.sum(state < v[:, None], axis=-1)  # insert position
    idx = jnp.arange(s, dtype=jnp.int32)[None, :]
    shifted = jnp.concatenate([state[:, :1], state[:, :-1]], axis=-1)
    cand = jnp.where(idx < pos[:, None], state,
                     jnp.where(idx == pos[:, None], v[:, None], shifted))
    return jnp.where(skip[:, None], state, cand)


def _merge_theta(a: jax.Array, b: jax.Array, s: int) -> jax.Array:
    """s-th smallest distinct of two sorted RSENT-padded (..., s) rank sets.

    Scatter/sort-free rank counting (scatters and sorts serialize on the
    VPU; this is pure elementwise + small reductions): for a candidate
    value x, its distinct-union rank is
        f(x) = #A<=x + #B<=x - #dup<=x,
    and theta is the smallest candidate with f(x) == s. The #<=
    counts come from an (..., s, s) comparison cube of int32 ranks — dense
    native-dtype VPU work with no gathers; XLA fuses the compare into the
    reduction, so the cube is never materialized.
    """
    valid_a = a != RSENT
    valid_b = b != RSENT
    # cmp[..., i, j] over candidate i of one set vs elements j of the other
    le_ba = (b[..., None, :] <= a[..., :, None]) & valid_b[..., None, :]
    eq_ba = (b[..., None, :] == a[..., :, None]) & valid_b[..., None, :]
    rB_a = jnp.sum(le_ba, axis=-1)                    # #B <= a_i
    dup_a = jnp.any(eq_ba, axis=-1)                   # a_i in B
    csum_dup_a = jnp.cumsum(dup_a.astype(jnp.int32), axis=-1)
    i = jnp.arange(1, s + 1, dtype=jnp.int32)
    f_a = i + rB_a - csum_dup_a                       # distinct rank of a_i

    le_ab = (a[..., None, :] <= b[..., :, None]) & valid_a[..., None, :]
    eq_ab = (a[..., None, :] == b[..., :, None]) & valid_a[..., None, :]
    rA_b = jnp.sum(le_ab, axis=-1)
    dup_b = jnp.any(eq_ab, axis=-1)
    csum_dup_b = jnp.cumsum(dup_b.astype(jnp.int32), axis=-1)
    f_b = i + rA_b - csum_dup_b

    th_a = jnp.min(jnp.where((f_a == s) & valid_a, a, RSENT), axis=-1)
    th_b = jnp.min(jnp.where((f_b == s) & valid_b, b, RSENT), axis=-1)
    return jnp.minimum(th_a, th_b)


# scan-body unroll factor. With the theta merge hoisted OUT of the scan
# (see _theta_chunk), scan steps are tiny (C, s) insert updates whose
# cost is per-step dispatch overhead, so unrolling several offsets per
# lax.scan step is a direct win.
try:
    _SCAN_UNROLL = max(1, int(os.environ.get(
        "MASHMAP_TPU_THETA_UNROLL", "4")))
except ValueError:
    raise ValueError(
        "MASHMAP_TPU_THETA_UNROLL must be a positive integer, got "
        f"{os.environ['MASHMAP_TPU_THETA_UNROLL']!r}") from None

# offsets merged per lax.map step in the batched theta merge: bounds the
# (MERGE_BLOCK * C, s, s) comparison-cube working set XLA tiles over.
_MERGE_BLOCK = 64


@functools.partial(jax.jit, static_argnames=("s", "s_b"))
def _theta_chunk(cur: jax.Array, nxt: jax.Array, s: int, s_b: int):
    """theta ranks for all windows starting inside a chunk of blocks.

    Args:
      cur: (C, S_B) int32 ranks of blocks b (RSENT where invalid).
      nxt: (C, S_B) int32 ranks of blocks b+1.

    Returns:
      theta: (C, S_B) int32; theta[c, j] for window W = b_c * S_B + j.

    Structure: the two lax.scans over the in-block offset carry ONLY the
    (C, s) bottom-s insert state (cheap, serial), materializing suffix
    and prefix sketch stacks; the O(s^2) theta merge — the expensive
    part — then runs once, fully parallel over ALL (offset, block) pairs
    via lax.map, where XLA tiles it at full VPU/HBM throughput instead
    of serializing it into the scan.
    """
    C = cur.shape[0]
    U = _SCAN_UNROLL
    s_b_p = -(-s_b // U) * U
    if s_b_p > s_b:
        pad = jnp.full((C, s_b_p - s_b), RSENT, jnp.int32)
        cur = jnp.concatenate([cur, pad], axis=1)
        nxt = jnp.concatenate([nxt, pad], axis=1)
    init = jnp.full((C, s), RSENT, dtype=jnp.int32)

    # suffix sketches of `cur`: suf[j] = bottom-s of cur[:, j:].
    # reverse=True makes the scan run j = s_b_p-1 .. 0 while stacking
    # outputs in FORWARD order — no input reversal and no flip copy of
    # the multi-GB sketch stack (layout copies were ~half the kernel's
    # runtime in the flipped formulation).
    cur_f = cur.T.reshape(s_b_p // U, U, C)

    def suf_step(state, vs):
        outs = [None] * U
        for u in range(U - 1, -1, -1):
            state = _insert_bottom_s(state, vs[u])
            outs[u] = state
        return state, jnp.stack(outs)

    _, suf = jax.lax.scan(suf_step, init, cur_f, reverse=True)

    # forward pass: the prefix sketch of `nxt` stays a scan CARRY and
    # merges against suf[j] in place — theta[j] = s-th distinct
    # smallest of suf[j] U pre[j]. Only ONE (S_B, C, s) stack ever
    # materializes (the prefix stack + flip copies OOMed human-
    # chromosome groups), and each step's U (C, s, s) rank-count merges
    # are wide enough to keep the VPU busy.
    nxt_u = nxt.T.reshape(s_b_p // U, U, C)

    def _merge_theta_sort(a, b):
        # s-th distinct smallest of two sorted RSENT-padded (C, s) sets.
        # Both operands are ALREADY sorted ascending, so a full
        # lax.sort of their concatenation wastes ~5x the comparisons: a
        # bitonic MERGE ([a, reversed b] is a bitonic sequence) needs
        # only log2(2P) butterfly stages of elementwise min/max —
        # measured 2.4x faster than the sort form on v5e at s=130.
        C2 = a.shape[0]
        P = 1 << (s - 1).bit_length()
        if P > s:
            pad = jnp.full((C2, P - s), RSENT, jnp.int32)
            a = jnp.concatenate([a, pad], axis=-1)
            b = jnp.concatenate([b, pad], axis=-1)
        m = jnp.concatenate([a, b[:, ::-1]], axis=-1)      # (C, 2P)
        n2 = 2 * P
        k2 = P
        while k2 >= 1:
            x = m.reshape(C2, n2 // (2 * k2), 2, k2)
            lo = jnp.minimum(x[:, :, 0], x[:, :, 1])
            hi = jnp.maximum(x[:, :, 0], x[:, :, 1])
            m = jnp.concatenate([lo[:, :, None], hi[:, :, None]],
                                axis=2).reshape(C2, n2)
            k2 //= 2
        prev = jnp.concatenate(
            [jnp.full_like(m[:, :1], -1), m[:, :-1]], axis=-1)
        newv = (m != prev) & (m != RSENT)
        cnt = jnp.cumsum(newv.astype(jnp.int32), axis=-1)
        hit = newv & (cnt == s)
        return jnp.min(jnp.where(hit, m, RSENT), axis=-1)

    def pre_step(state, xs):
        vs, suf_u = xs
        outs = [None] * U
        for u in range(U):
            outs[u] = _merge_theta_sort(suf_u[u], state)
            state = _insert_bottom_s(state, vs[u])
        return state, jnp.stack(outs)

    _, theta = jax.lax.scan(pre_step, init, (nxt_u, suf))
    return theta.reshape(s_b_p, C)[:s_b].T  # (C, S_B)


def _default_chunk_bytes() -> int:
    """Pick the sketch-stack materialization budget by platform.

    The scans are sequential in the window offset, so fewer/wider chunks
    amortize the 2*S_B serial steps over more block rows; the budget
    bounds the live (S_B, C, s) sketch stacks (suffix + prefix + one
    flip copy ~= 3 stacks) in HBM.
    """
    try:
        if jax.devices()[0].platform == "cpu":
            return 256 << 20
    except Exception:
        pass
    # TPU (16G HBM): bigger chunks => fewer serial scans, but the group
    # LUT + rank/strand views (+ the events kernel next) stay resident
    # during the scan at human-genome group sizes — leave them ~7GB
    return 9 << 30


@functools.partial(jax.jit, static_argnames=())
def _rank_reduce(hm: jax.Array):
    """Dense int32 ranks of a SENTINEL-masked u64 array (device).

    Returns (ranks, lut): ranks[i] = rank of hm[i] among distinct
    non-SENTINEL values (RSENT where hm is SENTINEL); lut[r] = the u64
    value of rank r (SENTINEL-padded).
    """
    n = hm.shape[0]
    # gather/scatter-free formulation: wide (>1e6) gathers and u64
    # scatters are the slow ops on TPU; multi-operand lax.sort is fast.
    iota = jnp.arange(n, dtype=jnp.int32)
    sv, perm = jax.lax.sort((hm, iota), dimension=-1, num_keys=1)
    prev = jnp.concatenate([sv[:1], sv[:-1]])
    newv = (sv != prev) | (iota == 0)
    newv &= sv != SENTINEL
    rank_sorted = jnp.cumsum(newv.astype(jnp.int32)) - 1
    rank_sorted = jnp.where(sv == SENTINEL, RSENT, rank_sorted)
    # invert the permutation by sorting (perm is a permutation, so the
    # sort is stable-equivalent): ranks[perm[i]] = rank_sorted[i]
    _, ranks = jax.lax.sort((perm, rank_sorted), dimension=-1,
                            num_keys=1)
    # unique values compact to their rank prefix: sort by rank slot
    # (non-new rows key to the spare slot n and carry SENTINEL)
    _, lut_full = jax.lax.sort(
        (jnp.where(newv, rank_sorted, n),
         jnp.where(newv, sv, SENTINEL)), dimension=-1, num_keys=1)
    return ranks, lut_full


# fixed theta-chunk row count => one XLA shape per (s, s_b)
THETA_CHUNK_ROWS_TPU = 2048
THETA_CHUNK_ROWS_CPU = 64


def _theta_chunk_rows(s: int, s_b: int) -> int:
    try:
        cpu = jax.devices()[0].platform == "cpu"
    except Exception:
        cpu = True
    rows = THETA_CHUNK_ROWS_CPU if cpu else THETA_CHUNK_ROWS_TPU
    budget = _default_chunk_bytes()
    per_row = s_b * max(s, 1) * 4 * 2   # one suffix stack + transients
    while rows > 8 and rows * per_row > budget:
        rows //= 2
    return rows


@functools.partial(jax.jit, static_argnames=("cap",))
def _rle_compact(x2d: jax.Array, cap: int):
    """Run-length compress a flattened int32 array on device.

    theta changes at only ~5% of windows, so fetching (position, value)
    change pairs moves ~10x fewer bytes over the (slow) device->host
    link than the dense array. Returns (buf, cnt): buf = positions
    [0:cap] then values [cap:2cap]; cnt = number of runs (> cap means
    overflow -> caller falls back to the dense fetch).
    """
    x = x2d.reshape(-1)
    n = x.shape[0]
    change = jnp.concatenate(
        [jnp.ones(1, bool), x[1:] != x[:-1]])
    idx = jnp.cumsum(change.astype(jnp.int32)) - 1
    cnt = idx[-1] + 1
    tgt = jnp.where(change, jnp.minimum(idx, cap - 1), cap)
    pos_buf = jnp.zeros(cap + 1, jnp.int32).at[tgt].set(
        jnp.arange(n, dtype=jnp.int32))
    val_buf = jnp.zeros(cap + 1, jnp.int32).at[tgt].set(x)
    return jnp.concatenate(
        [pos_buf[:cap], val_buf[:cap], cnt[None].astype(jnp.int32)])


def _fetch_theta_chunk(dev_chunk, rows: int, s_b: int) -> np.ndarray:
    """Fetch one (rows, s_b) device theta chunk, RLE-compressed.

    Fixed-size compressed buffer (count embedded at the end): dynamic
    slice fetches would trigger per-count XLA compiles.
    """
    cap = max(1024, rows * s_b // 8)
    flat = np.asarray(_rle_compact(dev_chunk, cap))
    cnt = int(flat[-1])
    if cnt > cap:
        return np.asarray(dev_chunk)          # dense fallback (rare)
    pos, val = flat[:cnt], flat[cap:cap + cnt]
    lengths = np.diff(np.concatenate([pos, [rows * s_b]]))
    return np.repeat(val, lengths).reshape(rows, s_b)


def _pallas_theta_usable() -> bool:
    """Probe (once per machine/config) whether the Pallas theta kernel
    compiles on this backend.

    Mosaic kernels need a working TPU compile service; some tunneled
    backends can't provide one (e.g. a misconfigured remote
    tpu_compile_helper). The probe result is cached on disk so later
    processes skip it.
    """
    import os
    mode = os.environ.get("MASHMAP_TPU_PALLAS", "auto")
    if mode == "0":
        return False
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.expanduser("~/.cache")), "mashmap_tpu")
    marker = os.path.join(cache_dir, "pallas_theta_probe_v1")
    if mode == "auto" and os.path.exists(marker):
        import time as _time
        with open(marker) as fh:
            cached = fh.read().strip()
        # a cached "ok" is trusted indefinitely; a cached failure
        # expires after a day so every round retries the real Mosaic
        # compile once (the backend may have been fixed)
        if cached == "ok":
            return True
        if _time.time() - os.path.getmtime(marker) < 86400:
            return False
    ok = False
    try:
        from .winnow_pallas import theta_chunk_pallas, C_T
        import numpy as _np
        cur = jnp.zeros((C_T, 8), jnp.int32)
        _np.asarray(theta_chunk_pallas(cur, cur, 4, 8))
        ok = True
    except Exception as e:  # noqa: BLE001 — any failure => fallback
        import logging
        logging.getLogger("mashmap_tpu.index").info(
            "pallas theta kernel unavailable (%s: %.300s); "
            "using XLA scan", type(e).__name__, str(e))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("ok" if ok else "no")
    except Exception:
        pass
    return ok


def theta_scan_ranks_jax(
    rank_list,
    s: int,
    window_span: int,
):
    """Device-resident theta scan: per-contig device rank arrays in,
    per-contig device theta arrays out (None where n_w <= 0).

    Same block decomposition as `theta_scan_ranks`, but nothing crosses
    the device->host link — the membership-event kernel
    (kernels/events.py) consumes theta in place.
    """
    import jax.numpy as jnp
    s_b = int(window_span)
    cur_rows, nxt_rows, spans = [], [], []
    row0 = 0
    for r in rank_list:
        n_k = int(r.shape[0])
        n_w = n_k - s_b + 1
        if n_w <= 0:
            spans.append(None)
            continue
        n_blocks = -(-n_k // s_b)
        pad = n_blocks * s_b - n_k
        if pad:
            r = jnp.concatenate(
                [r, jnp.full(pad, RSENT, jnp.int32)])
        blocks = r.reshape(n_blocks, s_b)
        nxt = jnp.concatenate(
            [blocks[1:], jnp.full((1, s_b), RSENT, jnp.int32)], axis=0)
        cur_rows.append(blocks)
        nxt_rows.append(nxt)
        spans.append((row0, n_blocks, n_w))
        row0 += n_blocks
    if not cur_rows:
        return [None for _ in spans]
    cur = jnp.concatenate(cur_rows, axis=0)
    nxt = jnp.concatenate(nxt_rows, axis=0)
    n_total = int(cur.shape[0])

    if _pallas_theta_usable():
        from .winnow_pallas import theta_chunk_pallas, C_T
        chunk_fn = functools.partial(theta_chunk_pallas, s=s, s_b=s_b)
        row_mult = C_T
    else:
        chunk_fn = functools.partial(_theta_chunk, s=s, s_b=s_b)
        row_mult = 8

    chunk = _theta_chunk_rows(s, s_b)
    # clamp to a {2^k, 1.5*2^k} grid just above the real block count:
    # plain pow2 rounding pads up to 2x (the merge is the build's
    # costliest kernel, so padding waste is real seconds), while the
    # grid keeps the distinct XLA shapes per (s, s_b) to a handful
    p2 = 1 << max(3, (n_total - 1).bit_length())
    if n_total <= (p2 * 3) // 4:
        p2 = (p2 * 3) // 4
    chunk = min(chunk, p2)
    chunk = max(row_mult, chunk - chunk % row_mult)
    # all slicing below runs through jit'd dynamic-slice helpers with
    # the offset as a DYNAMIC argument: baked-offset basic slices mint
    # a fresh XLA program per (genome, chunk) — multi-second compiles
    # on tunneled backends that never hit the persistent cache again
    rows_fn = _theta_rows_fn(n_total, chunk, s_b)
    pieces = []
    for c0 in range(0, n_total, chunk):
        n_live = min(chunk, n_total - c0)
        start_c = min(c0, max(0, n_total - chunk))
        cc, nn = rows_fn(cur, nxt, np.int32(start_c),
                         np.int32(c0 - start_c), np.int32(n_live))
        pieces.append(chunk_fn(cc, nn))
    theta_rank = (jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                  else pieces[0])
    n_rows = int(theta_rank.shape[0])    # chunk-quantized

    out = []
    for sp in spans:
        if sp is None:
            out.append(None)
            continue
        r0, n_blocks, n_w = sp
        out.append(_theta_out_fn(n_rows, n_blocks, s_b, n_w)(
            theta_rank, np.int32(r0)))
    return out


@functools.lru_cache(maxsize=None)
def _theta_rows_fn(n_total: int, chunk: int, s_b: int):
    """jit'd (chunk, s_b) row-window extractor with clamp+roll and
    RSENT masking of rows past n_live; offsets are dynamic args."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def f(cur, nxt, start_c, shift, n_live):
        mask = (jnp.arange(chunk, dtype=jnp.int32) < n_live)[:, None]

        def cut(x):
            if chunk > n_total:     # static: single short chunk
                x = lax.pad(x, jnp.int32(RSENT),
                            [(0, chunk - n_total, 0), (0, 0, 0)])
            sl = lax.dynamic_slice(
                x, (start_c, jnp.int32(0)), (chunk, s_b))
            sl = jnp.roll(sl, -shift, axis=0)
            return jnp.where(mask, sl, RSENT)

        return cut(cur), cut(nxt)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _theta_out_fn(n_rows: int, n_blocks: int, s_b: int, n_w: int):
    """jit'd per-contig theta extraction (dynamic row offset)."""
    import jax
    from jax import lax

    def f(theta_rank, r0):
        import jax.numpy as jnp
        blk = lax.dynamic_slice(
            theta_rank, (r0, jnp.int32(0)), (n_blocks, s_b))
        return blk.reshape(-1)[:n_w]

    return jax.jit(f)


def theta_scan_ranks(
    rank_list: Sequence[np.ndarray],
    s: int,
    window_span: int,
) -> List[np.ndarray]:
    """theta (as int32 ranks) for every window of every contig.

    Args:
      rank_list: per contig, (n_k,) int32 dense hash ranks with RSENT at
        invalid positions (see `_rank_reduce`).

    Returns:
      per contig, (n_w,) int32 theta ranks (RSENT = "window holds < s
      distinct valid hashes"); empty where n_w <= 0.

    Host<->device traffic: the block matrices are PUT (cheap, high
    bandwidth) and only the int32 theta ranks are fetched — on tunneled
    TPU backends device->host gets are the expensive direction.
    """
    s_b = int(window_span)
    cur_rows, nxt_rows, spans = [], [], []
    row0 = 0
    for r in rank_list:
        n_k = len(r)
        n_w = n_k - s_b + 1
        if n_w <= 0:
            spans.append(None)
            continue
        n_blocks = -(-n_k // s_b)
        pad = n_blocks * s_b - n_k
        if pad:
            r = np.concatenate([r, np.full(pad, RSENT, np.int32)])
        blocks = r.reshape(n_blocks, s_b)
        blocks_next = np.concatenate(
            [blocks[1:], np.full((1, s_b), RSENT, np.int32)], axis=0)
        cur_rows.append(blocks)
        nxt_rows.append(blocks_next)
        spans.append((row0, n_blocks, n_w))
        row0 += n_blocks

    out: List[np.ndarray] = []
    if not cur_rows:
        return [np.empty(0, np.int32) for _ in spans]
    cur = np.concatenate(cur_rows, axis=0)
    nxt = np.concatenate(nxt_rows, axis=0)
    n_total = cur.shape[0]

    use_pallas = _pallas_theta_usable()
    if use_pallas:
        from .winnow_pallas import theta_chunk_pallas, C_T
        chunk_fn = functools.partial(theta_chunk_pallas, s=s, s_b=s_b)
        row_mult = C_T
    else:
        chunk_fn = functools.partial(_theta_chunk, s=s, s_b=s_b)
        row_mult = 8

    chunk = _theta_chunk_rows(s, s_b)
    # don't pad a small genome up to the full chunk: clamp to the next
    # power of two above the actual block count (still few XLA shapes)
    p2 = 1 << max(3, (n_total - 1).bit_length())
    if n_total <= (p2 * 3) // 4:
        p2 = (p2 * 3) // 4
    chunk = min(chunk, p2)
    chunk = max(row_mult, chunk - chunk % row_mult)
    theta_rank = np.empty((n_total, s_b), dtype=np.int32)
    for c0 in range(0, n_total, chunk):
        c1 = min(c0 + chunk, n_total)
        cc, nn = cur[c0:c1], nxt[c0:c1]
        if c1 - c0 < chunk:  # pad to the fixed shape (one compile)
            padr = np.full((chunk - (c1 - c0), s_b), RSENT, np.int32)
            cc = np.concatenate([cc, padr])
            nn = np.concatenate([nn, padr])
        theta_rank[c0:c1] = _fetch_theta_chunk(
            chunk_fn(jnp.asarray(cc), jnp.asarray(nn)),
            chunk, s_b)[: c1 - c0]

    for sp in spans:
        if sp is None:
            out.append(np.empty(0, np.int32))
            continue
        r0, n_blocks, n_w = sp
        out.append(theta_rank[r0:r0 + n_blocks].reshape(-1)[:n_w].copy())
    return out


def rank_reduce_host(
    contigs: Sequence[Tuple[np.ndarray, np.ndarray]],
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Host (numpy) rank reduction over all contigs.

    Returns (per-contig int32 rank arrays with RSENT at invalid
    positions, sorted unique u64 value LUT). Used by the host build path
    and as the oracle for `_rank_reduce`.
    """
    masked = [np.where(v, h, SENTINEL) for h, v in contigs]
    if not masked:
        return [], np.empty(0, np.uint64)
    uniq = np.unique(np.concatenate(masked)) if masked else \
        np.empty(0, np.uint64)
    if len(uniq) and uniq[-1] == SENTINEL:
        uniq = uniq[:-1]
    assert len(uniq) < np.iinfo(np.int32).max
    ranks = []
    for hm in masked:
        sent = hm == SENTINEL
        r = np.searchsorted(uniq, hm)
        r[sent] = RSENT
        ranks.append(r.astype(np.int32))
    return ranks, uniq


def window_thresholds_batch(
    contigs: Sequence[Tuple[np.ndarray, np.ndarray]],
    s: int,
    window_span: int,
    block_chunk_bytes: int | None = None,
) -> List[np.ndarray]:
    """theta(W) as u64 hashes for every window of every contig.

    Compatibility wrapper over the rank pipeline (host rank reduction +
    device theta scan): returns SENTINEL where a window holds < s
    distinct valid hashes.
    """
    ranks, uniq = rank_reduce_host(contigs)
    thetas = theta_scan_ranks(ranks, s, window_span)
    lut = np.concatenate([uniq, [SENTINEL]])
    return [lut[np.minimum(t, len(uniq))] for t in thetas]


def window_thresholds(
    hashes: np.ndarray,
    valid: np.ndarray,
    s: int,
    window_span: int,
    block_chunk_bytes: int | None = None,
) -> np.ndarray:
    """theta(W) for every window of one contig (see batch variant)."""
    return window_thresholds_batch(
        [(hashes, valid)], s, window_span, block_chunk_bytes)[0]


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
