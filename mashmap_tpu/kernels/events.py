"""Device-side minmer membership-event extraction.

Replaces the host pass of ``index.builder.contig_minmer_intervals`` part
A (dense per-position work) with one jitted kernel per contig, so the
only device->host traffic of an index build is the SPARSE results:
membership intervals (~2s/span per position) and member-hash occurrence
rows — instead of the dense per-position ranks + strands (~5 bytes/bp,
the dominant fetch on tunneled TPU backends).

The kernel mirrors the reference's sequential sweep semantics
(commonFunc.hpp:376-520) exactly like the host pass does:

  * membership(h, W) = present(h, W) and h <= theta(W);
  * one k-mer enters / one leaves per window step => O(1) events per
    window: entering-hash gains, theta-rise gains, and their symmetric
    losses — all elementwise over the position/window axes;
  * begins and ends pair up per hash in (hash, W) order (j-th begin
    matches j-th end; the unmatched begin flushes at contig end).

TPU formulation notes: prev/next same-hash occurrences come from ONE
packed-key sort (rank << log2(Np) | position) with strand riding as a
sort payload; event compaction is a cumsum-scatter into fixed caps (one
XLA shape per padded contig size); pairing uses cap-sized searchsorted
lookups only. No gather/scatter ever touches more than the padded
position count.

Outputs pack into ONE i32 buffer per contig; the builder dispatches all
contigs asynchronously and fetches their concatenation once.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .winnow import RSENT

I32MAX = np.int32(np.iinfo(np.int32).max)
KEY_PAD = np.int64(0x7FFFFFFFFFFFFFFF)

# caps as a fraction of the padded position count. Real densities are
# ~2*s/span for intervals and similar for member occurrences, so the
# cap fraction DERIVES from (s, span) with ~2.5x headroom — a fixed
# shift underflows dense configs (--dense pushes s past 300, i.e.
# >12.5% density) straight into the slow host path. Overflow falls
# back to a bit-identical host-path rebuild of the group.
IV_CAP_SHIFT = 3     # legacy default (tests); prefer events_caps()
MEM_CAP_SHIFT = 3


def events_caps(Np: int, s: int, s_b: int):
    """(iv_cap, mem_cap) for a padded contig: pow2 fraction of Np with
    >= 2.5x headroom over the expected ~2*s/s_b event density."""
    import math
    shift = max(0, min(6, int(math.floor(
        math.log2(max(1.0, s_b / (5.0 * s)))))))
    cap = max(1 << 12, Np >> shift)
    # round up to a power of two: the builder's sized-fetch path slices
    # pow2-rounded live prefixes out of each cap-padded segment, and a
    # non-pow2 cap (padded streaming chunks: Np = CH_MAX + 2*span) would
    # let the rounded prefix exceed the cap and clamp silently,
    # corrupting the host's offset accounting for every later contig
    cap = 1 << (cap - 1).bit_length()
    return cap, cap


def _compact(mask, payloads, cap):
    """Order-preserving stream compaction into a fixed-size buffer.

    Returns (count, [payload buffers]); rows beyond cap are dropped
    (caller checks count > cap for overflow). Beyond the count, buffer
    contents are UNSPECIFIED (every consumer slices/masks to the
    count). Implementation is one multi-operand sort on the running
    index — wide scatters run ~3.3x slower than the equivalent sort on
    this TPU stack (41.9 vs 12.7 ms at a 4M-row mask, CLAUDE.md rule 3).
    """
    idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    cnt = jnp.where(mask.shape[0] > 0, idx[-1] + 1, 0)
    key = jnp.where(mask, idx, I32MAX)
    sorted_ = jax.lax.sort((key,) + tuple(payloads), dimension=-1,
                           num_keys=1)
    # the output buffer must be EXACTLY cap long even when the mask is
    # shorter (events_caps can exceed a small chunk's padded length):
    # callers pack segments at cap offsets, so a short buffer would
    # shift the whole packed layout
    outs = []
    for o in sorted_[1:]:
        o = o[:cap]
        if o.shape[0] < cap:
            o = jnp.concatenate(
                [o, jnp.zeros(cap - o.shape[0], o.dtype)])
        outs.append(o)
    return cnt, outs


@functools.partial(jax.jit, static_argnames=("s_b", "iv_cap", "mem_cap"))
def events_step(ranks, strand, theta, n_k, n_w, s_b: int,
                iv_cap: int, mem_cap: int):
    """Membership intervals + member occurrences for ONE contig.

    NOTE: the production build path uses ``events_chunk`` for every
    contig (it is ~1.5x faster and memory-bounded); this whole-contig
    kernel is kept as a second independent implementation for
    cross-validation in tests/test_events.py and tests/test_index.py.

    Args:
      ranks: (Np,) int32 dense hash ranks, RSENT at invalid/padded
        positions. Np must be a power of two >= n_k.
      strand: (Np,) int8 per-kmer strand votes (+1/-1).
      theta: (Np,) int32 per-window bottom-s thresholds (RSENT-padded
        beyond n_w).
      n_k / n_w: actual position / window counts (device scalars, so
        one XLA shape serves every contig of the same padded size).

    Returns one packed int32 buffer:
      [iv_rank(iv_cap), iv_wb(iv_cap), iv_we(iv_cap),   # we = -1 => flush
       mem_rank(mem_cap), mem_posstrand(mem_cap),       # pos<<1 | strand>0
       n_iv, n_mem, overflow]
    """
    Np = ranks.shape[0]
    shift = int(Np - 1).bit_length()
    # key layout: rank (<= shift bits) | pos (shift bits) | strand (1):
    # riding the strand in the key instead of a sort payload halves the
    # sort's live buffers — at 2^28-position contigs (chr1) the payload
    # operand alone is 2GB in + 2GB out at the peak
    assert 2 * shift + 1 <= 62, "contig too long for the packed keys"
    pos = jnp.arange(Np, dtype=jnp.int32)
    valid = (ranks != RSENT) & (pos < n_k)

    # --- prev/next same-hash occurrence via one packed-key sort ---
    key = jnp.where(valid,
                    (ranks.astype(jnp.int64) << (shift + 1))
                    | (pos.astype(jnp.int64) << 1)
                    | (strand > 0).astype(jnp.int64), KEY_PAD)
    skey = jax.lax.sort(key, dimension=-1)
    svalid = skey != KEY_PAD
    sstrand = jnp.where(svalid,
                        (skey & 1).astype(jnp.int32) * 2 - 1, 0)
    sp = jnp.where(svalid,
                   ((skey >> 1) & (Np - 1)).astype(jnp.int32), 0)
    sh = jnp.where(svalid, (skey >> (shift + 1)).astype(jnp.int32),
                   I32MAX)
    same_prev = jnp.concatenate(
        [jnp.zeros(1, bool), (sh[1:] == sh[:-1]) & svalid[1:]])
    same_next = jnp.concatenate(
        [(sh[1:] == sh[:-1]) & svalid[:-1], jnp.zeros(1, bool)])
    prev_s = jnp.where(same_prev,
                       jnp.concatenate([sp[:1] * 0, sp[:-1]]), -1)
    next_s = jnp.where(same_next,
                       jnp.concatenate([sp[1:], sp[:1] * 0]), I32MAX)
    # scatter back to position order (sp is a permutation of valid rows)
    tgt = jnp.where(svalid, sp, Np)
    prev_occ = jnp.full(Np + 1, -1, jnp.int32).at[tgt].set(prev_s)[:Np]
    next_occ = jnp.full(Np + 1, I32MAX, jnp.int32).at[tgt].set(
        next_s)[:Np]

    # --- membership-change masks (elementwise; builder.py part A) ---
    th0 = theta[0]
    # thetapad1[p] = theta[max(p - s_b + 1, 0)]
    thetapad1 = jnp.concatenate(
        [jnp.full(s_b - 1, 0, jnp.int32) + th0, theta])[:Np]
    # th_prevw[p] = theta[p - s_b] (only consumed where p >= s_b)
    th_prevw = jnp.concatenate(
        [jnp.zeros(s_b, jnp.int32), theta])[:Np]
    begW = jnp.maximum(pos - (s_b - 1), 0)
    # continuity exclusion: previous same-hash occurrence is exactly the
    # position leaving window begW and the hash was already a member
    stayed = (begW >= 1) & (prev_occ == begW - 1) & (ranks <= th_prevw)
    begin1 = valid & (prev_occ < begW) & (ranks <= thetapad1) & ~stayed
    # `lost` at position p (leaves window W = p+1)
    lost = valid & (pos + 1 < n_w) & (next_occ > pos + s_b)
    end1 = lost & (ranks <= theta)            # theta[W-1] == theta[p]

    # window-axis events (theta rise/fall), W in [1, n_w)
    W = pos
    th_W = theta
    th_Wm1 = jnp.concatenate([theta[:1], theta[:-1]])
    wmask = (W >= 1) & (W < n_w)
    rose = wmask & (th_W > th_Wm1)
    h_in_W = jnp.concatenate(                  # ranks[W + s_b - 1]
        [ranks[s_b - 1:], jnp.full(s_b - 1, RSENT, jnp.int32)])
    begin1_at = jnp.concatenate(
        [begin1[s_b - 1:], jnp.zeros(s_b - 1, bool)])
    begin2 = rose & (th_W != RSENT) & ~(begin1_at & (h_in_W == th_W))
    fell = wmask & (th_W < th_Wm1)
    h_out_W = jnp.concatenate(                 # ranks[W - 1]
        [jnp.full(1, RSENT, jnp.int32), ranks[:-1]])
    lost_at = jnp.concatenate([jnp.zeros(1, bool), lost[:-1]])
    end2 = fell & (th_Wm1 != RSENT) & ~(lost_at & (h_out_W == th_Wm1))

    # --- compact begins / ends, sort each by (hash, W) ---
    def compact_sorted(m1, h1, w1, m2, h2, w2):
        mask = jnp.concatenate([m1, m2])
        hh = jnp.concatenate([h1, h2])
        ww = jnp.concatenate([w1, w2])
        cnt, (ch, cw) = _compact(mask, (hh, ww), iv_cap)
        live = jnp.arange(iv_cap) < jnp.minimum(cnt, iv_cap)
        k = jnp.where(live, (ch.astype(jnp.int64) << 32)
                      | cw.astype(jnp.int64), KEY_PAD)
        k, ch, cw = jax.lax.sort((k, ch, cw), dimension=-1, num_keys=1)
        # dead rows (payload 0) sorted to the back would break the
        # ascending order searchsorted relies on — push them to +inf
        ch = jnp.where(live, ch, I32MAX)
        return cnt, ch, cw, live  # live refers to prefix (sorted order)

    n_beg, bh, bW, blive = compact_sorted(
        begin1, ranks, begW, begin2, th_W, W)
    n_end, eh, eW, _ = compact_sorted(
        end1, ranks, pos + 1, end2, th_Wm1, W)
    # after the sort, live rows occupy the prefix again
    blive = jnp.arange(iv_cap) < jnp.minimum(n_beg, iv_cap)

    # --- pair j-th begin with j-th end per hash ---
    gstart = blive & jnp.concatenate(
        [jnp.ones(1, bool), bh[1:] != bh[:-1]])
    gsidx = jax.lax.cummax(
        jnp.where(gstart, jnp.arange(iv_cap, dtype=jnp.int32), 0))
    r_b = jnp.arange(iv_cap, dtype=jnp.int32) - gsidx
    n_end_c = jnp.minimum(n_end, iv_cap)
    # method='sort': binary search would be iv_cap-wide gather rounds —
    # the pathologically slow op class on this TPU stack; one extra
    # multi-operand sort is far cheaper
    e_lo = jnp.searchsorted(
        eh, bh, side="left", method="sort").astype(jnp.int32)
    e_hi = jnp.searchsorted(
        eh, bh, side="right", method="sort").astype(jnp.int32)
    e_hi = jnp.minimum(e_hi, n_end_c)
    e_lo = jnp.minimum(e_lo, n_end_c)
    paired = blive & (r_b < (e_hi - e_lo))
    e_idx = jnp.clip(e_lo + r_b, 0, iv_cap - 1)
    iv_we = jnp.where(paired, eW[e_idx], -1)   # -1 => flush (host fills)

    # --- member occurrences: sorted rows whose hash has >= 1 begin ---
    uh = jnp.where(gstart, bh, I32MAX)
    o_lo = jnp.searchsorted(sh, uh, side="left", method="sort")
    o_hi = jnp.searchsorted(sh, uh, side="right", method="sort")
    dd = jnp.zeros(Np + 1, jnp.int32).at[o_lo].add(1).at[o_hi].add(-1)
    member = (jnp.cumsum(dd[:Np]) > 0) & svalid
    memps = (sp << 1) | (sstrand > 0).astype(jnp.int32)
    n_mem, (mem_rank, mem_ps) = _compact(member, (sh, memps), mem_cap)

    overflow = ((n_beg > iv_cap) | (n_end > iv_cap)
                | (n_mem > mem_cap)).astype(jnp.int32)
    return jnp.concatenate([
        jnp.where(blive, bh, 0), jnp.where(blive, bW, 0), iv_we,
        mem_rank, mem_ps,
        jnp.stack([jnp.minimum(n_beg, iv_cap + 1),
                   n_mem, overflow]).astype(jnp.int32)])


def unpack_events(buf: np.ndarray, iv_cap: int, mem_cap: int):
    """Host-side view splitter for events_step's packed buffer.

    Returns (iv_rank, iv_wb, iv_we(-1=flush), mem_pos, mem_rank,
    mem_strand(+-1), overflow).
    """
    n_iv, n_mem, ovf = (int(buf[-3]), int(buf[-2]), bool(buf[-1]))
    if ovf or n_iv > iv_cap or n_mem > mem_cap:
        return None
    iv = buf[:3 * iv_cap].reshape(3, iv_cap)[:, :n_iv]
    mem = buf[3 * iv_cap:3 * iv_cap + 2 * mem_cap].reshape(
        2, mem_cap)[:, :n_mem]
    return (iv[0], iv[1].astype(np.int64), iv[2].astype(np.int64),
            (mem[1] >> 1).astype(np.int64), mem[0],
            ((mem[1] & 1) * 2 - 1).astype(np.int64))


@functools.partial(jax.jit,
                   static_argnames=("s_b", "beg_cap", "mem_cap"))
def events_chunk(ranks, strand, theta, a0, base, n_local, n_k, n_w,
                 s_b: int, beg_cap: int, mem_cap: int):
    """Membership events for ONE position-chunk of a contig.

    The streaming form of ``events_step`` for chromosome-scale contigs:
    the kernel sees only positions [a0, a0+CHP) — the chunk core
    [a0+base, a0+base+n_local) plus an s_b halo on each side — so
    device memory is O(chunk) regardless of contig length. Every rule
    is exactly local given the halo:

      * prev/next same-hash occurrence tests only discriminate within
        +-s_b, so a local sort gives the same begin/end/lost decisions;
      * member occurrences use the EXACT characterization "rank <=
        sliding max of theta over the position's own windows" (a
        trailing-window block cummax) instead of events_step's global
        "every occurrence of a begun hash" superset — occurrences
        outside every member window contribute net-zero enter/leave
        votes to strand_classify, so downstream results are identical
        (and the fetch shrinks);
      * begins/ends are emitted UNPAIRED (hash, W); the host pairs the
        sparse events globally (builder._pair_begin_end).

    Returns one packed int32 buffer:
      [beg_h(beg_cap), beg_W(beg_cap), end_h(beg_cap), end_W(beg_cap),
       mem_rankstrand(mem_cap),        # rank<<1 | strand>0
       mem_pos(mem_cap),
       n_beg, n_end, n_mem, overflow]
    """
    CHP = ranks.shape[0]
    shift = int(CHP - 1).bit_length()
    pos_mask = (1 << shift) - 1   # CHP is NOT a power of two here —
    # masking with CHP-1 would corrupt extracted positions
    assert 2 * shift + 1 <= 62
    t = jnp.arange(CHP, dtype=jnp.int32)
    pos = a0 + t
    valid = (ranks != RSENT) & (pos < n_k)

    # --- prev/next same-hash occurrence via one LOCAL packed-key sort.
    # Invalid rows keep their t in the key under a rank of RSENT
    # (instead of collapsing to KEY_PAD): every row then retains its
    # identity, sp_t is a full permutation of [0, CHP), and the
    # scatter-back to position order becomes ONE permutation-keyed sort
    # — the two CHP-wide scatters it replaces cost ~2x more each
    # (12.2 ms vs 6.5 ms for the whole sort at CHP=2M, CLAUDE.md rule 3)
    key = ((jnp.where(valid, ranks, RSENT).astype(jnp.int64)
            << (shift + 1))
           | (t.astype(jnp.int64) << 1)
           | (strand > 0).astype(jnp.int64))
    skey = jax.lax.sort(key, dimension=-1)
    sh = (skey >> (shift + 1)).astype(jnp.int32)
    svalid = sh != RSENT
    sp_t = ((skey >> 1) & pos_mask).astype(jnp.int32)
    same_prev = jnp.concatenate(
        [jnp.zeros(1, bool), (sh[1:] == sh[:-1]) & svalid[1:]])
    same_next = jnp.concatenate(
        [(sh[1:] == sh[:-1]) & svalid[:-1], jnp.zeros(1, bool)])
    prev_t = jnp.where(same_prev,
                       jnp.concatenate([sp_t[:1] * 0, sp_t[:-1]]), -1)
    next_t = jnp.where(same_next,
                       jnp.concatenate([sp_t[1:], sp_t[:1] * 0]),
                       I32MAX)
    _, prev_t, next_t = jax.lax.sort(
        (sp_t, prev_t, next_t), dimension=-1, num_keys=1)
    # global coordinates; "none in the array" stays -1 / I32MAX, which
    # answers every +-s_b-window test identically to the true global
    # occurrence (it lies beyond the halo by construction)
    prev_occ = jnp.where(prev_t >= 0, a0 + prev_t, -1)
    next_occ = jnp.where(next_t != I32MAX, a0 + next_t, I32MAX)

    # --- membership-change masks (identical shifts to events_step) ---
    th0 = theta[0]
    thetapad1 = jnp.concatenate(
        [jnp.full(s_b - 1, 0, jnp.int32) + th0, theta])[:CHP]
    th_prevw = jnp.concatenate(
        [jnp.zeros(s_b, jnp.int32), theta])[:CHP]
    begW = jnp.maximum(pos - (s_b - 1), 0)
    stayed = (begW >= 1) & (prev_occ == begW - 1) & (ranks <= th_prevw)
    begin1 = valid & (prev_occ < begW) & (ranks <= thetapad1) & ~stayed
    lost = valid & (pos + 1 < n_w) & (next_occ > pos + s_b)
    end1 = lost & (ranks <= theta)

    W = pos
    th_W = theta
    th_Wm1 = jnp.concatenate([theta[:1], theta[:-1]])
    wmask = (W >= 1) & (W < n_w)
    rose = wmask & (th_W > th_Wm1)
    h_in_W = jnp.concatenate(
        [ranks[s_b - 1:], jnp.full(s_b - 1, RSENT, jnp.int32)])
    begin1_at = jnp.concatenate(
        [begin1[s_b - 1:], jnp.zeros(s_b - 1, bool)])
    begin2 = rose & (th_W != RSENT) & ~(begin1_at & (h_in_W == th_W))
    fell = wmask & (th_W < th_Wm1)
    h_out_W = jnp.concatenate(
        [jnp.full(1, RSENT, jnp.int32), ranks[:-1]])
    lost_at = jnp.concatenate([jnp.zeros(1, bool), lost[:-1]])
    end2 = fell & (th_Wm1 != RSENT) & ~(lost_at & (h_out_W == th_Wm1))

    # --- member occurrences: rank <= trailing sliding-max of theta ---
    # (block cummax decomposition; -1 where the window doesn't exist,
    #  RSENT where it holds < s distinct hashes => everything member)
    th_m = jnp.where((pos >= 0) & (pos < n_w), theta, jnp.int32(-1))
    m_len = -(-CHP // s_b) * s_b
    th_p = jnp.concatenate(
        [th_m, jnp.full(m_len - CHP, -1, jnp.int32)])
    blocks = th_p.reshape(-1, s_b)
    pre = jax.lax.cummax(blocks, axis=1).reshape(-1)[:CHP]
    suf = jax.lax.cummax(blocks[:, ::-1], axis=1)[:, ::-1].reshape(-1)
    suf_shift = jnp.concatenate(
        [jnp.full(s_b - 1, -1, jnp.int32), suf])[:CHP]
    smax = jnp.where(t >= s_b - 1, jnp.maximum(suf_shift, pre), pre)
    member = valid & (ranks <= smax)

    # --- compact (core positions / windows only) ---
    core = (t >= base) & (t < base + n_local)
    bmask = jnp.concatenate([begin1 & core, begin2 & core])
    bh_all = jnp.concatenate([ranks, th_W])
    bW_all = jnp.concatenate([begW, W])
    n_beg, (bh, bW) = _compact(bmask, (bh_all, bW_all), beg_cap)
    emask = jnp.concatenate([end1 & core, end2 & core])
    eh_all = jnp.concatenate([ranks, th_Wm1])
    eW_all = jnp.concatenate([pos + 1, W])
    n_end, (eh, eW) = _compact(emask, (eh_all, eW_all), beg_cap)
    mrk = (ranks << 1) | (strand > 0).astype(jnp.int32)
    n_mem, (m_rk, m_pos) = _compact(member & core, (mrk, pos), mem_cap)

    overflow = ((n_beg > beg_cap) | (n_end > beg_cap)
                | (n_mem > mem_cap)).astype(jnp.int32)
    return jnp.concatenate([
        bh, bW, eh, eW, m_rk, m_pos,
        jnp.stack([n_beg, n_end, n_mem, overflow]).astype(jnp.int32)])
