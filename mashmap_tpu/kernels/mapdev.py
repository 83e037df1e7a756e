"""Device-side mapping pipeline (the flagship jittable step).

Two jit-compiled kernels replace the reference's per-thread pointer-chasing
mapping loop (computeMap.hpp:755-1451):

``l1_step``: for a (B, L) batch of query fragments —
  sketch (bottom-s minhash) -> CSR lookup (searchsorted) -> postings
  gather -> interval-endpoint sort -> prefix-sum sweep -> candidate-run
  extraction + clustering. Everything is fixed-shape vector work; rows
  whose postings exceed the static caps are flagged for the (bit-identical)
  host fallback. All outputs pack into ONE i32 buffer (one fetch).

``l2_step``: for a (W,) batch of L1 candidates —
  gather the candidate's minmer-interval slice, merge insertions and
  expiries into one event stream (single multi-operand sort), recover
  the SlideMapper state at every snapshot via signed one-hot cumsums
  (see map/l2.py for the derivation), and extract the optimal-plateau
  runs on device. Zero wide gathers — they are pathologically slow on
  TPU. Returns a tiny packed run buffer.

ANIDiff pruning, run merging, chaining and filtering stay on the host:
they touch only a few hundred rows per query.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .sketch import sketch_fragments, UMAX

NEG = np.int64(-1)
KEY_PAD = np.int64(0x7FFFFFFFFFFFFFFF)

# Above this table size, searchsorted(method='sort') — which re-sorts
# table+queries on every call — loses to a bounded binary search: the
# sort pass scales with the TABLE (a 144M-hash human index would be
# re-sorted EVERY batch) while the query side stays a few thousand
# lanes wide, below the wide-gather pathology threshold (CLAUDE.md
# rule 3 was measured on >~1e6-wide gathers). Tunable for on-chip A/B.
_SORT_LOOKUP_MAX = int(__import__("os").environ.get(
    "MASHMAP_TPU_SORT_LOOKUP_MAX", 1 << 23))


# two-level refine step for large tables: the coarse stage buckets each
# query to a _COARSE_STEP-wide range via ONE method='sort' searchsorted
# on the (U/_COARSE_STEP)-entry sampled table, so the per-round
# narrow-gather binary search only runs log2(_COARSE_STEP) rounds
# instead of log2(U) (25+ at human scale)
_COARSE_STEP = 4096


def _bounded_binsearch(value_at, U, q, lo, hi, rounds):
    """side='left' binary search with per-query [lo, hi) start bounds;
    value_at(idx) reads the (virtual) table."""
    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        v = value_at(jnp.minimum(mid, U - 1))
        go = (v < q) & (lo < hi)
        return (jnp.where(go, mid + 1, lo),
                jnp.where(lo < hi, jnp.where(go, hi, mid), hi))

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    return lo


def _searchsorted_big(value_at, U, q):
    """Two-level side='left' search over a large sorted virtual table.

    Correctness: with coarse[j] = table[j*S] and b = the first j with
    coarse[j] >= q (side='left' on the sampled table), the answer i*
    satisfies (b-1)*S < i* <= b*S, so [max(b-1,0)*S, min(b*S, U))
    brackets it and log2(S)+1 rounds of the standard body converge.
    """
    S = _COARSE_STEP
    n_coarse = -(-U // S)
    coarse = value_at(jnp.minimum(
        jnp.arange(n_coarse, dtype=jnp.int32) * S, U - 1))
    b = jnp.searchsorted(coarse, q, method="sort").astype(jnp.int32)
    lo = jnp.maximum(b - 1, 0) * S
    hi = jnp.minimum(b.astype(jnp.int64) * S, U).astype(jnp.int32)
    return _bounded_binsearch(value_at, U, q, lo, hi,
                              S.bit_length() + 1)


def searchsorted_auto(table, q):
    """side='left' searchsorted choosing the lowering by table size.

    Small tables: jnp's method='sort' (one multi-operand sort; measured
    2-12x over binary search at bench scale on this backend). Large
    tables: coarse bucket via a sampled sub-table, then a bounded
    binary search — log2(_COARSE_STEP)+1 rounds of narrow gathers
    instead of log2(U). Bit-identical results either way.
    """
    U = table.shape[0]
    if U <= _SORT_LOOKUP_MAX:
        return jnp.searchsorted(table, q, method="sort")
    return _searchsorted_big(lambda idx: table[idx], U, q)


class L1Config(NamedTuple):
    k: int
    s: int                 # param sketch size
    seg_length: int
    p_cap: int = 512       # max gathered intervals per fragment
    c_cap: int = 16        # max candidate regions per fragment
    t_cap: int = 512       # max L2 entries per candidate
    table_scale: float = 1.0
    n_groups: int = 1      # reference prefix groups (skip_prefix)


def sweep_and_candidates(g_seq, g_wp, g_we, valid_j, s_q, min_hits,
                         ref_group, cutoff_table, cfg: L1Config):
    """Interval-endpoint sweep + candidate clustering over gathered
    postings (computeL1CandidateRegions, computeMap.hpp:915-1116).

    Shared by the replicated-index l1_step and the hash-range-sharded
    lookup path (parallel/sharded_index.py).

    Args:
      g_seq/g_wp/g_we: (B, P) gathered interval points (zero-filled
        where ~valid_j).
      s_q: (B,) post-filter sketch sizes; min_hits: (B,) int32.

    Returns (c_seq, c_first, c_last, c_inter, n_cand, overflow_c).
    """
    B, P = g_seq.shape
    # key = seqid << 33 | pos << 1 | side  (CLOSE=0 sorts before OPEN=1)
    k_open = ((g_seq.astype(jnp.int64) << 33)
              | (g_wp.astype(jnp.int64) << 1) | 1)
    k_close = ((g_seq.astype(jnp.int64) << 33)
               | (g_we.astype(jnp.int64) << 1))
    keys = jnp.concatenate([
        jnp.where(valid_j, k_open, KEY_PAD),
        jnp.where(valid_j, k_close, KEY_PAD)], axis=1)    # (B, 2P)
    keys = jnp.sort(keys, axis=1)
    ev_valid = keys != KEY_PAD
    side = jnp.where((keys & 1) == 1, 1, -1)
    overlap = jnp.cumsum(jnp.where(ev_valid, side, 0), axis=1)
    ev_pos = ((keys >> 1) & ((1 << 32) - 1)).astype(jnp.int32)
    ev_seq = (keys >> 33).astype(jnp.int32)

    grp = keys >> 1   # (seqid, pos)
    nxt = jnp.concatenate([grp[:, 1:], jnp.full((B, 1), KEY_PAD)], axis=1)
    last_of_pos = ev_valid & (grp != nxt)

    # stage-1 gate + hypergeometric cutoff, PER reference prefix group
    # (computeL1CandidateRegions runs per group, computeMap.hpp:1146-1165)
    NG = cfg.n_groups
    ev_grp = ref_group[jnp.clip(ev_seq, 0, ref_group.shape[0] - 1)]

    def grp_max(grps, mask, ov):
        return jnp.zeros((NG + 1,), ov.dtype).at[
            jnp.where(mask, grps, NG)].max(ov)[:NG]

    best_g = jax.vmap(grp_max)(ev_grp, last_of_pos,
                               overlap.astype(jnp.int32))   # (B, NG)
    best_g = jnp.minimum(best_g, s_q[:, None])
    ci = (best_g.astype(jnp.float64)
          / max(1.0, cfg.table_scale)).astype(jnp.int32)
    ci = jnp.clip(ci, 0, cutoff_table.shape[0] - 1)
    min_hits2_g = jnp.maximum(cutoff_table[ci], min_hits[:, None])
    has_any_g = best_g >= min_hits[:, None]

    # Dense per-(seq,pos) group arrays via ONE multi-operand sort
    # (compaction of the group-last rows). grank is strictly increasing
    # on last_of_pos columns, so sorting by (grank or G) moves the group
    # rows to the first n_grp columns in order. Row scatters here cost
    # ~20ms each at (1024, 2048) on this backend; sorts and cumsums are
    # ~10x cheaper, so every segment reduction below is expressed as
    # packed-key cummax + one compaction sort (measured 439ms -> ~210ms
    # of l1_step was these scatters).
    G = keys.shape[1]
    grank = jnp.cumsum(last_of_pos.astype(jnp.int32), axis=1) - 1
    gkey = jnp.where(last_of_pos, grank, G)
    zero = jnp.int32(0)
    _, gp, gs, go = jax.lax.sort(
        (gkey,
         jnp.where(last_of_pos, ev_pos, zero),
         jnp.where(last_of_pos, ev_seq, zero),
         jnp.where(last_of_pos, overlap.astype(jnp.int32), zero)),
        dimension=-1, num_keys=1)

    n_grp = jnp.sum(last_of_pos, axis=1)
    gi = jnp.arange(G)[None, :]
    g_valid = gi < n_grp[:, None]

    gg = ref_group[jnp.clip(gs, 0, ref_group.shape[0] - 1)]  # (B, G)
    mh2 = jnp.take_along_axis(min_hits2_g, gg, axis=1)
    ha = jnp.take_along_axis(has_any_g, gg, axis=1)
    m = g_valid & (go >= mh2) & ha
    prev_m = jnp.concatenate([jnp.zeros((B, 1), bool), m[:, :-1]], axis=1)
    prev_s = jnp.concatenate([jnp.full((B, 1), -1, gs.dtype),
                              gs[:, :-1]], axis=1)
    run_start = m & (~prev_m | (gs != prev_s))
    rid = jnp.cumsum(run_start.astype(jnp.int32), axis=1) - 1

    # Segment reductions without scatters. Within a run (contiguous
    # m-columns, one seq), gp ascends (groups are (seq,pos)-sorted), so
    # r_first = gp at the run's first column and r_last = gp at its
    # last. Packed (rid << 32 | value) cummaxes latch each run's
    # running values through masked gaps; reading the packed array at
    # column j-1 of a run start yields the PREVIOUS run's final values
    # (the clustering rule's pr_last / pr_seq).
    M32 = jnp.int64((1 << 32) - 1)
    neg1 = jnp.int64(-1)

    def latch(vals, mask):
        packed = jnp.where(mask, (rid.astype(jnp.int64) << 32)
                           | vals.astype(jnp.int64), neg1)
        return jax.lax.cummax(packed, axis=1)

    run_gp = latch(gp, m)          # run's max-so-far gp (== current gp)
    run_gs = latch(gs, m)          # run's seq
    prev_packed_gp = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int64), run_gp[:, :-1]], axis=1)
    prev_packed_gs = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int64), run_gs[:, :-1]], axis=1)
    has_prev = prev_packed_gp >= 0
    pr_last = jnp.where(has_prev,
                        (prev_packed_gp & M32).astype(jnp.int32),
                        jnp.int32(-(10 ** 9)))
    pr_seq = jnp.where(has_prev,
                       (prev_packed_gs & M32).astype(jnp.int32),
                       jnp.int32(-1))

    # cluster start decision at each run start (pairwise rule: the
    # dense-run formulation compares run r against run r-1)
    cl_new = run_start & ((gs != pr_seq)
                          | (gp > pr_last + cfg.seg_length))
    cid = jnp.cumsum(cl_new.astype(jnp.int32), axis=1) - 1   # (B, G)

    # cluster reductions: c_first = gp latched at the cluster's first
    # column; c_last = gp at the cluster's last m-column (ascending);
    # c_inter = max go over the cluster; c_seq = gs (const per cluster)
    def clatch(vals, mask):
        packed = jnp.where(mask, (cid.astype(jnp.int64) << 32)
                           | vals.astype(jnp.int64), neg1)
        return jax.lax.cummax(packed, axis=1)

    cl_first = clatch(gp, cl_new)          # latched once per cluster
    cl_go = clatch(go, m)

    # cluster-last column: the next m-column has a larger cid (cid is
    # nondecreasing over m-columns); reverse cummin finds the next
    # m-column's cid
    BIGI = jnp.int32(2**31 - 1)
    arr = jnp.where(m, cid, BIGI)
    nxt_cid = jnp.concatenate(
        [jax.lax.cummin(arr[:, ::-1], axis=1)[:, ::-1][:, 1:],
         jnp.full((B, 1), BIGI)], axis=1)
    cl_last = m & (nxt_cid != cid)

    C = cfg.c_cap
    # compact the <= n_cand cluster rows to the first columns with one
    # sort, then keep C. Pad payloads reproduce the scatter fills.
    ckey = jnp.where(cl_last, cid, G)
    _, c_first, c_last, c_inter, c_seq = jax.lax.sort(
        (ckey,
         jnp.where(cl_last, (cl_first & M32).astype(jnp.int32), BIGI),
         jnp.where(cl_last, gp, jnp.int32(-1)),
         jnp.where(cl_last, (cl_go & M32).astype(jnp.int32), zero),
         jnp.where(cl_last, gs, zero)),
        dimension=-1, num_keys=1)
    c_first, c_last = c_first[:, :C], c_last[:, :C]
    c_inter, c_seq = c_inter[:, :C], c_seq[:, :C]

    n_cand = jnp.max(jnp.where(m, cid, -1), axis=1) + 1
    overflow_c = n_cand > C
    n_cand = jnp.minimum(n_cand, C)

    return c_seq, c_first, c_last, c_inter, n_cand, overflow_c


@functools.partial(jax.jit, static_argnames=("cfg",))
def l1_step(frags, uniq_hashes, post_offsets, post_seqid, post_wpos,
            post_wend, is_frequent, min_hits_table, cutoff_table,
            allowed, ref_group, mi_seqid_t, mi_wpos_t, cfg: L1Config):
    """Fragment batch -> sketches + L1 candidate regions.

    Args:
      frags: (B, L) uint8 sanitized fragment bytes ('N'-padded).
      uniq_hashes/(post_*)/is_frequent: device index (CSR postings).
      min_hits_table: (s+1,) int32 — estimateMinimumHitsRelaxed per s_q.
      cutoff_table: (ss+1,) int32 hypergeometric cutoffs (or all-ones).
      allowed: (B, n_contigs) bool — per-fragment admissible reference
        sequences (skip_self / skip_prefix / lower_triangular masks,
        computeMap.hpp:887-894).
      mi_seqid_t/mi_wpos_t: the interval table's seqid/wpos columns
        (same device arrays l2_step uses) — the l1->l2 slice bounds
        run here on SYNTHESIZED (seqid << 32 | wpos) keys, so neither
        host nor HBM ever holds a materialized key table.
      cfg: static shape configuration.

    Returns dict of per-fragment sketches, candidates, and overflow flags.
    """
    B = frags.shape[0]
    s = cfg.s
    U = uniq_hashes.shape[0]
    P = cfg.p_cap

    q_hash, q_strand, q_cnt, q_cx = sketch_fragments(frags, cfg.k, s)

    # --- frequent-seed filter + compaction (order-preserving) ---
    pos0 = searchsorted_auto(uniq_hashes, q_hash)         # (B, s)
    posc = jnp.minimum(pos0, max(U - 1, 0))
    found = (q_hash != UMAX)
    if U > 0:
        found &= uniq_hashes[posc] == q_hash
        freq = found & is_frequent[posc]
    else:
        found &= False
        freq = jnp.zeros_like(found)
    keep = (q_hash != UMAX) & ~freq
    order = jnp.argsort(~keep, axis=1, stable=True)
    # RANK-CODE the sketch for l2: code = (insertion_pos << 1) | found.
    # Order-isomorphic to the u64 hashes against every interval-row
    # code (rank << 1) | 1 — present hashes get identical odd codes,
    # missing hashes land strictly between their sorted neighbors — so
    # every downstream <, ==, searchsorted outcome is bit-equivalent
    # while u64 (EMULATED as 32-bit pairs on TPU) leaves the hot path.
    # Pad/dropped lanes get I32MAX, which is > every real code (ranks
    # are < 2^30) and matches nothing, like UMAX did.
    q_code = (pos0.astype(jnp.int32) << 1) | found.astype(jnp.int32)
    q_code_c = jnp.take_along_axis(
        jnp.where(keep, q_code, jnp.int32(2**31 - 1)), order, axis=1)
    q_strand_c = jnp.take_along_axis(
        jnp.where(keep, q_strand, 0), order, axis=1)
    s_q = jnp.sum(keep, axis=1).astype(jnp.int32)         # (B,)
    min_hits = min_hits_table[s_q]

    # --- postings ranges (only kept+found sketch hashes) ---
    use = keep & found
    start = jnp.where(use, post_offsets[posc], 0)
    cnt = jnp.where(use, post_offsets[jnp.minimum(posc + 1, U)] - start, 0)
    cum = jnp.cumsum(cnt, axis=1)
    base = cum - cnt
    total = cum[:, -1]
    overflow_l1 = total > P

    # gather up to P intervals per row. slot[j] = which sketch hash owns
    # output position j = searchsorted(cum, j, 'right'); computed as a
    # small scatter-max of range starts + a cummax fill (binary-search
    # gathers are slow on TPU).
    j = jnp.arange(P, dtype=jnp.int32)[None, :]           # (1, P)

    def slot_row(base_r, cnt_r):
        z = jnp.full((P + 1,), -1, jnp.int32).at[
            jnp.minimum(jnp.where(cnt_r > 0, base_r, P), P)].max(
            jnp.arange(s, dtype=jnp.int32))
        return jax.lax.cummax(z[:P])

    slot = jax.vmap(slot_row)(base, cnt)
    slot = jnp.clip(slot, 0, s - 1)
    src = (jnp.take_along_axis(start, slot, axis=1)
           + (j - jnp.take_along_axis(base, slot, axis=1)))
    valid_j = j < jnp.minimum(total, P)[:, None]
    srcc = jnp.clip(src, 0, max(post_seqid.shape[0] - 1, 0))
    g_seq = jnp.where(valid_j, post_seqid[srcc], 0)
    g_wp = jnp.where(valid_j, post_wpos[srcc], 0)
    g_we = jnp.where(valid_j, post_wend[srcc], 0)
    # admissibility mask
    adm = jnp.take_along_axis(allowed, g_seq, axis=1)
    valid_j = valid_j & adm

    (c_seq, c_first, c_last, c_inter, n_cand,
     overflow_c) = sweep_and_candidates(
        g_seq, g_wp, g_we, valid_j, s_q, min_hits, ref_group,
        cutoff_table, cfg)

    c_lo, c_mid, c_hi = l2_slice_bounds(
        mi_seqid_t, mi_wpos_t, c_seq, c_first, c_last, cfg.seg_length)

    # pack the small per-fragment outputs into ONE (B, 4+7C) i32
    # buffer: on tunneled TPU backends every device->host array fetch
    # pays ~300ms of latency, so one fetch per batch beats one per
    # output. The compacted sketches (the bulk of the bytes) are
    # returned as SEPARATE device arrays that never cross to the host:
    # l2_step gathers its rows device-side by fragment index, and the
    # rare host-fallback fragments fetch just their rows on demand.
    meta = jnp.concatenate([
        s_q[:, None], n_cand[:, None],
        (overflow_l1 | overflow_c).astype(jnp.int32)[:, None],
        jax.lax.bitcast_convert_type(
            q_cx.astype(jnp.float32), jnp.int32)[:, None],
        c_seq, c_first, c_last, c_inter, c_lo, c_mid, c_hi], axis=1)
    return meta, q_code_c, q_strand_c.astype(jnp.int8)


def l2_slice_bounds(mi_seqid, mi_wpos, c_seq, c_first, c_last,
                    seg_length: int):
    """Interval-table slice bounds per L1 candidate (device searchsorted).

    Replaces the host's per-candidate np.searchsorted over the packed
    (seqid << 32 | wpos) key array (computeL2MappedRegions's
    minmerIndex range lookup, computeMap.hpp:1283-1294). The packed key
    is SYNTHESIZED from the (already-resident) seqid/wpos columns at
    probe time — no materialized (M,) int64 key table (2.1 GB of HBM at
    human scale). Requires table pads with seqid = 2^31-1 so pad keys
    sort after every real key.
    """
    seq64 = c_seq.astype(jnp.int64) << 32
    lo_k = seq64 | jnp.maximum(
        0, c_first.astype(jnp.int64) - seg_length - 1)
    mid_k = seq64 | jnp.maximum(0, c_first).astype(jnp.int64)
    hi_k = seq64 | (c_last.astype(jnp.int64) + 1)
    M = mi_seqid.shape[0]

    def key_at(idx):
        return ((mi_seqid[idx].astype(jnp.int64) << 32)
                | mi_wpos[idx].astype(jnp.int64))

    if M <= _SORT_LOOKUP_MAX:
        mi_key = key_at(jnp.arange(M, dtype=jnp.int32)) if M else \
            jnp.zeros((0,), jnp.int64)
        # ONE searchsorted for all three bound sets: method='sort'
        # re-sorts the whole table per call, so batching the queries
        # cuts two table sorts (the table dwarfs the queries)
        allq = jnp.stack([lo_k, mid_k, hi_k])
        c = jnp.searchsorted(mi_key, allq, method="sort").astype(
            jnp.int32)
        return c[0], c[1], c[2]

    # one batched two-level search for all three bound sets (the coarse
    # stage then samples the synthesized key table once, not thrice)
    allq = jnp.stack([lo_k, mid_k, hi_k])
    c = _searchsorted_big(key_at, M, allq).astype(jnp.int32)
    return c[0], c[1], c[2]


def unpack_l1_meta(meta: np.ndarray, c_cap: int):
    """Host-side view splitter for l1_step's packed output buffer
    (sketches live in l1_step's separate device outputs)."""
    C = c_cap
    return {
        "s_q": meta[:, 0],
        "n_cand": meta[:, 1],
        "overflow": meta[:, 2] != 0,
        "complexity": np.ascontiguousarray(
            meta[:, 3:4]).view(np.float32)[:, 0],
        "cand_seq": meta[:, 4:4 + C],
        "cand_start": meta[:, 4 + C:4 + 2 * C],
        "cand_end": meta[:, 4 + 2 * C:4 + 3 * C],
        "cand_inter": meta[:, 4 + 3 * C:4 + 4 * C],
        "cand_lo": meta[:, 4 + 4 * C:4 + 5 * C],
        "cand_mid": meta[:, 4 + 5 * C:4 + 6 * C],
        "cand_hi": meta[:, 4 + 6 * C:4 + 7 * C],
    }


def _prefix_matmul_e(d):
    """Inclusive prefix sum over the last (event) axis of a bf16 delta
    cube via blocked lower-triangular MXU matmuls; int16 result.

    Exact: deltas are {-1, 0, +1} (bf16-representable), the MXU
    accumulates in f32, and every prefix value is an integer bounded by
    the entry cap T <= 8192 < 2^24. One MXU pass per 512-event block
    plus a tiny inter-block carry replaces XLA's log2(E) shifted-add
    lowering of cumsum, which moved ~100x the necessary HBM bytes
    (measured: the three (W,2T,s) cube cumsums at W=512 T=1024 s=130
    ran 34 ms; this form runs the whole count/rank pipeline in ~14 ms).
    """
    Wd, Sd, Ed = d.shape
    C = 512 if Ed % 512 == 0 else Ed
    nb = Ed // C
    lt = (jnp.arange(C)[:, None] <= jnp.arange(C)[None, :]).astype(
        jnp.bfloat16)
    db = d.reshape(Wd, Sd, nb, C)
    intra = jax.lax.dot_general(
        db, lt, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int16)
    tot = intra[..., -1]                                  # (W, s, nb)
    carry = jnp.cumsum(tot, axis=-1, dtype=jnp.int16) - tot
    return (intra + carry[..., None]).reshape(Wd, Sd, Ed)


@functools.partial(jax.jit, static_argnames=("t_cap", "s"))
def l2_step(w_lo, w_mid, w_hi, w_seq, q_code, q_strand, s_q,
            mi_rank, mi_wpos, mi_wend, mi_strand, mi_seqid,
            t_cap: int, s: int):
    """Optimal-plateau runs for a batch of L1 candidates.

    Args:
      w_lo/w_mid/w_hi: (W,) int32 interval-table slice bounds per work item
        (precomputed searchsorted on the host or via device searchsorted).
      w_seq: (W,) candidate reference sequence ids.
      q_code/q_strand: (W, s) the owning fragment's compacted sketch as
        int32 rank codes from l1_step ((pos << 1) | found; I32MAX pad) —
        order-isomorphic to the u64 hashes, half the emulated-u64 cost.
      mi_*: the global interval table (device-resident); mi_rank int32.

    Returns a packed (W, 3 + 3*L2_RUN_CAP) i32 buffer (see
    unpack_l2_runs); the <= L-run merge happens on the host
    (map/l2.py loci_from_runs).

    TPU formulation — event-sorted signed cumsums, ZERO wide gathers
    (gathers/scatters are pathologically slow on some TPU stacks):

    The SlideMapper trajectory (slidingMap.hpp:28-212) evaluates, after
    inserting interval entry t (entries ascend by wpos),
        active(t) = {i : i <= t and wend_i > wpos_t}.
    Insertions and expiries are merged into one 2T event stream with a
    single multi-operand sort (key = window position; expiries apply
    before the snapshots of the same position; insertions tie-break by
    entry index). A signed one-hot cumsum over the event axis yields
    per-sketch-bucket active counts at every event; the pivot rule
    (rank_b = b+1 + #active non-matching below b <= s_q,
    slidingMap.hpp:158,204) is a cumsum over the bucket axis. Snapshots
    are read at main-entry insertion events. Plateau runs of
    shared == best are then extracted per row (computeMap.hpp:1373-1450)
    treating non-snapshot events as transparent.
    """
    W = w_lo.shape[0]
    T = t_cap
    E = 2 * T
    M_len = mi_rank.shape[0]
    BIG = jnp.int32(np.int32(2 ** 31 - 1))

    i_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    gidx = jnp.minimum(w_lo[:, None] + i_idx, max(M_len - 1, 0))
    e_valid = (w_lo[:, None] + i_idx) < w_hi[:, None]
    # entry code (rank << 1) | 1: always "present"; pads get I32MAX,
    # which never equals a query code and sorts above all real codes
    hash_a = jnp.where(e_valid, (mi_rank[gidx] << 1) | 1, BIG)
    wend_a = jnp.where(e_valid, mi_wend[gidx], BIG)
    strand_a = jnp.where(e_valid, mi_strand[gidx].astype(jnp.int32), 0)
    wpos_a = jnp.where(e_valid, mi_wpos[gidx], BIG)

    n_setup = (w_mid - w_lo)[:, None]
    t_is_main = (i_idx >= n_setup) & e_valid

    # next-entry wpos (neighbor read, computeMap.hpp:1386-1390)
    nxt_ok = ((w_lo[:, None] + i_idx + 1) < M_len)
    gnext = jnp.minimum(w_lo[:, None] + i_idx + 1, max(M_len - 1, 0))
    same_seq = nxt_ok & (mi_seqid[gnext] == w_seq[:, None])
    next_wpos = jnp.where(same_seq, mi_wpos[gnext],
                          jnp.where(e_valid, mi_wpos[gidx], BIG))

    # sketch bucket of each entry: compare-all against the (W, s) sorted
    # sketch (s is small; dense compares beat binary-search gathers)
    lt = q_code[:, None, :] < hash_a[:, :, None]          # (W, T, s)
    b = jnp.sum(lt, axis=-1).astype(jnp.int32)            # (W, T)
    eqh = jnp.any(q_code[:, None, :] == hash_a[:, :, None], axis=-1)
    inb = b < s
    match = eqh & e_valid
    non = inb & ~eqh & e_valid

    # ---- event stream: 2T events = T insertions + T expiries
    # composite key: (window position) * 2 + type, then entry index.
    # type 0 = expiry (applies before same-position snapshots).
    span = jnp.int64(T + 1)
    key_ins = ((wpos_a.astype(jnp.int64) * 2 + 1) * span
               + i_idx.astype(jnp.int64))
    key_exp = (wend_a.astype(jnp.int64) * 2) * span + i_idx.astype(
        jnp.int64)
    key_ins = jnp.where(e_valid, key_ins, KEY_PAD)
    key_exp = jnp.where(e_valid, key_exp, KEY_PAD)

    # packed payload: bucket(17b) | match(1) | non(1) | main(1) |
    # strand+1(2) | sign(1: 1=insert)
    def pack(sign_insert):
        pm = jnp.where(sign_insert, t_is_main, False)
        return (b << 7) | (match.astype(jnp.int32) << 6) \
            | (non.astype(jnp.int32) << 5) | (pm.astype(jnp.int32) << 4) \
            | ((strand_a + 1) << 2) \
            | jnp.where(sign_insert, 1, 0)

    keys = jnp.concatenate([key_ins, key_exp], axis=1)      # (W, 2T)
    pay = jnp.concatenate([pack(True), pack(False)], axis=1)
    wp_pay = jnp.concatenate([wpos_a, wpos_a], axis=1)
    nw_pay = jnp.concatenate([next_wpos, next_wpos], axis=1)
    keys, pay, wp_pay, nw_pay = jax.lax.sort(
        (keys, pay, wp_pay, nw_pay), dimension=-1, num_keys=1)

    ev_live = keys != KEY_PAD
    ev_b = jnp.where(ev_live, pay >> 7, s)
    ev_match = ev_live & (((pay >> 6) & 1) == 1)
    ev_non = ev_live & (((pay >> 5) & 1) == 1)
    ev_main = ev_live & (((pay >> 4) & 1) == 1)
    ev_strand = jnp.where(ev_live, ((pay >> 2) & 3) - 1, 0)
    sign = jnp.where(ev_live, (pay & 1) * 2 - 1, 0)         # +1/-1

    # ---- bucket-dense active counts at every event, (W, s, E) with the
    # long event axis minor, via MATMUL-form prefix sums (see
    # _prefix_matmul_e — one MXU pass instead of log2(E) cumsum passes
    # over the cubes; 2.5x on chip at bench scale, bit-identical)
    lane = jnp.arange(s, dtype=jnp.int32)[None, :, None]    # (1, s, 1)
    ohm = (ev_b[:, None, :] == lane) & ev_match[:, None, :]
    ohn = (ev_b[:, None, :] == lane) & ev_non[:, None, :]
    sgn = sign.astype(jnp.bfloat16)[:, None, :]
    dm = jnp.where(ohm, sgn, 0).astype(jnp.bfloat16)        # (W, s, E)
    dn = jnp.where(ohn, sgn, 0).astype(jnp.bfloat16)
    dv = jnp.where(ohm, sgn * ev_strand.astype(
        jnp.bfloat16)[:, None, :], 0).astype(jnp.bfloat16)
    cnt_m = _prefix_matmul_e(dm)                            # (W, s, E)
    cnt_v = _prefix_matmul_e(dv)

    # pivot rule over the bucket axis (rank fits int16: s + T <= 16384).
    # Per event only ONE bucket fires, so the bucket-inclusive prefix of
    # dn stays in {-1, 0, +1} — exact even in bf16 — and its event-axis
    # prefix is the rank correction.
    lts = (jnp.arange(s)[:, None] >= jnp.arange(s)[None, :]).astype(
        jnp.bfloat16)
    cs_dn = jnp.einsum("bt,wte->wbe", lts, dn,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)
    rank = (jnp.arange(1, s + 1, dtype=jnp.int16)[None, :, None]
            + _prefix_matmul_e(cs_dn))
    Pmask = rank <= s_q[:, None, None].astype(jnp.int16)    # (W, s, E)
    shared = jnp.sum(jnp.where(Pmask, cnt_m, jnp.int16(0)), axis=1,
                     dtype=jnp.int32)                       # (W, 2T)
    votes = jnp.sum(jnp.where(Pmask, cnt_v, jnp.int16(0))
                    * q_strand[:, :s, None].astype(jnp.int16), axis=1,
                    dtype=jnp.int32)

    # ---- optimal-plateau runs over snapshot (main-insert) events
    # (plateau_loci run phase; non-snapshot events are transparent)
    sh_m = jnp.where(ev_main, shared, -1)
    best = jnp.maximum(jnp.max(sh_m, axis=1), 1)            # (W,)
    eq = ev_main & (shared == best[:, None])

    m_id = jnp.cumsum(ev_main.astype(jnp.int32), axis=1)    # 1-based
    last_eq = jax.lax.cummax(
        jnp.where(eq, m_id, 0), axis=1)
    prev_last_eq = jnp.concatenate(
        [jnp.zeros((W, 1), last_eq.dtype), last_eq[:, :-1]], axis=1)
    # continuation iff the immediately preceding main snapshot (m_id - 1,
    # which must exist) was also eq
    run_start = eq & ~((m_id > 1) & (prev_last_eq == m_id - 1))
    rid = jnp.cumsum(run_start.astype(jnp.int32), axis=1) - 1

    L = L2_RUN_CAP
    col = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32)[None], (W, E))
    # run compaction by SORT, not vmapped row scatters (those cost
    # ~20 ms per chunk at (512, 2048) on this backend, CLAUDE.md rule 3;
    # two 2-operand sorts run in ~4 ms). Keys are unique below L (one
    # run_start / run_last column per rid), and rid >= L keys only exist
    # when > L real runs fill the first L columns anyway, so reading
    # [:L] reproduces the scatter fills exactly (BIG / -1 pads).
    #
    # start_w[r] = wp_pay at run r's FIRST eq column: eq columns are
    # main-insert events, whose wp ascends with the event sort key, so
    # the first column is the run's min wpos.
    _, start_w = jax.lax.sort(
        (jnp.where(run_start, rid, L),
         jnp.where(run_start, wp_pay, BIG)),
        dimension=-1, num_keys=1)
    start_w = start_w[:, :L]
    # tb[r] = run r's LAST eq column: eq-column rids are nondecreasing,
    # so a run ends where the next eq column's rid differs
    arr_r = jnp.where(eq, rid, BIG)
    nxt_rid = jnp.concatenate(
        [jax.lax.cummin(arr_r[:, ::-1], axis=1)[:, ::-1][:, 1:],
         jnp.full((W, 1), BIG)], axis=1)
    run_last = eq & (nxt_rid != rid)
    _, tb = jax.lax.sort(
        (jnp.where(run_last, rid, L),
         jnp.where(run_last, col, jnp.int32(-1))),
        dimension=-1, num_keys=1)
    tb = tb[:, :L]
    n_runs = jnp.max(jnp.where(eq, rid, -1), axis=1) + 1     # (W,)
    run_overflow = n_runs > L

    # opt_end of a run ending at snapshot tb: next_wpos of the NEXT
    # snapshot if one exists, else of tb itself (host plateau_loci
    # semantics with main-only indexing). next-main column per event:
    nm = jax.lax.cummin(
        jnp.where(ev_main, col, E)[:, ::-1], axis=1)[:, ::-1]
    nm_after = jnp.concatenate(
        [nm[:, 1:], jnp.full((W, 1), E, nm.dtype)], axis=1)
    tbc = jnp.clip(tb, 0, E - 1)
    nxt_main_col = jnp.take_along_axis(nm_after, tbc, axis=1)
    end_col = jnp.where(nxt_main_col < E, nxt_main_col, tbc)
    opt_end = jnp.take_along_axis(nw_pay, end_col, axis=1)
    vote_tb = jnp.take_along_axis(votes, tbc, axis=1)

    # ONE (W, 3 + 3L) i32 buffer -> one device->host fetch per chunk
    return jnp.concatenate([
        n_runs[:, None], best[:, None],
        run_overflow.astype(jnp.int32)[:, None],
        start_w, opt_end, jnp.where(vote_tb >= 0, 1, -1)], axis=1)


L2_RUN_CAP = 16


def unpack_l2_runs(buf: np.ndarray):
    """(n_runs, best, overflow, starts, ends, strands) views of
    l2_step's packed run buffer."""
    L = L2_RUN_CAP
    return (buf[:, 0], buf[:, 1], buf[:, 2] != 0,
            buf[:, 3:3 + L], buf[:, 3 + L:3 + 2 * L],
            buf[:, 3 + 2 * L:3 + 3 * L])
