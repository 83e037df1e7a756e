"""Hash-range-sharded reference index (the multi-chip scale path).

The default deployment replicates the index on every chip (pure data
parallelism, mesh.py). When the index outgrows one chip's HBM (e.g.
``--dense`` whole-human runs), this module shards the CSR postings by
unique-hash range across the mesh instead (SURVEY.md sections 2.3/5):

- every device holds one contiguous hash-range shard of the unique-hash
  array + its postings;
- L1 lookup runs under ``shard_map``: each shard resolves the
  (replicated) query sketches against its range, the per-shard postings
  meet in an ``all_gather`` over the ICI, and each device then sweeps
  the fragments it owns — the frequent-seed decision needs a ``psum``
  across shards;
- the output is bit-identical to the replicated-index ``l1_step`` (the
  endpoint sort canonicalizes the gathered postings order).

This is the analog slot of tensor parallelism in the reference's
inventory; the reference itself has no distributed story at all
(single-process pthreads, ThreadPool.hpp).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels import mapdev
from ..kernels.mapdev import L1Config, sweep_and_candidates
from ..kernels.sketch import sketch_fragments, UMAX


KEY_MAX = np.int64(0x7FFFFFFFFFFFFFFF)
KEY_MIN = np.int64(-0x8000000000000000)

# largest L2 interval-slice the device path handles (matches the
# engine's T bucket ceiling); the mi-slab halo must cover it so every
# work item's [lo, hi) slice lives wholly inside its owner's slab
L2_T_MAX = 8192


class ShardedIndex(NamedTuple):
    n_shards: int
    u_shard: int              # unique hashes per shard (padded)
    p_shard: int              # postings per shard (padded)
    uniq: jax.Array           # (n, u_shard) u64, UMAX-padded
    offsets: jax.Array        # (n, u_shard+1) i32, shard-local CSR
    seqid: jax.Array          # (n, p_shard) i32
    wpos: jax.Array           # (n, p_shard) i32
    wend: jax.Array           # (n, p_shard) i32
    frequent: jax.Array       # (n, u_shard) bool
    # ---- contig-range-sharded minmer interval table (L2) ----
    m_shard: int              # mi rows per slab (chunk + halo, padded)
    mi_bounds: np.ndarray     # (n+1,) host: global row range per shard
    mi_row0: jax.Array        # (n, 1) i32 replicated-by-row global start
    key_bounds: jax.Array     # (n+1,) i64 replicated: owned key ranges
    mi_rank: jax.Array        # (n, m_shard) i32 rank codes' domain
    mi_wpos: jax.Array        # (n, m_shard) i32
    mi_wend: jax.Array        # (n, m_shard) i32
    mi_strand: jax.Array      # (n, m_shard) i8
    mi_seqid: jax.Array       # (n, m_shard) i32
    mi_key: jax.Array         # (n, m_shard) i64, KEY_MAX-padded


def build_sharded_index(idx, mesh: Mesh,
                        halo: int = L2_T_MAX) -> ShardedIndex:
    """Split the index across the mesh with nothing replicated:

    - CSR postings (L1): contiguous unique-hash ranges, one per device;
    - minmer interval table (L2, the reference's ``minmerIndex``,
      winSketch.hpp:102): contiguous (seqid, wpos)-sorted ROW ranges,
      one per device, each extended by a ``halo`` of the next shard's
      rows so any <= halo-row slice is wholly resident on its owner.
      Range boundaries are key-aligned (equal (seqid, wpos) keys are
      never split) so shard-local searchsorted + row offset equals the
      global searchsorted.
    """
    n = mesh.devices.size
    U = len(idx.uniq_hashes)
    u_shard = -(-max(U, 1) // n)
    p_shard = 1
    parts = []
    for d in range(n):
        lo = min(d * u_shard, U)
        hi = min(lo + u_shard, U)
        plo = int(idx.post_offsets[lo]) if lo < U else len(idx.post_seqid)
        phi = int(idx.post_offsets[hi]) if hi <= U else len(idx.post_seqid)
        parts.append((lo, hi, plo, phi))
        p_shard = max(p_shard, phi - plo)
    p_shard = 1 << (p_shard - 1).bit_length() if p_shard > 1 else 1

    uniq = np.full((n, u_shard), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
    offs = np.zeros((n, u_shard + 1), np.int32)
    seqid = np.zeros((n, p_shard), np.int32)
    wpos = np.zeros((n, p_shard), np.int32)
    wend = np.zeros((n, p_shard), np.int32)
    freq = np.zeros((n, u_shard), bool)
    for d, (lo, hi, plo, phi) in enumerate(parts):
        m = hi - lo
        uniq[d, :m] = idx.uniq_hashes[lo:hi]
        offs[d, :m + 1] = idx.post_offsets[lo:hi + 1] - plo
        offs[d, m + 1:] = offs[d, m]
        seqid[d, :phi - plo] = idx.post_seqid[plo:phi]
        wpos[d, :phi - plo] = idx.post_wpos[plo:phi]
        wend[d, :phi - plo] = idx.post_wend[plo:phi]
        freq[d, :m] = idx.is_frequent[lo:hi]

    # ---- mi slabs: key-aligned row ranges + halo
    key = ((idx.mi_seqid.astype(np.int64) << 32)
           | idx.mi_wpos.astype(np.int64))
    M = len(key)
    chunk_nom = -(-max(M, 1) // n)
    bounds = [0]
    for d in range(1, n):
        b = min(d * chunk_nom, M)
        if b < M:
            b = int(np.searchsorted(key, key[b], side="left"))
        bounds.append(max(b, bounds[-1]))
    bounds.append(M)
    mi_bounds = np.asarray(bounds, np.int64)
    m_shard = max(1, max(
        min(bounds[d + 1] + halo, M) - bounds[d] for d in range(n)))

    mh = np.zeros((n, m_shard), np.int32)   # pads masked by e_valid
    mwp = np.zeros((n, m_shard), np.int32)
    mwe = np.zeros((n, m_shard), np.int32)
    mst = np.zeros((n, m_shard), np.int8)
    msq = np.full((n, m_shard), -1, np.int32)
    mk = np.full((n, m_shard), KEY_MAX, np.int64)
    row0 = np.zeros((n, 1), np.int32)
    kb = np.full(n + 1, KEY_MAX, np.int64)
    kb[0] = KEY_MIN
    for d in range(n):
        lo, hi = bounds[d], min(bounds[d + 1] + halo, M)
        m = hi - lo
        mh[d, :m] = idx.mi_rank[lo:hi]
        mwp[d, :m] = idx.mi_wpos[lo:hi]
        mwe[d, :m] = idx.mi_wend[lo:hi]
        mst[d, :m] = idx.mi_strand[lo:hi]
        msq[d, :m] = idx.mi_seqid[lo:hi]
        mk[d, :m] = key[lo:hi]
        row0[d, 0] = lo
        if 0 < d and bounds[d] < M:
            kb[d] = key[bounds[d]]
        elif 0 < d:
            kb[d] = KEY_MAX
    kb[n] = KEY_MAX

    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    return ShardedIndex(
        n_shards=n, u_shard=u_shard, p_shard=p_shard,
        uniq=jax.device_put(uniq, sh),
        offsets=jax.device_put(offs, sh),
        seqid=jax.device_put(seqid, sh),
        wpos=jax.device_put(wpos, sh),
        wend=jax.device_put(wend, sh),
        frequent=jax.device_put(freq, sh),
        m_shard=m_shard,
        mi_bounds=mi_bounds,
        mi_row0=jax.device_put(row0, sh),
        key_bounds=jax.device_put(kb, rep),
        mi_rank=jax.device_put(mh, sh),
        mi_wpos=jax.device_put(mwp, sh),
        mi_wend=jax.device_put(mwe, sh),
        mi_strand=jax.device_put(mst, sh),
        mi_seqid=jax.device_put(msq, sh),
        mi_key=jax.device_put(mk, sh),
    )


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "p_shard"))
def l1_step_sharded(frags, sidx_uniq, sidx_offs, sidx_seqid, sidx_wpos,
                    sidx_wend, sidx_freq, min_hits_table, cutoff_table,
                    allowed, ref_group, mi_key_s, mi_row0, key_bounds,
                    cfg: L1Config, mesh: Mesh, p_shard: int):
    """Hash-range-sharded l1_step: same packed output, different layout.

    Inputs except the sidx_* tables are replicated; fragments are owned
    round-robin in contiguous blocks (device i sweeps rows
    [i*B/n, (i+1)*B/n)).
    """
    from jax.experimental.shard_map import shard_map

    B = frags.shape[0]
    s = cfg.s
    n = mesh.devices.size
    Bl = B // n
    P_loc = p_shard  # gather cap per shard; total gathered = n * P_loc

    q_hash, q_strand, q_cnt, q_cx = sketch_fragments(frags, cfg.k, s)

    def body(q_hash, q_strand, q_cx, uniq_s, offs_s, pseq_s, pwp_s,
             pwe_s, freq_s, allowed, ref_group, mh_table, ct, mi_key_s,
             mi_row0, key_bounds):
        uniq_l = uniq_s[0]
        offs_l = offs_s[0]
        U_s = uniq_l.shape[0]
        pos0 = mapdev.searchsorted_auto(uniq_l, q_hash)   # (B, s)
        posc = jnp.minimum(pos0, U_s - 1)
        found_l = (q_hash != UMAX) & (uniq_l[posc] == q_hash)
        freq_l = found_l & freq_s[0][posc]
        # frequent-seed status lives on exactly one shard -> psum = OR
        freq_g = jax.lax.psum(freq_l.astype(jnp.int32), "data") > 0
        keep = (q_hash != UMAX) & ~freq_g
        order = jnp.argsort(~keep, axis=1, stable=True)
        # global insertion position: shards hold contiguous ranges of
        # the sorted hash table, so counts-below sum across shards
        # (pads are UMAX and never counted for real queries); the rank
        # code then matches the replicated l1_step bit-for-bit
        pos_g = jax.lax.psum(pos0, "data")
        found_g = jax.lax.psum(found_l.astype(jnp.int32), "data") > 0
        q_code = (pos_g.astype(jnp.int32) << 1) | found_g.astype(jnp.int32)
        q_code_c = jnp.take_along_axis(
            jnp.where(keep, q_code, jnp.int32(2**31 - 1)), order, axis=1)
        q_strand_c = jnp.take_along_axis(
            jnp.where(keep, q_strand, 0), order, axis=1)
        s_q = jnp.sum(keep, axis=1).astype(jnp.int32)
        min_hits = mh_table[s_q]

        # local postings ranges for kept hashes found on THIS shard
        use = keep & found_l
        start = jnp.where(use, offs_l[posc], 0)
        cnt = jnp.where(
            use, offs_l[jnp.minimum(posc + 1, U_s)] - start, 0)
        cum = jnp.cumsum(cnt, axis=1)
        base = cum - cnt
        total_l = cum[:, -1]
        total = jax.lax.psum(total_l, "data")
        overflow_l1 = total > cfg.p_cap     # replicated-path rule

        j = jnp.arange(P_loc, dtype=jnp.int32)[None, :]

        def slot_row(base_r, cnt_r):
            z = jnp.full((P_loc + 1,), -1, jnp.int32).at[
                jnp.minimum(jnp.where(cnt_r > 0, base_r, P_loc),
                            P_loc)].max(jnp.arange(s, dtype=jnp.int32))
            return jax.lax.cummax(z[:P_loc])

        slot = jnp.clip(jax.vmap(slot_row)(base, cnt), 0, s - 1)
        src = (jnp.take_along_axis(start, slot, axis=1)
               + (j - jnp.take_along_axis(base, slot, axis=1)))
        valid_j = j < jnp.minimum(total_l, P_loc)[:, None]
        srcc = jnp.clip(src, 0, pseq_s.shape[1] - 1)
        g_seq = jnp.where(valid_j, pseq_s[0][srcc], 0)
        g_wp = jnp.where(valid_j, pwp_s[0][srcc], 0)
        g_we = jnp.where(valid_j, pwe_s[0][srcc], 0)

        # meet on the ICI: every device gets every shard's hits
        g_seq = jax.lax.all_gather(g_seq, "data", axis=1, tiled=True)
        g_wp = jax.lax.all_gather(g_wp, "data", axis=1, tiled=True)
        g_we = jax.lax.all_gather(g_we, "data", axis=1, tiled=True)
        valid_all = jax.lax.all_gather(
            valid_j, "data", axis=1, tiled=True)        # (B, n*P_loc)

        # sweep only the fragments this device owns
        i = jax.lax.axis_index("data")
        row0 = i * Bl

        def rows(x):
            return jax.lax.dynamic_slice_in_dim(x, row0, Bl, axis=0)

        g_seq, g_wp, g_we = rows(g_seq), rows(g_wp), rows(g_we)
        valid_all = rows(valid_all)
        adm = jnp.take_along_axis(rows(allowed), g_seq, axis=1)
        valid_all = valid_all & adm

        (c_seq, c_first, c_last, c_inter, n_cand,
         overflow_c) = sweep_and_candidates(
            g_seq, g_wp, g_we, valid_all, rows(s_q), rows(min_hits),
            ref_group, ct, cfg)

        # l2 slice bounds against the contig-range-SHARDED key array:
        # each shard binary-searches its slab for every device's
        # candidates (an all_gather of the small key triples), keeps the
        # keys its value range owns, and a psum assembles the global
        # insertion points (slab-local position + slab row offset —
        # exact because slab boundaries are key-aligned).
        seq64 = c_seq.astype(jnp.int64) << 32
        lo_k = seq64 | jnp.maximum(
            0, c_first.astype(jnp.int64) - cfg.seg_length - 1)
        mid_k = seq64 | jnp.maximum(0, c_first).astype(jnp.int64)
        hi_k = seq64 | (c_last.astype(jnp.int64) + 1)
        C = c_seq.shape[1]
        keys3 = jnp.concatenate([lo_k, mid_k, hi_k], axis=1)  # (Bl, 3C)
        keys3 = jax.lax.all_gather(keys3, "data", axis=0, tiled=True)
        slab = mi_key_s[0]
        pos = (mapdev.searchsorted_auto(slab, keys3).astype(jnp.int32)
               + mi_row0[0, 0])
        kb_lo = jax.lax.dynamic_slice_in_dim(
            key_bounds, jax.lax.axis_index("data"), 1)[0]
        kb_hi = jax.lax.dynamic_slice_in_dim(
            key_bounds, jax.lax.axis_index("data") + 1, 1)[0]
        owned = (keys3 >= kb_lo) & (keys3 < kb_hi)
        posg = jax.lax.psum(jnp.where(owned, pos, 0), "data")
        posg = rows(posg)
        c_lo, c_mid, c_hi = (posg[:, :C], posg[:, C:2 * C],
                             posg[:, 2 * C:])

        meta = jnp.concatenate([
            rows(s_q)[:, None], n_cand[:, None],
            (rows(overflow_l1) | overflow_c).astype(jnp.int32)[:, None],
            jax.lax.bitcast_convert_type(
                rows(q_cx).astype(jnp.float32), jnp.int32)[:, None],
            c_seq, c_first, c_last, c_inter, c_lo, c_mid, c_hi], axis=1)
        # sketches are derived from replicated inputs, so every shard
        # already holds the full (B, s) arrays — return them unsharded
        return meta, q_code_c, q_strand_c.astype(jnp.int8)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data"), P("data"),
                  P("data"), P("data"), P("data"), P(), P(), P(), P(),
                  P("data"), P("data"), P()),
        out_specs=(P("data"), P(), P()),
        check_rep=False,
    )(q_hash, q_strand, q_cx, sidx_uniq, sidx_offs, sidx_seqid,
      sidx_wpos, sidx_wend, sidx_freq, allowed, ref_group,
      min_hits_table, cutoff_table, mi_key_s, mi_row0, key_bounds)


@functools.partial(jax.jit, static_argnames=("t_cap", "s", "mesh"))
def l2_step_sharded(w_lo, w_mid, w_hi, w_seq, q_code, q_strand, s_q,
                    mi_rank_s, mi_wpos_s, mi_wend_s, mi_strand_s,
                    mi_seqid_s, t_cap: int, s: int, mesh: Mesh):
    """l2_step over the contig-range-sharded interval table.

    Work items arrive pre-routed: row d of the stacked (n, W) inputs
    holds the items whose [lo, hi) slice lives on shard d, with bounds
    already rebased to slab-local rows (engine does the routing from
    ShardedIndex.mi_bounds). Every shard runs the standard l2_step on
    its slab; the (n, W, buf) output keeps the per-shard layout.
    """
    from jax.experimental.shard_map import shard_map
    from ..kernels.mapdev import l2_step

    def body(w_lo, w_mid, w_hi, w_seq, qh, qs, sqv,
             mh, mwp, mwe, mst, msq):
        return l2_step(w_lo[0], w_mid[0], w_hi[0], w_seq[0], qh[0],
                       qs[0], sqv[0], mh[0], mwp[0], mwe[0], mst[0],
                       msq[0], t_cap, s)[None]

    return shard_map(
        body, mesh=mesh,
        in_specs=(P("data"),) * 12,
        out_specs=P("data"),
        check_rep=False,
    )(w_lo, w_mid, w_hi, w_seq, q_code, q_strand, s_q,
      mi_rank_s, mi_wpos_s, mi_wend_s, mi_strand_s, mi_seqid_s)
