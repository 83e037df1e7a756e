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

from ..kernels.mapdev import L1Config, sweep_and_candidates
from ..kernels.sketch import sketch_fragments, UMAX


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


def build_sharded_index(idx, mesh: Mesh) -> ShardedIndex:
    """Split the CSR postings into contiguous hash ranges, one per
    device, and place each shard on its owner."""
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

    sh = NamedSharding(mesh, P("data"))
    return ShardedIndex(
        n_shards=n, u_shard=u_shard, p_shard=p_shard,
        uniq=jax.device_put(uniq, sh),
        offsets=jax.device_put(offs, sh),
        seqid=jax.device_put(seqid, sh),
        wpos=jax.device_put(wpos, sh),
        wend=jax.device_put(wend, sh),
        frequent=jax.device_put(freq, sh),
    )


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "p_shard"))
def l1_step_sharded(frags, sidx_uniq, sidx_offs, sidx_seqid, sidx_wpos,
                    sidx_wend, sidx_freq, min_hits_table, cutoff_table,
                    allowed, ref_group, mi_key, cfg: L1Config,
                    mesh: Mesh, p_shard: int):
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
             pwe_s, freq_s, allowed, ref_group, mh_table, ct, mi_key):
        uniq_l = uniq_s[0]
        offs_l = offs_s[0]
        U_s = uniq_l.shape[0]
        pos0 = jnp.searchsorted(uniq_l, q_hash)           # (B, s)
        posc = jnp.minimum(pos0, U_s - 1)
        found_l = (q_hash != UMAX) & (uniq_l[posc] == q_hash)
        freq_l = found_l & freq_s[0][posc]
        # frequent-seed status lives on exactly one shard -> psum = OR
        freq_g = jax.lax.psum(freq_l.astype(jnp.int32), "data") > 0
        keep = (q_hash != UMAX) & ~freq_g
        order = jnp.argsort(~keep, axis=1, stable=True)
        q_hash_c = jnp.take_along_axis(
            jnp.where(keep, q_hash, UMAX), order, axis=1)
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

        from ..kernels.mapdev import l2_slice_bounds
        c_lo, c_mid, c_hi = l2_slice_bounds(
            mi_key, c_seq, c_first, c_last, cfg.seg_length)

        qh32 = jax.lax.bitcast_convert_type(
            rows(q_hash_c), jnp.uint32).reshape(Bl, 2 * s).astype(
            jnp.int32)
        meta = jnp.concatenate([
            rows(s_q)[:, None], n_cand[:, None],
            (rows(overflow_l1) | overflow_c).astype(jnp.int32)[:, None],
            jax.lax.bitcast_convert_type(
                rows(q_cx).astype(jnp.float32), jnp.int32)[:, None],
            c_seq, c_first, c_last, c_inter, c_lo, c_mid, c_hi,
            qh32, rows(q_strand_c).astype(jnp.int32)], axis=1)
        return meta

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data"), P("data"),
                  P("data"), P("data"), P("data"), P(), P(), P(), P(),
                  P()),
        out_specs=P("data"),
        check_rep=False,
    )(q_hash, q_strand, q_cx, sidx_uniq, sidx_offs, sidx_seqid,
      sidx_wpos, sidx_wend, sidx_freq, allowed, ref_group,
      min_hits_table, cutoff_table, mi_key)
