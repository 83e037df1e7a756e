"""Mapping engine orchestration.

Equivalent of ``skch::Map`` (reference: computeMap.hpp:53-1818), restructured
for TPU execution:

- the reference maps one whole query sequence per pthread-pool task
  (ThreadPool.hpp); here query sequences are cut into segLength fragments
  that form a flat batch axis — fragments from many queries are sketched
  in one device call, then candidate finding / scoring runs per fragment;
- results are regrouped per query, chained/merged/filtered on the host
  (tiny row counts), and written in input order (the reference's pool
  preserves submission order; we process in order by construction).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import sys
import time
from typing import IO, List, Optional, Sequence, Tuple

import numpy as np

from .. import stats
from ..params import FIXED, Parameters, FILTER_MAP, FILTER_ONETOONE
from ..index.builder import ReferenceIndex
from ..kernels import kmers
from ..kernels.sketch import sketch_fragments, complexity_rescale
from . import l1 as l1_mod
from . import l2 as l2_mod
from . import filters, merge, output
from .results import MappingResult

logger = logging.getLogger("mashmap_tpu.map")

# shapes already AOT-prewarmed in this process (see prewarm_async)
_PREWARMED: set = set()


def _batch_pad_rows(B: int, batch_fragments: int, n_dev: int) -> int:
    """Padded row count for a B-fragment batch: {2^k, 1.5*2^k} grid,
    quarter-width tail floor, full-batch floor, device divisibility.
    THE single source of truth — _dispatch_batch sizes real batches with
    it and prewarm_async compiles exactly these shapes."""
    Bp = 1 << max(3, (B - 1).bit_length())
    if B <= (Bp * 3) // 4:
        Bp = (Bp * 3) // 4
    # clamp: the tail shape must never exceed the full-batch shape
    # (batch_fragments < 64 configs would otherwise pad UP to 64)
    b_small = min(batch_fragments, max(64, batch_fragments // 4))
    if B <= b_small:
        Bp = b_small
    else:
        Bp = max(batch_fragments, Bp)
    return Bp + (-Bp) % n_dev


def _gather_sketch_rows(qh_dev, qs_dev, indices):
    """Device row gather of sketch hashes/strands at `indices`, with
    the index vector padded to a pow2 grid (repeating indices[0]) so
    the gather's XLA shape is reused across batches/runs. Callers slice
    the first len(indices) rows."""
    import jax.numpy as jnp
    npow = 1 << max(3, (len(indices) - 1).bit_length())
    idxv = np.full(npow, indices[0], np.int32)
    idxv[:len(indices)] = indices
    idxs = jnp.asarray(idxv)
    return (jnp.take(qh_dev, idxs, axis=0),
            jnp.take(qs_dev, idxs, axis=0))


_SYNC_MARKS = bool(int(os.environ.get("MASHMAP_TPU_SYNC_MARKS", "0")))


def _start_host_copy(arr) -> None:
    """Begin an async device->host transfer for a buffer we will
    device_get later. On the tunneled TPU backend a fetch pays ~300ms
    of latency; starting the copy at dispatch time lets it overlap
    with the host prep + device compute of the NEXT batch, so the
    eventual device_get mostly just picks up finished bytes."""
    try:
        arr.copy_to_host_async()
    except Exception:        # multi-device layouts / older jax: harmless
        pass


@dataclasses.dataclass
class _Fragment:
    query_idx: int          # position in the batch's query list
    q_start: int            # fragment offset within the query
    q_len: int              # fragment length (== Q.len)
    window_len: int         # max(0, q_len - seg_length)
    q: object = None        # owning _Query (pipelined path)
    ord: int = 0            # ordinal within the query (pipelined path)


@dataclasses.dataclass
class _Query:
    name: str
    seq: str
    counter: int            # global sequence counter (file order)
    # pipelined-path state: fragments of one query may land in different
    # device batches (mandatory for chromosome-scale queries whose
    # fragment count exceeds any single batch), so per-query results
    # accumulate here until every fragment has been delivered.
    u8: object = None       # sanitized bytes (np.uint8)
    allowed: object = None  # admissible-reference mask (or None)
    qg: int = -1            # reference prefix group
    n_frags: int = 0
    done: int = 0
    counted: int = 0        # bp already credited to the progress meter
    rows: object = None     # per-ordinal List[List[MappingResult]]


@dataclasses.dataclass
class _Batch:
    """One in-flight device batch of fragments (pipelined path)."""
    frags: list
    mat: object = None          # (B, L) uint8 host matrix
    out: object = None          # l1_step packed meta (device)
    qh_dev: object = None       # (B, s) sketches (device-resident)
    qs_dev: object = None
    stage: int = 0              # 0 = l1 dispatched, 1 = l2 dispatched
    o: object = None            # unpacked l1 meta (host)
    cx: object = None
    host_frags: object = None   # set of batch-frag indices
    host_l2_set: object = None  # set of (i, j)
    pending: object = None      # [(chunk, nrows)]
    pcat: object = None         # concatenated l2 run buffer (device)
    qh_pick: object = None      # pre-gathered host-replay sketch rows
    need0: object = None        # frag indices covered by qh_pick
    loci_by: object = None
    qh_host: object = None


class Mapper:
    """L1+L2 mapping pipeline against a built ReferenceIndex."""

    def __init__(self, params: Parameters, index: ReferenceIndex):
        self.p = params
        self.idx = index
        self._mi_key = None     # lazy: 2.1 GB host RAM at human scale
        self.table_scale = max(
            1.0, params.sketch_size / FIXED.ss_table_max)
        if params.stage1_topANI_filter:
            self.cutoff_table = stats.sketch_cutoffs(
                params.sketch_size, params.kmer_size,
                params.ANIDiff, params.ANIDiffConf, FIXED.ss_table_max)
        else:
            self.cutoff_table = None
        self.ref_groups = self._set_ref_groups() \
            if params.skip_prefix else np.zeros(index.n_contigs, np.int64)
        self._min_hits_cache: dict[int, int] = {}
        self._ub_cache: dict[tuple, float] = {}
        self._name_arr = np.array(index.names)
        # one-to-one bookkeeping
        self.qmetadata: list[tuple[str, int]] = []
        self._buffered: List[MappingResult] = []
        # counters (reference prints these at the end, computeMap.hpp:409-414)
        self.total_reads_picked = 0
        self.total_reads_mapped = 0
        self.total_seq_counter = 0
        self.total_bp = 0
        # device-path observability: which escalation/fallback paths ran
        self.path_stats = {"host_frags": 0, "host_l2": 0,
                           "l2_buckets": {}}

    @property
    def mi_key(self) -> np.ndarray:
        """Packed (seqid << 32 | wpos) interval sort keys, host-side.

        Only host paths need it (host L2 fallback/replay and the
        HOST_SLICE_BOUNDS escape hatch); the device kernels synthesize
        probe keys from the seqid/wpos columns instead, so this 2.1 GB
        (at human scale) array materializes lazily."""
        if self._mi_key is None:
            self._mi_key = l2_mod.pack_mi_key(
                self.idx.mi_seqid, self.idx.mi_wpos)
        return self._mi_key

    # --- prefix grouping (computeMap.hpp:144-177) ---
    @staticmethod
    def _prefix(name: str, delim: str) -> str:
        i = name.rfind(delim)
        return name if i < 0 else name[:i]

    def _set_ref_groups(self) -> np.ndarray:
        groups = np.zeros(self.idx.n_contigs, np.int64)
        group = 0
        i = 0
        while i < self.idx.n_contigs:
            pref = self._prefix(self.idx.names[i], self.p.prefix_delim)
            j = i
            while j < self.idx.n_contigs and \
                    self._prefix(self.idx.names[j],
                                 self.p.prefix_delim) == pref:
                groups[j] = group
                j += 1
            group += 1
            i = j
        return groups

    def _get_ref_group(self, seq_name: str) -> int:
        if not hasattr(self, "_prefix_to_group"):
            self._prefix_to_group = {}
            for i in range(self.idx.n_contigs):
                pref = self._prefix(self.idx.names[i],
                                    self.p.prefix_delim)
                self._prefix_to_group.setdefault(
                    pref, int(self.ref_groups[i]))
        return self._prefix_to_group.get(
            self._prefix(seq_name, self.p.prefix_delim), -1)

    # --- cached statistics ---
    def _minimum_hits(self, s_q: int) -> int:
        v = self._min_hits_cache.get(s_q)
        if v is None:
            v = stats.estimate_minimum_hits_relaxed(
                s_q, self.p.kmer_size, self.p.percentage_identity,
                FIXED.confidence_interval)
            self._min_hits_cache[s_q] = v
        return v

    def _identity_ub(self, shared: int, s_q: int) -> float:
        key = (shared, s_q)
        v = self._ub_cache.get(key)
        if v is None:
            mash_dist = stats.j2md(
                float(np.float32(1.0) * np.float32(shared)
                      / np.float32(s_q)), self.p.kmer_size)
            v = 1.0 - stats.md_lower_bound(
                mash_dist, s_q, self.p.kmer_size, FIXED.confidence_interval)
            self._ub_cache[key] = v
        return v

    # ------------------------------------------------------------------
    def _fragment_query(self, qlen: int) -> List[Tuple[int, int]]:
        """(q_start, q_len) per fragment (computeMap.hpp:587-671)."""
        p = self.p
        if not p.split or qlen <= p.seg_length:
            return [(0, qlen)]
        out = []
        n = qlen // p.seg_length
        for i in range(n):
            out.append((i * p.seg_length, p.seg_length))
        if n >= 1 and qlen % p.seg_length != 0:
            out.append((qlen - p.seg_length, p.seg_length))
        return out

    def _sketch_batch(self, seqs: List[np.ndarray]):
        """Device-sketch fragments, bucketed by padded length."""
        import jax.numpy as jnp
        p = self.p
        n = len(seqs)
        res_h = [None] * n
        res_s = [None] * n
        res_cnt = [0] * n
        res_cx = [0.0] * n
        # bucket by padded length (multiples of seg_length)
        buckets: dict[int, list[int]] = {}
        for i, sq in enumerate(seqs):
            pl = max(p.seg_length,
                     -(-len(sq) // p.seg_length) * p.seg_length)
            buckets.setdefault(pl, []).append(i)
        for pl, idxs in buckets.items():
            mat = np.full((len(idxs), pl), ord("N"), np.uint8)
            for r, i in enumerate(idxs):
                mat[r, : len(seqs[i])] = seqs[i]
            h, st, cnt, cx = sketch_fragments(
                jnp.asarray(mat), p.kmer_size, p.sketch_size)
            h = np.asarray(h)
            st = np.asarray(st)
            cnt = np.asarray(cnt)
            cx = np.asarray(cx)
            for r, i in enumerate(idxs):
                res_h[i] = h[r]
                res_s[i] = st[r]
                res_cnt[i] = int(cnt[r])
                res_cx[i] = float(complexity_rescale(
                    cx[r], pl, np.int64(len(seqs[i])), p.kmer_size))
        return res_h, res_s, res_cnt, res_cx

    # ------------------------------------------------------------------
    def _map_fragment(self, q: _Query, frag: _Fragment,
                      q_hashes: np.ndarray, q_strand: np.ndarray,
                      count: int, complexity: float,
                      allowed: Optional[np.ndarray],
                      q_ref_group: int) -> List[MappingResult]:
        """mapSingleQueryFrag equivalent (computeMap.hpp:755-815)."""
        p = self.p
        if count == 0 or complexity < p.kmer_complexity_threshold:
            return []
        hashes = q_hashes[:count]
        strands = q_strand[:count].astype(np.int64)
        # frequent-seed filtering (computeMap.hpp:833-839)
        freq = self.idx.is_freq_seed(hashes)
        if freq.any():
            hashes = hashes[~freq]
            strands = strands[~freq]
        s_q = len(hashes)
        if s_q == 0:
            return []

        minimum_hits = self._minimum_hits(s_q)
        seqid, wpos, wend, hrep = l1_mod.gather_postings(self.idx, hashes)
        if allowed is not None and len(seqid):
            keep = allowed[seqid]
            seqid, wpos, wend, hrep = (seqid[keep], wpos[keep],
                                       wend[keep], hrep[keep])
        if len(seqid) == 0:
            return []

        # group interval points by reference prefix group
        # (doL1Mapping, computeMap.hpp:1146-1165)
        if p.skip_prefix:
            gsel = self.ref_groups[seqid]
            group_vals = np.unique(gsel)
        else:
            gsel = None
            group_vals = np.array([0])

        wl = frag.window_len
        rows: List[MappingResult] = []
        for gv in group_vals:
            if gsel is None:
                sq, wp, we, hr = seqid, wpos, wend, hrep
            else:
                sel = gsel == gv
                sq, wp, we, hr = (seqid[sel], wpos[sel], wend[sel],
                                  hrep[sel])
            if wl == 0:
                cands = l1_mod.l1_candidates(
                    sq, wp, we, minimum_hits, s_q, p.seg_length,
                    p.stage1_topANI_filter, self.cutoff_table,
                    self.table_scale, p.stage2_full_scan)
            else:
                cands = l1_mod.l1_candidates_windowed(
                    sq, wp, we, hr, wl, minimum_hits, s_q,
                    p.seg_length, p.stage1_topANI_filter,
                    self.cutoff_table, self.table_scale,
                    p.stage2_full_scan)
            rows.extend(self._do_l2(q, frag, hashes, strands, s_q,
                                    complexity, cands))
        rows.sort(key=lambda m: (m.ref_seq_id, m.ref_start))
        return rows

    def _do_l2(self, q: _Query, frag: _Fragment, hashes, strands, s_q,
               complexity, cands,
               loci_fn=None) -> List[MappingResult]:
        """doL2Mapping equivalent (computeMap.hpp:1181-1267).

        loci_fn(candidate) -> List[L2Locus] override lets the device
        pipeline supply precomputed trajectories.
        """
        p = self.p
        k = p.kmer_size
        if not cands:
            return []
        if p.stage1_topANI_filter:
            cands = sorted(cands, key=lambda c: -c.intersection)
        best_jacc_num = 0.0
        rows: List[MappingResult] = []
        f32 = np.float32
        for c in cands:
            if p.stage1_topANI_filter:
                # float32 arithmetic mirrors the reference's `float` path
                # (computeMap.hpp:1196-1201)
                j_best = float(f32(best_jacc_num / s_q))
                cutoff_ani = max(0.0, float(
                    f32(f32(1.0) - f32(stats.j2md(j_best, k))
                        - f32(p.ANIDiff))))
                cutoff_j = float(f32(stats.md2j(1.0 - cutoff_ani, k)))
                if float(c.intersection) / s_q < cutoff_j:
                    break
            if loci_fn is not None:
                loci = loci_fn(c)
            else:
                loci = l2_mod.l2_mapped_regions(
                    self.idx, self.mi_key, hashes, strands,
                    c.seq_id, c.range_start, c.range_end,
                    p.seg_length, frag.window_len)
            for loc in loci:
                mash_dist = stats.j2md(
                    float(f32(1.0) * f32(loc.shared_sketch_size)
                          / f32(s_q)), k)
                nuc_id = float(f32(1) - f32(mash_dist))
                nuc_id_ub = self._identity_ub(loc.shared_sketch_size, s_q)
                if (p.keep_low_pct_id
                        and nuc_id_ub >= p.percentage_identity) \
                        or nuc_id >= p.percentage_identity:
                    best_jacc_num = max(best_jacc_num,
                                        float(loc.shared_sketch_size))
                    m = MappingResult(
                        query_len=frag.q_len,
                        ref_start=loc.mean_optimal_pos,
                        ref_end=loc.mean_optimal_pos + frag.q_len,
                        query_start=0,
                        query_end=frag.q_len,
                        ref_seq_id=loc.seq_id,
                        query_seq_id=q.counter,
                        nuc_identity=nuc_id,
                        nuc_identity_ub=nuc_id_ub,
                        sketch_size=s_q,
                        conserved_sketches=loc.shared_sketch_size,
                        strand=loc.strand,
                        kmer_complexity=complexity,
                    )
                    m.block_length = max(m.ref_end - m.ref_start,
                                         m.query_end - m.query_start)
                    m.approx_matches = output.cpp_round(
                        m.nuc_identity * m.block_length / 100.0)
                    rows.append(m)
        return rows

    # ------------------------------------------------------------------
    def _allowed_mask(self, q: _Query) -> Optional[np.ndarray]:
        """Per-query admissible reference sequences
        (getSeedIntervalPoints, computeMap.hpp:887-894)."""
        p = self.p
        if not (p.skip_self or p.skip_prefix or p.lower_triangular):
            return None
        allowed = np.ones(self.idx.n_contigs, bool)
        if p.skip_self:
            allowed &= self._name_arr != q.name
        if p.lower_triangular:
            allowed &= q.counter > np.arange(self.idx.n_contigs)
        if p.skip_prefix:
            qg = self._get_ref_group(q.name)
            allowed &= self.ref_groups != qg
        return allowed

    def _fragments_of(self, queries: List[_Query]) -> List[_Fragment]:
        p = self.p
        frags: List[_Fragment] = []
        for qi, q in enumerate(queries):
            for (qs, qlen) in self._fragment_query(len(q.seq)):
                frags.append(_Fragment(
                    qi, qs, qlen, max(0, qlen - p.seg_length)))
        return frags

    def map_queries(self, queries: List[_Query]) -> List[
            Tuple[_Query, List[MappingResult]]]:
        """Map a batch of query sequences."""
        p = self.p
        frags = self._fragments_of(queries)
        all_wl0 = all(fr.window_len == 0 for fr in frags)
        if p.use_device_pipeline and all_wl0 and len(frags):
            rows_by_frag = self._run_fragments_device(queries, frags)
        else:
            rows_by_frag = self._run_fragments_host(queries, frags)
        return self._assemble(queries, frags, rows_by_frag)

    def _run_fragments_host(self, queries, frags):
        p = self.p
        sanitized = [kmers.sanitize(q.seq.encode("ascii"))
                     for q in queries]
        frag_seqs = [
            sanitized[fr.query_idx][fr.q_start:fr.q_start + fr.q_len]
            for fr in frags]
        h, st, cnt, cx = self._sketch_batch(frag_seqs)
        allowed = [self._allowed_mask(q) for q in queries]
        qg = [self._get_ref_group(q.name) if p.skip_prefix else -1
              for q in queries]
        out = []
        for fi, fr in enumerate(frags):
            q = queries[fr.query_idx]
            out.append(self._map_fragment(
                q, fr, h[fi], st[fi], cnt[fi], cx[fi],
                allowed[fr.query_idx], qg[fr.query_idx]))
        return out

    def _assemble(self, queries, frags, rows_by_frag):
        """Per-query post-processing (mapModule, computeMap.hpp:674-712)."""
        results: List[Tuple[_Query, List[MappingResult]]] = []
        fi = 0
        for qi, q in enumerate(queries):
            frag_rows = []
            while fi < len(frags) and frags[fi].query_idx == qi:
                frag_rows.append((frags[fi], rows_by_frag[fi]))
                fi += 1
            results.append((q, self._postprocess_query(q, frag_rows)))
        return results

    def _postprocess_query(self, q: _Query, frag_rows) -> \
            List[MappingResult]:
        """Merge / filter one query's fragment rows (computeMap.hpp:
        674-712). `frag_rows` is [(fragment, rows)] in fragment order."""
        p = self.p
        qlen = len(q.seq)
        unfiltered: List[MappingResult] = []
        split_mapping = p.split and qlen > p.seg_length
        for fr, rows in frag_rows:
            if split_mapping:
                for m in rows:
                    m.query_len = qlen
                    m.query_start = fr.q_start
                    m.query_end = fr.q_start + fr.q_len
            unfiltered.extend(rows)

        n_mappings = (p.num_mappings_for_short_sequence
                      if qlen < p.seg_length
                      else p.num_mappings_for_segment) - 1

        if split_mapping and p.merge_mappings:
            unfiltered = merge.merge_mappings_in_range(
                unfiltered, p.chain_gap)
            unfiltered = filters.filter_weak_mappings(
                unfiltered, p.block_length // p.seg_length)

        if p.filter_mode in (FILTER_MAP, FILTER_ONETOONE):
            unfiltered = self._filter_by_group(
                unfiltered, n_mappings, filter_ref=False)

        if p.filter_length_mismatches:
            unfiltered = filters.filter_false_high_identity(
                unfiltered, p.percentage_identity)

        filters.mapping_boundary_sanity_check(
            unfiltered, qlen, self.idx.lengths)
        return filters.sparsify_mappings(
            unfiltered, p.sparsity_hash_threshold)

    # --- device fragment pipeline ------------------------------------
    def _device_tables(self):
        if getattr(self, "_dev", None) is not None:
            return self._dev
        import jax
        import jax.numpy as jnp
        from ..parallel import mesh as mesh_mod
        p = self.p
        mh_table = np.ones(p.sketch_size + 1, np.int32)
        for sq in range(1, p.sketch_size + 1):
            mh_table[sq] = max(1, self._minimum_hits(sq))
        ct = (self.cutoff_table.astype(np.int32)
              if self.cutoff_table is not None else np.ones(2, np.int32))
        idx = self.idx

        # multi-device: pure data parallelism over fragments / L2 work
        # items, index replicated on every chip (SURVEY.md section 2.3;
        # the reference's pthread pool recast as SPMD)
        n_dev = len(jax.devices())
        if n_dev > 1:
            self._mesh = mesh_mod.make_mesh()
            self._shard_data = mesh_mod.shard_fragments(self._mesh)
            rep = mesh_mod.replicate(self._mesh)

            def put(x):
                return jax.device_put(jnp.asarray(x), rep)
        else:
            self._mesh = None
            self._shard_data = None
            put = jnp.asarray
        self._n_dev = n_dev

        self._sharded_idx = None
        if p.shard_index and self._mesh is not None:
            from ..parallel.sharded_index import build_sharded_index
            self._sharded_idx = build_sharded_index(idx, self._mesh)
        elif p.shard_index:
            logger.warning(
                "shard_index requested but only one device is visible; "
                "falling back to the replicated index")

        # pad every index array to a power-of-two length: the arrays'
        # sizes are part of the kernels' XLA shapes, so without padding
        # every new reference genome would recompile l1/l2 (tens of
        # seconds on tunneled backends). Pads are inert: UMAX hashes
        # never match queries, zero-length posting ranges gather
        # nothing, and interval pads sit beyond every w_hi bound.
        def pow2(n, lo=1024):
            return 1 << max(lo.bit_length() - 1, (max(n, 1) - 1)
                            .bit_length())

        def padded(a, n, fill):
            if len(a) >= n:
                return a
            out = np.full(n, fill, a.dtype)
            out[:len(a)] = a
            return out

        NC = pow2(self.idx.n_contigs, lo=8)
        self._n_contigs_padded = NC
        self._dev = {
            "min_hits_table": put(mh_table),
            "cutoff_table": put(ct),
            "ref_group": put(padded(
                self.ref_groups.astype(np.int32), NC, np.int32(0))),
        }
        if self._sharded_idx is None:
            # replicated layout (fits-one-chip default); in --shardIndex
            # mode NO O(index)-sized array is replicated — postings live
            # as hash-range shards and the interval table as
            # contig-range slabs (parallel/sharded_index.py)
            # index arrays pad to the finer {1,1.25,1.5,1.75}*2^k grid:
            # still a handful of kernel shapes per octave (so new
            # genomes reuse cached compiles) at <=14% HBM waste instead
            # of pow2's <=100% — at human scale that difference is GBs
            from ..index.builder import _grid_len
            U = _grid_len(len(idx.uniq_hashes), lo=1024)
            Pn = _grid_len(len(idx.post_seqid), lo=1024)
            M = _grid_len(len(idx.mi_rank), lo=1024)
            po = padded(idx.post_offsets.astype(np.int32), U + 1,
                        np.int32(len(idx.post_seqid)))
            # No materialized mi_key on device: the l1 kernel
            # synthesizes (seqid << 32 | wpos) probe keys from the
            # seqid/wpos columns it already holds (mapdev.
            # l2_slice_bounds) — 2.1 GB of HBM back at human scale.
            # The HOST_SLICE_BOUNDS escape hatch (bounds via
            # np.searchsorted on the host after the l1 fetch) remains
            # for A/B: ~35k lookups/batch, negligible.
            import os as _os
            self._mi_key_host = None
            if _os.environ.get("MASHMAP_TPU_HOST_SLICE_BOUNDS") == "1":
                self._mi_key_host = padded(
                    self.mi_key, M, np.int64(0x7FFFFFFFFFFFFFFF))
            self._dev.update({
                "uniq_hashes": put(padded(
                    idx.uniq_hashes, U, np.uint64(0xFFFFFFFFFFFFFFFF))),
                "post_offsets": put(po),
                "post_seqid": put(padded(idx.post_seqid, Pn,
                                         np.int32(0))),
                "post_wpos": put(padded(idx.post_wpos, Pn, np.int32(0))),
                "post_wend": put(padded(idx.post_wend, Pn, np.int32(0))),
                "is_frequent": put(padded(idx.is_frequent, U, False)),
                # UPLOAD ORDER MATTERS on slow links: device_put is
                # async and transfers drain roughly in put order, so
                # the l1 kernel's dependencies (above, plus
                # mi_seqid/mi_wpos for the slice bounds) go first —
                # batch 1's l1 then starts while the l2-only columns
                # (mi_rank/wend/strand, ~40% of the index bytes at
                # human scale) are still in flight.
                #
                # pad seqid = INT32_MAX: synthesized pad keys must sort
                # after every real (seqid << 32 | wpos) key
                "mi_seqid": put(padded(idx.mi_seqid, M,
                                       np.int32(2**31 - 1))),
                "mi_wpos": put(padded(idx.mi_wpos, M, np.int32(0))),
                # rank domain (int32): u64 is emulated on this TPU, so
                # the L2 compare cubes/gathers halve; pad rows are
                # masked by e_valid in the kernel, value irrelevant
                "mi_rank": put(padded(idx.mi_rank, M, np.int32(0))),
                "mi_wend": put(padded(idx.mi_wend, M, np.int32(0))),
                "mi_strand": put(padded(idx.mi_strand, M, np.int8(0))),
            })
        return self._dev

    def _put_batch(self, x):
        """Place a batch-axis array: sharded over the mesh if present."""
        import jax
        import jax.numpy as jnp
        if getattr(self, "_shard_data", None) is not None:
            return jax.device_put(np.asarray(x), self._shard_data)
        return jnp.asarray(x)

    def _l1cfg(self):
        from ..kernels.mapdev import L1Config
        p = self.p
        if getattr(self, "_cfg", None) is not None:
            return self._cfg
        # n_groups rounds up to a power of two: it is a static kernel
        # parameter, and per-genome values would force recompiles
        if p.skip_prefix:
            ng = 1 << max(3, int(self.ref_groups.max() + 1).bit_length())
        else:
            ng = 8
        self._cfg = L1Config(
            k=p.kmer_size, s=p.sketch_size, seg_length=p.seg_length,
            p_cap=p.l1_postings_cap, c_cap=p.l1_candidates_cap,
            t_cap=p.l2_entries_cap, table_scale=self.table_scale,
            n_groups=ng)
        return self._cfg

    def _run_fragments_device(self, queries, frags):
        """Batched device pipeline: l1_step + l2_step kernels.

        Fragments whose postings/candidates/L2 slices exceed the static
        caps fall back to the bit-identical host path. This synchronous
        wrapper drives the staged batch methods that `run`'s pipelined
        path overlaps across batches.
        """
        for q in queries:
            if q.u8 is None:
                q.u8 = kmers.sanitize(q.seq.encode("ascii"))
                q.allowed = self._allowed_mask(q)
                q.qg = (self._get_ref_group(q.name)
                        if self.p.skip_prefix else -1)
        for fr in frags:
            fr.q = queries[fr.query_idx]
        ctx = self._dispatch_batch(frags)
        self._collect_l1(ctx)
        self._collect_l2(ctx)
        return [rows for _, rows in self._post_batch(ctx)]

    def _dispatch_batch(self, frags) -> "_Batch":
        """Stage 1: host matrix prep + l1_step dispatch (async)."""
        import jax
        import jax.numpy as jnp
        from ..kernels.mapdev import l1_step

        p = self.p
        _t = [time.perf_counter()]

        def _mark(label):
            now = time.perf_counter()
            logger.debug("map phase %-13s %.2fs", label, now - _t[0])
            _t[0] = now

        dev = self._device_tables()
        cfg = self._l1cfg()
        B = len(frags)
        L = p.seg_length
        mat = np.full((B, L), ord("N"), np.uint8)
        for i, fr in enumerate(frags):
            mat[i, :fr.q_len] = fr.q.u8[fr.q_start:fr.q_start + fr.q_len]
        NC = self._n_contigs_padded
        allowed = np.zeros((B, NC), bool)
        for i, fr in enumerate(frags):
            qa = fr.q.allowed
            if qa is None:
                allowed[i, :self.idx.n_contigs] = True
            else:
                allowed[i, :self.idx.n_contigs] = qa

        # pad batch to a fixed floor, then to a {2^k, 1.5*2^k} size grid:
        # few distinct l1_step XLA shapes (compiles are multi-second and
        # reused across batches/processes) without paying up to 2x
        # padding waste; multi-device meshes also need divisibility by
        # the device count. A trailing partial batch (the stream's tail)
        # drops to a quarter-width program when it fits — l1_step cost
        # is ~linear in rows, so a 176-fragment tail in a 1024-row batch
        # would pay ~6x its real work.
        Bp = _batch_pad_rows(B, p.batch_fragments, self._n_dev)
        matp = mat
        allowedp = allowed
        if Bp > B:
            matp = np.concatenate(
                [mat, np.full((Bp - B, L), ord("N"), np.uint8)])
            allowedp = np.concatenate(
                [allowed, np.zeros((Bp - B, allowed.shape[1]), bool)])

        import jax
        if self._sharded_idx is not None:
            from ..parallel.sharded_index import l1_step_sharded
            si = self._sharded_idx
            rep_put = (lambda x: jax.device_put(
                np.asarray(x), jax.sharding.NamedSharding(
                    self._mesh, jax.sharding.PartitionSpec())))
            out, qh_dev, qs_dev = l1_step_sharded(
                rep_put(matp), si.uniq, si.offsets, si.seqid, si.wpos,
                si.wend, si.frequent, dev["min_hits_table"],
                dev["cutoff_table"], rep_put(allowedp),
                dev["ref_group"], si.mi_key, si.mi_row0, si.key_bounds,
                cfg, self._mesh, si.p_shard)
        else:
            out, qh_dev, qs_dev = l1_step(
                self._put_batch(matp), dev["uniq_hashes"],
                dev["post_offsets"],
                dev["post_seqid"], dev["post_wpos"], dev["post_wend"],
                dev["is_frequent"], dev["min_hits_table"],
                dev["cutoff_table"],
                self._put_batch(allowedp), dev["ref_group"],
                dev["mi_seqid"], dev["mi_wpos"], cfg)
        _start_host_copy(out)
        _mark("l1-dispatch")
        return _Batch(frags=frags, mat=mat, out=out,
                      qh_dev=qh_dev, qs_dev=qs_dev)

    def _collect_l1(self, ctx: "_Batch"):
        """Stage 2: fetch l1 meta, derive L2 work, dispatch l2 chunks.

        The fetch overlaps with whatever is queued behind this batch's
        l1_step on the device (later batches' l1, earlier l2 chunks).
        """
        import jax
        import jax.numpy as jnp
        from ..kernels.mapdev import unpack_l1_meta, l2_step

        p = self.p
        dev = self._dev
        cfg = self._l1cfg()
        frags = ctx.frags
        B = len(frags)
        L = p.seg_length
        qh_dev, qs_dev = ctx.qh_dev, ctx.qs_dev
        _t = [time.perf_counter()]

        def _mark(label):
            now = time.perf_counter()
            logger.debug("map phase %-13s %.2fs", label, now - _t[0])
            _t[0] = now

        # ONE device->host transfer per batch: on tunneled TPU backends
        # every fetch pays ~300ms of latency, so the kernel packs all
        # outputs into a single i32 buffer.
        if _SYNC_MARKS:       # split compute-done vs transfer time
            jax.device_get(ctx.out[:1, :1])
            _mark("l1-compute")
        o = unpack_l1_meta(jax.device_get(ctx.out)[:B], cfg.c_cap)
        ctx.out = None
        ctx.o = o
        if getattr(self, "_mi_key_host", None) is not None:
            # MASHMAP_TPU_HOST_SLICE_BOUNDS=1: mi_key stayed on the
            # host; redo l2_slice_bounds (mapdev.py) with np.searchsorted
            key = self._mi_key_host
            seq64 = o["cand_seq"].astype(np.int64) << 32
            lo_k = seq64 | np.maximum(
                0, o["cand_start"].astype(np.int64) - p.seg_length - 1)
            mid_k = seq64 | np.maximum(
                0, o["cand_start"]).astype(np.int64)
            hi_k = seq64 | (o["cand_end"].astype(np.int64) + 1)
            o = dict(o)
            o["cand_lo"] = np.searchsorted(key, lo_k.ravel()).reshape(
                lo_k.shape).astype(np.int64)
            o["cand_mid"] = np.searchsorted(key, mid_k.ravel()).reshape(
                mid_k.shape).astype(np.int64)
            o["cand_hi"] = np.searchsorted(key, hi_k.ravel()).reshape(
                hi_k.shape).astype(np.int64)
            ctx.o = o
        _mark("l1-fetch")

        # complexity rescale for 'N'-padded fragments
        cx = np.array([
            float(o["complexity"][i]) * (L - p.kmer_size + 1)
            / max(1, frags[i].q_len - p.kmer_size + 1)
            for i in range(B)])
        ctx.cx = cx

        # L2 work items from device candidates (slice bounds were
        # computed inside l1_step — no host searchsorted per candidate)
        work = []
        host_frags = set()
        for i, fr in enumerate(frags):
            if o["overflow"][i]:
                host_frags.add(i)
                self.path_stats["host_frags"] += 1
                continue
            if int(o["s_q"][i]) == 0 \
                    or cx[i] < p.kmer_complexity_threshold:
                continue
            for j in range(int(o["n_cand"][i])):
                work.append((i, j, int(o["cand_lo"][i, j]),
                             int(o["cand_mid"][i, j]),
                             int(o["cand_hi"][i, j])))
        ctx.host_frags = host_frags

        # bucket work items by interval-slice length; W*T stays constant
        # so device memory and compile shapes are bounded (3 shapes
        # total; the kernel's event axis is 2T, hence the halving)
        AREA = p.l2_batch * p.l2_entries_cap // 2
        from ..parallel.sharded_index import L2_T_MAX
        # ceiling tied to the sharded-index slab halo: a slice must fit
        # wholly inside its owner's slab. l2_step cost is ~linear in
        # dispatched area (W*T), so the replicated path uses a finer T
        # ladder (fewer pad columns per item) at the price of one more
        # compiled shape; the sharded path keeps the coarse ladder (its
        # per-owner routing multiplies shapes by the shard count).
        if self._sharded_idx is not None:
            T_BUCKETS = (512, 2048, L2_T_MAX)
        else:
            T_BUCKETS = (512, 1024, 2048, L2_T_MAX)
        t_max = T_BUCKETS[-1]
        buckets: dict[int, list] = {t: [] for t in T_BUCKETS}
        host_l2_set = set()
        for w in work:
            span = w[4] - w[2]
            for t in T_BUCKETS:
                if span <= t:
                    buckets[t].append(w)
                    self.path_stats["l2_buckets"][t] = \
                        self.path_stats["l2_buckets"].get(t, 0) + 1
                    break
            else:
                host_l2_set.add((w[0], w[1]))
                self.path_stats["host_l2"] += 1
        # dispatch ALL chunks first (async); every chunk's packed run
        # buffer has the same width, so they concatenate device-side
        # into ONE fetch (~300ms latency each on tunneled backends)
        pending = []
        if self._sharded_idx is not None:
            # contig-range-sharded interval table: work items route to
            # the shard whose slab holds their [lo, hi) slice (bounds
            # rebased to slab-local rows), one stacked shard_map call
            # per round — no replicated mi arrays anywhere
            si = self._sharded_idx
            from ..parallel.sharded_index import l2_step_sharded
            from jax.sharding import NamedSharding, PartitionSpec
            n_sh = si.n_shards
            bnds = si.mi_bounds
            shp = NamedSharding(self._mesh, PartitionSpec("data"))
            for T, todo in buckets.items():
                W_STEP = max(8, AREA // T)
                by_owner = [[] for _ in range(n_sh)]
                for w in todo:
                    d = int(np.searchsorted(bnds, w[2], side="right")) - 1
                    by_owner[min(max(d, 0), n_sh - 1)].append(w)
                rounds = max((len(x) + W_STEP - 1) // W_STEP
                             for x in by_owner)
                for r in range(rounds):
                    Wp = W_STEP
                    w_lo = np.zeros((n_sh, Wp), np.int32)
                    w_mid = np.zeros((n_sh, Wp), np.int32)
                    w_hi = np.zeros((n_sh, Wp), np.int32)
                    w_seq = np.zeros((n_sh, Wp), np.int32)
                    fidx = np.zeros((n_sh, Wp), np.int32)
                    sqv = np.ones((n_sh, Wp), np.int32)
                    chunk = [None] * (n_sh * Wp)
                    for d in range(n_sh):
                        row0 = int(bnds[d])
                        items = by_owner[d][r * W_STEP:(r + 1) * W_STEP]
                        for rr, (i, j, lo, mid, hi) in enumerate(items):
                            w_lo[d, rr] = lo - row0
                            w_mid[d, rr] = mid - row0
                            w_hi[d, rr] = hi - row0
                            w_seq[d, rr] = int(o["cand_seq"][i, j])
                            fidx[d, rr] = i
                            sqv[d, rr] = o["s_q"][i]
                            chunk[d * Wp + rr] = (i, j, lo, mid, hi)
                    # sketches never visit the host: gather rows from
                    # l1's device-resident outputs by fragment index
                    fi = jnp.asarray(fidx.ravel())
                    qh = jax.device_put(jnp.take(qh_dev, fi, axis=0)
                                        .reshape(n_sh, Wp, -1), shp)
                    qs = jax.device_put(jnp.take(qs_dev, fi, axis=0)
                                        .reshape(n_sh, Wp, -1), shp)
                    buf = l2_step_sharded(
                        *(jax.device_put(a, shp) for a in
                          (w_lo, w_mid, w_hi, w_seq)),
                        qh, qs, jax.device_put(sqv, shp),
                        si.mi_rank, si.mi_wpos, si.mi_wend,
                        si.mi_strand, si.mi_seqid, T, p.sketch_size,
                        self._mesh)
                    pending.append((chunk, buf.reshape(n_sh * Wp, -1)))
            buckets = {}
        for T, todo in buckets.items():
            W_STEP = max(8, AREA // T)
            if W_STEP % self._n_dev:
                W_STEP += self._n_dev - W_STEP % self._n_dev
            # a trailing partial chunk drops to a quarter-width program
            # when it fits: area cost is linear, so a 100-item tail in a
            # 1024-row chunk would pay 10x its real work
            W_SMALL = max(8, W_STEP // 4)
            if W_SMALL % self._n_dev:
                W_SMALL += self._n_dev - W_SMALL % self._n_dev
            for w0 in range(0, len(todo), W_STEP):
                chunk = todo[w0:w0 + W_STEP]
                Wp = W_SMALL if len(chunk) <= W_SMALL else W_STEP
                w_lo = np.zeros(Wp, np.int32)
                w_mid = np.zeros(Wp, np.int32)
                w_hi = np.zeros(Wp, np.int32)
                w_seq = np.zeros(Wp, np.int32)
                fidx = np.zeros(Wp, np.int32)
                sqv = np.ones(Wp, np.int32)
                for r, (i, j, lo, mid, hi) in enumerate(chunk):
                    w_lo[r], w_mid[r], w_hi[r] = lo, mid, hi
                    w_seq[r] = int(o["cand_seq"][i, j])
                    fidx[r] = i
                    sqv[r] = o["s_q"][i]
                # sketches never visit the host: device-side row gather
                fi = jnp.asarray(fidx)
                qh = jnp.take(qh_dev, fi, axis=0)
                qs = jnp.take(qs_dev, fi, axis=0)
                if self._shard_data is not None:
                    args = tuple(self._put_batch(a) for a in (
                        w_lo, w_mid, w_hi, w_seq)) + (
                        self._put_batch(qh), self._put_batch(qs),
                        self._put_batch(sqv))
                else:
                    args = jax.device_put(
                        (w_lo, w_mid, w_hi, w_seq)) + (qh, qs,
                                                       jnp.asarray(sqv))
                buf = l2_step(*args,
                              dev["mi_rank"], dev["mi_wpos"],
                              dev["mi_wend"], dev["mi_strand"],
                              dev["mi_seqid"], T, p.sketch_size)
                pending.append((chunk, buf))
        # concatenate all run buffers device-side into ONE transfer and
        # start the copy now — by the time _collect_l2 runs (after the
        # next batch's l1 was dispatched) the bytes are usually here
        if pending:
            ctx.pcat = (jnp.concatenate([b for _, b in pending], axis=0)
                        if len(pending) > 1 else pending[0][1])
            _start_host_copy(ctx.pcat)
        ctx.pending = [(chunk, int(b.shape[0])) for chunk, b in pending]
        # host-replay sketch rows: dispatch the tiny gather now too
        need = sorted({i for (i, _j) in host_l2_set})
        if need:
            ctx.qh_pick = _gather_sketch_rows(qh_dev, qs_dev, need)
            _start_host_copy(ctx.qh_pick[0])
            _start_host_copy(ctx.qh_pick[1])
        ctx.need0 = need
        if logger.isEnabledFor(logging.DEBUG):
            spans = np.array([w[4] - w[2] for w in work], np.int64)
            hist = {t: int((spans <= t).sum()) for t in
                    (64, 128, 256, 512, 1024, 2048, 4096, 8192)}
            logger.debug("l2 work: %d items -> %d chunks (host_l2 %d, "
                         "host_frags %d); span cdf %s", len(work),
                         len(pending), len(host_l2_set),
                         len(host_frags), hist)
        _mark("l2-dispatch")
        ctx.host_l2_set = host_l2_set
        ctx.stage = 1

    def _collect_l2(self, ctx: "_Batch"):
        """Stage 3: one fetch of all l2 run buffers + host-replay rows."""
        import jax
        import jax.numpy as jnp
        from ..kernels.mapdev import unpack_l2_runs

        p = self.p
        o = ctx.o
        pending = ctx.pending
        host_l2_set = ctx.host_l2_set
        loci_by = {}
        _t = [time.perf_counter()]
        if pending and _SYNC_MARKS:
            jax.device_get(ctx.pcat[:1, :1])
            logger.debug("map phase %-13s %.2fs (%d chunks, %d rows)",
                         "l2-compute", time.perf_counter() - _t[0],
                         len(pending), int(ctx.pcat.shape[0]))
            _t[0] = time.perf_counter()
        if pending:
            all_runs = jax.device_get(ctx.pcat)
            ctx.pcat = None
            logger.debug("map phase %-13s %.2fs", "l2-fetch",
                         time.perf_counter() - _t[0])
        row0 = 0
        for chunk, nrows in pending:
            n_runs, best, r_ovf, starts, ends, strands = \
                unpack_l2_runs(all_runs[row0:row0 + nrows])
            row0 += nrows
            for r, item in enumerate(chunk):
                if item is None:      # sharded-routing pad row
                    continue
                (i, j, lo, mid, hi) = item
                if r_ovf[r]:
                    host_l2_set.add((i, j))
                    continue
                loci_by[(i, j)] = l2_mod.loci_from_runs(
                    n_runs[r], best[r], starts[r], ends[r],
                    strands[r], int(o["cand_seq"][i, j]),
                    p.seg_length)
        ctx.pending = None
        ctx.loci_by = loci_by

        # Sketch rows are fetched ONLY for fragments whose L2 replays on
        # the host (one tiny gather+fetch; usually none). Rows known at
        # dispatch time were pre-gathered (+async-copied) in _collect_l1;
        # fragments whose L2 overflowed only at collect time need a
        # second tiny fetch here.
        qh_host = {}
        if ctx.need0:
            qh_rows, qs_rows = jax.device_get(ctx.qh_pick)
            qh_host = {i: (qh_rows[t], qs_rows[t])
                       for t, i in enumerate(ctx.need0)}
            ctx.qh_pick = None
        late = sorted({i for (i, _j) in host_l2_set} - set(ctx.need0))
        if late:
            qh_rows, qs_rows = jax.device_get(
                _gather_sketch_rows(ctx.qh_dev, ctx.qs_dev, late))
            qh_host.update({i: (qh_rows[t], qs_rows[t])
                            for t, i in enumerate(late)})
        ctx.qh_host = qh_host
        ctx.qh_dev = ctx.qs_dev = None

    def _post_batch(self, ctx: "_Batch"):
        """Stage 4: per-fragment row assembly with exact pruning
        semantics. Returns [(fragment, rows)] in batch order."""
        from ..kernels.sketch import sketch_sequence_py

        p = self.p
        o = ctx.o
        cx = ctx.cx
        frags = ctx.frags
        mat = ctx.mat
        host_frags = ctx.host_frags
        host_l2_set = ctx.host_l2_set
        loci_by = ctx.loci_by
        qh_host = ctx.qh_host
        _t = [time.perf_counter()]
        out = []
        for i, fr in enumerate(frags):
            q = fr.q
            if i in host_frags:
                oh, ostr, ocnt, ocx = sketch_sequence_py(
                    mat[i, :fr.q_len], p.kmer_size, p.sketch_size)
                out.append((fr, self._map_fragment(
                    q, fr, oh, ostr, ocnt, ocx, q.allowed, q.qg)))
                continue
            s_q = int(o["s_q"][i])
            if s_q == 0 or cx[i] < p.kmer_complexity_threshold:
                out.append((fr, []))
                continue
            if i in qh_host:
                hashes = qh_host[i][0][:s_q]
                strands = qh_host[i][1][:s_q].astype(np.int64)
            else:       # only consumed on host-L2 replay, never here
                hashes = strands = None
            cands = [
                l1_mod.L1Candidate(
                    int(o["cand_seq"][i, j]), int(o["cand_start"][i, j]),
                    int(o["cand_end"][i, j]), int(o["cand_inter"][i, j]))
                for j in range(int(o["n_cand"][i]))]
            cand_j = {id(c): j for j, c in enumerate(cands)}

            def loci_fn(c, _i=i, _cand_j=cand_j, _h=hashes, _s=strands):
                j = _cand_j[id(c)]
                if (_i, j) in host_l2_set:
                    return l2_mod.l2_mapped_regions(
                        self.idx, self.mi_key, _h, _s, c.seq_id,
                        c.range_start, c.range_end, p.seg_length, 0,
                        q_are_codes=True)
                return loci_by.get((_i, j), [])

            if p.skip_prefix:
                rows = []
                groups: dict[int, list] = {}
                for c in cands:
                    groups.setdefault(
                        int(self.ref_groups[c.seq_id]), []).append(c)
                for gv in sorted(groups):
                    rows.extend(self._do_l2(
                        q, fr, hashes, strands, s_q, cx[i],
                        groups[gv], loci_fn))
            else:
                rows = self._do_l2(q, fr, hashes, strands, s_q, cx[i],
                                   cands, loci_fn)
            rows.sort(key=lambda m: (m.ref_seq_id, m.ref_start))
            out.append((fr, rows))
        logger.debug("map phase %-13s %.2fs", "host-post",
                     time.perf_counter() - _t[0])
        return out

    def _filter_by_group(self, rows: List[MappingResult], n_mappings: int,
                         filter_ref: bool) -> List[MappingResult]:
        """filterByGroup (computeMap.hpp:504-561)."""
        p = self.p
        rows = sorted(rows, key=lambda m: (m.ref_seq_id, m.ref_start))
        out: List[MappingResult] = []
        i = 0
        while i < len(rows):
            if p.skip_prefix:
                g = self.ref_groups[rows[i].ref_seq_id]
                j = i
                while j < len(rows) and \
                        self.ref_groups[rows[j].ref_seq_id] == g:
                    j += 1
            else:
                j = len(rows)
            sub = sorted(rows[i:j], key=lambda m: (
                m.query_start, m.ref_seq_id, m.ref_start))
            if filter_ref:
                filters.filter_by_ref_axis(sub, n_mappings,
                                           self.idx.lengths)
            else:
                filters.filter_by_query_axis(sub, n_mappings)
            out.extend(sub)
            i = j
        out.sort(key=lambda m: (m.query_start, m.ref_seq_id, m.ref_start))
        return out

    # ------------------------------------------------------------------
    def prewarm_async(self) -> None:
        """AOT-compile the expected l1/l2 kernel shapes on a daemon
        thread, so cold-start compiles overlap query-file reading and
        the first batches' host prep instead of serializing at first
        dispatch (each kernel compile is tens of seconds on tunneled
        backends). Results land in jax's persistent compile cache; the
        later jitted calls trace and load instead of compiling.
        Single-device replicated path only (sharded lowerings differ).
        """
        import os
        import threading
        if getattr(self, "_warmed", False):
            return
        self._warmed = True
        if os.environ.get("MASHMAP_TPU_PREWARM", "1") == "0":
            return
        dev = self._device_tables()     # main thread: device puts
        if self._mesh is not None or self._sharded_idx is not None:
            return
        cfg = self._l1cfg()
        p = self.p

        stop = threading.Event()

        def _compile_jobs():
            import jax
            import jax.numpy as jnp
            from ..kernels.mapdev import l1_step, l2_step
            from ..parallel.sharded_index import L2_T_MAX
            S = jax.ShapeDtypeStruct
            # mirror _dispatch_batch's padding: full batches land
            # on the {2^k, 1.5*2^k} grid floored at batch_fragments
            def _dev_round(n):
                # _collect_l1 rounds l2 chunk widths up to a multiple
                # of the device count; prewarm must mirror it or multi-
                # device runs recompile the tail on the fly
                return n + (-n) % self._n_dev

            # batch shapes through the SAME helper _dispatch_batch uses
            Bp = _batch_pad_rows(p.batch_fragments, p.batch_fragments,
                                 self._n_dev)
            b_small = _batch_pad_rows(1, p.batch_fragments, self._n_dev)
            L = p.seg_length
            NC = self._n_contigs_padded
            def l1_args(Bn):
                return (S((Bn, L), jnp.uint8),) + tuple(
                    S(x.shape, x.dtype) for x in (
                        dev["uniq_hashes"], dev["post_offsets"],
                        dev["post_seqid"], dev["post_wpos"],
                        dev["post_wend"], dev["is_frequent"],
                        dev["min_hits_table"], dev["cutoff_table"])) + (
                    S((Bn, NC), jnp.bool_),
                    S(dev["ref_group"].shape, dev["ref_group"].dtype),
                    S(dev["mi_seqid"].shape, dev["mi_seqid"].dtype),
                    S(dev["mi_wpos"].shape, dev["mi_wpos"].dtype))
            # keys carry the FULL arg shapes: two indexes can share
            # (Bp, L, NC, cfg) but differ in padded table sizes, which
            # change the compiled executable
            jobs = [(("l1", l1_args(Bp), cfg),
                     lambda a=l1_args(Bp): l1_step.lower(
                         *a, cfg=cfg).compile()),
                    # the quarter-width tail batch (_dispatch_batch)
                    (("l1", l1_args(b_small), cfg),
                     lambda a=l1_args(b_small):
                         l1_step.lower(*a, cfg=cfg).compile())]
            AREA = p.l2_batch * p.l2_entries_cap // 2
            s = p.sketch_size
            mi = tuple(S(dev[k].shape, dev[k].dtype) for k in (
                "mi_rank", "mi_wpos", "mi_wend", "mi_strand",
                "mi_seqid"))
            # ONLY the shapes the first batches certainly hit: l2
            # full widths for the two buckets that dominate real span
            # mixes. Prewarming every bucket+tail backfired on this
            # backend — compile RPCs throttle concurrent execution, the
            # run epilogue stops the thread after its in-flight job,
            # and the leftover jobs then burned INSIDE later runs
            # (bench_extra timed runs ran 7x slow). Rare buckets/tails
            # compile on first hit, once ever (persistent cache).
            pairs = []
            for T in (512, 1024):
                W = _dev_round(max(8, AREA // T))
                pairs.append((T, W))
            for T, W in pairs:
                wargs = (S((W,), jnp.int32),) * 4 + (
                    S((W, s), jnp.int32), S((W, s), jnp.int8),
                    S((W,), jnp.int32)) + mi
                jobs.append((("l2", T, W, s, mi),
                             lambda wargs=wargs, T=T: l2_step.lower(
                                 *wargs, t_cap=T, s=s).compile()))
            return jobs

        # MASHMAP_TPU_PREWARM_THREADS > 1 compiles the independent
        # kernels concurrently — pays off iff the backend's compile
        # service accepts parallel requests (A/B on the tunnel).
        n_warm = int(os.environ.get("MASHMAP_TPU_PREWARM_THREADS", "1"))

        def warm():
            try:
                # AOT .lower().compile() does NOT share the jitted-call
                # cache: without this memo every map_files() in a
                # process re-deserializes ~10 cached executables on this
                # thread (~0.5-2s each on the tunnel), contending with
                # the live run's dispatches — seen as 4-5s "steady"
                # bench runs that drop to ~3s once the thread goes idle
                jobs = [(key, j) for key, j in _compile_jobs()
                        if key not in _PREWARMED]
                if n_warm > 1:
                    from concurrent.futures import ThreadPoolExecutor
                    with ThreadPoolExecutor(max_workers=n_warm) as wex:
                        fs = [wex.submit(j) for _, j in jobs]
                        for f in fs:
                            f.result()
                    _PREWARMED.update(key for key, _ in jobs)
                else:
                    for key, j in jobs:
                        if stop.is_set():
                            return
                        j()
                        _PREWARMED.add(key)
                logger.debug("kernel prewarm complete")
            except Exception as e:      # noqa: BLE001 — best-effort
                logger.debug("kernel prewarm skipped: %s", e)

        # NOT a daemon thread: the interpreter killing a thread inside
        # an XLA compile aborts the process (SIGABRT at teardown).
        # finish_prewarm (run's epilogue) asks it to stop after the
        # in-flight compile and joins.
        t = threading.Thread(target=warm, daemon=False)
        t.start()
        self._warm_thread = t
        self._warm_stop = stop

    def finish_prewarm(self) -> None:
        t = getattr(self, "_warm_thread", None)
        if t is not None:
            self._warm_stop.set()
            t.join()
            self._warm_thread = None

    def _run_pipelined(self, queries, out: IO[str], meter) -> None:
        """Streaming, depth-2 pipelined device mapping.

        The synchronous path serializes four ~300ms tunnel fetch
        latencies per batch (l1 meta, l2 runs) with device compute and
        host work. Here fragments stream into fixed-size batches and at
        most two batches are in flight: while batch N's l1 meta travels
        to the host, batch N+1's host prep + l1 dispatch and batch
        N-1's l2 collect proceed, so device compute, transfers, and
        host post-processing overlap. The reference overlaps I/O and
        compute with a thread pool (computeMap.hpp:607-637); this is
        the single-host-thread equivalent driven by async dispatch.

        Fragments of one query may land in different batches (mandatory
        for chromosome-scale queries); per-query rows accumulate on the
        _Query and each query finalizes — merge/filter/emit, in input
        order — once its last fragment is delivered.
        """
        import collections
        p = self.p
        BF = p.batch_fragments
        inflight: collections.deque = collections.deque()
        finalq: collections.deque = collections.deque()
        cur: list = []

        def credit(q, fr):
            if meter is None:
                return
            inc = min(fr.q_len, len(q.seq) - q.counted)
            if inc > 0:
                meter.increment(inc)
                q.counted += inc

        def finalize_ready():
            while finalq and finalq[0].done == finalq[0].n_frags:
                q = finalq.popleft()
                rows = self._postprocess_query(q, q.rows)
                self._emit(q, rows, out)
                q.rows = q.u8 = q.allowed = None

        def complete(ctx):
            for fr, rows in self._post_batch(ctx):
                q = fr.q
                q.rows[fr.ord] = (fr, rows)
                q.done += 1
                credit(q, fr)
            finalize_ready()

        def submit():
            nonlocal cur
            if not cur:
                return
            inflight.append(self._dispatch_batch(cur))
            cur = []
            # steady state holds [N-1 (l2 in flight), N (l1 in flight)]:
            # every blocking fetch below has the next batch's device
            # work already queued behind it
            if len(inflight) >= 2 and inflight[-2].stage == 0:
                self._collect_l1(inflight[-2])
            while len(inflight) >= 3:
                b = inflight[0]
                if b.stage == 0:
                    self._collect_l1(b)
                self._collect_l2(b)
                complete(inflight.popleft())

        for q in queries:
            q.u8 = kmers.sanitize(q.seq.encode("ascii"))
            q.allowed = self._allowed_mask(q)
            q.qg = (self._get_ref_group(q.name)
                    if p.skip_prefix else -1)
            fl = self._fragment_query(len(q.seq))
            q.n_frags = len(fl)
            q.rows = [None] * len(fl)
            finalq.append(q)
            for o_, (qs, qlen) in enumerate(fl):
                cur.append(_Fragment(
                    0, qs, qlen, max(0, qlen - p.seg_length),
                    q=q, ord=o_))
                if len(cur) == BF:
                    submit()
        submit()
        while inflight:
            b = inflight.popleft()
            if b.stage == 0:
                self._collect_l1(b)
            self._collect_l2(b)
            complete(b)
        assert not finalq, "pipelined path left unfinished queries"

    def run(self, query_files: Sequence[str], out: IO[str],
            progress: Optional[bool] = None, reader=None) -> None:
        """Full mapQuery equivalent: stream files, map, write output.

        ``reader`` (io.fasta.PrefetchReader) supplies the same
        (name, seq) stream as iterating ``query_files`` in order, but
        from a thread that started during the index build."""
        from ..io import for_each_seq_in_file, total_seq_stats
        from ..progress import ProgressMeter
        from ..parallel import distributed
        p = self.p
        t0 = time.time()
        self._dist = distributed.context()

        if progress is None:
            # the reference always paints its meter to stderr
            # (progress.hpp:25-38); --noProgress is the opt-out
            progress = not p.no_progress
        meter = None
        if progress:
            # reference sizes its meter from the .fai / a pre-scan
            # (computeMap.hpp:279-304). For non-tty stderr (piped /
            # captured) skip the pre-scan unless .fai files make sizing
            # free; the meter then runs unsized.
            import os as _os
            if (sys.stderr.isatty()
                    or all(_os.path.exists(f + ".fai")
                           for f in query_files)):
                _, total_bp = total_seq_stats(query_files)
            else:
                total_bp = 0
            meter = ProgressMeter(
                total_bp, "[mashmap-tpu::map] mapped")

        def name_seq_stream():
            if reader is not None:
                yield from reader
            else:
                for fname in query_files:
                    yield from for_each_seq_in_file(fname)

        def owned_queries():
            """Stream owned queries in file order, maintaining the
            global counters / one-to-one metadata / meter credit for
            skipped and foreign-process queries."""
            for name, seq in name_seq_stream():
                qlen = len(seq)
                if p.filter_mode == FILTER_ONETOONE:
                    self.qmetadata.append((name, qlen))
                if qlen >= p.kmer_size:
                    self.total_reads_picked += 1
                    if self._dist is not None and not \
                            self._dist.owns_query(
                                self.total_seq_counter):
                        # another process maps this query; count its
                        # bp so the meter tracks global progress
                        if meter is not None:
                            meter.increment(qlen)
                    else:
                        yield _Query(name, seq,
                                     self.total_seq_counter)
                else:
                    logger.warning(
                        "read %s of %dbp is not long enough for "
                        "mapping", name, qlen)
                self.total_seq_counter += 1
                self.total_bp += qlen

        if p.use_device_pipeline and p.split:
            self.prewarm_async()
            try:
                self._run_pipelined(owned_queries(), out, meter)
            finally:
                self.finish_prewarm()
        else:
            pending: List[_Query] = []
            pending_frags = 0

            def flush():
                nonlocal pending, pending_frags
                for qq, rows in self.map_queries(pending):
                    self._emit(qq, rows, out)
                    if meter is not None:
                        meter.increment(len(qq.seq))
                pending = []
                pending_frags = 0

            for q in owned_queries():
                pending.append(q)
                pending_frags += max(1, len(q.seq) // p.seg_length)
                if pending_frags >= p.batch_fragments:
                    flush()
            if pending:
                flush()
        if meter is not None:
            meter.finish()

        if p.filter_mode == FILTER_ONETOONE:
            if self._dist is not None:
                rows_path = self._dist.part_path(p.out_file_name) + ".rows"
                distributed.dump_rows(rows_path, self._buffered)
                distributed.barrier("one-to-one-rows")
                if self._dist.is_primary:
                    self._buffered = distributed.gather_rows(
                        p.out_file_name, self._dist)
                    self._finish_one_to_one(out)
            else:
                self._finish_one_to_one(out)

        logger.info(
            "count of mapped reads = %d, reads qualified for mapping = %d, "
            "total input reads = %d, total input bp = %d [%.1fs]",
            self.total_reads_mapped, self.total_reads_picked,
            self.total_seq_counter, self.total_bp, time.time() - t0)

    def _emit(self, q: _Query, rows: List[MappingResult],
              out: IO[str]) -> None:
        if rows:
            self.total_reads_mapped += 1
        if self.p.filter_mode == FILTER_ONETOONE:
            self._buffered.extend(rows)
        elif getattr(self, "_dist", None) is not None:
            # part-file line: "<query ordinal>\t<paf...>" so process 0
            # can k-way-merge parts back into input order
            import io as _io
            buf = _io.StringIO()
            output.write_mappings(
                buf, rows, lambda m: q.name, self.idx.names,
                self.idx.lengths, self.p.legacy_output,
                self.p.merge_mappings, self.p.report_ANI_percentage)
            pfx = f"{q.counter}\t"
            for ln in buf.getvalue().splitlines(keepends=True):
                out.write(pfx + ln)
        else:
            output.write_mappings(
                out, rows, lambda m: q.name, self.idx.names,
                self.idx.lengths, self.p.legacy_output,
                self.p.merge_mappings, self.p.report_ANI_percentage)

    def _finish_one_to_one(self, out: IO[str]) -> None:
        """Reference-axis global pass (mapQuery, computeMap.hpp:357-405)."""
        p = self.p
        n = p.num_mappings_for_segment - 1
        rows = self._buffered
        result: List[MappingResult] = []
        i = 0
        while i < len(rows):
            if p.skip_prefix:
                g = self._get_ref_group(
                    self.qmetadata[rows[i].query_seq_id][0])
                j = i
                while j < len(rows) and self._get_ref_group(
                        self.qmetadata[rows[j].query_seq_id][0]) == g:
                    j += 1
            else:
                j = len(rows)
            sub = rows[i:j]
            result.extend(self._filter_by_group(sub, n, filter_ref=True))
            i = j
        result.sort(key=lambda m: (m.query_seq_id, m.query_start,
                                   m.ref_seq_id, m.ref_start))
        output.write_mappings(
            out, result,
            lambda m: self.qmetadata[m.query_seq_id][0],
            self.idx.names, self.idx.lengths, p.legacy_output,
            p.merge_mappings, p.report_ANI_percentage)
