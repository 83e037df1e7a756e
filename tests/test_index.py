"""Index-builder tests: minmer intervals vs. a brute-force window oracle."""

import os

import numpy as np
import pytest

from mashmap_tpu.index.builder import (
    contig_minmer_intervals, _chunk_long_intervals, _freq_threshold,
    build_index, ReferenceIndex)
from mashmap_tpu.kernels import winnow


def brute_members(h, valid, s, span):
    """member set per window, directly from the definition."""
    n_w = len(h) - span + 1
    out = []
    for w in range(n_w):
        vals = sorted({int(h[p]) for p in range(w, w + span) if valid[p]})
        out.append(set(vals[:s]))
    return out


def brute_votes(h, valid, strand, span):
    """hash -> vote sum per window."""
    n_w = len(h) - span + 1
    out = []
    for w in range(n_w):
        votes = {}
        for p in range(w, w + span):
            if valid[p]:
                votes[int(h[p])] = votes.get(int(h[p]), 0) + int(strand[p])
        out.append(votes)
    return out


@pytest.mark.parametrize("seed,alphabet", [
    (0, 60), (1, 60), (2, 60), (3, 60),
    # alphabet 6 packs many same-hash occurrences into window 0 —
    # regression for the packed event sort's W=0 clamp-tie ordering
    # (strand_classify sorts on unclamped positions; ties must process
    # in ascending occurrence order)
    (4, 6), (5, 6),
])
def test_intervals_match_bruteforce(seed, alphabet):
    rng = np.random.default_rng(seed)
    n_k = 300
    span = 25
    s = 4
    # small universe => heavy duplication, exercises presence dedup
    h = rng.integers(0, alphabet, size=n_k).astype(np.uint64)
    valid = rng.random(n_k) > 0.15
    strand = np.where(rng.random(n_k) < 0.5, 1, -1).astype(np.int8)
    n_flush = n_k  # stands in for len-k+1

    theta = winnow.window_thresholds_bruteforce(h, valid, s, span)
    (ph, pb, pe), (sh, sb, se, ss) = contig_minmer_intervals(
        h, valid, strand, theta, span, n_flush)

    members = brute_members(h, valid, s, span)
    n_w = len(members)

    # 1. membership intervals reproduce the member sets exactly
    cover = {}
    for hh, b, e in zip(ph, pb, pe):
        for w in range(int(b), min(int(e), n_w)):
            key = (int(hh), w)
            assert key not in cover, "overlapping intervals for one hash"
            cover[key] = True
        # flush intervals must end at n_flush and cover through n_w-1
        if e > n_w:
            assert int(e) == n_flush
    want = {(hh, w) for w in range(n_w) for hh in members[w]}
    assert set(cover) == want

    # 2. strand-split intervals partition the same coverage with the
    #    correct sign class per window
    votes = brute_votes(h, valid, strand, span)
    scover = {}
    for hh, b, e, st in zip(sh, sb, se, ss):
        assert e > b
        for w in range(int(b), min(int(e), n_w)):
            key = (int(hh), w)
            assert key not in scover
            scover[key] = int(st)
    assert set(scover) == want
    for (hh, w), st in scover.items():
        v = votes[w].get(hh, 0)
        assert st == (-1 if v < 0 else 1), (hh, w, v, st)


def test_chunk_long_intervals():
    h = np.array([5, 6], np.uint64)
    wb = np.array([0, 10], np.int64)
    we = np.array([25, 14], np.int64)
    st = np.array([1, -1], np.int8)
    ch, cb, ce, cs = _chunk_long_intervals(h, wb, we, st, 10)
    rows = sorted(zip(ch.tolist(), cb.tolist(), ce.tolist(), cs.tolist()))
    assert rows == [(5, 0, 10, 1), (5, 10, 20, 1), (5, 20, 25, 1),
                    (6, 10, 14, -1)]


def test_freq_threshold():
    # 1000 hashes, top one with huge posting size; 0.2% => ignore >= 2 of them
    sizes = np.full(1000, 2, np.int64)
    sizes[:3] = [100, 90, 80]
    t = _freq_threshold(sizes, 0.2)  # to_ignore = 2
    assert t == 90
    assert _freq_threshold(sizes, 0.0) == np.iinfo(np.int64).max


def test_build_index_and_save_load(tmp_path):
    rng = np.random.default_rng(5)
    seq = "".join(rng.choice(list("ACGT"), size=3000))
    contigs = [("c1", seq), ("tiny", "ACGT" * 10), ("c2", seq[::-1])]
    idx = build_index(contigs, kmer_size=7, window_size=500, sketch_size=5)
    assert idx.names == ["c1", "tiny", "c2"]
    assert (idx.mi_seqid != 1).all()  # tiny contig not indexed
    assert len(idx.uniq_hashes) == len(idx.post_offsets) - 1
    assert np.all(np.diff(idx.uniq_hashes.view(np.uint64)) > 0)
    # intervals sorted by (seqid, wpos, wend)
    key = np.lexsort((idx.mi_wend, idx.mi_wpos, idx.mi_seqid))
    assert np.array_equal(key, np.arange(len(key)))

    p = tmp_path / "idx.npz"
    idx.save(str(p))
    idx2 = ReferenceIndex.load(str(p))
    np.testing.assert_array_equal(idx.mi_hash, idx2.mi_hash)
    np.testing.assert_array_equal(idx.post_wpos, idx2.post_wpos)
    assert idx2.names == idx.names
    assert idx2.kmer_size == 7 and idx2.window_size == 500


def test_grouped_build_matches_single_group(monkeypatch):
    """Contig-group streaming (local rank domains, u64 global merge) is
    bit-identical to the one-group build — the mechanism that removes
    the global int32 distinct-hash cap (reference streams with O(w)
    state instead, winSketch.hpp:122-509)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from genomes import pangenome
    contigs = pangenome(4, 60_000, 0.05, seed=11)

    def build(limit):
        monkeypatch.setenv("MASHMAP_TPU_DEVICE_RANK_LIMIT", str(limit))
        return build_index(contigs, 19, 5000, 40, threads=2)

    a = build(1 << 30)    # everything in one group
    b = build(70_000)     # ~2 contigs per group
    c = build(20_000)     # every contig overflows its group => host stream
    for f in ("uniq_hashes", "post_offsets", "post_seqid", "post_wpos",
              "post_wend", "mi_hash", "mi_seqid", "mi_wpos", "mi_wend",
              "mi_strand", "is_frequent"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                      err_msg=f)
        np.testing.assert_array_equal(getattr(a, f), getattr(c, f),
                                      err_msg=f)
    assert a.freq_threshold == b.freq_threshold == c.freq_threshold
    assert len(a.uniq_hashes) > 0


def test_group_packer_budgets_padded_positions(monkeypatch, caplog):
    """The packer must budget PADDED slab positions, not raw ones.

    Regression: a group packed to just under the device limit by raw
    k-mer count exceeded it once the last slab of each contig was pow2
    padded, silently sending the whole group down the host-streaming
    fallback (a 284s detour per ~250 Mbp group on the 3 Gbp build)."""
    import logging
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from genomes import pangenome
    from mashmap_tpu.index.builder import _padded_positions

    k = 19
    n = 34_000                    # pads 34018 -> 65536 bytes
    assert _padded_positions(n, k) > n
    contigs = pangenome(2, n + k - 1, 0.05, seed=23)
    raw_sum = 2 * n
    pad_each = _padded_positions(n, k)
    limit = (raw_sum + 2 * pad_each) // 2  # raw fits; padded pair doesn't
    assert raw_sum < limit < 2 * pad_each and pad_each <= limit

    monkeypatch.setenv("MASHMAP_TPU_DEVICE_RANK_LIMIT", str(limit))
    with caplog.at_level(logging.INFO, logger="mashmap_tpu.index"):
        b = build_index(contigs, k, 5000, 40)
    assert "streaming hashes to the host" not in caplog.text

    monkeypatch.setenv("MASHMAP_TPU_DEVICE_RANK_LIMIT", str(1 << 30))
    a = build_index(contigs, k, 5000, 40)
    np.testing.assert_array_equal(a.mi_hash, b.mi_hash)
    np.testing.assert_array_equal(a.uniq_hashes, b.uniq_hashes)


def test_whole_fetch_matches_sized(monkeypatch):
    """The small-group single whole-buffer events fetch (one round
    trip, copies started at dispatch) must be bit-identical to the
    two-phase sized fetch — same kernels, different transfer plan —
    in both the overlapped (deferred host) and serial builds."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from genomes import pangenome
    contigs = pangenome(3, 60_000, 0.05, seed=23)

    def build():
        return build_index(contigs, 19, 5000, 40, threads=2)

    monkeypatch.setenv("MASHMAP_TPU_EVENTS_WHOLE_FETCH", "0")
    a = build()                                   # sized two-phase
    monkeypatch.setenv("MASHMAP_TPU_EVENTS_WHOLE_FETCH", str(1 << 30))
    b = build()                                   # whole, deferred
    monkeypatch.setenv("MASHMAP_TPU_OVERLAP_BUILD", "0")
    c = build()                                   # whole, serial
    for f in ("uniq_hashes", "post_offsets", "post_seqid", "post_wpos",
              "post_wend", "mi_hash", "mi_seqid", "mi_wpos", "mi_wend",
              "mi_strand", "is_frequent"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                      err_msg=f)
        np.testing.assert_array_equal(getattr(a, f), getattr(c, f),
                                      err_msg=f)
    assert len(a.mi_hash) > 0


def test_chunked_events_matches_whole(monkeypatch):
    """The streaming (chunked + halo) events path must produce a
    bit-identical index to the whole-contig kernel: chunk the same
    contigs by forcing CH_MAX below their length."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from genomes import pangenome
    from mashmap_tpu.index import builder as B

    contigs = pangenome(3, 90_000, 0.05, seed=17)
    # an in-contig tandem repeat straddling chunk boundaries: duplicate
    # hashes exercise the prev/next-occurrence machinery (a position-
    # extraction mask bug here once survived the random-only fixture)
    from genomes import random_genome
    unit = random_genome(1_332, seed=18)
    contigs.append(("rep", random_genome(20_000, seed=19) + unit * 40
                    + random_genome(20_000, seed=20)))
    a = build_index(contigs, 19, 5000, 40, threads=1)

    assert hasattr(B, "_EVENTS_CH_MAX")
    monkeypatch.setattr(B, "_EVENTS_CH_MAX", 30_000)
    b = build_index(contigs, 19, 5000, 40, threads=1)
    for f in ("uniq_hashes", "post_offsets", "post_seqid", "post_wpos",
              "post_wend", "mi_hash", "mi_seqid", "mi_wpos", "mi_wend",
              "mi_strand", "is_frequent"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                      err_msg=f)
    assert len(a.mi_hash) > 0
