"""Device pipeline (l1_step/l2_step) must reproduce the host path exactly."""

import numpy as np
import pytest

from mashmap_tpu.params import Parameters
from mashmap_tpu.api import map_files
from tests.genomes import pangenome, write_fasta, mutate, random_genome


def run_both(tmp_path, records, queries, **kw):
    outs = {}
    for dev in (False, True):
        ref = tmp_path / f"ref{dev}.fa"
        write_fasta(str(ref), records)
        params = Parameters(ref_sequences=[str(ref)],
                            use_device_pipeline=dev, **kw)
        if queries is not None:
            qf = tmp_path / f"q{dev}.fa"
            write_fasta(str(qf), queries)
            params.query_sequences = [str(qf)]
        params.out_file_name = str(tmp_path / f"out{dev}.paf")
        map_files(params)
        with open(params.out_file_name) as fh:
            outs[dev] = [line.rstrip("\n") for line in fh]
    return outs[False], outs[True]


def test_device_matches_host_query_mapping(tmp_path):
    base = random_genome(20_000, seed=80)
    q = mutate(base, 0.05, seed=81)
    host, dev = run_both(
        tmp_path, [("chr1", base)], [("q1", q), ("short", base[700:1100])],
        kmer_size=11, seg_length=500, sketch_size=30,
        percentage_identity=0.80, merge_mappings=False)
    assert len(host) > 10
    assert host == dev


def test_device_matches_host_selfmap(tmp_path):
    recs = pangenome(3, 10_000, divergence=0.05, seed=90)
    host, dev = run_both(
        tmp_path, recs, None,
        kmer_size=11, seg_length=500, sketch_size=30,
        percentage_identity=0.80,
        skip_prefix=True, prefix_delim="#")
    assert len(host) > 0
    assert host == dev


def test_pipelined_tiny_batches_match(tmp_path):
    """Depth-2 pipelined streaming with batch_fragments so small that
    one query's fragments span MANY batches must be byte-identical to
    big-batch runs (exercises cross-batch per-query accumulation,
    in-order finalization, and the in-flight queue drain)."""
    base = random_genome(40_000, seed=70)
    recs = [("chr1", base)]
    queries = [("q_long", mutate(base, 0.04, seed=71)),      # 80 frags
               ("q_mid", mutate(base[3000:15_000], 0.06, seed=72)),
               ("q_short", base[700:1150])]
    outs = {}
    for bf in (4, 64, 4096):
        ref = tmp_path / f"r{bf}.fa"
        qf = tmp_path / f"q{bf}.fa"
        write_fasta(str(ref), recs)
        write_fasta(str(qf), queries)
        p = Parameters(ref_sequences=[str(ref)],
                       query_sequences=[str(qf)],
                       out_file_name=str(tmp_path / f"o{bf}.paf"),
                       kmer_size=11, seg_length=500, sketch_size=30,
                       percentage_identity=0.80, batch_fragments=bf,
                       no_progress=True)
        map_files(p)
        with open(p.out_file_name) as fh:
            outs[bf] = fh.read()
    assert outs[4].strip(), "no mappings produced"
    assert outs[4] == outs[64] == outs[4096]


def test_host_slice_bounds_match(tmp_path, monkeypatch):
    """MASHMAP_TPU_HOST_SLICE_BOUNDS=1 (mi_key kept on the host, bounds
    via np.searchsorted) must be byte-identical to the device bounds."""
    base = random_genome(25_000, seed=75)
    recs = [("chr1", base), ("chr2", mutate(base[:12_000], 0.08,
                                            seed=76))]
    queries = [("q1", mutate(base, 0.05, seed=77))]
    kw = dict(kmer_size=11, seg_length=500, sketch_size=30,
              percentage_identity=0.80, no_progress=True)
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("MASHMAP_TPU_HOST_SLICE_BOUNDS", mode)
        ref = tmp_path / f"r{mode}.fa"
        qf = tmp_path / f"q{mode}.fa"
        write_fasta(str(ref), recs)
        write_fasta(str(qf), queries)
        p = Parameters(ref_sequences=[str(ref)],
                       query_sequences=[str(qf)],
                       out_file_name=str(tmp_path / f"o{mode}.paf"),
                       **kw)
        map_files(p)
        with open(p.out_file_name) as fh:
            outs[mode] = fh.read()
    assert outs["0"].strip()
    assert outs["0"] == outs["1"]


def test_device_overflow_fallback(tmp_path):
    """Tiny caps force the host fallback; output must be unchanged."""
    base = random_genome(15_000, seed=95)
    q = mutate(base, 0.05, seed=96)
    host, dev = run_both(
        tmp_path, [("chr1", base)], [("q1", q)],
        kmer_size=11, seg_length=500, sketch_size=30,
        percentage_identity=0.80,
        l1_postings_cap=32, l2_entries_cap=16, l2_batch=8)
    assert len(host) > 0
    assert host == dev


def test_searchsorted_auto_binary_matches_sort(monkeypatch):
    """The large-table binary-search lowering must equal method='sort'
    (and np.searchsorted) bit-for-bit, including miss/duplicate/edge
    queries — it activates on human-scale tables where re-sorting the
    table per batch is prohibitive."""
    import jax.numpy as jnp
    from mashmap_tpu.kernels import mapdev

    rng = np.random.default_rng(11)
    table = np.unique(rng.integers(0, 1 << 62, 5000).astype(np.uint64))
    q = np.concatenate([
        rng.choice(table, 300),                    # exact hits
        rng.integers(0, 1 << 62, 300).astype(np.uint64),  # misses
        [np.uint64(0), table[0], table[-1],
         np.uint64((1 << 63) + 5)],                # edges
    ]).reshape(2, -1)
    want = np.searchsorted(table, q)

    monkeypatch.setattr(mapdev, "_SORT_LOOKUP_MAX", 1)   # force binary
    got_bin = np.asarray(mapdev.searchsorted_auto(jnp.asarray(table),
                                                  jnp.asarray(q)))
    monkeypatch.setattr(mapdev, "_SORT_LOOKUP_MAX", 1 << 23)
    got_sort = np.asarray(mapdev.searchsorted_auto(jnp.asarray(table),
                                                   jnp.asarray(q)))
    np.testing.assert_array_equal(want, got_bin)
    np.testing.assert_array_equal(want, got_sort)
    # tiny tables (the l2 escalation path can hand in short slabs)
    for U in (1, 2, 3):
        t2 = table[:U]
        q2 = np.stack([np.concatenate([[np.uint64(0)], t2,
                                       [t2[-1] + np.uint64(1)]])])
        monkeypatch.setattr(mapdev, "_SORT_LOOKUP_MAX", 0)
        got = np.asarray(mapdev.searchsorted_auto(jnp.asarray(t2),
                                                  jnp.asarray(q2)))
        np.testing.assert_array_equal(np.searchsorted(t2, q2), got)


def test_device_pipeline_binary_lookup_matches(tmp_path, monkeypatch):
    """End-to-end: forcing the binary-search lookup (as a human-scale
    index would) leaves the PAF byte-identical."""
    monkeypatch.setenv("MASHMAP_TPU_SORT_LOOKUP_MAX", "1")
    import importlib
    from mashmap_tpu.kernels import mapdev
    monkeypatch.setattr(mapdev, "_SORT_LOOKUP_MAX", 1)
    recs = pangenome(2, 120_000, 0.04, seed=21)
    qs = [("q1", mutate(recs[0][1][:60_000], 0.05, seed=22))]
    host, dev = run_both(tmp_path, recs, qs, seg_length=5000,
                         percentage_identity=0.85)
    assert host == dev and host


def test_rank_code_order_isomorphism():
    """The int32 code domain ((rank<<1)|1 for table entries,
    (insertion_pos<<1)|found for queries) must reproduce EVERY u64
    <, ==, > outcome between query sketch hashes and interval-row
    hashes — the property all rank-domain L2 comparisons rest on."""
    rng = np.random.default_rng(3)
    table = np.unique(rng.integers(0, 1 << 63, 4000).astype(np.uint64))
    q = np.concatenate([
        rng.choice(table, 500),                       # present
        rng.integers(0, 1 << 63, 500).astype(np.uint64),  # mostly missing
        [np.uint64(0), table[0], table[-1]],
    ])
    pos = np.searchsorted(table, q)
    found = table[np.minimum(pos, len(table) - 1)] == q
    q_code = (pos.astype(np.int64) << 1) | found
    t_code = (np.arange(len(table), dtype=np.int64) << 1) | 1

    lt_u64 = q[:, None] < table[None, :]
    eq_u64 = q[:, None] == table[None, :]
    lt_code = q_code[:, None] < t_code[None, :]
    eq_code = q_code[:, None] == t_code[None, :]
    np.testing.assert_array_equal(lt_u64, lt_code)
    np.testing.assert_array_equal(eq_u64, eq_code)
    # searchsorted outcomes both directions (l2.py searches entries
    # into the query sketch; the kernel counts sketch-below-entry)
    qs = np.sort(q_code)
    qs_u = np.sort(q)
    np.testing.assert_array_equal(
        np.searchsorted(qs_u, table), np.searchsorted(qs, t_code))


def test_searchsorted_big_two_level_exactness():
    """The >8M-entry lookup path (flagship scale) uses a coarse sampled
    stage + bounded refine (mapdev._searchsorted_big); pin exactness
    against np.searchsorted including duplicate runs, exact hits and
    extremes, at sizes straddling non-multiples of the coarse step."""
    import numpy as np
    import jax.numpy as jnp
    from mashmap_tpu.kernels import mapdev

    rng = np.random.default_rng(0)
    for U in (9_000_000, 12_345_677):
        t = np.sort(rng.integers(0, 1 << 62, U).astype(np.int64))
        t[1000:2000] = t[1000]          # a duplicate run
        t = np.sort(t)
        q = np.concatenate([
            rng.integers(0, 1 << 62, 2000).astype(np.int64),
            t[rng.integers(0, U, 1000)],          # exact hits
            [t[0], t[-1], 0, (1 << 62) + 5, t[1000]]])
        want = np.searchsorted(t, q, side="left")
        got = np.asarray(mapdev.searchsorted_auto(
            jnp.asarray(t), jnp.asarray(q)))
        np.testing.assert_array_equal(got, want)
