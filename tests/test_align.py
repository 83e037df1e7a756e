"""Alignment-stage tests: DP kernel vs host oracle, anchor chains, and
end-to-end + golden parity vs the reference mashmap-align binary.

The reference aligner consumes LEGACY (inclusive-end) mashmap rows — it
asserts out on PAF rows that touch a sequence end — so parity runs use
``--legacy`` mappings, the supported flow (computeAlignments.hpp:236-241).

CIGAR strings are NOT bit-compared: any cost-optimal path is valid and
edlib's tie-breaking is internal. Parity = exact edit distance, matching
row sets, near-equal error rates, and CIGAR self-consistency.
"""

import os
import re
import subprocess

import numpy as np
import pytest

from mashmap_tpu.align import kernel as K
from mashmap_tpu.align.anchors import find_anchor_chain, kmer_codes
from mashmap_tpu.align.driver import (
    Aligner, align_files, build_row_work, parse_mashmap_row, run_pieces,
    ops_to_cigar, MappingRecord)
from mashmap_tpu.kernels.kmers import sanitize
from tests.genomes import random_genome, mutate, revcomp, write_fasta

HERE = os.path.dirname(__file__)
ALIGN_ORACLE = "/tmp/mashmap_ref/mashmap-align"
MAP_ORACLE = "/tmp/mashmap_ref/mashmap"


def _rand_piece(rng, n, m, div=0.1):
    q = rng.integers(65, 69, size=n, dtype=np.uint8)
    r = q.copy()[:m] if m <= n else np.concatenate(
        [q, rng.integers(65, 69, size=m - n, dtype=np.uint8)])
    nmut = int(div * m)
    if nmut:
        at = rng.choice(m, size=nmut, replace=False)
        r[at] = rng.integers(65, 69, size=nmut, dtype=np.uint8)
    return q, r


class TestKernel:
    def test_banded_matches_full_dp(self):
        rng = np.random.default_rng(0)
        P, W = 64, 32
        B = 16
        qs, rs, metas = [], [], []
        for b in range(B):
            n = int(rng.integers(8, P + 1))
            m = int(np.clip(n + rng.integers(-6, 7), 1, P + W - 1))
            q, r = _rand_piece(rng, n, m)
            qs.append(q), rs.append(r)
            metas.append((n, m, bool(b % 2)))     # alternate free_start
        q_pad = np.zeros((B, P), np.uint8)
        r_pad = np.zeros((B, P + W), np.uint8)
        n_a = np.zeros(B, np.int32)
        m_a = np.zeros(B, np.int32)
        lo = np.zeros(B, np.int32)
        fs = np.zeros(B, bool)
        for b in range(B):
            n, m, f = metas[b]
            q_pad[b, :n], r_pad[b, :m] = qs[b], rs[b]
            n_a[b], m_a[b], fs[b] = n, m, f
            d = m - n
            lo[b] = min(0, d) - (W - abs(d) - 1) // 2
        rows = np.asarray(K.banded_dp_rows(
            q_pad, r_pad, n_a, m_a, lo, fs, p_len=P, width=W))
        for b in range(B):
            n, m, f = metas[b]
            D = K.full_dp_host(qs[b], rs[b], f)
            for i in range(n + 1):
                for c in range(W):
                    j = i + int(lo[b]) + c
                    if 0 <= j <= m:
                        got = int(rows[b, i, c])
                        want = int(D[i, j])
                        # band cells can only OVERestimate (clipped paths)
                        assert got >= want
                        # interior band cells must be exact
                        if abs(j - i) <= 8 and abs(j - i - (m - n)) <= 8:
                            assert got == want, (b, i, j, got, want)

    def test_traceback_reproduces_edit_distance(self):
        rng = np.random.default_rng(1)
        for trial in range(20):
            n = int(rng.integers(10, 60))
            m = int(np.clip(n + rng.integers(-5, 6), 5, 90))
            q, r = _rand_piece(rng, n, m, div=0.15)
            D = K.full_dp_host(q, r, False)
            from mashmap_tpu.align.driver import _traceback_full
            ops, start_j = _traceback_full(D, q, r, n, m, False)
            e = int(np.sum(ops != K.OP_MATCH))
            assert e == D[n, m]
            # consumption invariants (SAM semantics)
            q_cons = int(np.sum((ops == K.OP_MATCH) | (ops == K.OP_SUB)
                                | (ops == K.OP_INS)))
            r_cons = int(np.sum((ops == K.OP_MATCH) | (ops == K.OP_SUB)
                                | (ops == K.OP_DEL)))
            assert q_cons == n and r_cons == m

    def test_cummin_row_identity(self):
        """full_dp_host equals a textbook serial DP."""
        rng = np.random.default_rng(2)
        q, r = _rand_piece(rng, 30, 33, div=0.2)
        D = K.full_dp_host(q, r, False)
        n, m = len(q), len(r)
        S = np.zeros((n + 1, m + 1), np.int32)
        S[0] = np.arange(m + 1)
        S[:, 0] = np.arange(n + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                S[i, j] = min(S[i - 1, j - 1] + (q[i - 1] != r[j - 1]),
                              S[i - 1, j] + 1, S[i, j - 1] + 1)
        np.testing.assert_array_equal(D, S)


class TestAnchors:
    def test_kmer_codes_n_handling(self):
        seq = sanitize(b"ACGTNACGTACGT")
        codes, valid = kmer_codes(seq, 4)
        assert not valid[1:5].any()      # windows covering the N
        assert valid[0] and valid[5:].all()

    def test_chain_is_collinear_and_spaced(self):
        base = random_genome(20000, seed=3)
        mut = mutate(base, 0.05, seed=4)
        a = find_anchor_chain(sanitize(base.encode()),
                              sanitize(mut.encode()), 21, 192)
        assert len(a) > 20
        assert (np.diff(a[:, 0]) >= 21).all()
        assert (np.diff(a[:, 1]) >= 21).all()
        # roughly diagonal
        assert np.abs((a[:, 1] - a[:, 0])).max() < 500


def _cig_stats(line):
    f = line.split()
    cig, rate = f[-1], float(f[-2])
    runs = re.findall(r"(\d+)([MID])", cig)
    alen = sum(int(x) for x, _ in runs)
    return rate, alen, round(rate * alen), cig, runs


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("align")
        base = random_genome(30000, seed=5)
        q1 = mutate(base, 0.05, seed=6)
        q2 = revcomp(mutate(base[4000:12000], 0.03, seed=7))
        ref, qf = str(d / "ref.fa"), str(d / "q.fa")
        write_fasta(ref, [("chr1", base)])
        write_fasta(qf, [("q1", q1), ("q2", q2)])
        r = subprocess.run(
            [os.path.join(HERE, "oracle", "build_ref.sh")],
            capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr}")
        mp = str(d / "map.out")
        r = subprocess.run(
            [MAP_ORACLE, "-r", ref, "-q", qf, "-o", mp, "-k", "15",
             "-s", "1000", "-J", "60", "--pi", "80", "--legacy"],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        return d, ref, qf, mp

    def test_parity_vs_reference_aligner(self, setup):
        d, ref, qf, mp = setup
        r = subprocess.run(
            [ALIGN_ORACLE, "-s", ref, "-q", qf, "--mappingFile", mp,
             "--pi", "80", "-o", str(d / "ref.aln")],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        align_files([ref], [qf], mp, 80.0, str(d / "ours.aln"))
        ref_lines = open(d / "ref.aln").read().splitlines()
        our_lines = open(d / "ours.aln").read().splitlines()
        assert len(ref_lines) == len(our_lines) > 0
        for rl, ol in zip(ref_lines, our_lines):
            # identical original row prefix
            assert rl.split()[:10] == ol.split()[:10]
            r_rate, r_alen, r_e, _, _ = _cig_stats(rl)
            o_rate, o_alen, o_e, cig, runs = _cig_stats(ol)
            assert o_e == r_e, "edit distance must match the oracle"
            assert abs(o_rate - r_rate) < 2e-3
            # CIGAR consumption: full query region + within target region
            f = ol.split()
            qspan = int(f[3]) - int(f[2]) + 1
            rspan = int(f[8]) - int(f[7]) + 1
            q_cons = sum(int(x) for x, c in runs if c in "MI")
            r_cons = sum(int(x) for x, c in runs if c in "MD")
            assert q_cons == qspan
            assert r_cons <= rspan

    def test_unbounded_pi_zero(self, setup):
        d, ref, qf, mp = setup
        align_files([ref], [qf], mp, 0.0, str(d / "pi0.aln"))
        assert len(open(d / "pi0.aln").read().splitlines()) \
            == len(open(mp).read().splitlines())

    def test_cli(self, setup):
        d, ref, qf, mp = setup
        from mashmap_tpu.align.cli import main
        out = str(d / "cli.aln")
        assert main(["-s", ref, "-q", qf, "--mappingFile", mp,
                     "--pi", "80", "-o", out]) == 0
        assert os.path.getsize(out) > 0

    def test_edit_limit_drops_rows(self, setup):
        """A divergent mapping row beyond the pi bound produces no output."""
        d, ref, qf, mp = setup
        base = random_genome(2000, seed=8)
        other = random_genome(2000, seed=9)
        ref2, qf2 = str(d / "r2.fa"), str(d / "q2.fa")
        write_fasta(ref2, [("c", base)])
        write_fasta(qf2, [("z", other)])
        fake = str(d / "fake.map")
        with open(fake, "w") as fh:
            fh.write("z 2000 0 1999 + c 2000 0 1999 85.0\n")
        align_files([ref2], [qf2], fake, 90.0, str(d / "z.aln"))
        assert open(d / "z.aln").read() == ""


def test_ops_to_cigar_rle():
    ops = np.array([0, 0, 3, 1, 1, 2, 0], np.uint8)
    assert ops_to_cigar(ops) == "3M2I1D1M"
    assert ops_to_cigar(np.zeros(0, np.uint8)) == ""
