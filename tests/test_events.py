"""Device membership-event kernel vs the host oracle.

`kernels.events.events_step` must reproduce `index.builder.
contig_minmer_intervals` part A (intervals + member occurrences)
bit-exactly; part B (strand classification) is shared code.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mashmap_tpu.index import builder
from mashmap_tpu.kernels import events as ev
from mashmap_tpu.kernels import winnow
from mashmap_tpu.kernels.winnow import RSENT


def _host_parts(ranks, strand, theta, s_b):
    valid = ranks != RSENT
    (ph, pb, pe), (mh, mb, me, ms) = builder.contig_minmer_intervals(
        ranks, valid, strand, theta, s_b, n_flush=len(ranks), sent=RSENT)
    return (ph, pb, pe), (mh, mb, me, ms)


def _device_parts(ranks, strand, theta, s_b):
    n = len(ranks)
    n_w = len(theta)
    Np = 1 << max(6, (n - 1).bit_length())
    rv = np.full(Np, RSENT, np.int32)
    rv[:n] = ranks
    sv = np.zeros(Np, np.int8)
    sv[:n] = strand
    th = np.full(Np, RSENT, np.int32)
    th[:n_w] = theta
    iv_cap = max(64, Np >> 1)
    mem_cap = max(64, Np >> 1)
    buf = np.asarray(ev.events_step(
        jnp.asarray(rv), jnp.asarray(sv), jnp.asarray(th),
        np.int32(n), np.int32(n_w), s_b, iv_cap, mem_cap))
    got = ev.unpack_events(buf, iv_cap, mem_cap)
    assert got is not None, "unexpected cap overflow"
    iv_rank, iv_wb, iv_we, mp, mh_occ, md = got
    iv_we = np.where(iv_we < 0, n, iv_we)
    sh, sb_, se, ss = builder.strand_classify(
        iv_rank, iv_wb, iv_we, mp, mh_occ, md, n_w, s_b, n, np.int32)
    return (iv_rank, iv_wb, iv_we), (sh, sb_, se, ss)


def _random_case(rng, n, alphabet, s, s_b, n_frac=0.0):
    ranks = rng.integers(0, alphabet, n).astype(np.int32)
    if n_frac:
        ranks[rng.random(n) < n_frac] = RSENT
    strand = np.where(rng.random(n) < 0.5, 1, -1).astype(np.int8)
    valid = ranks != RSENT
    theta_u64 = winnow.window_thresholds_bruteforce(
        ranks.astype(np.uint64), valid, s, s_b)
    theta = np.where(theta_u64 == winnow.SENTINEL, RSENT,
                     theta_u64).astype(np.int32)
    return ranks, strand, theta


@pytest.mark.parametrize("seed,n,alphabet,s,s_b,n_frac", [
    (0, 300, 64, 4, 50, 0.0),
    (1, 500, 16, 4, 50, 0.0),        # heavy repeats: many dups
    (2, 500, 1000, 8, 64, 0.1),      # invalid (N) positions
    (3, 2000, 40, 6, 128, 0.02),     # strand churn on repeats
    (4, 64, 8, 3, 64, 0.0),          # exactly one window
    (5, 4096, 2**30, 16, 500, 0.0),  # all-distinct hashes
])
def test_device_events_match_host(seed, n, alphabet, s, s_b, n_frac):
    rng = np.random.default_rng(seed)
    ranks, strand, theta = _random_case(rng, n, alphabet, s, s_b, n_frac)
    if len(theta) <= 0:
        pytest.skip("no windows")
    (hp, hb, he), (hmh, hmb, hme, hms) = _host_parts(
        ranks, strand, theta, s_b)
    (dp, db, de), (dmh, dmb, dme, dms) = _device_parts(
        ranks, strand, theta, s_b)
    np.testing.assert_array_equal(hp, dp)
    np.testing.assert_array_equal(hb, db)
    np.testing.assert_array_equal(he, de)
    np.testing.assert_array_equal(hmh, dmh)
    np.testing.assert_array_equal(hmb, dmb)
    np.testing.assert_array_equal(hme, dme)
    np.testing.assert_array_equal(hms, dms)


def test_overflow_flag():
    rng = np.random.default_rng(7)
    n, s_b = 512, 32
    ranks, strand, theta = _random_case(rng, n, 1 << 20, 8, s_b)
    Np = 512
    iv_cap = 8   # absurdly small: must flag overflow, not corrupt
    buf = np.asarray(ev.events_step(
        jnp.asarray(ranks), jnp.asarray(strand),
        jnp.asarray(np.concatenate(
            [theta, np.full(Np - len(theta), RSENT, np.int32)])),
        np.int32(n), np.int32(len(theta)), s_b, iv_cap, 8))
    assert ev.unpack_events(buf, iv_cap, 8) is None


def test_chunk_nonpow2_cap_exceeds_length():
    """Regression: events_caps can return caps LARGER than a small
    chunk's (non-pow2, grid-padded) length; the packed buffer segments
    must still sit at exact cap offsets (a short segment shifts every
    later lane — wrong member positions => wrong interval strands).
    Cross-checks events_chunk against the host oracle at such a shape."""
    rng = np.random.default_rng(11)
    s, s_b = 60, 500
    n = 5000
    ranks, strand, theta = _random_case(rng, n, 300, s, s_b, 0.05)
    n_w = len(theta)
    CHP = 6144                       # 1.5 * 2^12: grid, not pow2
    caps = ev.events_caps(CHP, s, s_b)
    assert caps[0] > CHP, "shape must exercise cap > chunk length"
    rv = np.full(CHP, RSENT, np.int32); rv[:n] = ranks
    sv = np.zeros(CHP, np.int8); sv[:n] = strand
    th = np.full(CHP, RSENT, np.int32); th[:n_w] = theta
    buf = np.asarray(ev.events_chunk(
        jnp.asarray(rv), jnp.asarray(sv), jnp.asarray(th),
        np.int32(0), np.int32(0), np.int32(CHP), np.int32(n),
        np.int32(n_w), s_b, caps[0], caps[1]))
    c1, c2 = caps
    nb, ne, nm, ovf = buf[-4], buf[-3], buf[-2], buf[-1]
    assert not ovf
    assert len(buf) == 4 * c1 + 2 * c2 + 4, "packed layout must be cap-sized"
    bh, bW = buf[:nb], buf[c1:c1 + nb]
    eh, eW = buf[2 * c1:2 * c1 + ne], buf[3 * c1:3 * c1 + ne]
    m_rk = buf[4 * c1:4 * c1 + nm]
    m_pos = buf[4 * c1 + c2:4 * c1 + c2 + nm]
    # host oracle: intervals via pairing, members via part A
    (hp, hb, he), (hmh, hmb, hme, hms) = _host_parts(
        ranks, strand, theta, s_b)
    iv_hash, iv_wb, iv_we, _ = builder._pair_begin_end(
        bh, bW.astype(np.int64), eh, eW.astype(np.int64), n)
    iv_we = np.where(iv_we < 0, n, iv_we)
    sh, sb_, se, ss = builder.strand_classify(
        iv_hash, iv_wb, iv_we, m_pos.astype(np.int64),
        (m_rk >> 1), ((m_rk & 1) * 2 - 1).astype(np.int64),
        n_w, s_b, n, np.int32)
    np.testing.assert_array_equal(hp, iv_hash)
    np.testing.assert_array_equal(hb, iv_wb)
    np.testing.assert_array_equal(he, iv_we)
    np.testing.assert_array_equal(hmh, sh)
    np.testing.assert_array_equal(hmb, sb_)
    np.testing.assert_array_equal(hme, se)
    np.testing.assert_array_equal(hms, ss)
