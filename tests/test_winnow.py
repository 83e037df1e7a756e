"""theta-scan (block-decomposed bottom-s sliding window) tests."""

import numpy as np
import jax.numpy as jnp

from mashmap_tpu.kernels import winnow


def test_insert_bottom_s():
    S = winnow.SENTINEL
    st = jnp.asarray(np.array([[2, 5, 9, S], [1, 2, 3, 4]], dtype=np.uint64))
    v = jnp.asarray(np.array([7, 5], dtype=np.uint64))
    out = np.asarray(winnow._insert_bottom_s(st, v))
    np.testing.assert_array_equal(out[0], [2, 5, 7, 9])
    np.testing.assert_array_equal(out[1], [1, 2, 3, 4])  # 5 > max, full
    # duplicate insert is a no-op
    v2 = jnp.asarray(np.array([5, 2], dtype=np.uint64))
    out2 = np.asarray(winnow._insert_bottom_s(st, v2))
    np.testing.assert_array_equal(out2, np.asarray(st))


def test_theta_matches_bruteforce():
    rng = np.random.default_rng(7)
    n_k = 517
    span = 40
    s = 6
    # small hash universe to force duplicates
    hashes = rng.integers(0, 120, size=n_k).astype(np.uint64)
    valid = rng.random(n_k) > 0.1
    got = winnow.window_thresholds(hashes, valid, s, span)
    want = winnow.window_thresholds_bruteforce(hashes, valid, s, span)
    np.testing.assert_array_equal(got, want)


def test_theta_chunked_consistency():
    rng = np.random.default_rng(8)
    n_k = 1000
    span = 64
    s = 5
    hashes = rng.integers(0, 1 << 63, size=n_k).astype(np.uint64)
    valid = np.ones(n_k, bool)
    a = winnow.window_thresholds(hashes, valid, s, span)
    b = winnow.window_thresholds(hashes, valid, s, span,
                                 block_chunk_bytes=span * s * 8 * 2)
    np.testing.assert_array_equal(a, b)
    c = winnow.window_thresholds_bruteforce(hashes, valid, s, span)
    np.testing.assert_array_equal(a, c)


def test_theta_sentinel_when_sparse():
    # fewer than s distinct in a window -> SENTINEL
    hashes = np.arange(10, dtype=np.uint64)
    valid = np.zeros(10, bool)
    valid[:2] = True
    th = winnow.window_thresholds(hashes, valid, 5, 8)
    assert np.all(th == winnow.SENTINEL)
