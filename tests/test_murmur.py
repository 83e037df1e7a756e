"""MurmurHash3_x64_128 parity tests.

The JAX implementation must be bit-exact with the byte-serial algorithm
(reference: src/common/murmur3.h:226-303). The pure-Python oracle in
kernels/murmur.py implements the same spec independently; known-answer
vectors below were additionally cross-checked against the published
MurmurHash3 reference values.
"""

import numpy as np
import jax.numpy as jnp

from mashmap_tpu.kernels.murmur import (
    murmur128_low64, murmur128_low64_py, hash_kmer_windows, SEED)


def test_known_vectors():
    # Known-answer vectors generated with the canonical MurmurHash3_x64_128
    # implementation (seed 42, low 64 bits of the 128-bit digest).
    cases = {
        b"": 17305828677633410339,
        b"a": 2892890568104748720,
        b"foo": 17606432766137750514,
        b"ACGTACGTACGTACGTACG": 2819345507021956028,  # 19-byte (k=19)
        b"The quick brown fox": 11026268933861320091,
        b"NNNNNNNNNNNNNNNNNNN": 17953916120634147333,
    }
    for key, want in cases.items():
        got = murmur128_low64_py(key, 42)
        assert got == want, (key, got)
        got_jax = int(murmur128_low64(
            jnp.asarray(np.frombuffer(key, np.uint8)), len(key)))
        assert got_jax == want, (key, got_jax)


def test_jax_matches_python_oracle():
    rng = np.random.default_rng(0)
    for length in [1, 3, 7, 8, 9, 15, 16, 17, 19, 21, 31, 32, 33, 48]:
        batch = rng.integers(0, 256, size=(17, length), dtype=np.uint8)
        got = np.asarray(murmur128_low64(jnp.asarray(batch), length))
        want = np.array(
            [murmur128_low64_py(bytes(row), SEED) for row in batch],
            dtype=np.uint64)
        np.testing.assert_array_equal(got, want)


def test_hash_kmer_windows():
    rng = np.random.default_rng(1)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=64)
    k = 19
    got = np.asarray(hash_kmer_windows(jnp.asarray(seq), k))
    want = np.array(
        [murmur128_low64_py(bytes(seq[i:i + k]), SEED)
         for i in range(len(seq) - k + 1)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
