"""Query sketch tests: device kernel vs. byte-serial oracle."""

import numpy as np
import jax.numpy as jnp

from mashmap_tpu.kernels import kmers
from mashmap_tpu.kernels.sketch import (
    sketch_fragments, sketch_sequence_py, complexity_rescale, UMAX)
from tests.genomes import random_genome


def test_sketch_matches_oracle():
    rng = np.random.default_rng(3)
    k, s, L = 11, 8, 400
    seqs = []
    for i in range(6):
        seq = list(random_genome(L, seed=10 + i))
        # sprinkle Ns and lowercase
        for p in rng.integers(0, L, 5):
            seq[p] = "N"
        for p in rng.integers(0, L, 10):
            seq[p] = seq[p].lower()
        seqs.append("".join(seq))

    mat = np.stack([kmers.sanitize(s_.encode()) for s_ in seqs])
    h, st, cnt, cx = sketch_fragments(jnp.asarray(mat), k, s)
    h, st = np.asarray(h), np.asarray(st)
    cnt, cx = np.asarray(cnt), np.asarray(cx)

    for i, s_ in enumerate(seqs):
        oh, ostrand, ocnt, ocx = sketch_sequence_py(
            kmers.sanitize(s_.encode()), k, s)
        assert cnt[i] == ocnt
        np.testing.assert_array_equal(h[i, :ocnt], oh)
        assert np.all(h[i, ocnt:] == UMAX)
        np.testing.assert_array_equal(st[i, :ocnt], ostrand)
        assert abs(cx[i] - ocx) < 1e-9
        # ascending hash order (required by L2's SlideMapper semantics)
        assert np.all(np.diff(h[i, :ocnt].view(np.uint64)) > 0)


def test_sketch_n_padding_invariance():
    """'N'-padding a fragment must not change its sketch."""
    k, s = 11, 6
    seq = random_genome(200, seed=42)
    a = kmers.sanitize(seq.encode())
    b = np.full(300, ord("N"), np.uint8)
    b[:200] = a
    ha, sa, ca, xa = sketch_fragments(jnp.asarray(a[None]), k, s)
    hb, sb, cb, xb = sketch_fragments(jnp.asarray(b[None]), k, s)
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    assert int(ca[0]) == int(cb[0])
    fixed = complexity_rescale(np.asarray(xb), 300, np.int64(200), k)
    assert abs(float(fixed) - float(xa[0])) < 1e-12


def test_all_n_fragment():
    k, s = 11, 6
    mat = np.full((1, 100), ord("N"), np.uint8)
    h, st, cnt, cx = sketch_fragments(jnp.asarray(mat), k, s)
    assert int(cnt[0]) == 0
    assert float(cx[0]) == 0.0
    assert np.all(np.asarray(h) == UMAX)


def test_sketch_size_exceeds_window_count():
    """Regression: s >= L-k+1 (tiny fragments or huge -J) must produce
    the valid min(s, n_distinct)-entry sketch, not a broadcast crash."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for (L, k, s) in [(20, 5, 16), (25, 5, 21), (30, 11, 40)]:
        frags = rng.choice(bases, (2, L))
        h, st, cnt, _ = sketch_fragments(jnp.asarray(frags), k, s)
        assert h.shape == (2, s)
        for i in range(2):
            oh, ostr, ocnt, _ = sketch_sequence_py(frags[i], k, s)
            assert int(cnt[i]) == ocnt
            np.testing.assert_array_equal(np.asarray(h[i][:ocnt]), oh)
            np.testing.assert_array_equal(np.asarray(st[i][:ocnt]), ostr)
