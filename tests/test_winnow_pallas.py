"""Pallas theta kernel vs the XLA scan (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mashmap_tpu.kernels import winnow
from mashmap_tpu.kernels.winnow_pallas import theta_chunk_pallas, C_T


@pytest.mark.parametrize("seed,s,s_b,invalid_frac", [
    (0, 20, 300, 0.1),
    (1, 30, 513, 0.0),      # s_b not a multiple of SEG_K
    (2, 8, 64, 0.5),        # heavy invalidity
    # production shapes (defaults: w=5000, k=19 => s_b=4982; auto
    # sketch sizes land in s=85-130) so the kernel is trustworthy the
    # day the backend's Mosaic compiler works (~30s in interpret mode)
    pytest.param(3, 120, 4982, 0.02, marks=pytest.mark.slow),
    pytest.param(4, 85, 4982, 0.0, marks=pytest.mark.slow),
])
def test_pallas_matches_xla_scan(seed, s, s_b, invalid_frac):
    rng = np.random.default_rng(seed)
    C = C_T
    cur = rng.integers(0, 50 * s, (C, s_b)).astype(np.int32)
    nxt = rng.integers(0, 50 * s, (C, s_b)).astype(np.int32)
    cur[rng.random((C, s_b)) < invalid_frac] = winnow.RSENT
    nxt[rng.random((C, s_b)) < invalid_frac] = winnow.RSENT
    ours = np.asarray(theta_chunk_pallas(
        jnp.asarray(cur), jnp.asarray(nxt), s, s_b, interpret=True))
    ref = np.asarray(winnow._theta_chunk(
        jnp.asarray(cur), jnp.asarray(nxt), s, s_b))
    np.testing.assert_array_equal(ours, ref)
