"""Statistics layer tests (reference: src/map/include/map_stats.hpp)."""

import math

import numpy as np

from mashmap_tpu import stats


def test_j2md_md2j_roundtrip():
    k = 19
    assert stats.j2md(0.0, k) == 1.0
    assert stats.j2md(1.0, k) == 0.0
    for j in [0.01, 0.05, 0.2, 0.5, 0.9]:
        d = stats.j2md(j, k)
        j2 = stats.md2j(d, k)
        assert abs(j2 - j) < 1e-5
    # closed form check (float32 arithmetic)
    j = 0.1
    want = 1.0 - (2 * j / (1 + j)) ** (1.0 / k)
    assert abs(stats.j2md(j, k) - want) < 1e-6


def test_minimum_hits():
    # identity 0.85, k=19: jaccard = md2j(0.15, 19)
    j = stats.md2j(0.15, 19)
    for s in [25, 100, 500]:
        strict = stats.estimate_minimum_hits(s, 19, 0.85)
        assert strict == math.ceil(s * j)
        relaxed = stats.estimate_minimum_hits_relaxed(s, 19, 0.85, 0.95)
        assert 0 <= relaxed <= strict


def test_recommended_sketch_size_regimes():
    # Bigger references need bigger sketches; steps of 10 starting at 10.
    s_small = stats.recommended_sketch_size(
        1e-3, 0.95, 19, 4, 0.85, 5000, 10_000_000)
    s_big = stats.recommended_sketch_size(
        1e-3, 0.95, 19, 4, 0.85, 5000, 3_000_000_000)
    assert s_small % 10 == 0 and s_big % 10 == 0
    assert 10 <= s_small <= s_big
    # p-value at the selected size satisfies the cutoff
    pv = stats.estimate_pvalue(s_big, 19, 4, 0.85, 5000 - 19,
                               3_000_000_000, 0.95)
    assert pv <= 1e-3


def test_sketch_cutoffs_table():
    tbl = stats.sketch_cutoffs(30, 19, 0.0, 0.999)
    assert tbl.shape == (31,)
    assert tbl[0] == 1  # untouched default
    # cutoffs are monotone nondecreasing in cmax and never exceed cmax+1
    assert np.all(np.diff(tbl[1:]) >= 0)
    assert np.all(tbl[1:] >= 1)
    assert np.all(tbl[1:] <= np.arange(1, 31) + 1)


def test_parameters_finalize(tmp_path):
    from mashmap_tpu.params import Parameters
    ref = tmp_path / "r.fa"
    ref.write_text(">a\n" + "ACGT" * 2500 + "\n")
    p = Parameters(ref_sequences=[str(ref)]).finalize()
    assert p.block_length == p.seg_length == 5000
    assert p.chain_gap == 5000
    # no query => self-map mode; the reference does NOT skip self here
    # (the -X flag overrides unconditionally, parseCmdArgs.hpp:340-344)
    assert p.skip_self is False
    assert p.query_sequences == [str(ref)]
    assert p.sketch_size is not None and p.sketch_size >= 10

    pd = Parameters(ref_sequences=[str(ref)], dense=True).finalize()
    md = 1 - 0.85
    assert pd.sketch_size == int(0.02 * (1 + md / 0.05) * (5000 - 19))


# ---------------------------------------------------------------------------
# Oracle-driven sweeps: compile the reference's map_stats.hpp (with the GSL
# shims) and pin our stats layer against it across the int32 referenceSize
# boundary that the stock binary wraps at (parseCmdArgs.hpp:304 assigns the
# uint64 byte size into offset_t=int32, map_parameters.hpp:41) — the
# round-4 flagship divergence (binary s=40 vs honest s=20 at 3.1 GB).
# ---------------------------------------------------------------------------
import os
import subprocess

import pytest

HERE = os.path.dirname(__file__)


@pytest.fixture(scope="module")
def stats_probe():
    r = subprocess.run([os.path.join(HERE, "oracle", "build_ref.sh")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"reference oracle build failed: {r.stderr}")
    return "/tmp/mashmap_ref/stats_probe"


# referenceSize sweep straddling the 2^31 wrap (and the 2^32 re-wrap)
_SIZES = [10**6, 10**8, 2**31 - 1, 2**31, 2**31 + 1, 3_123_562_657,
          2**32 - 1, 2**32, 2**32 + 10**6, 5 * 10**9, 10**10]


def test_sketch_size_matches_binary_across_int32_boundary(stats_probe):
    from mashmap_tpu.params import binary_effective_ref_size
    for size in _SIZES:
        for pi in [0.75, 0.85, 0.95]:
            want = int(subprocess.run(
                [stats_probe, "sketch", str(size), "19", "5000", str(pi)],
                capture_output=True, text=True, check=True).stdout)
            got = stats.recommended_sketch_size(
                1e-3, 0.95, 19, 4, pi, 5000,
                binary_effective_ref_size(size))
            assert got == want, (size, pi, got, want)


def test_sketch_size_exact_mode_matches_unwrapped_oracle(stats_probe):
    for size in [10**6, 2**31 + 1, 3_123_562_657, 10**10]:
        want = int(subprocess.run(
            [stats_probe, "sketch_nowrap", str(size), "19", "5000", "0.95"],
            capture_output=True, text=True, check=True).stdout)
        got = stats.recommended_sketch_size(1e-3, 0.95, 19, 4, 0.95,
                                            5000, size)
        assert got == want, (size, got, want)


def test_flagship_operating_point_pinned(stats_probe):
    """The 3.1 GB flagship: stock binary auto-selects s=40 (int32 wrap),
    the honest computation gives 20. Pin both so neither regresses."""
    from mashmap_tpu.params import binary_effective_ref_size
    size = 3_123_562_657
    assert binary_effective_ref_size(size) == 18446744072538146977
    assert stats.recommended_sketch_size(
        1e-3, 0.95, 19, 4, 0.95, 5000,
        binary_effective_ref_size(size)) == 40
    assert stats.recommended_sketch_size(
        1e-3, 0.95, 19, 4, 0.95, 5000, size) == 20


def test_estimate_pvalue_fuzz_vs_oracle(stats_probe):
    """estimate_pvalue parity across scale/s/pi (rel tol: the shims use
    lgamma-sum binomials; SciPy is the same math)."""
    for size in [10**6, 2**31 + 1, 10**10]:
        for s in [10, 40, 100]:
            for pi in [0.75, 0.85, 0.99]:
                for wrap in [0, 1]:
                    want = float(subprocess.run(
                        [stats_probe, "pvalue", str(s), "19", "5000",
                         str(pi), str(size), str(wrap)],
                        capture_output=True, text=True, check=True).stdout)
                    from mashmap_tpu.params import binary_effective_ref_size
                    eff = binary_effective_ref_size(size) if wrap else size
                    got = stats.estimate_pvalue(s, 19, 4, pi, 5000 - 19,
                                                eff, 0.95)
                    if want == 0.0:
                        assert got < 1e-290
                    else:
                        assert abs(got - want) <= 1e-6 * abs(want) + 1e-300, (
                            size, s, pi, wrap, got, want)


def test_parameters_finalize_wrap_default(tmp_path, stats_probe):
    """Parameters.finalize mirrors the binary by default; --exactRefSize
    opts out. (reference_size is injected directly: no 3 GB fixture.)"""
    from mashmap_tpu.params import Parameters
    ref = tmp_path / "r.fa"
    ref.write_text(">a\n" + "ACGT" * 2500 + "\n")
    p = Parameters(ref_sequences=[str(ref)], percentage_identity=0.95,
                   reference_size=3_123_562_657).finalize()
    assert p.sketch_size == 40
    pe = Parameters(ref_sequences=[str(ref)], percentage_identity=0.95,
                    reference_size=3_123_562_657,
                    exact_ref_size=True).finalize()
    assert pe.sketch_size == 20
