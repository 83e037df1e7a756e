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
