"""Fuzz the libstdc++ std::sort emulation against the real thing.

mashmap_tpu/map/cxxsort.py replays GNU introsort so the merged-chain
head (whose conservedSketches becomes PAF column 10,
computeMap.hpp:1646-1698) is picked bit-identically to the reference
binary. This test compiles a small C++ driver with the system
toolchain and compares permutations on adversarial key patterns.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from mashmap_tpu.map.cxxsort import cxx_sort_perm

HERE = os.path.dirname(os.path.abspath(__file__))
DRIVER_SRC = os.path.join(HERE, "oracle", "cxxsort_driver.cpp")
DRIVER_BIN = "/tmp/mashmap_ref/cxxsort_driver"


@pytest.fixture(scope="module")
def driver():
    if shutil.which("g++") is None:
        pytest.skip("no g++ in this environment")
    os.makedirs(os.path.dirname(DRIVER_BIN), exist_ok=True)
    if (not os.path.exists(DRIVER_BIN)
            or os.path.getmtime(DRIVER_BIN)
            < os.path.getmtime(DRIVER_SRC)):
        subprocess.run(["g++", "-O2", "-o", DRIVER_BIN, DRIVER_SRC],
                       check=True)
    return DRIVER_BIN


def batches():
    rng = np.random.default_rng(20260817)
    out = []
    # the merge's actual shape: blocks of one repeated key (chains),
    # in ascending block order — plus general adversarial patterns
    for n in (2, 3, 15, 16, 17, 31, 32, 33, 40, 56, 63, 64, 100, 127,
              128, 200, 341, 512, 1000, 2048):
        out.append(np.full(n, 7))                       # all-equal
        out.append(np.arange(n))                        # sorted
        out.append(np.arange(n)[::-1].copy())           # reversed
        out.append(rng.integers(0, max(1, n // 4), n))  # heavy ties
        out.append(rng.integers(-2**40, 2**40, n))      # distinct-ish
        # chain-shaped: ascending root ids with random run lengths
        runs = []
        root = 0
        total = 0
        while total < n:
            ln = int(rng.integers(1, 9))
            ln = min(ln, n - total)
            runs.extend([root] * ln)
            root += int(rng.integers(1, 3))
            total += ln
        out.append(np.array(runs))
        # same, shuffled (post-find ids arrive grouped but the sort
        # input order is position order — not id-grouped)
        sh = np.array(runs)
        rng.shuffle(sh)
        out.append(sh)
    for n in range(0, 20):                              # tiny sizes
        out.append(rng.integers(0, 3, n))
    return out


def test_matches_real_std_sort(driver):
    arrays = batches()
    feed = []
    for a in arrays:
        feed.append(str(len(a)))
        feed.extend(str(int(x)) for x in a)
    res = subprocess.run([driver], input=" ".join(feed),
                         capture_output=True, text=True, check=True)
    lines = res.stdout.splitlines()
    assert len(lines) == len(arrays)
    for a, line in zip(arrays, lines):
        want = [int(x) for x in line.split()] if line.strip() else []
        got = cxx_sort_perm([int(x) for x in a])
        assert got == want, (
            f"n={len(a)} keys={a.tolist()[:50]}...: "
            f"emulation diverges from std::sort")
        ks = [int(a[i]) for i in got]
        assert ks == sorted(ks)
