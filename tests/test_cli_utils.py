"""CLI surface, handy-parameter suffixes, progress meter, scripts."""

import io
import subprocess
import sys
import os

import pytest

from mashmap_tpu.utils import handy_parameter
from mashmap_tpu.progress import ProgressMeter
from mashmap_tpu.cli import build_parser, args_to_params

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)


def test_handy_parameter():
    # reference: src/common/utils.cpp:9-31
    assert handy_parameter("5000") == 5000
    assert handy_parameter("5k") == 5000
    assert handy_parameter("5K") == 5000
    assert handy_parameter("1.5k") == 1500
    assert handy_parameter("1M") == 1_000_000
    assert handy_parameter("2g") == 2_000_000_000
    assert handy_parameter("junk") == -1


def test_cli_suffix_parsing(tmp_path):
    ref = tmp_path / "r.fa"
    ref.write_text(">a\n" + "ACGT" * 50 + "\n")
    a = build_parser().parse_args(
        ["-r", str(ref), "-s", "5k", "-l", "10k", "-c", "2k"])
    p = args_to_params(a)
    assert p.seg_length == 5000
    assert p.block_length == 10000
    assert p.chain_gap == 2000


@pytest.mark.parametrize("argv,msg", [
    (["-s", "50"], "segment length"),
    (["--pi", "30"], "identity"),
    (["-n", "0"], "mappings to retain"),
    (["-l", "-5"], "block length"),
])
def test_cli_validation_errors(tmp_path, argv, msg, capsys):
    ref = tmp_path / "r.fa"
    ref.write_text(">a\nACGTACGT\n")
    a = build_parser().parse_args(["-r", str(ref)] + argv)
    with pytest.raises(SystemExit):
        args_to_params(a)
    assert msg in capsys.readouterr().err


def test_progress_meter():
    buf = io.StringIO()
    m = ProgressMeter(1000, "[x] mapped", stream=buf, interval=0.01)
    m.increment(500)
    import time
    time.sleep(0.05)
    m.finish()
    out = buf.getvalue()
    assert "100.00%" in out
    assert "bp/s" in out


def test_progress_meter_unsized():
    # total<=0 => unsized meter (non-tty, no .fai): counts, no percent
    buf = io.StringIO()
    m = ProgressMeter(0, "[x] mapped", stream=buf, interval=0.01)
    m.increment(1234)
    import time
    time.sleep(0.05)
    m.finish()
    out = buf.getvalue()
    assert "%" not in out
    assert "1234 bp" in out


def test_progress_meter_rises_during_run():
    # the meter must move with increments, not only at finish
    # (reference increments per sequence: computeMap.hpp:638,
    # progress.hpp:25-55)
    buf = io.StringIO()
    m = ProgressMeter(1000, "[x] mapped", stream=buf, interval=0.01)
    import time
    m.increment(250)
    deadline = time.time() + 2.0     # poll: fixed sleeps are flaky
    mid = ""
    while time.time() < deadline and "25.00%" not in mid:
        time.sleep(0.02)
        mid = buf.getvalue()
    m.increment(750)
    m.finish()
    assert "25.00%" in mid
    assert "100.00%" in buf.getvalue()


def test_check_coverage_script(tmp_path):
    fai = tmp_path / "r.fai"
    fai.write_text("s1\t1000\t0\t0\t0\n")
    paf = tmp_path / "m.paf"
    paf.write_text("s1\t1000\t0\t950\t+\ts1\t1000\t0\t950\t950\t950\t255\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_coverage.py"),
         str(fai), str(paf), "0.92"], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_coverage.py"),
         str(fai), str(paf), "0.99"], capture_output=True, text=True)
    assert r.returncode == 1
    assert "Low coverage" in r.stdout


def test_dotplot_script(tmp_path):
    paf = tmp_path / "m.paf"
    paf.write_text(
        "q1\t1000\t0\t500\t+\tr1\t2000\t100\t600\t500\t500\t255\n"
        "q1\t1000\t500\t900\t-\tr1\t2000\t700\t1100\t400\t400\t255\n")
    out = tmp_path / "d.svg"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "generate_dotplot.py"),
         str(paf), str(out)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    svg = out.read_text()
    assert svg.startswith("<svg") and svg.count("<line") >= 2
