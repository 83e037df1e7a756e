#!/usr/bin/env python
"""Per-sequence mapped-coverage gate.

Equivalent of the reference's scripts/test.sh (the CI acceptance check,
.github/workflows/build-and-test.yml:73-74) without the bedtools
dependency: both query and target intervals of every PAF row count
toward a sequence's coverage; merged interval length / sequence length
must reach the threshold for every sequence in the .fai.

Usage: check_coverage.py <fasta.fai> <mappings.paf> <min_coverage>
Exits 1 and prints the offending sequences if any is below threshold.
"""

import sys


def merged_len(intervals):
    total = 0
    cur_a = cur_b = None
    for a, b in sorted(intervals):
        if cur_a is None:
            cur_a, cur_b = a, b
        elif a > cur_b:
            total += cur_b - cur_a
            cur_a, cur_b = a, b
        else:
            cur_b = max(cur_b, b)
    if cur_a is not None:
        total += cur_b - cur_a
    return total


def coverage_by_sequence(lengths, paf_lines):
    """name -> mapped coverage fraction (query+target intervals merged),
    the scripts/test.sh:13-25 semantics. ``lengths`` maps every sequence
    name to its length; ``paf_lines`` yields PAF rows."""
    spans = {name: [] for name in lengths}
    for line in paf_lines:
        f = line.rstrip("\n").split("\t")
        if len(f) < 9:
            continue
        if f[0] in spans:
            spans[f[0]].append((int(f[2]), int(f[3])))
        if f[5] in spans:
            spans[f[5]].append((int(f[7]), int(f[8])))
    return {name: (merged_len(spans[name]) / ln if ln else 0.0)
            for name, ln in lengths.items()}


def main(argv):
    if len(argv) != 4:
        print(__doc__, file=sys.stderr)
        return 2
    fai, paf, threshold = argv[1], argv[2], float(argv[3])
    lengths = {}
    with open(fai) as fh:
        for line in fh:
            f = line.split("\t")
            lengths[f[0]] = int(f[1])
    with open(paf) as fh:
        cov_map = coverage_by_sequence(lengths, fh)
    print("#seq.name\tcoverage")
    rows = list(cov_map.items())
    failed = False
    for name, cov in sorted(rows, key=lambda r: (-r[1], r[0])):
        print(f"{name}\t{cov:f}")
    for name, cov in rows:
        if cov < threshold:
            print(f"Low coverage for sequence {name} with coverage "
                  f"{cov:f}")
            failed = True
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
