#!/usr/bin/env python
"""De novo repeat annotation from mashmap self-mapping output.

Equivalent of the reference's scripts/denovo_repeat_annotation.py:
label genome segments similar to other loci as repeats. Same filter
semantics (non-self or offset by >= 1.5x the minimum length on both
ends; length >= min_length; identity + 1 >= min_identity), same BED
output (end+1), plus built-in interval merging (--merge) so bedtools
isn't needed.

Usage:
    mashmap-tpu -r genome.fa -q genome.fa -f none -s 5000 --pi 95 \\
        --legacy -o mashmap.out
    denovo_repeat_annotation.py mashmap.out 5000 95 [--merge] > repeats.bed

Accepts both the legacy format (identity in column 10) and PAF
(identity from the id:f tag, converted to a percentage).
"""

import sys


def parse_rows(path):
    with open(path) as fh:
        for line in fh:
            f = line.split()
            if len(f) < 10:
                continue
            if f[9].replace(".", "", 1).isdigit() and "id:f:" not in line:
                identity = float(f[9])          # legacy column
            else:
                identity = None
                for tok in f[12:]:
                    if tok.startswith("id:f:"):
                        identity = float(tok[5:]) * 100.0
                        break
                if identity is None:
                    continue
            yield (f[0], int(f[2]), int(f[3]), f[5], int(f[7]), int(f[8]),
                   identity)


def main(argv):
    merge = "--merge" in argv
    args = [a for a in argv[1:] if a != "--merge"]
    if len(args) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    argv = [argv[0]] + args
    min_len = int(argv[2])
    min_id = float(argv[3]) if len(argv) > 3 else 0.0
    repeats = []
    for c1, s1, e1, c2, s2, e2, ident in parse_rows(argv[1]):
        if (c1 != c2 or (abs(s1 - s2) >= 1.5 * min_len
                         and abs(e1 - e2) >= 1.5 * min_len)):
            # +1 on identity for sensitivity, like the reference
            if e1 - s1 + 1 >= min_len and ident + 1 >= min_id:
                repeats.append((c1, s1, e1 + 1))
    repeats.sort()
    if merge:
        merged = []
        for c, a, b in repeats:
            if merged and merged[-1][0] == c and a <= merged[-1][2]:
                merged[-1][2] = max(merged[-1][2], b)
            else:
                merged.append([c, a, b])
        repeats = [tuple(x) for x in merged]
    for c, a, b in repeats:
        print(f"{c}\t{a}\t{b}")
    return 0


if __name__ == "__main__":
    sys.exit(main(["denovo_repeat_annotation.py"] + sys.argv[1:]))
