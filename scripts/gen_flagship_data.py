#!/usr/bin/env python
"""Generate the flagship benchmark dataset (BASELINE config 5 shape).

Round-2 generated these ad hoc and the files were lost to a machine
reimage; this script makes the workload reproducible:

- data/generated/hg3g.fa      — 3.05 Gbp synthetic reference, 24
  chromosomes with hg38-shaped length distribution (chr1..chr22,X,Y).
- data/generated/hg3g_asm.fa  — mutated assembly of the same genome:
  2.5% SNPs, chromosomes split into 2-8 Mbp contigs (the shape of a
  de-novo human assembly mapped back to GRCh38,
  /root/reference/README.md:8).

Pure-numpy vectorized (the tests/genomes.py helpers are string-based
and too slow at 3 Gbp); ~100 MB/s on one core. Deterministic (seeded).

Usage: python scripts/gen_flagship_data.py [--scale 1.0]
  --scale 0.02 produces a ~60 Mbp smoke-test pair with the same shape.
"""
import argparse
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(HERE, "data", "generated")

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
NEWLINE = np.uint8(ord("\n"))
WIDTH = 80

# hg38-ish chromosome lengths (Mbp), summing ~3.05 Gbp at scale 1.0
CHR_MBP = [248, 242, 198, 190, 182, 171, 159, 145, 138, 134,
           135, 133, 114, 107, 102, 90, 83, 80, 59, 64,
           47, 51, 156, 57]
SNP_RATE = 0.025
CONTIG_MIN, CONTIG_MAX = 2_000_000, 8_000_000


def write_record(fh, name: str, idx: np.ndarray) -> None:
    """Write one FASTA record from a 0..3 base-index array, 80 cols."""
    fh.write(f">{name}\n".encode())
    arr = BASES[idx]
    n = len(arr)
    pad = (-n) % WIDTH
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
    rows = arr.reshape(-1, WIDTH)
    out = np.empty((rows.shape[0], WIDTH + 1), np.uint8)
    out[:, :WIDTH] = rows
    out[:, WIDTH] = NEWLINE
    buf = out.tobytes()
    if pad:  # drop the padding and keep a trailing newline
        buf = buf[:-(pad + 1)] + b"\n"
    fh.write(buf)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=314)
    args = ap.parse_args()

    os.makedirs(DATA, exist_ok=True)
    suffix = "" if args.scale == 1.0 else f"_s{args.scale:g}"
    ref_path = os.path.join(DATA, f"hg3g{suffix}.fa")
    asm_path = os.path.join(DATA, f"hg3g_asm{suffix}.fa")

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    total = 0
    with open(ref_path, "wb") as rf, open(asm_path, "wb") as af:
        for ci, mbp in enumerate(CHR_MBP):
            n = max(int(mbp * 1e6 * args.scale), CONTIG_MIN // 4)
            name = f"chr{ci + 1}" if ci < 22 else ("chrX", "chrY")[ci - 22]
            idx = rng.integers(0, 4, size=n, dtype=np.uint8)
            write_record(rf, name, idx)
            # mutated assembly: 2.5% SNPs, then 2-8 Mbp contig pieces
            mut = rng.random(n) < SNP_RATE
            shift = rng.integers(1, 4, size=int(mut.sum()), dtype=np.uint8)
            asm = idx.copy()
            asm[mut] = (asm[mut] + shift) % 4
            pos, k = 0, 0
            while pos < n:
                clen = int(rng.integers(CONTIG_MIN, CONTIG_MAX + 1))
                clen = min(clen, n - pos)
                write_record(af, f"asm_{name}_ctg{k}", asm[pos:pos + clen])
                pos += clen
                k += 1
            total += n
            print(f"[gen] {name}: {n/1e6:.0f} Mbp "
                  f"({total/1e6:.0f} Mbp total, {time.time()-t0:.0f}s)",
                  file=sys.stderr)
    print(f"[gen] wrote {ref_path} and {asm_path}: {total/1e6:.0f} Mbp "
          f"in {time.time()-t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
