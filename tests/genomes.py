"""Deterministic synthetic genome generation for tests and benchmarks.

The reference's CI fixture (an 8-haplotype yeast pangenome,
data/scerevisiae8.fa.gz) is a stripped blob in this environment, so tests
use synthetic pangenomes: a random base genome plus haplotypes derived by
point mutations / indels at a controlled divergence — the same structure
the reference's coverage gate exercises (scripts/test.sh).
"""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(length: int, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    return rng.choice(BASES, size=length).tobytes().decode()


def mutate(seq: str, divergence: float, seed: int = 1,
           indel_frac: float = 0.1) -> str:
    """Point-mutate (and lightly indel) a sequence to a target divergence."""
    rng = np.random.default_rng(seed)
    arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
    n = len(arr)
    n_mut = int(n * divergence)
    pos = rng.choice(n, size=n_mut, replace=False)
    subs = pos[int(n_mut * indel_frac):]
    arr[subs] = BASES[(np.searchsorted(BASES, arr[subs]) +
                       rng.integers(1, 4, len(subs))) % 4]
    out = arr.tobytes().decode()
    # a few indels
    for p in sorted(pos[: int(n_mut * indel_frac)].tolist(), reverse=True):
        if rng.random() < 0.5:
            out = out[:p] + out[p + 1:]
        else:
            out = out[:p] + rng.choice(list("ACGT")) + out[p:]
    return out


def revcomp(seq: str) -> str:
    comp = str.maketrans("ACGT", "TGCA")
    return seq.translate(comp)[::-1]


def write_fasta(path: str, records: list[tuple[str, str]],
                width: int = 80) -> None:
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i:i + width] + "\n")


def pangenome(n_haplotypes: int, length: int, divergence: float,
              seed: int = 0) -> list[tuple[str, str]]:
    """PanSN-style haplotypes (name pattern hap#N#chr1) of one genome."""
    base = random_genome(length, seed)
    recs = [("hap#0#chr1", base)]
    for i in range(1, n_haplotypes):
        recs.append((f"hap#{i}#chr1", mutate(base, divergence, seed + i)))
    return recs
