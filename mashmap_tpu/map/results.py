"""Mapping result record (reference: MappingResult, base_types.hpp:154-206)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class MappingResult:
    query_len: int = 0
    ref_start: int = 0
    ref_end: int = 0
    query_start: int = 0
    query_end: int = 0
    ref_seq_id: int = 0
    query_seq_id: int = 0
    block_length: int = 0
    nuc_identity: float = 0.0          # [0,1]
    nuc_identity_ub: float = 0.0
    sketch_size: int = 0
    conserved_sketches: int = 0
    strand: int = 1                    # +1 / -1
    approx_matches: int = 0
    kmer_complexity: float = 0.0
    n_merged: int = 1
    split_mapping_id: int = 0
    discard: int = 0
    self_map_filter: bool = False

    def qlen(self) -> int:
        return self.query_end - self.query_start + 1

    def rlen(self) -> int:
        return self.ref_end - self.ref_start + 1

    def stable_hash(self) -> int:
        """Deterministic row hash for --sparsifyMappings subsampling.

        The reference combines std::hash of the fields
        (base_types.hpp:187-204); exact std::hash output is
        implementation-defined, so we use our own stable mix — the flag is
        a random-subsample knob, not an output-parity surface.
        """
        from ..kernels.murmur import murmur128_low64_py
        key = (f"{self.query_len},{self.ref_start},{self.ref_end},"
               f"{self.query_start},{self.query_end},{self.ref_seq_id},"
               f"{self.query_seq_id},{self.block_length},"
               f"{self.nuc_identity:.6g},{self.nuc_identity_ub:.6g},"
               f"{self.sketch_size},{self.conserved_sketches},"
               f"{self.strand},{self.approx_matches}")
        return murmur128_low64_py(key.encode())
