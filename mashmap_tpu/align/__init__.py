"""Base-level alignment stage (the reference's ``mashmap-align`` binary).

Turns mashmap mappings into base-level alignments: per mapping row, a
semi-global (free target end-gaps) unit-cost edit-distance alignment of
the query region onto the reference region, reported as the original row
plus an edit-distance rate and a standard CIGAR
(reference: src/align/include/computeAlignments.hpp:36-301).

TPU-native design (NOT a port of edlib's word-serial Myers bit-vector):
exact unique k-mer anchors are chained inside each mapped region, the
inter-anchor gaps become thousands of small independent banded DP
problems batched on the device (see kernel.py), and CIGARs are stitched
on the host through the exact-match anchors.
"""

from .driver import Aligner, align_files  # noqa: F401
