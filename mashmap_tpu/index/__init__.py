"""Reference index: device-friendly sorted-array / CSR structures."""

from .builder import ReferenceIndex, build_index, contig_minmer_intervals  # noqa: F401
