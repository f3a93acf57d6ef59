"""Column-level operator library: text stats, dedup, similarity,
log-pipeline ops, multimodal plumbing."""

from . import dedup, logops, multimodal, similarity, textstats  # noqa: F401
