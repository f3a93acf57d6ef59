"""Column-level operator library: text stats, dedup, similarity,
log-pipeline ops, multimodal plumbing."""

from . import (  # noqa: F401
    classify,
    dedup,
    logops,
    multimodal,
    similarity,
    textstats,
)
