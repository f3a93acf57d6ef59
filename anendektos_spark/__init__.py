"""anendektos_spark — a PySpark-native parse → enrich → route → aggregate
pipeline for multi-turn agent transcripts, with the query semantics of the
reference Zeek-log summarizer (steveno/anendektos, studied at
/root/reference; all file:line citations in docstrings point there).

This is a from-scratch Spark design, not a port: the reference's
single-threaded D fiber pipeline becomes a declarative DataFrame plan
(Catalyst-optimized, whole-stage-codegen'd, Arrow-batched where Python is
unavoidable), designed for 10^12-turn Iceberg tables on multi-executor
clusters while remaining bit-for-bit faithful to the reference's per-field
extraction semantics.
"""

__version__ = "0.1.0"
