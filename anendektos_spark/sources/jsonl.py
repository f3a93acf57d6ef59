"""JSONL transcript source: newline-delimited JSON → transcripts rows +
a malformed-line reject channel.

Crawl and agent-log deliveries commonly arrive as JSONL long before they
are compacted to parquet/Iceberg; this connector gives that format the
same contract as the Zeek TSV source — the north-star transcript shape
out, a row-level error channel instead of silent drops, and fully
distributed reads:

- lines are read with ``spark.read.text`` (splittable — a 100 GB JSONL
  file fans out across tasks like any text source);
- parsing is ``from_json`` with the EXPLICIT transcript schema, JVM-side
  (never the inference-scans-the-corpus ``spark.read.json`` path, and no
  Python);
- a line that fails to parse, or parses without the two identity fields
  (conv_id, turn_idx), lands in ``rejects`` with the raw line and a
  reason — mirroring the TSV source's reject policy (SURVEY §1.3 row-drop
  semantics at source grain).

ts arrives as epoch seconds (integer) in the JSON and is surfaced as a
timestamp; extra JSON keys are ignored by from_json's permissive mode.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts_epoch bigint, _corrupt string"
)


@dataclass(frozen=True)
class JsonlRead:
    rows: DataFrame
    rejects: DataFrame


def _shape(raw: DataFrame) -> JsonlRead:
    raw = raw.filter(F.trim("value") != "")
    # PERMISSIVE from_json yields an all-null struct (not a null struct)
    # for malformed input, so bad JSON is detected the standard way: a
    # corrupt-record column in the schema that from_json fills with the
    # raw text exactly when parsing failed
    parsed = raw.select(
        F.col("value").alias("line"),
        F.from_json(
            "value", _SCHEMA, {"columnNameOfCorruptRecord": "_corrupt"}
        ).alias("r"),
    )
    bad_json = F.col("r").isNull() | F.col("r._corrupt").isNotNull()
    ok = (
        ~bad_json
        & F.col("r.conv_id").isNotNull()
        & F.col("r.turn_idx").isNotNull()
    )
    rows = parsed.filter(ok).select(
        F.col("r.conv_id").alias("conv_id"),
        F.col("r.turn_idx").alias("turn_idx"),
        F.col("r.role").alias("role"),
        F.col("r.text").alias("text"),
        F.col("r.tool").alias("tool"),
        F.timestamp_seconds(F.col("r.ts_epoch")).alias("ts"),
    )
    rejects = parsed.filter(~ok).select(
        "line",
        F.when(bad_json, "bad_json")
        .otherwise("missing_identity")
        .alias("reject_reason"),
    )
    return JsonlRead(rows=rows, rejects=rejects)


def read_jsonl(spark: SparkSession, path: str) -> JsonlRead:
    """Read JSONL transcripts under ``path``; returns (rows, rejects).

    rows: the transcript shape (conv_id, turn_idx, role, text, tool, ts).
    rejects: (line, reject_reason) — bad_json for unparseable lines,
    missing_identity when conv_id/turn_idx is absent or null. Blank
    lines are silently skipped (they carry no record, like the TSV
    source's comment filter)."""
    return _shape(spark.read.text(path))


def stream_jsonl(spark: SparkSession, path: str) -> JsonlRead:
    """Streaming twin of :func:`read_jsonl`: the same explicit-schema
    shaping over ``readStream.text`` — new JSONL files appearing under
    ``path`` become transcript rows + rejects exactly once (file-source
    checkpointing), ready for the foreachBatch fan-out or any stateful
    op downstream. Identical select exprs, so stream == batch row-for-row
    on the same files (pinned in tests)."""
    return _shape(spark.readStream.text(path))
