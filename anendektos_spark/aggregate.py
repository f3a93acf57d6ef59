"""Per-sink aggregates — the reference's declared-but-empty summarize
stage (parser.d:170-180 discards its result; anendektos.ini:10-16 names
the outputs), realized per BASELINE.json:north_star.

All aggregates are plain hash aggregates (partial map-side combine +
final) or a single window for top-K — no driver-side loops, no UDAFs.

- sink_counts: O19 — the per-fixture record counts the reference tests
  pin (conn.d:233-237 …).
- distinct_keys: exact countDistinct of the sink's key column (uid/fuid/
  id — the lookup key of every reference golden test, conn.d:242-246).
- top_k: frequency top-K of a per-sink headline field (dns query
  dns.d:115, http host http.d:115, ssl server_name ssl.d:107, …) via
  groupBy + window rank. The groupBy pre-aggregates to distinct values
  before the window, so the window input is tiny.
- time_bucketed: per (tool[, conv_id], minute) counts over the record's
  own ts (epoch double, conn.d:26/74).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOP_K_FIELD = {
    "conn": "resp_h", "dns": "query", "http": "host",
    "files": "mime_type", "ssl": "server_name", "x509": "certificate_issuer",
}


def sink_counts(sinks: dict[str, DataFrame]) -> DataFrame:
    """One row per tool: routed record count (O19)."""
    parts = [df.groupBy("tool").agg(F.count("*").alias("n_records")) for df in sinks.values()]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def distinct_keys(sinks: dict[str, DataFrame], key_column: dict[str, str]) -> DataFrame:
    parts = [
        df.groupBy("tool").agg(F.countDistinct(key_column[t]).alias("n_distinct_keys"))
        for t, df in sinks.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def top_k(df: DataFrame, field: str, k: int = 10) -> DataFrame:
    """Top-K values of ``field`` by frequency within each tool.

    Ties broken by value ascending so the result is deterministic."""
    counts = df.groupBy("tool", field).agg(F.count("*").alias("n"))
    w = Window.partitionBy("tool").orderBy(F.desc("n"), F.col(field).asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("tool", F.col(field).alias("value"), "n", "rank")
    )


def time_bucketed(df: DataFrame, bucket: str = "minute", by_conv: bool = False) -> DataFrame:
    """Counts per (tool[, conv_id], time bucket) over the parsed ts."""
    keys = ["tool"] + (["conv_id"] if by_conv else [])
    b = F.date_trunc(bucket, F.timestamp_seconds(F.col("ts"))).alias("bucket")
    return df.groupBy(*keys, b).agg(F.count("*").alias("n")).select(*keys, "bucket", "n")


def reject_counts(rejects: DataFrame) -> DataFrame:
    """Metrics for the error channel: rows per (tool, reason) — the
    errorf/warningf tallies (O17/O24)."""
    return rejects.groupBy("tool", "reject_reason").agg(F.count("*").alias("n"))
