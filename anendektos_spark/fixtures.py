"""Deterministic transcript synthesis (FIXTURES.md §1, §5).

Golden scale: one transcript row per fixture data line — ``text`` is the
exact TSV line, ``tool`` the reference header's #path routing key
(parser.d:72-86), ``conv_id`` the record's key field, ``turn_idx`` the
0-based line ordinal, ``ts`` the line's own epoch. Plus a few
``unknown_tool`` rows to exercise the unimplemented-path channel
(parser.d:85).

Scale/skew generator: distributed replication (spark.range × broadcast of
the 24 golden rows) with deterministic conv_id perturbation, optional
hot-conversation skew and malformed-row injection. No wall-clock, no
randomness — fully reproducible given the parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .data.zeek_fixture_lines import FIXTURE_LINES
from .schemas import TRANSCRIPTS_SCHEMA

UNKNOWN_TOOL_ROWS = [
    ("UNK0cafebabe", 0, "user", "1531687175.000000\tsome\tunparsed\tpayload", "weird", 1531687175.0),
    ("UNK1deadbeef", 1, "assistant", "1531687180.000000\tother\tpayload", "telemetry", 1531687180.0),
]


def golden_rows() -> list[tuple]:
    """The 24 fixture rows + 2 unknown-tool rows, as plain tuples."""
    rows = []
    for tool, lines in FIXTURE_LINES.items():
        for idx, line in enumerate(lines):
            toks = line.strip().split("\t")
            rows.append((toks[1], idx, "user" if idx % 2 == 0 else "assistant", line, tool, float(toks[0])))
    rows.extend(UNKNOWN_TOOL_ROWS)
    return rows


def fixture_transcripts(spark: SparkSession) -> DataFrame:
    """Golden-scale transcripts DataFrame (26 rows)."""
    df = spark.createDataFrame(
        [(c, i, r, t, tool, ts) for (c, i, r, t, tool, ts) in golden_rows()],
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts_epoch double",
    )
    return df.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.timestamp_seconds("ts_epoch").alias("ts"),
    )


def synth_transcripts(
    spark: SparkSession,
    replicas: int = 1000,
    hot_fraction: float = 0.0,
    malformed_fraction: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed scale-up of the golden rows (26 × replicas rows).

    - conv_id gets a per-replica suffix so conversation cardinality scales;
    - a ``hot_fraction`` of replicas all collapse onto one conv_id
      (hot-conversation skew for the salting/AQE path);
    - a ``malformed_fraction`` of rows get their first field (ts — a
      drop-on-bad-cast column in every sink) corrupted, to exercise the
      rejects channel;
    - ``ts`` is shifted per replica to spread time buckets.

    Built as spark.range(replicas) ⋈ broadcast(golden) so generation is
    distributed and never collects to the driver.
    """
    base = fixture_transcripts(spark).withColumnRenamed("ts", "base_ts")
    rng = spark.range(replicas).withColumnRenamed("id", "replica")
    if partitions:
        rng = rng.repartition(partitions)
    df = rng.join(F.broadcast(base))

    conv = F.concat_ws("#", F.col("conv_id"), F.col("replica").cast("string"))
    if hot_fraction > 0:
        hot_every = max(2, int(round(1.0 / hot_fraction)))
        conv = F.when(F.col("replica") % hot_every == 0, F.lit("HOTCONV")).otherwise(conv)

    text = F.col("text")
    if malformed_fraction > 0:
        bad_every = max(2, int(round(1.0 / malformed_fraction)))
        is_bad = (F.col("replica") * 31 + F.col("turn_idx")) % bad_every == 0
        text = F.when(is_bad, F.regexp_replace("text", r"^[^\t]*", "NOT_A_TS")).otherwise(text)

    return df.select(
        conv.alias("conv_id"),
        F.col("turn_idx"),
        F.col("role"),
        text.alias("text"),
        F.col("tool"),
        (F.col("base_ts") + F.make_interval(secs=F.col("replica").cast("double"))).alias("ts"),
    )


def tool_role_lookup(spark: SparkSession) -> DataFrame:
    """Broadcast-side enrich table (FIXTURES.md §2).

    One row per (tool, role); ``sink_table`` mirrors the reference's
    [results] output mapping (anendektos.ini:10-16).
    """
    families = {
        "conn": "network", "dns": "network", "http": "application",
        "files": "content", "ssl": "crypto", "x509": "crypto",
    }
    rows = []
    for tool, fam in families.items():
        for rank, role in enumerate(["user", "assistant"]):
            rows.append((tool, role, fam, rank, f"sink_{tool}"))
    return spark.createDataFrame(
        rows, schema="tool string, role string, tool_family string, role_rank int, sink_table string"
    )


def _require_schema(df: DataFrame) -> None:
    assert [f.name for f in df.schema.fields] == [f.name for f in TRANSCRIPTS_SCHEMA.fields]
