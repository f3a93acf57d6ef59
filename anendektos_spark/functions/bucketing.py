"""Bucketed-table storage layout: shuffle-free co-located joins.

The biggest single cost of a 100 TB join is shuffling both sides on the
join key. If the tables are WRITTEN hash-bucketed on that key (same
bucket count, same key), Spark's scan is already key-partitioned, the
planner drops both Exchange operators, and the join runs bucket-to-bucket
with zero network movement — the storage-side analog of Iceberg's
bucket partition transform. This module wraps the write path and gives a
plan probe so "no shuffle" is testable, not folklore.

Production guidance: bucket the fact tables of the pipeline (parsed
per-tool sinks on conv_id, the dedup signature index on a band-hash
prefix) at a bucket count sized so one bucket ≈ one task's worth of data
at full scale; joins and groupBys on the bucket key then skip their
exchange forever after. The write itself costs one shuffle — paid once,
amortized over every later join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort_col: str | None = None,
) -> None:
    """Write ``df`` as a parquet table hash-bucketed on ``bucket_col``.

    ``sort_col`` additionally sorts within buckets (enables sort-merge
    join without a per-task sort). With ``path`` the table is external
    (data at ``path``, metadata in the session catalog)."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the EXECUTED plan — the
    probe that proves a bucketed join moved no data. Reused exchanges
    count once (they run once)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # an executed AdaptiveSparkPlan prints "== Final Plan ==" followed by
    # "== Initial Plan ==": count only the plan that actually ran
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==", 1)[0]
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
        if "ReusedExchange" not in line
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. When
    both were written with ``write_bucketed`` (same key, same count) the
    physical plan contains no Exchange — verify with
    ``shuffle_exchanges(result) == 0``."""
    return spark.table(left_table).join(spark.table(right_table), on)
