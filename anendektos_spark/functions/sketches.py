"""Count-Min frequency sketch with engine-portable hashing.

The reference engine's aggregation surface is exact counts per key
(conn.d:233-441 sink counts); at 100 TB an exact per-key count table for
a high-cardinality key (users, URLs, grams) is itself huge and every
consumer pays a full shuffle of it. A Count-Min sketch collapses that to
a fixed ``depth × width`` integer counter table (here 4×256 = 1 KiB of
longs) that:

- builds in ONE pass with map-side partial combine (the shuffle carries
  at most depth×width rows per mapper, regardless of input size);
- merges across partitions/days/clusters by integer ``+`` — the same
  mergeable-partial property as ``logops.time_rollup_partials`` and the
  md5-HLL registers, so incremental maintenance is a union + re-sum, and
  a 1000-executor fleet can keep per-shard sketches and fold them in
  O(sketch) at read time;
- answers point frequency queries with a broadcast join (the sketch is
  tiny by construction) — never an overestimate below the true count,
  with error ≤ n/width at probability 1 − 2^−depth (Cormode & Muthu-
  krishnan 2005).

Determinism contract: counters are integer sums (shuffle-order
independent) over md5-derived buckets — ``bucket_i(k) = int(hex2(md5(
"i:" || k)))`` (first 2 hex digits → width fixed at 256) — so any engine
reproduces the sketch AND the estimates bit-for-bit; the DuckDB oracle
mirrors the construction verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256  # bucket = first 2 hex digits of the salted md5 — fixed


def _bucket(key: Column, row: int) -> Column:
    """Row ``row``'s bucket for ``key``: first byte of md5("row:key")."""
    h = F.md5(F.concat(F.lit(f"{row}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def _row_buckets(key: Column, depth: int) -> Column:
    return F.array(
        *[
            F.struct(F.lit(i).alias("row"), _bucket(key, i).alias("bucket"))
            for i in range(depth)
        ]
    )


def cms_build(df: DataFrame, key_col: str, depth: int = CMS_DEPTH) -> DataFrame:
    """One-pass sketch build → counter table (row, bucket, cnt).

    The explode emits ``depth`` rows per input row, but the partial hash
    aggregate collapses them to ≤ depth×256 rows per task before the
    exchange — the shuffle is O(sketch), not O(input)."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    pairs = _row_buckets(F.col(key_col), depth)
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Fold partial sketches (same depth) into one: union + integer sum.

    This is the incremental-maintenance path: per-day/per-shard sketches
    append as rows and merge in O(depth×width) — history inputs are
    never re-read."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame, keys: DataFrame, key_col: str, depth: int = CMS_DEPTH
) -> DataFrame:
    """Point-frequency estimates for a candidate key set →
    (key, cms_count). min over the key's ``depth`` counters; a bucket
    absent from the counter table contributes 0 (nothing ever hashed
    there). The sketch side is broadcast — estimating any number of keys
    is a narrow map + tiny-side join + per-key min aggregate.

    ``depth`` must match the build depth: a row index the sketch never
    populated would coalesce to 0 and silently invert the one-sided
    error guarantee, so the (tiny, O(sketch)) row-index check below
    REFUSES a depth mismatch instead."""
    present = {r[0] for r in cms.select("row").distinct().collect()}
    # an empty sketch (no input yet) estimates 0 everywhere — correct
    if present and present != set(range(depth)):
        raise ValueError(
            f"sketch rows {sorted(present)} do not match depth={depth}; "
            "estimate with the same depth the sketch was built with"
        )
    kb = keys.select(
        F.col(key_col), F.explode(_row_buckets(F.col(key_col), depth)).alias("p")
    ).select(key_col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        kb.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )
