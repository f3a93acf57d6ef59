"""Temporal join operators Spark's DataFrame API lacks as primitives:
as-of join and banded range join, built as compositions of existing
relational ops (no UDFs, no per-row Python) per the custom-operator
policy — composition first, applyInPandas only when semantics demand it.

asof_join — "attach the most recent right-side row at or before each
left timestamp, per key". The naive formulation is an inequality join
(left ⋈ right ON key AND r.ts <= l.ts) + argmax, which explodes to
|matches| intermediate rows (every left row × its full right history).
This implementation is the classic union-merge plan instead:

    union(right tagged 0, left tagged 1)
      → window over (key) ordered by (ts, tag, tie)
      → last(right_struct, ignorenulls) carries the latest right row
        forward onto each left row
      → filter tag = 1

Cost: ONE hash shuffle on the key + a per-key local sort — the same
shape as a sort-merge join, with no intermediate blow-up, no skew
amplification from hot keys' history length. Right columns travel as one
struct so the carried values are atomic (all from the same right row,
never column-mixed between rows sharing a timestamp). Ordering within a
timestamp puts right rows first (tag 0 < 1): a right row at exactly the
left timestamp IS eligible, matching the `<=` contract; ties among right
rows resolve by the caller's tie column (last wins).

range_join_count — "per left row, count right rows of the same key
within ±band of its timestamp". The naive inequality join is O(n²) per
key. The banded plan quantizes time into band-width buckets and joins on
(key, bucket) with the left side exploded to its 3 adjacent buckets —
every true match shares one of those buckets, so the exact |Δt| ≤ band
refine after the equi-join loses nothing. The shuffle carries only
(key, bucket) pairs: Catalyst runs it as a hash join, and candidate fan-
out is bounded by per-bucket occupancy instead of per-key history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _check_reserved(
    cols: list[str], reserved: tuple[str, ...], what: str = "internal working names"
) -> None:
    clash = sorted(set(cols) & set(reserved))
    if clash:
        raise ValueError(f"input columns collide with {what}: {clash}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``right_cols`` from the
    latest ``right`` row with ``right[right_ts] <= left[left_ts]`` and
    the same ``key`` (null when no right row precedes it).

    ``tie_col`` breaks timestamp ties among right rows (greatest wins),
    making the result deterministic. ``right_cols`` colliding with left
    columns and internal working names are rejected loudly (checked
    below). Right rows with a NULL timestamp or NULL key are dropped:
    SQL equality/comparison semantics make them unmatchable (the
    window's nulls-first sort — and the fact that partitionBy groups
    NULL keys together — would otherwise hand them out as spurious
    matches, diverging from the equi-join contract). NULL-keyed LEFT
    rows survive with null right columns.
    """
    _check_reserved(left.columns, ("_t", "_tag", "_tie", "_r", "_last"))
    _check_reserved(left.columns, tuple(right_cols), "right_cols")
    right = right.filter(F.col(right_ts).isNotNull() & F.col(key).isNotNull())
    rs = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.col(tie_col).alias("_tie"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    left_cols = left.columns
    ls = left.select(
        *left_cols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(rs.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(rs.schema["_r"].dataType).alias("_r"),
    )
    # unionByName with missing left columns nulled on the right side
    merged = ls.unionByName(rs, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t"), F.col("_tag"), F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("_last", F.last("_r", ignorenulls=True).over(w))
    return carried.filter(F.col("_tag") == 1).select(
        *left_cols, *[F.col(f"_last.{c}").alias(c) for c in right_cols]
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Hot-key-safe as-of join: identical semantics to ``asof_join``
    (latest right row at-or-before each left timestamp per key, greatest
    ``tie_col`` on timestamp ties, null when none), but the per-key work
    splits across time buckets so a single hot key never becomes one
    giant sorted task.

    Two phases:

    1. Boundary relation (small): per (key, bucket), the latest right
       row — ``max_by`` over (ts, tie). A per-KEY window over the
       BUCKET-granularity rows (|active buckets|, not |rows|) computes
       the carry-in for every left-active bucket: the latest boundary
       from buckets STRICTLY before it (left markers sort before the
       same bucket's boundary, so the running ``last`` can't see the
       current bucket).
    2. In-bucket union-merge, partitioned by (key, bucket) — the same
       window as ``asof_join`` but bounded by bucket occupancy. A left
       row takes its in-bucket carried value when one exists, else the
       bucket's carry-in (any in-bucket right at-or-before it is by
       construction later than every earlier bucket's rows).

    Parallelism for a hot key = its active time buckets; pick
    ``bucket_seconds`` so a bucket's rows fit one task comfortably.
    """
    _check_reserved(
        left.columns, ("_b", "_t", "_tag", "_tie", "_r", "_side", "_m", "_c", "_loc")
    )
    _check_reserved(left.columns, tuple(right_cols), "right_cols")
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    # same unmatchable-row policy as asof_join: see its docstring
    right = right.filter(F.col(right_ts).isNotNull() & F.col(key).isNotNull())
    bus = bucket_seconds * 1_000_000
    rb = F.floor(F.unix_micros(F.col(right_ts).cast("timestamp")) / bus)
    lb = F.floor(F.unix_micros(F.col(left_ts).cast("timestamp")) / bus)

    rs = right.select(
        F.col(key),
        rb.alias("_b"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.col(tie_col).alias("_tie"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    # phase 1: per-bucket latest right row, then per-key running carry-in
    bnd = rs.groupBy(key, "_b").agg(
        F.max_by(F.col("_r"), F.struct("_t", "_tie")).alias("_m")
    )
    lmarks = left.select(F.col(key), lb.alias("_b")).distinct()
    marks = lmarks.select(
        key, "_b", F.lit(0).alias("_side"),
        F.lit(None).cast(bnd.schema["_m"].dataType).alias("_m"),
    ).unionByName(bnd.select(key, "_b", F.lit(1).alias("_side"), "_m"))
    wk = (
        Window.partitionBy(key)
        .orderBy("_b", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        marks.withColumn("_c", F.last("_m", ignorenulls=True).over(wk))
        .filter(F.col("_side") == 0)
        .select(key, "_b", "_c")
    )

    # phase 2: in-bucket union-merge, partitioned by (key, bucket)
    left_cols = left.columns
    ls = left.select(
        *left_cols,
        lb.alias("_b"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(rs.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(rs.schema["_r"].dataType).alias("_r"),
    )
    merged = ls.unionByName(rs, allowMissingColumns=True)
    wb = (
        Window.partitionBy(key, "_b")
        .orderBy("_t", "_tag", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = merged.withColumn("_loc", F.last("_r", ignorenulls=True).over(wb)).filter(
        F.col("_tag") == 1
    )
    final = F.coalesce(F.col("_loc"), F.col("_c"))
    return loc.join(carry, [key, "_b"], "left").select(
        *left_cols, *[final.getField(c).alias(c) for c in right_cols]
    )


def _bucket(ts: Column, band_seconds: int) -> Column:
    return F.floor(F.unix_micros(ts.cast("timestamp")) / (band_seconds * 1_000_000))


def range_join_count(
    df: DataFrame,
    key: str,
    id_col: str,
    ts_col: str,
    band_seconds: int,
) -> DataFrame:
    """Self range join: for every row, ``n_nearby`` = count of OTHER rows
    with the same ``key`` whose timestamp lies within ±``band_seconds``
    (inclusive). Rows with no neighbor report 0.

    Plan: quantize to band-width buckets, explode each probe row to its
    {b-1, b, b+1} candidate buckets, equi-join on (key, bucket), refine
    with the exact microsecond predicate, aggregate, then left-join the
    counts back so zero-neighbor rows survive. All joins are hash
    equi-joins; no inequality join, no cartesian.
    """
    if band_seconds <= 0:
        raise ValueError(f"band_seconds must be positive, got {band_seconds}")
    _check_reserved(df.columns, ("_k", "_id", "_us", "_b", "_oid", "_ous", "_n", "n_nearby"))
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    b = _bucket(F.col(ts_col), band_seconds)
    probe = df.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
        F.explode(F.array(b - 1, b, b + 1)).alias("_b"),
    )
    build = df.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("_oid"),
        us.alias("_ous"),
        b.alias("_b"),
    )
    band_us = band_seconds * 1_000_000
    counts = (
        probe.join(build, ["_k", "_b"])
        .filter(
            (F.col("_oid") != F.col("_id"))
            & (F.abs(F.col("_ous") - F.col("_us")) <= band_us)
        )
        .groupBy("_id")
        .agg(F.count("*").alias("_n"))
    )
    return df.join(
        counts, df[id_col] == counts["_id"], "left"
    ).select(
        *df.columns, F.coalesce(F.col("_n"), F.lit(0)).alias("n_nearby")
    )
