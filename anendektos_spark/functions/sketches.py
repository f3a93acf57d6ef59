"""Mergeable sketches with engine-portable hashing: Count-Min frequency,
HyperLogLog distinct-count, and a Bloom membership filter.

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


# --------------------------------------------------------------------------
# HyperLogLog (portable, integer fixed-point estimate)
# --------------------------------------------------------------------------
#
# Spark's own approx_count_distinct is the production choice when only
# Spark reads the result; these registers exist for the same reason the
# CMS does — a MERGEABLE distinct sketch any engine can reproduce
# bit-for-bit. bucket = first 2 md5 hex digits (m = 256 registers); the
# rank is the leading-zero count (+1) of the NEXT 48 hash bits, derived
# via length(bin(v)) — integer ops only, identical in Spark and DuckDB.
# The estimate is the raw Flajolet HLL harmonic mean computed entirely in
# integer arithmetic (DECIMAL(38,0) / HUGEINT): with R = max rank,
#   est = floor( alpha_ppm · m² · 2^R  /  (10⁶ · Σ_j 2^(R − rank_j)) )
# where absent registers contribute rank 0. No float ever touches the
# result, so shards built on different engines merge and estimate
# identically. Accuracy (~1.04/√m ≈ 6.5 % at m=256) is pinned in
# tests/test_functions.py; bias correction for tiny/huge cardinality is
# intentionally omitted — determinism is the contract here.

HLL_M = 256  # 2^8 registers: bucket = first 2 md5 hex digits
_HLL_ALPHA_PPM = 718272  # floor(1e6 * 0.7213 / (1 + 1.079/256))


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """One-pass register build → (bucket, max_rank). Map-side partial
    max-combine keeps the shuffle at ≤ m rows per task; registers merge
    across shards/epochs by groupBy(bucket).max(max_rank)."""
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")  # next 48 bits
    rank = F.when(v == 0, F.lit(49)).otherwise(F.lit(49) - F.length(F.bin(v)))
    return (
        df.select(bucket.alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(*register_sets: DataFrame) -> DataFrame:
    """Fold partial register sets: union + per-bucket max."""
    if not register_sets:
        raise ValueError("hll_merge needs at least one register set")
    out = register_sets[0]
    for s in register_sets[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("max_rank").alias("max_rank"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Registers → one-row (est_distinct) via the integer fixed-point
    harmonic mean above. The register relation is O(m); the whole
    estimate is a two-level aggregate over ≤ m rows."""
    m = HLL_M
    agg = registers.agg(
        F.max("max_rank").alias("r_max"),
        F.count(F.lit(1)).alias("n_present"),
    )
    # Σ 2^(R - rank_j) needs R first — join the (1-row) maxima back
    denom = (
        registers.crossJoin(F.broadcast(agg))
        .select(F.expr("CAST(shiftleft(1L, r_max - max_rank) AS DECIMAL(38,0))").alias("t"),
                "r_max", "n_present")
        .groupBy("r_max", "n_present")
        .agg(F.sum("t").alias("present_sum"))
        .select(
            "r_max",
            (F.col("present_sum")
             + (F.lit(m) - F.col("n_present")).cast("decimal(38,0)")
             * F.expr("CAST(shiftleft(1L, r_max) AS DECIMAL(38,0))")).alias("denom"),
        )
    )
    return denom.select(
        F.expr(
            f"CAST((CAST({_HLL_ALPHA_PPM} AS DECIMAL(38,0)) * {m * m} * "
            f"CAST(shiftleft(1L, r_max) AS DECIMAL(38,0))) DIV "
            f"(CAST(1000000 AS DECIMAL(38,0)) * denom) AS BIGINT)"
        ).alias("est_distinct")
    )


# --------------------------------------------------------------------------
# Bloom membership filter (the broadcast runtime-filter pattern)
# --------------------------------------------------------------------------
#
# At 100 TB the canonical use is JOIN PRUNING: build the filter over the
# small side's join keys (O(bits), here 2048 positions max), broadcast
# it, and drop non-matching big-side rows BEFORE the shuffle — rows that
# can't join never leave the scan stage. One-sided error: no false
# negatives ever; false positives ≈ (1 − e^(−kn/m))^k re-checked by the
# real join. Positions are md5-derived (pos_i = first 3 md5 hex digits of
# "i:key" mod m_bits), so any engine reproduces the same filter and the
# same false positives — the DuckDB oracle mirrors it verbatim.

BLOOM_BITS = 2048
BLOOM_K = 4


def _bloom_positions(key: Column, k: int, m_bits: int) -> Column:
    return F.array(
        *[
            (F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 3),
                16, 10,
            ).cast("int") % m_bits).alias(f"p{i}")
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str, k: int = BLOOM_K, m_bits: int = BLOOM_BITS
) -> DataFrame:
    """Build the filter → (pos) distinct set-bit positions (≤ m_bits
    rows). One narrow pass + a partial-combined distinct; the result is
    broadcast-sized by construction. Filters merge by UNION DISTINCT."""
    if k < 1 or m_bits < 2:
        raise ValueError(f"need k >= 1 and m_bits >= 2, got k={k} m_bits={m_bits}")
    return (
        df.select(F.explode(_bloom_positions(F.col(key_col), k, m_bits)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """Membership probe → (key, maybe_member). A key is a maybe-member
    iff ALL k of its positions are set. The filter side is broadcast;
    the probe is a narrow map + tiny-side join + per-key count — the
    exact shape used to pre-filter the big side of a shuffle join."""
    kp = keys.select(
        F.col(key_col),
        F.explode(_bloom_positions(F.col(key_col), k, m_bits)).alias("pos"),
    )
    return (
        kp.join(F.broadcast(bloom.withColumn("hit", F.lit(1))), ["pos"], "left")
        .groupBy(key_col)
        .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0))) == k).alias("maybe_member"))
    )


def bloom_pruned_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """Inner join with a Bloom runtime filter applied to the big side
    BEFORE its shuffle: build the filter over the small side's keys
    (driver collect of ≤ m_bits ints — metadata-sized, same budget as a
    broadcast centroid model), embed the set-bit array as a literal, and
    keep a big-side row only if all k of its positions are set. Rows that
    cannot join never enter the exchange; false positives are removed by
    the real join that follows, so the result is EXACTLY the plain inner
    join (the DuckDB oracle is the plain join).

    This is Spark's own runtime-filter / DPP idea made explicit and
    portable: at 10^12 rows the narrow md5 filter runs inside the scan's
    codegen span and the shuffle carries only plausible keys."""
    positions = sorted(
        r["pos"] for r in bloom_build(small, small_key, k, m_bits).collect()
    )
    pos_lit = F.array(*[F.lit(int(p)) for p in positions])
    probe = _bloom_positions(F.col(big_key), k, m_bits)
    pruned = big.filter(F.size(F.array_except(probe, pos_lit)) == 0)
    return pruned.join(small, pruned[big_key] == small[small_key], "inner")


# --- HDR-style log-bucket quantile sketch -----------------------------------
#
# CMS answers frequency and HLL answers distinct-count at O(sketch); this
# answers QUANTILES at O(sketch) — the piece exact nearest-rank percentiles
# (transcript.latency_percentiles) cannot provide at 10^12 rows without a
# full per-key sort, and the one sketch family still missing here. Design
# is the HdrHistogram idea reduced to its portable core: a nonnegative
# integer value lands in bucket
#
#   shift  = max(bitlen(v) − 1 − SUB_BITS, 0)      bitlen via length(bin(v))
#   bucket = shift · 2^SUB_BITS + (v >> shift)
#
# i.e. exact buckets below 2^SUB_BITS, then 2^SUB_BITS sub-buckets per
# power of two: bucket count grows LOGARITHMICALLY with the value range
# (≤ ~1,900 buckets for the full long range at SUB_BITS=5) and the bucket
# lower bound under-estimates the true value by a relative error
# < 2^−SUB_BITS (3.125%). Everything is integer bit arithmetic — no float
# log2 whose ulp at exact powers of two flips buckets between engines —
# so the DuckDB oracle reproduces the sketch and every estimate exactly.

HDR_SUB_BITS = 5


def _hdr_bucket_expr(v: str, sub_bits: int) -> str:
    return (
        f"(greatest(length(bin({v})) - 1 - {sub_bits}, 0) * {1 << sub_bits}"
        f" + shiftright({v}, greatest(length(bin({v})) - 1 - {sub_bits}, 0)))"
    )


def _hdr_lb_expr(bucket: str, sub_bits: int) -> str:
    sub = 1 << sub_bits
    return (
        f"shiftleft({bucket} - greatest(({bucket} div {sub}) - 1, 0) * {sub},"
        f" cast(greatest(({bucket} div {sub}) - 1, 0) as int))"
    )


def hdr_histogram(
    df: DataFrame,
    value_col: str,
    group_col: str,
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Per-group log-bucket histogram (group, bucket, cnt) over a
    NONNEGATIVE integer value column (null / negative rows are excluded
    — latencies, sizes and counts are nonnegative by construction;
    exclusion is mirrored in the oracle so both engines see the same
    population).

    One pass, map-side partial combine: the shuffle carries at most
    (groups × ~log-range·2^sub_bits) partial rows per mapper regardless
    of input size; shards/days/streams merge by integer sum
    (:func:`hdr_merge`), the same mergeable-partial contract as CMS and
    the HLL registers."""
    v = F.col(value_col).cast("long")
    return (
        df.filter(v >= 0)
        .select(F.col(group_col), v.alias("_v"))
        .withColumn("bucket", F.expr(_hdr_bucket_expr("_v", sub_bits)))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hdr_merge(*hists: DataFrame) -> DataFrame:
    """Fold shard histograms by bucket-wise integer sum (associative and
    commutative, like cms_merge/hll_merge)."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("cnt"))


def hdr_percentiles(
    hist: DataFrame,
    ps: tuple = (50, 90, 99),
    group_col: str = "tool_called",
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Nearest-rank percentile estimates off the sketch alone: for each
    p, the bucket where rank ceil(p·n/100) falls, reported as that
    bucket's LOWER bound (value_lb ≤ true percentile < value_lb·(1 +
    2^−sub_bits) for value_lb ≥ 2^sub_bits; exact below that).

    The cumulative walk is a window over the histogram relation —
    sketch-sized, not data-sized; the rank test selects each p's bucket
    with a codegen filter (cum ≥ rank AND cum − cnt < rank), never a
    per-group collect. Integer end to end."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(group_col)
    c = hist.select(
        group_col,
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(wn).alias("_n"),
    )
    p_arr = F.array(*[F.lit(int(p)) for p in ps])
    rank = F.expr("(_p * _n + 99) div 100")
    return (
        c.select("*", F.explode(p_arr).alias("_p"))
        .filter((F.col("_cum") >= rank) & (F.col("_cum") - F.col("cnt") < rank))
        .select(
            group_col,
            F.col("_p").alias("p"),
            F.expr(_hdr_lb_expr("bucket", sub_bits)).alias("value_lb"),
        )
    )


def hdr_percentiles_sql(
    rel: str,
    value_col: str,
    group_col: str,
    ps: tuple = (50, 90, 99),
    sub_bits: int = HDR_SUB_BITS,
) -> str:
    """DuckDB mirror of hdr_histogram → hdr_percentiles (same bit
    arithmetic, bit-identical buckets and estimates)."""
    sub = 1 << sub_bits
    plist = ", ".join(f"({int(p)})" for p in ps)
    return f"""
        WITH v AS (
          SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS v
          FROM ({rel})
          WHERE {value_col} IS NOT NULL AND {value_col} >= 0
        ),
        h AS (
          SELECT g,
                 (greatest(length(bin(v)) - 1 - {sub_bits}, 0) * {sub}
                  + (v >> greatest(length(bin(v)) - 1 - {sub_bits}, 0)))
                   AS bucket,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM v GROUP BY 1, 2
        ),
        c AS (
          SELECT g, bucket, cnt,
                 sum(cnt) OVER (PARTITION BY g ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 sum(cnt) OVER (PARTITION BY g) AS n
          FROM h
        )
        SELECT g AS {group_col}, CAST(p AS INT) AS p,
               ((bucket - greatest((bucket // {sub}) - 1, 0) * {sub})
                 << CAST(greatest((bucket // {sub}) - 1, 0) AS INT)) AS value_lb
        FROM c, (VALUES {plist}) ps(p)
        WHERE cum >= (p * n + 99) // 100
          AND cum - cnt < (p * n + 99) // 100
    """
