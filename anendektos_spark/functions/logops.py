"""Log/telemetry pipeline operators over a generic event stream.

The same parse → enrich → route → aggregate stages as pipeline.py, bound
to the driver's ``events`` table (event_id, ts, user_id, event_type,
value, props) so every stage is oracle-checkable against DuckDB:

- parse: regexp field extraction from the semi-structured ``props``
  payload (the grok stage, O6-O7 analog);
- route: fan-out on event_type + unknown-type rejects channel (O4/O17);
- enrich: broadcast join to the user dimension (customer table);
- aggregate: per-sink counts, exact distinct, top-K by frequency,
  time-bucketed counts (O19 + north_star set);
- ordinal: stable per-user ordering (O18);
- sessionize: gap-based session assignment via a lag window — the
  stateful-stream analog in batch form.

Float sums use the decimal-cast trick (sum in DECIMAL, round, then cast
to double) so the result is exact and engine-independent regardless of
shuffle order. Time buckets are emitted as formatted strings, immune to
session-timezone epoch skew across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

KNOWN_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
PROPS_K_PATTERN = r'"k": (\d+)'


def _dec_sum(col, scale: int = 2):
    """Exact, order-independent sum: cast to decimal first."""
    return F.round(F.sum(col.cast("decimal(20,6)")), scale).cast("double")


def route_counts(events: DataFrame) -> DataFrame:
    """Routed record count per sink (O4 + O19)."""
    return (
        events.filter(F.col("event_type").isin(*KNOWN_EVENT_TYPES))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_records"))
    )


def route_rejects(events: DataFrame) -> DataFrame:
    """Unknown-type rejects channel (parser.d:85 analog)."""
    return (
        events.filter(~F.col("event_type").isin(*KNOWN_EVENT_TYPES))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_records"))
    )


def parse_props(events: DataFrame) -> DataFrame:
    """Grok/regexp parse of the props payload; bad rows (no match) are
    dropped — the reference's row-drop-on-error policy (conn.d:73-78)."""
    k = F.regexp_extract("props", PROPS_K_PATTERN, 1)
    return (
        events.withColumn("k", F.when(k != "", k.cast("int")))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_parsed"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def enrich_events(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Broadcast-hash-join enrich to the user dimension, then aggregate
    per (mktsegment, event_type). Left join: unmatched users survive with
    a null segment."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("mktsegment")
    )
    return (
        events.join(F.broadcast(dim), "user_id", "left")
        .groupBy("mktsegment", "event_type")
        .agg(F.count("*").alias("n_events"), _dec_sum(F.col("value")).alias("sum_value"))
    )


def distinct_users(events: DataFrame) -> DataFrame:
    """Exact distinct-count per sink."""
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events")
    )


def topk_users(events: DataFrame, k: int = 5) -> DataFrame:
    """Top-K users by event count within each sink; deterministic
    tie-break on user_id. The groupBy pre-aggregates before the window,
    so the window input is |users|×|types|, not |events|."""
    counts = events.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.col("user_id").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("event_type", "user_id", "n", "rank")
    )


def time_buckets(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """Per (sink, time-bucket) counts + exact value sums. Bucket emitted
    as a formatted string (timezone-safe across engines)."""
    b = F.date_format(F.date_trunc(bucket, F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        events.groupBy("event_type", b.alias("bucket"))
        .agg(F.count("*").alias("n_events"), _dec_sum(F.col("value")).alias("sum_value"))
    )


def stable_ordinal(events: DataFrame, max_user: int = 10) -> DataFrame:
    """Stable per-user ordinal (O18): row_number over (ts, event_id).

    Restricted to a user prefix so the correctness check stays small; the
    full-table form is identical. One shuffle on user_id; sort is local
    per user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.filter(F.col("user_id") < max_user)
        .select("user_id", "event_id", (F.row_number().over(w) - 1).alias("ord"))
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact continuous percentiles of value per sink (p50/p90/p99).

    F.percentile is the exact linear-interpolation aggregate (one sort
    per group, still distributed); the approx_* variants below are the
    scale fast path when a sketch-accuracy answer suffices."""
    def p(q: float, name: str):
        return F.round(F.percentile("value", F.lit(q)), 4).alias(name)

    return events.groupBy("event_type").agg(
        p(0.5, "p50"), p(0.9, "p90"), p(0.99, "p99")
    )


def approx_profile(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Sketch-based profile per sink: HyperLogLog distinct users (both
    the classic approx_count_distinct and a mergeable Datasketches HLL
    column) + KLL-style approximate median. The mergeable sketch is what
    a 100 TB rollup keeps in an intermediate table so late partitions
    union in O(sketch) — no oracle (sketch internals are engine-specific);
    accuracy is pinned in tests against the exact answers."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("hll_users"),
        F.round(F.percentile_approx("value", F.lit(0.5), F.lit(10000)), 4).alias(
            "approx_p50"
        ),
        F.count("*").alias("n_events"),
    )


# --- portable HLL constants (mirrored in the DuckDB oracle SQL) ---
HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)   # standard alpha_m, m >= 128
HLL_RMAX = 40                  # rank clamp: keeps 2^(RMAX-M) an exact BIGINT


def approx_profile_portable(events: DataFrame) -> DataFrame:
    """Engine-portable sketch profile per sink: an md5-based HyperLogLog
    distinct-user estimate and a deterministic-sample median, plus exact
    companions (n_events, n_users_exact) — every column reproducible
    bit-for-bit by the DuckDB oracle, unlike the engine-native sketches
    in ``approx_profile``.

    HLL construction (classic Flajolet): register index = first 2 hex
    digits of md5(user_id); rank = leading-zero-bits of the remaining 120
    bits + 1, clamped to ``HLL_RMAX``. The register sum is computed as an
    INTEGER sum of 2^(RMAX - M_j) — exact and shuffle-order-independent,
    so the double division afterwards is deterministic. Small-range
    correction (linear counting) applies below 2.5m with empty registers.
    The same register table merges across partitions/days with max() —
    the mergeable-rollup property a 100 TB profile table needs.

    The median is exact over a deterministic 1/4 sample: rows whose
    md5(event_id) starts below '4' — the same rows in any engine."""
    h = F.md5(F.col("user_id").cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rest = F.substring(h, 3, 30)
    zeros = F.length(F.regexp_extract(rest, "^(0*)", 1))
    digit = F.substring(rest, zeros + 1, 1)
    lz = (
        F.when(digit == "1", 3)
        .when(digit.isin("2", "3"), 2)
        .when(digit.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rank = F.least(
        F.when(zeros == 30, F.lit(121)).otherwise(zeros * 4 + lz + 1), F.lit(HLL_RMAX)
    )

    regs = (
        events.select("event_type", bucket.alias("b"), rank.alias("r"))
        .groupBy("event_type", "b")
        .agg(F.max("r").alias("M"))
    )
    term = F.pow(F.lit(2.0), (F.lit(HLL_RMAX) - F.col("M")).cast("double")).cast("long")
    scale = float(2 ** HLL_RMAX)
    amm = HLL_ALPHA * HLL_M * HLL_M
    per_type = regs.groupBy("event_type").agg(
        F.sum(term).alias("present_sum"), F.count("*").alias("nonzero")
    )
    total = (
        F.col("present_sum").cast("double")
        + (F.lit(HLL_M) - F.col("nonzero")).cast("double") * F.lit(scale)
    )
    raw = F.lit(amm) * F.lit(scale) / total
    zero_ct = (F.lit(HLL_M) - F.col("nonzero")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zero_ct > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zero_ct),
    ).otherwise(raw)
    hll = per_type.select("event_type", F.round(est, 4).alias("hll_users"))

    hrow = F.md5(F.col("event_id").cast("string"))
    base = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users_exact"),
        F.round(
            F.percentile(F.when(hrow < "4", F.col("value")), F.lit(0.5)), 4
        ).alias("p50_sample"),
    )
    return base.join(hll, "event_type").select(
        "event_type", "n_events", "n_users_exact", "hll_users", "p50_sample"
    )


def time_rollup_partials(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Minute-level mergeable partials (event_type, bucket, n, s-decimal)
    — the state a maintained rollup table persists. Mergeable by
    addition: see ``time_rollup_merge``."""
    mb = F.date_format(F.date_trunc("minute", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    dec = F.col(value_col).cast("decimal(20,6)")
    return events.groupBy("event_type", mb.alias("bucket")).agg(
        F.count("*").alias("n"), F.sum(dec).cast("decimal(20,6)").alias("s")
    )


def time_rollup(
    events: DataFrame | None = None,
    value_col: str = "value",
    minute_partials: DataFrame | None = None,
) -> DataFrame:
    """Hierarchical time rollup (hypertable-style continuous-aggregate
    shape): per-sink counts + exact value sums at minute, hour, day, and
    total granularity in ONE cascade.

    Instead of a GROUPING SETS/Expand plan (which replicates every input
    row once per granularity before the partial aggregate), each level
    re-aggregates the PREVIOUS level: raw→minute is the only full-data
    shuffle; hour re-shuffles |minute-bucket| rows, day |hour-bucket|
    rows, total |day-bucket| rows. That is exactly how a 100 TB rollup
    table is maintained incrementally — the minute aggregate is the
    mergeable partial every coarser granularity derives from, so late
    partitions fold in at minute cost only.

    Sums stay DECIMAL through every level (re-aggregating rounded doubles
    would drift from a direct day-level aggregation); rounding to double
    happens once, at emission. Coarser buckets are derived from the
    minute STRING (substr + ':00:00') — no timestamp reparse, and
    bit-identical semantics in any engine.

    ``minute_partials`` short-circuits the raw aggregation with an
    existing partial table (e.g. the output of ``time_rollup_merge``
    after a late batch) — the incremental-maintenance entry point."""
    if minute_partials is not None:
        minute = minute_partials
    elif events is not None:
        minute = time_rollup_partials(events, value_col)
    else:
        raise ValueError("pass events or minute_partials")

    def _coarsen(df: DataFrame, bucket_expr) -> DataFrame:
        return df.groupBy("event_type", bucket_expr.alias("bucket")).agg(
            F.sum("n").alias("n"), F.sum("s").cast("decimal(20,6)").alias("s")
        )

    hour = _coarsen(minute, F.concat(F.substring("bucket", 1, 13), F.lit(":00:00")))
    day = _coarsen(hour, F.concat(F.substring("bucket", 1, 10), F.lit(" 00:00:00")))
    total = _coarsen(day, F.lit("ALL"))

    def _emit(df: DataFrame, level: str) -> DataFrame:
        return df.select(
            F.lit(level).alias("level"),
            "event_type",
            "bucket",
            F.col("n").alias("n_events"),
            F.round(F.col("s"), 2).cast("double").alias("sum_value"),
        )

    out = _emit(minute, "minute")
    for df, lv in ((hour, "hour"), (day, "day"), (total, "total")):
        out = out.unionByName(_emit(df, lv))
    return out


def time_rollup_merge(minute_partials: DataFrame, late_events: DataFrame,
                      value_col: str = "value") -> DataFrame:
    """Incremental rollup maintenance: fold a late batch of events into
    an existing minute-level partial table (as produced by the first
    stage of ``time_rollup``) and return the updated partials.

    This is the property the cascade design buys: a late partition costs
    one aggregation of the LATE rows plus a merge keyed by the touched
    (event_type, bucket) cells — never a recompute over history. The
    merged output feeds the same hour/day/total cascade. Counts and
    DECIMAL sums are mergeable by addition, so
    merge(rollup(A), B) ≡ rollup(A ∪ B) exactly (pinned in tests)."""
    late = time_rollup_partials(late_events, value_col)
    return (
        minute_partials.unionByName(late)
        .groupBy("event_type", "bucket")
        .agg(F.sum("n").alias("n"), F.sum("s").cast("decimal(20,6)").alias("s"))
    )


def latest_by_key(
    df: DataFrame, key_cols: list[str], version_col: str, tie_col: str
) -> DataFrame:
    """Log compaction / SCD-1 upsert resolution: keep each key's latest
    record by ``version_col`` (ties broken by ``tie_col``, greatest
    wins). One row_number window per key — a single hash shuffle with
    the rank filter applied inside the per-key sort, so output is one
    row per key regardless of update skew. The canonical read-side
    collapse of an append-only changelog table."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col(tie_col).desc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str = "ts",
    tie_col: str | None = None,
) -> DataFrame:
    """SCD-2 history build: collapse an append-only changelog into
    validity intervals per key. A row opens a new interval iff its
    ``attr_col`` differs from the key's previous value (consecutive
    duplicates are absorbed); the interval closes at the NEXT change's
    timestamp (``valid_to`` null = current version).

    Plan: one hash shuffle on the key; the change-detect lag window and
    the interval-close lead window share that exchange (the lead runs
    over the filtered change rows — same partitioning, so Catalyst
    reuses the exchange and only re-sorts the much smaller change set).
    Epoch math is integer seconds (``unix_seconds``) so the interval
    bounds are engine-exact. The companion read-side collapse is
    :func:`latest_by_key`; this is the write-side history table a
    warehouse keeps alongside it."""
    tie = [F.col(tie_col)] if tie_col else []
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col), *tie)
    us = F.unix_seconds(F.col(ts_col).cast("timestamp"))
    # null-safe change detect: the key's first row always opens an
    # interval; a null attr differs from any non-null neighbor
    changed = F.row_number().over(w) == 1
    changed = changed | ~F.lag(F.col(attr_col)).over(w).eqNullSafe(F.col(attr_col))
    changes = df.withColumn("_chg", changed).filter(F.col("_chg")).select(
        *key_cols, F.col(attr_col), us.alias("valid_from"), *tie
    )
    # the lead window repeats the tie-break: two changes inside the same
    # epoch second must close in the same order in every engine
    w2 = Window.partitionBy(*key_cols).orderBy(F.col("valid_from"), *tie)
    return changes.select(
        *key_cols,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def sessionize_events(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Per-event session assignment: like ``sessionize`` but emits each
    event's session ordinal (1-based per user) — a running sum of
    new-session flags over the same (ts, event_id)-ordered window, so
    downstream session-level aggregates can group on (user_id,
    session_id). Same single shuffle as sessionize; the two windows
    share one sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.sum(new_session).over(run).cast("int").alias("session_id"),
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Table profiling (ANALYZE-style): one output row per requested
    column with row/null/exact-distinct counts and min/max (as strings,
    so heterogeneous column types stack into one relation).

    Single scan: all per-column aggregates run in ONE df.agg (map-side
    partials), then the 1-row result unpivots driver-free via an
    explode over per-column structs. N exact distincts expand the
    aggregate input N-fold (Spark's multi-distinct Expand) — at 100 TB
    profile with approx_count_distinct instead, or one column per pass;
    exact is kept here because the driver contract hash-checks it."""
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_str"),
                F.col(f"_mx_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_seconds``. Returns per
    user session/event counts. Epoch arithmetic in integer microseconds
    (unix_micros), so the gap comparison is exact across engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return (
        events.select("user_id", new_session.alias("new_s"))
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"), F.count("*").alias("n_events"))
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-funnel analysis: per user, the first time each step was
    reached IN ORDER (step k counts only after the user's step-k-1
    time). The classic product-analytics query, and the transcript
    analogue of "did this conversation reach tool A then B then C".

    Emits one row per user who reached step 0: first-reach epoch micros
    per step (null once the funnel breaks) and ``furthest_stage``
    (1-based count of completed steps).

    Plan shape: one aggregate per step plus a per-step left join, all
    keyed on user_id — k small fixed joins, no window over the full
    event stream, no collect. Epoch math is integer (unix_micros) so
    cross-engine equality is exact. Conversion-rate rollups are a
    trivial count over this output."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cur = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min(us).alias("t_0"))
    )
    for i, step in enumerate(steps[1:], 1):
        nxt = events.filter(F.col("event_type") == step).select(
            F.col("user_id").alias("_u"), us.alias("_e")
        )
        cond = (cur["user_id"] == nxt["_u"]) & (nxt["_e"] > cur[f"t_{i-1}"])
        carried = ["user_id"] + [f"t_{j}" for j in range(i)]
        cur = (
            cur.join(nxt, cond, "left")
            .groupBy(*carried)
            .agg(F.min("_e").alias(f"t_{i}"))
        )
    stage = sum(
        (F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0) for i in range(len(steps))),
        F.lit(0),
    )
    return cur.select(
        "user_id",
        *[F.col(f"t_{i}").alias(f"t_{s}") for i, s in enumerate(steps)],
        stage.cast("int").alias("furthest_stage"),
    )


def rate_spikes(
    events: DataFrame,
    bucket: str = "hour",
    window: int = 8,
    factor: int = 3,
    min_history: int = 4,
) -> DataFrame:
    """Volume-spike detection per event type: a bucket is a spike when
    its count exceeds ``factor``× the trailing-window mean, given at
    least ``min_history`` observed prior buckets.

    The comparison is pure integer cross-multiplication
    (count · n_prev > factor · sum_prev) — no float mean, so the flag is
    engine-exact; the reported ratio is fixed-point ×10⁴ floor division.
    The trailing window is over OBSERVED buckets (sparse series skip
    empty buckets; at production density every bucket is populated).

    Plan: one groupBy (type, bucket) with map-side partial count, then a
    per-type ordered window — partitions are event types, so the window
    state is tiny and parallel across types."""
    b = F.date_format(F.date_trunc(bucket, F.col("ts").cast("timestamp")), "yyyy-MM-dd HH:mm:ss")
    counts = events.groupBy(
        F.col("event_type"), b.alias("bucket")
    ).agg(F.count("*").alias("n_events"))
    return spike_flags(counts, "event_type", window=window, factor=factor,
                       min_history=min_history)


def spike_flags(
    counts: DataFrame,
    key_col: str = "event_type",
    bucket_col: str = "bucket",
    n_col: str = "n_events",
    window: int = 8,
    factor: int = 3,
    min_history: int = 4,
) -> DataFrame:
    """Spike verdicts over an already-bucketed count relation
    (``key, bucket, n``) — the shared core of :func:`rate_spikes` and
    ``streaming.stream_rate_spikes`` (batch and streaming apply the SAME
    integer-exact rule to their count tables)."""
    w = (
        Window.partitionBy(key_col).orderBy(bucket_col).rowsBetween(-window, -1)
    )
    hist = counts.select(
        key_col,
        bucket_col,
        n_col,
        F.coalesce(F.sum(n_col).over(w), F.lit(0)).alias("sum_prev"),
        F.count(n_col).over(w).alias("n_prev"),
    )
    ok_hist = F.col("n_prev") >= min_history
    return hist.select(
        key_col,
        bucket_col,
        n_col,
        "sum_prev",
        "n_prev",
        (
            ok_hist
            & (F.col(n_col) * F.col("n_prev") > factor * F.col("sum_prev"))
        ).alias("is_spike"),
        F.when(
            F.col("sum_prev") > 0,
            F.expr(f"({n_col} * n_prev * 10000) DIV sum_prev").cast("long"),
        ).alias("ratio_x10k"),
    )


def skew_stats(df: DataFrame, key_col: str) -> DataFrame:
    """One-row shuffle-skew diagnostic for a prospective join/groupBy
    key: per-key count distribution (p50/p99, max), the heaviest key,
    and the max/mean ratio in integer fixed point (×10⁴). At 100 TB the
    relevant question before keying a shuffle on a column is "how hot is
    the hottest key" — this answers it with ONE partial-combine pass
    over the data plus a tiny aggregate over the distinct keys.

    skew_x10k = (max_n · 10⁴) DIV (n_rows DIV n_keys) — the mean is
    floored FIRST so the widest intermediate is max_n·10⁴ (overflow-safe
    up to ~9·10¹⁴ rows on one key; the naive max·keys·10⁴ product wraps
    long at billions of keys, where DuckDB's HUGEINT would silently
    diverge). All integer, so the row (percentiles aside, which follow
    the value_percentiles parity rule) hash-checks across engines."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(F.count(F.lit(1)).alias("n"))
    top = F.max(F.struct(F.col("n").alias("n"), F.col("k").alias("k"))).alias("_top")
    return (
        counts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_key_n"),
            F.round(F.percentile(F.col("n"), F.lit(0.5)), 4).alias("p50_key_n"),
            F.round(F.percentile(F.col("n"), F.lit(0.99)), 4).alias("p99_key_n"),
            top,
        )
        .select(
            "n_keys",
            "n_rows",
            "max_key_n",
            "p50_key_n",
            "p99_key_n",
            F.col("_top.k").cast("string").alias("top_key"),
            F.expr("(max_key_n * 10000) DIV (n_rows DIV n_keys)").alias("skew_x10k"),
        )
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    tie_col: str,
    op_col: str = "op",
) -> DataFrame:
    """CDC apply: fold a changelog (``op`` in I/U/D) into a base snapshot
    → the next snapshot. Last writer per key wins (``version_col`` then
    ``tie_col``, greatest wins); a final D deletes the key; base rows act
    as version-0 upserts so an untouched key survives unchanged.

    This is the MERGE INTO / Iceberg-CDC maintenance step expressed as a
    pure relational fold: union(base-as-insert, changes) → latest_by_key
    → drop deletes. ONE hash shuffle on the key regardless of how many
    changes pile onto a hot key (the row_number sort absorbs them);
    output columns = base columns. Engine-exact, so the DuckDB oracle
    runs the identical fold. An op outside I/U/D fails the job from
    inside the fold itself (``raise_error`` in the projection — no
    separate validation scan of the changelog)."""
    data_cols = [c for c in base.columns]
    missing = [c for c in data_cols + [version_col, tie_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"changelog lacks columns {missing}")
    op_checked = F.when(
        F.col(op_col).isin("I", "U", "D"), F.col(op_col)
    ).otherwise(
        F.raise_error(F.concat(F.lit("unknown changelog op: "), F.col(op_col)))
    )
    tagged_base = (
        base.select(*data_cols)
        .withColumn("_op", F.lit("I"))
        .withColumn("_v", F.lit(None).cast(changes.schema[version_col].dataType))
        .withColumn("_tie", F.lit(None).cast(changes.schema[tie_col].dataType))
    )
    tagged_chg = changes.select(
        *data_cols,
        op_checked.alias("_op"),
        F.col(version_col).alias("_v"),
        F.col(tie_col).alias("_tie"),
    )
    merged = tagged_base.unionByName(tagged_chg)
    # null version (base rows) sorts below every change — base acts as
    # version 0, so any change to the key beats the base record; ties
    # among equal-version changes break by greatest tie value (base rows
    # never tie: a snapshot is unique per key)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_v").desc_nulls_last(), F.col("_tie").desc_nulls_last()
    )
    return (
        merged.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1) & (F.col("_op") != "D"))
        .select(*data_cols)
    )


# NOTE (measured, not assumed): a manual "salted" two-stage exact
# count-distinct per key was prototyped here and REMOVED — Spark's own
# count(DISTINCT) expansion already plans the skew-proof shape: the first
# exchange partitions on (key, value), spreading a hot key's values
# across reducers, and partial_count(distinct) collapses each partition
# to one row per key before the final key exchange. See PLANS.md
# "Count-distinct skew" for the executed-plan evidence; hand-salting on
# top of that only adds a third exchange.


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Anti-entropy check between two snapshots → one row per key whose
    state differs: status ∈ added / removed / changed. The audit
    companion of :func:`apply_changelog` (apply a changelog, then diff
    against the expected snapshot — empty diff = converged) and of
    checkpoint resume (two runs of the same stage must diff empty).

    One full-outer hash join on the key; value comparison is null-safe
    per column, evaluated inside the join projection (no second pass).
    Unchanged keys are dropped so the output is |difference|-sized, not
    |snapshot|-sized."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    val_cols = [c for c in old.columns if c not in key_cols]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot schemas differ: {sorted(old.columns)} vs {sorted(new.columns)}"
        )
    o = old.alias("o")
    n = new.alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols]
    joined = o.join(n, cond, "full_outer")
    # key presence: any key col non-null on that side (keys are non-null
    # in a snapshot; eqNullSafe keeps the join total anyway)
    in_old = F.col(f"o.{key_cols[0]}").isNotNull()
    in_new = F.col(f"n.{key_cols[0]}").isNotNull()
    same_vals = F.lit(True)
    for c in val_cols:
        same_vals = same_vals & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same_vals, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    key_out = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in key_cols
    ]
    return (
        joined.select(*key_out, status.alias("status"))
        .filter(F.col("status") != "unchanged")
    )


def validate_constraints(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Data-quality constraint validation (the Deequ/Great-Expectations
    primitive): each rule is a boolean Column that must hold for every
    row; a NULL rule result counts as a violation (null-hostile, so a
    rule can't silently pass on missing data).

    ONE scan computes every rule as a conditional sum inside a single
    aggregate (map-side partial → one singleton exchange), then the
    per-rule rows are unpivoted driver-free with ``stack``. Adding a rule
    adds an expression, never a pass — at 100 TB this is the difference
    between one scan and len(rules) scans.

    Returns (rule string, n_rows long, n_violations long, passed bool).
    Key-level constraints (uniqueness) need a groupBy — see
    :func:`unique_violations`."""
    if not rules:
        raise ValueError("rules must be a non-empty dict")
    for name in rules:
        if '"' in name or "'" in name:
            raise ValueError(f"rule name {name!r} may not contain quotes")
    aggs = [F.count("*").alias("_n")]
    names = list(rules)
    for i, (name, col) in enumerate(rules.items()):
        aggs.append(
            F.sum(
                F.when(col.isNull() | ~col, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"_v{i}")
        )
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{n}', _v{i}" for i, n in enumerate(names))
    return wide.selectExpr(
        f"stack({len(names)}, {stack_expr}) AS (rule, n_violations)", "_n"
    ).select(
        "rule",
        F.col("_n").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key-uniqueness constraint: rows whose key occurs more than once.
    One hash shuffle on the key (map-side combine); returns one row per
    violating key with its multiplicity — the actionable output (which
    keys, how bad), not just a count."""
    if not cols:
        raise ValueError("cols must be non-empty")
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 1)
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: integer bin index via
    floor division over a DECIMAL-scaled value (engine-exact — no float
    division whose ulps could flip a boundary row between bins), with
    underflow/overflow clamped to bins -1 and ``n_bins``. NULLs are
    dropped (profile_columns reports null counts). One narrow map + one
    hash aggregate on ≤ n_bins+2 keys; histograms of shards merge by
    adding counts (used as the mergeable profiling sketch).

    Returns (bin int, lo_edge double, hi_edge double, n long)."""
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    # scale to integers: bin = (v*1e6 - lo*1e6) div width_1e6, exact in
    # decimal domain (values are parquet doubles; *1e6 cast decimal is
    # deterministic in both engines)
    scale = 10**6
    lo_i, hi_i = round(lo * scale), round(hi * scale)
    width_i = (hi_i - lo_i + n_bins - 1) // n_bins  # ceil so hi lands in last bin
    v_i = F.round(F.col(value_col).cast("decimal(26,6)") * scale, 0).cast(
        "long"
    )
    raw_bin = F.expr(
        f"CASE WHEN _vi >= 0 THEN _vi div {width_i} "
        f"ELSE -((-_vi) div {width_i}) - CASE WHEN (-_vi) % {width_i} = 0 "
        f"THEN 0 ELSE 1 END END"
    )
    binned = (
        df.filter(F.col(value_col).isNotNull())
        .select((v_i - F.lit(lo_i)).alias("_vi"))
        .select(
            F.greatest(
                F.lit(-1), F.least(F.lit(n_bins), raw_bin.cast("int"))
            ).alias("bin")
        )
    )
    return (
        binned.groupBy("bin")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width_i / scale)).alias("lo_edge"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width_i / scale)).alias(
                "hi_edge"
            ),
            "n",
        )
    )


def histogram_drift(
    df: DataFrame,
    value_col: str,
    period_b: Column,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Distribution drift between two data periods as an integer-exact
    PSI-style report: bin the value column with :func:`value_histogram`'s
    fixed-width DECIMAL-scaled binning (identical bin boundaries in any
    engine), count each bin separately for period A (``period_b`` false)
    and period B (true), normalize to parts-per-million with integer
    floor division, and report the per-bin absolute share shift. The L1
    drift distance is ``Σ drift_ppm / 2e6`` — derivable from the output,
    so the whole report stays float-free.

    This is the corpus-snapshot drift check of a training pipeline (did
    the value distribution move between crawls?). ONE scan with a
    conditional-sum hash aggregate onto ≤ n_bins+2 keys, then the period
    totals as an unpartitioned window over that bin-count relation (a
    single-partition exchange of ≤ n_bins+2 rows): mergeable across
    shards exactly like the histogram it extends, and nothing data-sized
    ever leaves the executors. NULL values are dropped (profile_columns
    reports null counts); rows land in clamp bins -1/n_bins when outside
    [lo, hi) so overflow drift is visible rather than silently excluded.

    Returns (bin int, lo_edge double, hi_edge double, n_a long, n_b long,
    ppm_a long, ppm_b long, drift_ppm long) — empty when BOTH periods are
    empty; raises neither (a bin missing from a period counts 0)."""
    return drift_report(
        drift_bin_counts(df, value_col, period_b, lo, hi, n_bins), lo, hi, n_bins
    )


def _drift_params(lo: float, hi: float, n_bins: int) -> tuple[int, int, int]:
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    scale = 10**6
    lo_i, hi_i = round(lo * scale), round(hi * scale)
    width_i = (hi_i - lo_i + n_bins - 1) // n_bins
    return scale, lo_i, width_i


def drift_bin_counts(
    df: DataFrame,
    value_col: str,
    period_b: Column,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """The mergeable half of :func:`histogram_drift`: per-bin (n_a, n_b)
    period counts with the DECIMAL-exact fixed-width binning. Counts of
    shards/micro-batches merge by per-bin addition (used as the streamed
    epoch partial — see streaming.stream_drift_partials); ONE scan, ONE
    hash exchange onto ≤ n_bins+2 keys with map-side partial sums."""
    scale, lo_i, width_i = _drift_params(lo, hi, n_bins)
    v_i = F.round(F.col(value_col).cast("decimal(26,6)") * scale, 0).cast("long")
    raw_bin = F.expr(
        f"CASE WHEN _vi >= 0 THEN _vi div {width_i} "
        f"ELSE -((-_vi) div {width_i}) - CASE WHEN (-_vi) % {width_i} = 0 "
        f"THEN 0 ELSE 1 END END"
    )
    binned = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            (v_i - F.lit(lo_i)).alias("_vi"),
            period_b.cast("boolean").alias("_b"),
        )
        .select(
            F.greatest(F.lit(-1), F.least(F.lit(n_bins), raw_bin.cast("int"))).alias("bin"),
            F.col("_b"),
        )
    )
    return binned.groupBy("bin").agg(
        F.sum(F.when(~F.col("_b"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("_b"), 1).otherwise(0)).cast("long").alias("n_b"),
    )


def drift_report(
    counts: DataFrame, lo: float, hi: float, n_bins: int = 10
) -> DataFrame:
    """Finish :func:`histogram_drift` from (bin, n_a, n_b) counts —
    possibly the merged union of shard/epoch partials. Everything here
    operates on the ≤ n_bins+2-row bin relation."""
    scale, _lo_i, width_i = _drift_params(lo, hi, n_bins)
    counts = counts.groupBy("bin").agg(
        F.sum("n_a").cast("long").alias("n_a"),
        F.sum("n_b").cast("long").alias("n_b"),
    )
    # totals as an unpartitioned window over the ≤ n_bins+2-row bin
    # relation — NOT a separate aggregate joined back, which Catalyst
    # plans as a SECOND full scan+aggregate of the raw data (no subtree
    # reuse without persisting). The single-partition window moves only
    # the bin counts, never data-sized rows.
    wall = Window.partitionBy(F.lit(1))
    counts = counts.select(
        "bin", "n_a", "n_b",
        F.sum("n_a").over(wall).cast("long").alias("_tot_a"),
        F.sum("n_b").over(wall).cast("long").alias("_tot_b"),
    )
    ppm = lambda n, tot: F.when(  # noqa: E731 — local formula, named for the two uses
        F.col(tot) > 0, F.expr(f"{n} * {scale}L div {tot}")
    ).otherwise(F.lit(0)).cast("long")
    return (
        counts
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width_i / scale)).alias("lo_edge"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width_i / scale)).alias("hi_edge"),
            "n_a",
            "n_b",
            ppm("n_a", "_tot_a").alias("ppm_a"),
            ppm("n_b", "_tot_b").alias("ppm_b"),
        )
        .withColumn("drift_ppm", F.abs(F.col("ppm_a") - F.col("ppm_b")))
    )


def shuffle_plan(
    df: DataFrame,
    key_col: str,
    row_bytes: int,
    target_mb: int = 128,
) -> DataFrame:
    """Shuffle-plan advisor — the actionable counterpart of
    :func:`skew_stats`: given a prospective shuffle key, an average row
    width and a target partition size, emit the per-key SALT FACTORS a
    salted repartition needs (keys whose single-partition payload would
    exceed the target, with salt_factor = ceil(key_bytes / target)) so
    hot keys split across exactly enough partitions and cold keys pay
    nothing. Empty output = the key is safe to shuffle unsalted.

    Output (key, n_rows, key_mb, salt_factor) for hot keys only — the
    relation a pipeline broadcasts next to the data to compute
    ``hash(key, row_hash % salt_factor)`` partition keys, bounded by the
    number of hot keys, never the corpus. Integer ceil via
    (a + b − 1) div b; ONE partial-combine count pass, a codegen filter
    on the aggregated key relation, nothing else."""
    if row_bytes <= 0 or target_mb <= 0:
        raise ValueError(
            f"row_bytes and target_mb must be positive, got {row_bytes}, {target_mb}"
        )
    target_bytes = target_mb * (1 << 20)
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    key_bytes = F.col("n_rows") * row_bytes
    return (
        counts.withColumn("_kb", key_bytes)
        .filter(F.col("_kb") > target_bytes)
        .select(
            "key",
            "n_rows",
            F.expr("_kb div 1048576").alias("key_mb"),
            F.expr(f"(_kb + {target_bytes}L - 1) div {target_bytes}L").alias(
                "salt_factor"
            ),
        )
    )


def shuffle_plan_sql(
    rel: str, key_col: str, row_bytes: int, target_mb: int = 128
) -> str:
    """DuckDB mirror of :func:`shuffle_plan`."""
    tb = target_mb * (1 << 20)
    return f"""
        WITH c AS (SELECT {key_col} AS key,
                          CAST(count(*) AS BIGINT) AS n_rows
                   FROM ({rel}) GROUP BY 1),
        k AS (SELECT key, n_rows, n_rows * {row_bytes} AS kb FROM c)
        SELECT key, n_rows,
               kb // 1048576 AS key_mb,
               (kb + {tb} - 1) // {tb} AS salt_factor
        FROM k WHERE kb > {tb}
    """


def cohort_retention(events: DataFrame) -> DataFrame:
    """Classic cohort-retention matrix over the event log: users are
    cohorted by their FIRST-seen day, and each (cohort_day, age_days)
    cell counts how many of that cohort's users were active again
    age_days later, plus the retention share in ppm of the cohort's
    size. Day arithmetic is integer microseconds-per-day floor division
    (``unix_micros div 86.4e9``) — timezone-free and bit-identical in
    both engines.

    Shape at 10^12 events: one (user, day) distinct (map-side-combined,
    output is active-user-days — orders smaller than events), one
    user-grain min aggregate for first-seen, a user-keyed hash join
    between those two user-grain relations (events are never
    self-joined), a (cohort, age) count aggregate, and a broadcast-size
    join back to cohort sizes. first-seen is a mergeable min, so the
    matrix maintains incrementally under daily appends."""
    # integer DIV, not float /: double rounding at day boundaries would
    # disagree with DuckDB's exact `//` on epoch_us values near 1.7e15
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    active = events.select("user_id", day.alias("day")).distinct()
    first = active.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cells = (
        active.join(first, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("age_days"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    sizes = first.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        cells.join(sizes, "cohort_day")
        .select(
            "cohort_day", "age_days", "n_users", "cohort_size",
            F.expr("(n_users * 1000000) div cohort_size").alias("retention_ppm"),
        )
    )


def cohort_retention_sql(rel: str) -> str:
    """DuckDB mirror of :func:`cohort_retention`."""
    return f"""
        WITH active AS (
          SELECT DISTINCT user_id,
                 epoch_us(ts) // 86400000000 AS day
          FROM ({rel})
        ),
        first AS (
          SELECT user_id, min(day) AS cohort_day FROM active GROUP BY user_id
        ),
        cells AS (
          SELECT f.cohort_day, a.day - f.cohort_day AS age_days,
                 count(*) AS n_users
          FROM active a JOIN first f USING (user_id)
          GROUP BY 1, 2
        ),
        sizes AS (
          SELECT cohort_day, count(*) AS cohort_size FROM first GROUP BY 1
        )
        SELECT c.cohort_day, c.age_days, c.n_users, s.cohort_size,
               (c.n_users * 1000000) // s.cohort_size AS retention_ppm
        FROM cells c JOIN sizes s USING (cohort_day)
    """


def funnel_latency(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    ps: tuple = (50, 90, 99),
) -> DataFrame:
    """Time-to-convert percentiles per funnel leg: for every consecutive
    step pair, exact nearest-rank percentiles of the seconds between the
    user's ordered first-reach times (:func:`funnel` output), over the
    users who completed the leg — the "how long does view→click take"
    curve that conversion COUNTS alone can't show (a leg whose p90 blows
    up is a UX regression even at flat conversion).

    Shape: funnel's per-user first-reach relation (user-grain, k fixed
    joins), then per leg a VALUE HISTOGRAM in whole seconds and the
    cumulative walk over the (stage, gap_s) relation — the response_gap
    scale contract: the only ordered windows run per stage over distinct
    gap values, bounded by the gap range, never the user count. Exact
    nearest-rank: answer = smallest gap with cum ≥ ceil(n·p/100);
    integer end-to-end (micros DIV 10⁶), engine-exact."""
    from pyspark.sql import Window

    f = funnel(events, steps)
    legs = None
    for i in range(1, len(steps)):
        a, b = f"t_{steps[i - 1]}", f"t_{steps[i]}"
        leg = f.filter(F.col(b).isNotNull()).select(
            F.lit(f"{steps[i - 1]}->{steps[i]}").alias("stage"),
            F.expr(f"(`{b}` - `{a}`) div 1000000").alias("gap_s"),
        )
        legs = leg if legs is None else legs.unionByName(leg)
    hist = legs.groupBy("stage", "gap_s").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("stage").orderBy("gap_s")
    cum = hist.select(
        "stage", "gap_s",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n_users"),
    )
    p = F.explode(F.array(*[F.lit(int(x)) for x in ps])).alias("p")
    return (
        cum.select("stage", "gap_s", "cum", "cum_prev", "n_users", p)
        .filter(
            (F.col("cum") >= F.expr("(n_users * p + 99) DIV 100"))
            & (F.col("cum_prev") < F.expr("(n_users * p + 99) DIV 100"))
        )
        .select("stage", "p", F.col("gap_s").alias("gap_p_s"), "n_users")
    )


def funnel_latency_sql(
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    ps: tuple = (50, 90, 99),
    table: str = "events",
) -> str:
    """DuckDB mirror of :func:`funnel_latency` (the funnel CTE chain of
    the funnel_steps oracle, then the same histogram + cumulative
    nearest-rank walk)."""
    parts = [
        f"WITH s0 AS (SELECT user_id, min(epoch_us(ts)) AS t0 "
        f"FROM {table} WHERE event_type = '{steps[0]}' GROUP BY 1)"
    ]
    for i in range(1, len(steps)):
        prev = ", ".join(f"t{j}" for j in range(i))
        guard = f"AND s{i-1}.t{i-1} IS NOT NULL " if i > 1 else ""
        parts.append(
            f"s{i} AS (SELECT s{i-1}.user_id, {', '.join('s' + str(i-1) + '.t' + str(j) for j in range(i))}, "
            f"min(CASE WHEN e.event_type = '{steps[i]}' {guard}"
            f"AND epoch_us(e.ts) > s{i-1}.t{i-1} "
            f"THEN epoch_us(e.ts) END) AS t{i} "
            f"FROM s{i-1} LEFT JOIN {table} e ON e.user_id = s{i-1}.user_id "
            f"GROUP BY {', '.join(str(k) for k in range(1, i + 2))})"
        )
    leg_selects = [
        f"SELECT '{steps[i-1]}->{steps[i]}' AS stage, "
        f"(t{i} - t{i-1}) // 1000000 AS gap_s "
        f"FROM s{len(steps)-1} WHERE t{i} IS NOT NULL"
        for i in range(1, len(steps))
    ]
    parts.append("legs AS (" + " UNION ALL ".join(leg_selects) + ")")
    parts.append(
        "hist AS (SELECT stage, gap_s, count(*) AS cnt "
        "FROM legs GROUP BY 1, 2)"
    )
    parts.append(
        "cum AS (SELECT stage, gap_s, "
        "sum(cnt) OVER (PARTITION BY stage ORDER BY gap_s) AS cum, "
        "sum(cnt) OVER (PARTITION BY stage ORDER BY gap_s) - cnt AS cum_prev, "
        "sum(cnt) OVER (PARTITION BY stage) AS n_users FROM hist)"
    )
    pvals = ", ".join(f"({int(x)})" for x in ps)
    return (
        ",\n".join(parts)
        + f"""
        SELECT stage, CAST(p.p AS INT) AS p, gap_s AS gap_p_s,
               CAST(n_users AS BIGINT) AS n_users
        FROM cum CROSS JOIN (VALUES {pvals}) AS p(p)
        WHERE cum >= (n_users * p.p + 99) // 100
          AND cum_prev < (n_users * p.p + 99) // 100
        """
    )


def session_paths(
    events: DataFrame,
    gap_seconds: int = 1800,
    top_n: int = 20,
) -> DataFrame:
    """Top in-session event-type trigram paths: the most frequent
    (step, next, next-next) sequences users actually walk inside one
    session — the "what do people do after an error" / navigation-flow
    report. Paths never cross a session boundary (the lead rows must
    carry the same session ordinal).

    Shape: ONE user_id hash exchange serves everything — the
    session-flag lag, the running session ordinal, and both event-type
    leads all share the same (ts, event_id)-ordered sort; then a
    map-side-combined count on the type³-bounded path key. The final
    rank is a single-partition window over that ≤|event types|³
    relation — a bounded domain (tens of types → thousands of rows),
    never the event count. Ties break (count desc, then path asc), so
    top_n is deterministic; integer end-to-end."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = events.select(
        "user_id", "event_type", "ts", "event_id",
        F.sum(new_session).over(run).cast("int").alias("sid"),
    )
    # second projection so the leads don't nest inside the running sum
    # (Spark forbids window-in-window); same key + same order, so
    # Catalyst reuses the one exchange + sort
    seq = base.select(
        F.col("event_type").alias("step_1"),
        "sid",
        F.lead("event_type", 1).over(w).alias("step_2"),
        F.lead("event_type", 2).over(w).alias("step_3"),
        # session ordinal is monotone within the user's order, so the
        # trigram stays in-session iff the +2 row is still in the same
        # session (which implies the +1 row is too)
        F.lead("sid", 2).over(w).alias("sid_3"),
    )
    counts = (
        seq.filter(F.col("sid_3") == F.col("sid"))
        .groupBy("step_1", "step_2", "step_3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    rw = Window.orderBy(
        F.col("n_paths").desc(), "step_1", "step_2", "step_3"
    )
    return (
        counts.select(
            "step_1", "step_2", "step_3", "n_paths",
            F.row_number().over(rw).cast("int").alias("path_rank"),
        )
        .filter(F.col("path_rank") <= top_n)
    )


def session_paths_sql(
    gap_seconds: int = 1800, top_n: int = 20, table: str = "events"
) -> str:
    """DuckDB mirror of :func:`session_paths`."""
    return f"""
        WITH o AS (
          SELECT user_id, event_type, ts, event_id,
                 epoch_us(ts) AS us,
                 lag(epoch_us(ts)) OVER w AS prev
          FROM {table}
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, event_type, ts, event_id,
                 CAST(sum(CASE WHEN prev IS NULL
                               OR us - prev > {gap_seconds} * 1000000
                               THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS INT) AS sid
          FROM o
        ),
        t AS (
          SELECT event_type AS step_1,
                 lead(event_type, 1) OVER w AS step_2,
                 lead(event_type, 2) OVER w AS step_3,
                 sid, lead(sid, 2) OVER w AS sid_3
          FROM s
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        c AS (
          SELECT step_1, step_2, step_3, count(*) AS n_paths
          FROM t WHERE sid_3 = sid GROUP BY 1, 2, 3
        )
        SELECT step_1, step_2, step_3, n_paths,
               CAST(row_number() OVER (ORDER BY n_paths DESC,
                    step_1, step_2, step_3) AS INT) AS path_rank
        FROM c
        QUALIFY path_rank <= {top_n}
    """


def basket_pairs(
    lineitem: DataFrame,
    min_pairs: int = 2,
    top_n: int = 25,
    scale: int = 1_000_000,
) -> DataFrame:
    """Market-basket affinity over order line items: the top part pairs
    by co-occurrence count, with integer support and lift — the
    "frequently bought together" relation (lift > 1e6 ppm ⇒ the pair
    co-occurs more than independent popularity predicts).

    Scale shape: the pair explosion is a self-join CO-PARTITIONED on the
    order key, so its cost is Σ basket² — bounded by real basket sizes
    (TPC-H ≤ 7), never corpus² — and parts are deduped per order first
    so repeated line numbers don't inflate counts. Popularity joins run
    at part grain (hash joins on the part key; the totals relation is a
    broadcast single row). The global top-N is orderBy+limit
    (TakeOrdered — per-partition heads, no single-partition sort of the
    pair relation) with the rank window running over the ≤top_n result.
    All ratios are DECIMAL(38,0)-product fixed point with truncating
    div, bit-identical to the HUGEINT mirror at any count. Ties break
    (count desc, part_a, part_b)."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    items = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    part_n = items.groupBy("pk").agg(F.count(F.lit(1)).alias("n_part"))
    totals = items.agg(
        F.countDistinct("ok").alias("_n_orders")
    )
    b = items.select("ok", F.col("pk").alias("pk_b"))
    pairs = (
        items.join(b, "ok")
        .filter(F.col("pk") < F.col("pk_b"))
        .groupBy(F.col("pk").alias("part_a"), F.col("pk_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_together"))
        .filter(F.col("n_together") >= min_pairs)
    )
    enriched = (
        pairs.join(
            part_n.select(F.col("pk").alias("part_a"),
                          F.col("n_part").alias("n_a")), "part_a")
        .join(
            part_n.select(F.col("pk").alias("part_b"),
                          F.col("n_part").alias("n_b")), "part_b")
        .crossJoin(F.broadcast(totals))
    )
    top = (
        enriched.orderBy(
            F.col("n_together").desc(), "part_a", "part_b"
        ).limit(top_n)
    )
    rw = Window.orderBy(F.col("n_together").desc(), "part_a", "part_b")
    return top.select(
        "part_a", "part_b", "n_together",
        F.expr(
            f"(cast(n_together as decimal(38,0)) * {scale}) div _n_orders"
        ).alias("support_ppm"),
        F.expr(
            f"(cast(n_together as decimal(38,0)) * _n_orders * {scale})"
            f" div (cast(n_a as decimal(38,0)) * n_b)"
        ).alias("lift_ppm"),
        F.row_number().over(rw).cast("int").alias("pair_rank"),
    )


def basket_pairs_sql(
    min_pairs: int = 2,
    top_n: int = 25,
    scale: int = 1_000_000,
    table: str = "lineitem",
) -> str:
    """DuckDB mirror of :func:`basket_pairs`."""
    return f"""
        WITH items AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM {table}
        ),
        part_n AS (SELECT pk, count(*) AS n_part FROM items GROUP BY pk),
        totals AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
        pairs AS (
          SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_together
          FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY 1, 2
          HAVING count(*) >= {min_pairs}
        )
        SELECT part_a, part_b, n_together,
               CAST(CAST(n_together AS HUGEINT) * {scale} // n_orders
                    AS BIGINT) AS support_ppm,
               CAST(CAST(n_together AS HUGEINT) * n_orders * {scale}
                    // (CAST(na.n_part AS HUGEINT) * nb.n_part)
                    AS BIGINT) AS lift_ppm,
               CAST(row_number() OVER (ORDER BY n_together DESC,
                    part_a, part_b) AS INT) AS pair_rank
        FROM pairs
        JOIN part_n na ON na.pk = part_a
        JOIN part_n nb ON nb.pk = part_b
        CROSS JOIN totals
        QUALIFY pair_rank <= {top_n}
    """


def stickiness(
    events: DataFrame, window_days: int = 7, scale: int = 1_000_000
) -> DataFrame:
    """DAU / trailing-WAU stickiness per day: distinct daily actives
    over distinct actives in the trailing ``window_days`` window, in ppm
    — the engagement ratio (1e6 ⇒ every weekly user shows up daily). Day
    arithmetic is integer microseconds DIV a day (the cohort_retention
    contract), so day boundaries agree across engines.

    Shape: ONE (user, day) distinct off the event scan, then the DAU
    aggregate and — for the trailing window — a bounded ×window_days
    explode of the USER-DAY relation (each active (user, day) projects
    onto the next ``window_days`` as-of days) re-distincted and counted.
    Events are never self-joined and nothing is keyed finer than
    (user, day); the final join is day-grain. As-of days are restricted
    to days with observed activity (an inner join on the DAU relation),
    so the series has no trailing phantom days."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    ud = events.select("user_id", day.alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        ud.select(
            "user_id",
            F.explode(
                F.expr(f"sequence(day, day + {window_days - 1})")
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day", "dau", "wau",
        F.expr(f"(cast(dau as decimal(38,0)) * {scale}) div wau").alias(
            "stickiness_ppm"
        ),
    )


def stickiness_sql(
    window_days: int = 7, scale: int = 1_000_000, table: str = "events"
) -> str:
    """DuckDB mirror of :func:`stickiness`."""
    return f"""
        WITH ud AS (
          SELECT DISTINCT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
          FROM {table}
        ),
        dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        wau AS (
          SELECT day, count(*) AS wau FROM (
            SELECT DISTINCT user_id, ud.day + i AS day
            FROM ud, range({window_days}) r(i)
          ) GROUP BY day
        )
        SELECT dau.day, dau, wau,
               CAST(CAST(dau AS HUGEINT) * {scale} // wau AS BIGINT)
                 AS stickiness_ppm
        FROM dau JOIN wau ON dau.day = wau.day
    """


def reorder_gap(
    orders: DataFrame, ps: tuple = (50, 90, 99)
) -> DataFrame:
    """Repeat-purchase cadence: exact nearest-rank percentiles of the
    days between a customer's consecutive orders — the
    inter-purchase-interval curve behind churn heuristics ("inactive
    for > p90 gap"). First orders contribute no gap; ties in the
    per-customer order break on the order key.

    Shape: one lag window on the customer exchange, then the VALUE
    HISTOGRAM + cumulative walk over distinct gap-day values (the
    response_gap scale contract — the only global ordering runs over
    the bounded gap-day domain, never the order count). Integer: day =
    micros DIV day, gap in whole days, rank = smallest gap with
    cum ≥ ceil(n·p/100)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    day = F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
    gaps = (
        orders.select("o_custkey", "o_orderkey", day.alias("day"))
        .withColumn("prev", F.lag("day").over(w))
        .filter(F.col("prev").isNotNull())
        .select((F.col("day") - F.col("prev")).alias("gap_d"))
    )
    hist = gaps.groupBy("gap_d").agg(F.count(F.lit(1)).alias("cnt"))
    cw = Window.orderBy("gap_d")
    cum = hist.select(
        "gap_d",
        F.sum("cnt").over(cw).alias("cum"),
        (F.sum("cnt").over(cw) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(
            cw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    p = F.explode(F.array(*[F.lit(int(x)) for x in ps])).alias("p")
    return (
        cum.select("gap_d", "cum", "cum_prev", "n", p)
        .filter(
            (F.col("cum") >= F.expr("(n * p + 99) DIV 100"))
            & (F.col("cum_prev") < F.expr("(n * p + 99) DIV 100"))
        )
        .select("p", F.col("gap_d").alias("gap_p_days"),
                F.col("n").alias("n_gaps"))
    )


def reorder_gap_sql(ps: tuple = (50, 90, 99), table: str = "orders") -> str:
    """DuckDB mirror of :func:`reorder_gap`."""
    pvals = ", ".join(f"({int(x)})" for x in ps)
    return f"""
        WITH o AS (
          SELECT o_custkey, o_orderkey,
                 epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
                   AS day
          FROM {table}
        ),
        g AS (
          SELECT day - lag(day) OVER (PARTITION BY o_custkey
                                      ORDER BY day, o_orderkey) AS gap_d
          FROM o
          QUALIFY gap_d IS NOT NULL
        ),
        hist AS (SELECT gap_d, count(*) AS cnt FROM g GROUP BY gap_d),
        cum AS (
          SELECT gap_d,
                 sum(cnt) OVER (ORDER BY gap_d) AS cum,
                 sum(cnt) OVER (ORDER BY gap_d) - cnt AS cum_prev,
                 sum(cnt) OVER () AS n
          FROM hist
        )
        SELECT CAST(p.p AS INT) AS p, gap_d AS gap_p_days,
               CAST(n AS BIGINT) AS n_gaps
        FROM cum CROSS JOIN (VALUES {pvals}) AS p(p)
        WHERE cum >= (n * p.p + 99) // 100
          AND cum_prev < (n * p.p + 99) // 100
    """


def cohort_ltv(
    orders: DataFrame, max_age_months: int = 12
) -> DataFrame:
    """Cohort lifetime-value curve: customers cohorted by first-order
    month; per (cohort_month, age_months) the order count, period
    revenue, and CUMULATIVE revenue per cohort — the payback curve that
    tells you how fast a cohort earns back acquisition cost and whether
    newer cohorts monetize slower. Month arithmetic is integer
    (epoch-day DIV 30 — calendar-month drift is irrelevant to the curve
    shape and the fixed divisor keeps engines bit-equal); money sums run
    in DECIMAL(18,2) exactly (order-independent); only the
    final report columns drop to rounded double (the _dec_sum
    convention).

    Shape: first-order month is a customer-grain min (mergeable ⇒
    incremental under appends); orders join that CUSTOMER-grain relation
    on the customer key (never order×order); ONE (cohort, age) aggregate;
    the cumulative window runs over the ≤cohorts×ages relation."""
    if max_age_months < 0:
        raise ValueError(f"max_age_months must be >= 0, got {max_age_months}")
    month = F.expr(
        "unix_micros(cast(o_orderdate as timestamp))"
        " div 86400000000 div 30"
    )
    o = orders.select(
        "o_custkey",
        month.alias("month"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    first = o.groupBy("o_custkey").agg(F.min("month").alias("cohort_month"))
    j = (
        o.join(first, "o_custkey")
        .select(
            "cohort_month",
            (F.col("month") - F.col("cohort_month")).alias("age_months"),
            "price",
        )
        .filter(F.col("age_months") <= max_age_months)
    )
    agg = j.groupBy("cohort_month", "age_months").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").alias("revenue"),
    )
    cw = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # report through the repo's _dec_sum convention: the SUM is exact
    # decimal (order-independent); only the final report column drops to
    # rounded double, like every other money-valued oracle query here
    return agg.select(
        "cohort_month", "age_months", "n_orders",
        F.round(F.col("revenue"), 2).cast("double").alias("revenue"),
        F.round(F.sum("revenue").over(cw), 2).cast("double").alias(
            "cum_revenue"
        ),
    )


def cohort_ltv_sql(max_age_months: int = 12, table: str = "orders") -> str:
    """DuckDB mirror of :func:`cohort_ltv`."""
    return f"""
        WITH o AS (
          SELECT o_custkey,
                 epoch_us(CAST(o_orderdate AS TIMESTAMP))
                   // 86400000000 // 30 AS month,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price
          FROM {table}
        ),
        first AS (SELECT o_custkey, min(month) AS cohort_month
                  FROM o GROUP BY 1),
        j AS (
          SELECT cohort_month, o.month - cohort_month AS age_months, price
          FROM o JOIN first USING (o_custkey)
          WHERE o.month - cohort_month <= {max_age_months}
        ),
        agg AS (
          SELECT cohort_month, age_months, count(*) AS n_orders,
                 sum(price) AS revenue
          FROM j GROUP BY 1, 2
        )
        SELECT cohort_month, age_months, n_orders,
               CAST(round(revenue, 2) AS DOUBLE) AS revenue,
               CAST(round(sum(revenue) OVER (PARTITION BY cohort_month
                    ORDER BY age_months ROWS UNBOUNDED PRECEDING), 2)
                    AS DOUBLE) AS cum_revenue
        FROM agg
    """

def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM segmentation: customers quartile-scored on Recency (days
    since last order, lower = better), Frequency (order count) and
    Monetary (lifetime revenue), then rolled up per (r,f,m) cell —
    the classic CRM grid (`444` = recent/frequent/big-ticket whales,
    `111` = lapsed one-shot buyers). Scores are 1..4: one point per
    quartile threshold the value exceeds, recency reversed.

    Engine-exact by construction: thresholds are exact nearest-rank
    quartiles computed via the VALUE HISTOGRAM + cumulative walk (the
    reorder_gap scale contract — the only global windows run over the
    bounded threshold domains: distinct recency days, distinct order
    counts, distinct revenue DOLLARS; monetary is segmented at dollar
    grain exactly so its threshold domain is price-grid-bounded rather
    than customer-bounded). Revenue itself accumulates in
    DECIMAL(18,2) cents and reports as BIGINT cents (wraps past ~9e16
    dollars per cell — a documented non-bound).

    Shape: ONE customer-grain aggregate off the order scan; three tiny
    histogram walks; the 1-row threshold relation broadcast back over
    the customer relation; one ≤64-cell rollup. Orders are never
    self-joined and nothing is keyed finer than the customer."""
    day = F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
    per_cust = orders.select(
        "o_custkey", day.alias("day"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).groupBy("o_custkey").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.expr("CAST(price * 100 AS DECIMAL(38,0))")).alias("cents"),
    )
    anchor = per_cust.agg(F.max("last_day").alias("anchor_day"))
    base = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        (F.col("anchor_day") - F.col("last_day")).alias("rec_d"),
        "freq",
        "cents",
        F.expr("CAST(cents DIV 100 AS BIGINT)").alias("dollars"),
    )

    def _quartiles(col: str):
        hist = base.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        cw = Window.orderBy("v")
        cum = hist.select(
            "v",
            F.sum("cnt").over(cw).alias("cum"),
            (F.sum("cnt").over(cw) - F.col("cnt")).alias("cum_prev"),
            F.sum("cnt").over(
                cw.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
            ).alias("n"),
        )
        p = F.explode(F.array(F.lit(25), F.lit(50), F.lit(75))).alias("p")
        picked = cum.select("v", "cum", "cum_prev", "n", p).filter(
            (F.col("cum") >= F.expr("(n * p + 99) DIV 100"))
            & (F.col("cum_prev") < F.expr("(n * p + 99) DIV 100"))
        )
        return picked.groupBy().pivot("p", [25, 50, 75]).agg(
            F.first("v")
        ).select(
            F.col("25").alias(f"{col}_q1"),
            F.col("50").alias(f"{col}_q2"),
            F.col("75").alias(f"{col}_q3"),
        )

    th = (
        _quartiles("rec_d")
        .crossJoin(_quartiles("freq"))
        .crossJoin(_quartiles("dollars"))
    )
    scored = base.crossJoin(F.broadcast(th)).select(
        "cents",
        (
            F.lit(4)
            - (F.col("rec_d") > F.col("rec_d_q1")).cast("int")
            - (F.col("rec_d") > F.col("rec_d_q2")).cast("int")
            - (F.col("rec_d") > F.col("rec_d_q3")).cast("int")
        ).alias("r_score"),
        (
            F.lit(1)
            + (F.col("freq") > F.col("freq_q1")).cast("int")
            + (F.col("freq") > F.col("freq_q2")).cast("int")
            + (F.col("freq") > F.col("freq_q3")).cast("int")
        ).alias("f_score"),
        (
            F.lit(1)
            + (F.col("dollars") > F.col("dollars_q1")).cast("int")
            + (F.col("dollars") > F.col("dollars_q2")).cast("int")
            + (F.col("dollars") > F.col("dollars_q3")).cast("int")
        ).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr("CAST(sum(cents) AS BIGINT)").alias("revenue_cents"),
    )


def rfm_segments_sql(table: str = "orders") -> str:
    """DuckDB mirror of :func:`rfm_segments`."""

    def q(col: str) -> str:
        return f"""
        {col}_hist AS (
          SELECT {col} AS v, count(*) AS cnt FROM base GROUP BY 1
        ),
        {col}_cum AS (
          SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
                 sum(cnt) OVER (ORDER BY v) - cnt AS cum_prev,
                 sum(cnt) OVER () AS n
          FROM {col}_hist
        ),
        {col}_q AS (
          SELECT max(CASE WHEN p = 25 THEN v END) AS {col}_q1,
                 max(CASE WHEN p = 50 THEN v END) AS {col}_q2,
                 max(CASE WHEN p = 75 THEN v END) AS {col}_q3
          FROM {col}_cum CROSS JOIN (VALUES (25), (50), (75)) AS pp(p)
          WHERE cum >= (n * p + 99) // 100
            AND cum_prev < (n * p + 99) // 100
        )"""

    return f"""
        WITH pc AS (
          SELECT o_custkey,
                 max(epoch_us(CAST(o_orderdate AS TIMESTAMP))
                     // 86400000000) AS last_day,
                 count(*) AS freq,
                 sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS DECIMAL(38,0))) AS cents
          FROM {table} GROUP BY 1
        ),
        anchor AS (SELECT max(last_day) AS anchor_day FROM pc),
        base AS (
          SELECT o_custkey, anchor_day - last_day AS rec_d, freq, cents,
                 CAST(CAST(cents AS HUGEINT) // 100 AS BIGINT) AS dollars
          FROM pc CROSS JOIN anchor
        ),
        {q("rec_d")},
        {q("freq")},
        {q("dollars")}
        SELECT CAST(4 - (rec_d > rec_d_q1)::INT - (rec_d > rec_d_q2)::INT
                    - (rec_d > rec_d_q3)::INT AS INT) AS r_score,
               CAST(1 + (freq > freq_q1)::INT + (freq > freq_q2)::INT
                    + (freq > freq_q3)::INT AS INT) AS f_score,
               CAST(1 + (dollars > dollars_q1)::INT
                    + (dollars > dollars_q2)::INT
                    + (dollars > dollars_q3)::INT AS INT) AS m_score,
               count(*) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM base CROSS JOIN rec_d_q CROSS JOIN freq_q CROSS JOIN dollars_q
        GROUP BY 1, 2, 3
    """

def pareto_share(orders: DataFrame, n_buckets: int = 10,
                 scale: int = 1_000_000) -> DataFrame:
    """Revenue-concentration (Lorenz/Pareto) curve: for each decile k of
    customers ranked by lifetime revenue DESC, the cumulative revenue
    share in ppm — "the top 10% of customers carry X% of revenue". The
    whale-dependence report every marketplace runs.

    Ranking is at revenue-DOLLAR grain with deterministic intra-class
    apportionment: when a decile boundary falls inside a class of
    customers sharing the same dollar total, that class's exact cents
    contribute proportionally by customer count (truncating integer
    div). This keeps the only global ordering on the DISTINCT DOLLAR
    domain (price-grid-bounded — the reorder_gap scale contract) while
    remaining bit-identical across engines; cents stay DECIMAL(38,0)
    throughout.

    Shape: one customer-grain aggregate, one dollar-grain histogram,
    one cumulative walk over the histogram, a |n_buckets|-element
    literal explode. No global sort of the customer relation."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    per_cust = orders.select(
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(price * 100 AS DECIMAL(38,0))")).alias("cents"),
    ).select("cents", F.expr("CAST(cents DIV 100 AS BIGINT)").alias("dollars"))
    hist = per_cust.groupBy("dollars").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("cents").alias("rev"),
    )
    cw = Window.orderBy(F.col("dollars").desc())
    full = cw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "dollars", "cnt", "rev",
        (F.sum("cnt").over(cw)).alias("cum"),
        (F.sum("cnt").over(cw) - F.col("cnt")).alias("cum_prev"),
        (F.sum("rev").over(cw) - F.col("rev")).alias("rev_prev"),
        F.sum("cnt").over(full).alias("n"),
        F.sum("rev").over(full).alias("total_rev"),
    )
    k = F.explode(
        F.array(*[F.lit(int(i)) for i in range(1, n_buckets + 1)])
    ).alias("k")
    return (
        cum.select("dollars", "cnt", "rev", "cum", "cum_prev", "rev_prev",
                   "n", "total_rev", k)
        .filter(
            (F.col("cum") >= F.expr(f"(n * k) DIV {n_buckets}"))
            & (F.col("cum_prev") < F.expr(f"(n * k) DIV {n_buckets}"))
        )
        .select(
            "k",
            F.expr(f"CAST((n * k) DIV {n_buckets} AS BIGINT)").alias(
                "n_customers"
            ),
            F.expr(
                f"CAST(rev_prev + (rev * ((n * k) DIV {n_buckets} - cum_prev))"
                f" DIV cnt AS BIGINT)"
            ).alias("cum_revenue_cents"),
            F.expr(
                f"CAST(((rev_prev + (rev * ((n * k) DIV {n_buckets}"
                f" - cum_prev)) DIV cnt) * {scale}) DIV total_rev AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


def pareto_share_sql(n_buckets: int = 10, scale: int = 1_000_000,
                     table: str = "orders") -> str:
    """DuckDB mirror of :func:`pareto_share`."""
    tgt = f"(n * k) // {n_buckets}"
    return f"""
        WITH pc AS (
          SELECT o_custkey,
                 sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS DECIMAL(38,0))) AS cents
          FROM {table} GROUP BY 1
        ),
        -- all mirror arithmetic runs in HUGEINT: DuckDB's // on DECIMAL
        -- operands routes through DOUBLE and can round the quotient up,
        -- while HUGEINT // is exact (matches Spark's exact decimal DIV)
        d AS (SELECT CAST(cents AS HUGEINT) AS cents,
                     CAST(CAST(cents AS HUGEINT) // 100 AS BIGINT) AS dollars
              FROM pc),
        hist AS (
          SELECT dollars, count(*) AS cnt, sum(cents) AS rev
          FROM d GROUP BY 1
        ),
        cum AS (
          SELECT dollars, cnt, rev,
                 sum(cnt) OVER (ORDER BY dollars DESC) AS cum,
                 sum(cnt) OVER (ORDER BY dollars DESC) - cnt AS cum_prev,
                 sum(rev) OVER (ORDER BY dollars DESC) - rev AS rev_prev,
                 sum(cnt) OVER () AS n,
                 sum(rev) OVER () AS total_rev
          FROM hist
        )
        SELECT CAST(k AS INT) AS k,
               CAST({tgt} AS BIGINT) AS n_customers,
               CAST(rev_prev + (rev * ({tgt} - cum_prev)) // cnt
                    AS BIGINT) AS cum_revenue_cents,
               CAST(((rev_prev + (rev * ({tgt} - cum_prev)) // cnt)
                    * {scale}) // total_rev AS BIGINT) AS share_ppm
        FROM cum CROSS JOIN (SELECT unnest(range(1, {n_buckets + 1})) AS k)
        WHERE cum >= {tgt} AND cum_prev < {tgt}
    """


def debounce_events(events: DataFrame, window_s: int = 60) -> DataFrame:
    """Debounce audit per event type: how many events arrive within
    ``window_s`` seconds of the SAME user's previous event of the same
    type (double-clicks, retry storms, duplicate beacons) and the kept
    rate in ppm after dropping them. The dedup-by-proximity screen a
    telemetry ingest runs before billing/metrics.

    Gap semantics: each event compares against its immediate
    predecessor in (user, type) event order (ties on event_id), not
    against the last KEPT event — a single lag window, stateless and
    exactly mirrorable, where the kept-anchored variant would need a
    sequential scan. Integer seconds (micros DIV 1e6).

    Shape: ONE (user_id, event_type) exchange for the lag window, then
    a per-type rollup. Nothing driver-side, no self-join."""
    if window_s < 1:
        raise ValueError(f"window_s must be >= 1, got {window_s}")
    w = Window.partitionBy("user_id", "event_type").orderBy("sec", "event_id")
    sec = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    flagged = (
        events.select("event_id", "user_id", "event_type", sec.alias("sec"))
        .withColumn("prev", F.lag("sec").over(w))
        .select(
            "event_type",
            (
                F.col("prev").isNotNull()
                & (F.col("sec") - F.col("prev") < window_s)
            ).cast("int").alias("bounced"),
        )
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("bounced").cast("long").alias("n_bounced"),
        F.expr(
            "CAST((CAST(count(1) - sum(bounced) AS DECIMAL(38,0))"
            " * 1000000) DIV count(1) AS BIGINT)"
        ).alias("kept_ppm"),
    )


def debounce_events_sql(window_s: int = 60, table: str = "events") -> str:
    """DuckDB mirror of :func:`debounce_events`."""
    return f"""
        WITH s AS (
          SELECT event_id, user_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
          FROM {table}
        ),
        f AS (
          SELECT event_type,
                 CAST(coalesce(
                   sec - lag(sec) OVER (PARTITION BY user_id, event_type
                                        ORDER BY sec, event_id)
                   < {window_s}, FALSE) AS INT) AS bounced
          FROM s
        )
        SELECT event_type, count(*) AS n_events,
               CAST(sum(bounced) AS BIGINT) AS n_bounced,
               CAST((CAST(count(*) - sum(bounced) AS HUGEINT) * 1000000)
                    // count(*) AS BIGINT) AS kept_ppm
        FROM f GROUP BY 1
    """


def burstiness(events: DataFrame, min_events: int = 5,
               top_n: int = 100, scale: int = 1_000_000) -> DataFrame:
    """Per-user inter-arrival burstiness: the squared coefficient of
    variation of a user's gaps between consecutive events, in ppm —
    CV² = n·Σg²/(Σg)² − 1. A Poisson (memoryless) user sits at ~1e6;
    bots on a timer → 0; bursty humans → ≫1e6. The bot/burst screen for
    rate-limiting and abuse triage, reported for the ``top_n`` most
    bursty qualifying users.

    Integer end to end: gaps in whole seconds, Σg² accumulated in
    DECIMAL(38,0) (safe: 10¹² one-year gaps), the CV² ratio a
    truncating div — bit-equal to the HUGEINT mirror. Zero-duration
    users (Σg = 0) are excluded with the < min_events crowd.

    Shape: one lag window on the user exchange, one user-grain
    aggregate reusing that partitioning, then a global top-N via
    orderBy+limit (TakeOrdered — per-partition heads, never a full
    sort). Ties break (cv2 desc, user_id)."""
    if min_events < 2:
        raise ValueError(f"min_events must be >= 2, got {min_events}")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    sec = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    gaps = (
        events.select("event_id", "user_id", sec.alias("sec"))
        .withColumn("prev", F.lag("sec").over(w))
        .filter(F.col("prev").isNotNull())
        .select("user_id", (F.col("sec") - F.col("prev")).alias("g"))
    )
    per_user = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("g").cast("decimal(38,0)")).alias("sg"),
        F.sum(F.expr("CAST(g AS DECIMAL(38,0)) * g")).alias("sg2"),
    ).filter((F.col("n_gaps") >= min_events - 1) & (F.col("sg") > 0))
    scored = per_user.select(
        "user_id",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.expr("CAST(sg DIV n_gaps AS BIGINT)").alias("mean_gap_s"),
        F.expr(
            f"CAST((n_gaps * sg2 * {scale}) DIV (sg * sg) - {scale}"
            f" AS BIGINT)"
        ).alias("cv2_ppm"),
    )
    return scored.orderBy(F.col("cv2_ppm").desc(), "user_id").limit(top_n)


def burstiness_sql(min_events: int = 5, top_n: int = 100,
                   scale: int = 1_000_000, table: str = "events") -> str:
    """DuckDB mirror of :func:`burstiness`."""
    return f"""
        WITH s AS (
          SELECT event_id, user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
          FROM {table}
        ),
        g AS (
          SELECT user_id,
                 sec - lag(sec) OVER (PARTITION BY user_id
                                      ORDER BY sec, event_id) AS g
          FROM s
          QUALIFY g IS NOT NULL
        ),
        pu AS (
          SELECT user_id, count(*) AS n_gaps,
                 sum(CAST(g AS HUGEINT)) AS sg,
                 sum(CAST(g AS HUGEINT) * g) AS sg2
          FROM g GROUP BY 1
          HAVING count(*) >= {min_events - 1} AND sum(g) > 0
        )
        SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
               CAST(sg // n_gaps AS BIGINT) AS mean_gap_s,
               CAST((n_gaps * sg2 * {scale}) // (sg * sg) - {scale}
                    AS BIGINT) AS cv2_ppm
        FROM pu
        ORDER BY cv2_ppm DESC, user_id
        LIMIT {top_n}
    """

def hist_equidepth(
    df: DataFrame, value_col: str = "value", n_bins: int = 10
) -> DataFrame:
    """Equi-depth histogram boundaries of a numeric column: for each
    bin k of ``n_bins``, the exact nearest-rank upper boundary (the
    value at rank ceil(n·k/n_bins)) — the quantile sketch behind
    range-partition planning, z-order bucket sizing and skew detection,
    where fixed-width bins (:func:`value_histogram`) waste resolution on
    long tails.

    Values map to the micro-integer grid first (round(v·1e6) as long —
    the value_histogram contract, deterministic in both engines), and
    boundaries come from the VALUE HISTOGRAM + cumulative walk: the only
    global ordering runs over the distinct micro-value relation
    (value-grid-bounded, the reorder_gap contract), never a sort of the
    row stream. NULLs drop (profile_columns owns null counts).

    Returns (bin int, upper_micro long, upper double, n_cum long)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    v_i = F.round(F.col(value_col).cast("decimal(26,6)") * 1_000_000, 0).cast(
        "long"
    )
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .select(v_i.alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cw = Window.orderBy("v")
    cum = hist.select(
        "v",
        F.sum("cnt").over(cw).alias("cum"),
        (F.sum("cnt").over(cw) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(
            cw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    k = F.explode(
        F.array(*[F.lit(int(i)) for i in range(1, n_bins + 1)])
    ).alias("bin")
    return (
        cum.select("v", "cum", "cum_prev", "n", k)
        .filter(
            (F.col("cum") >= F.expr(f"(n * bin + {n_bins - 1}) DIV {n_bins}"))
            & (F.col("cum_prev") < F.expr(f"(n * bin + {n_bins - 1}) DIV {n_bins}"))
        )
        .select(
            "bin",
            F.col("v").alias("upper_micro"),
            (F.col("v") / F.lit(1_000_000.0)).alias("upper"),
            F.expr(f"CAST((n * bin + {n_bins - 1}) DIV {n_bins} AS BIGINT)").alias(
                "n_cum"
            ),
        )
    )


def hist_equidepth_sql(
    value_col: str = "value", n_bins: int = 10, table: str = "events"
) -> str:
    """DuckDB mirror of :func:`hist_equidepth`."""
    tgt = f"(n * k + {n_bins - 1}) // {n_bins}"
    return f"""
        WITH hist AS (
          SELECT CAST(round(CAST({value_col} AS DECIMAL(26,6)) * 1000000, 0)
                      AS BIGINT) AS v,
                 count(*) AS cnt
          FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1
        ),
        cum AS (
          SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
                 sum(cnt) OVER (ORDER BY v) - cnt AS cum_prev,
                 sum(cnt) OVER () AS n
          FROM hist
        )
        SELECT CAST(k AS INT) AS bin, v AS upper_micro,
               v / 1000000.0 AS upper,
               CAST({tgt} AS BIGINT) AS n_cum
        FROM cum CROSS JOIN (SELECT unnest(range(1, {n_bins + 1})) AS k)
        WHERE cum >= {tgt} AND cum_prev < {tgt}
    """


def ship_sla(
    orders: DataFrame, lineitem: DataFrame,
    slas: tuple = (30, 60, 90), scale: int = 1_000_000,
) -> DataFrame:
    """Fulfilment-SLA attainment by order priority: per priority class,
    the line-item count and the ppm share shipped within each
    ``slas``-day window of the order date — the ops dashboard behind
    "URGENT orders ship in 30 days 99% of the time". Integer day
    arithmetic (micros DIV day) on both sides of the join.

    Shape: ONE hash join lineitem⋈orders on the order key (big⋈big,
    co-partitioned — at TPC-H scale both sides are bucketed/sorted by
    orderkey, so the exchange is free under storage-partitioned joins),
    then one ≤|priorities| aggregate with conditional sums folded
    map-side. The share arithmetic is DECIMAL(38,0)·scale with
    truncating div (engine-exact past 10¹² line items)."""
    if not slas:
        raise ValueError("slas must be non-empty")
    day = "unix_micros(cast({} as timestamp)) div 86400000000"
    o = orders.select(
        "o_orderkey", "o_orderpriority",
        F.expr(day.format("o_orderdate")).alias("od"),
    )
    li = lineitem.select(
        "l_orderkey", F.expr(day.format("l_shipdate")).alias("sd")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", (F.col("sd") - F.col("od")).alias("lag_d")
    )
    aggs = [F.count(F.lit(1)).alias("n_items")]
    shares = []
    for s in slas:
        aggs.append(
            F.sum((F.col("lag_d") <= s).cast("long")).alias(f"_w{s}")
        )
        shares.append(
            F.expr(
                f"CAST((CAST(_w{s} AS DECIMAL(38,0)) * {scale})"
                f" DIV n_items AS BIGINT)"
            ).alias(f"within{s}_ppm")
        )
    return (
        j.groupBy("o_orderpriority")
        .agg(*aggs)
        .select("o_orderpriority", "n_items", *shares)
    )


def ship_sla_sql(
    slas: tuple = (30, 60, 90), scale: int = 1_000_000,
    orders_table: str = "orders", lineitem_table: str = "lineitem",
) -> str:
    """DuckDB mirror of :func:`ship_sla`."""
    cols = ", ".join(
        f"CAST((CAST(sum(CASE WHEN lag_d <= {s} THEN 1 ELSE 0 END)"
        f" AS HUGEINT) * {scale}) // count(*) AS BIGINT) AS within{s}_ppm"
        for s in slas
    )
    return f"""
        WITH j AS (
          SELECT o.o_orderpriority,
                 epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 86400000000
                 - epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 86400000000
                   AS lag_d
          FROM {lineitem_table} l
          JOIN {orders_table} o ON l.l_orderkey = o.o_orderkey
        )
        SELECT o_orderpriority, count(*) AS n_items, {cols}
        FROM j GROUP BY 1
    """


def seasonal_spikes(
    events: DataFrame, min_ratio_ppm: int = 2_000_000,
    min_base_events: int = 8, scale: int = 1_000_000,
) -> DataFrame:
    """Seasonal-naive anomaly screen: hourly event counts compared
    against the SAME-HOUR-OF-DAY baseline for that event type (mean
    over all observed days, computed leave-in), emitting the (type,
    day, hour) cells whose count is ≥ ``min_ratio_ppm`` of baseline —
    the diurnal-aware complement of :func:`rate_spikes`' trailing
    window, which flags every morning ramp on a nocturnal service.
    ratio = n/(total/n_days) evaluated as n·n_days·scale DIV total
    (exact integers, no baseline rounding). Types whose hod baseline
    has fewer than ``min_base_events`` events are skipped (a spike over
    a 1-event baseline is noise).

    Shape: one (type, day, hod) count aggregate off the scan, one
    (type, hod) rollup of THAT relation (tiny), a hash join back on
    (type, hod), and a codegen filter. Day/hour are integer micros
    arithmetic — no timezone-dependent truncation. The cell aggregate
    (:func:`seasonal_cells`) is a mergeable integer partial — the
    streaming twin (streaming.stream_seasonal_partials /
    read_seasonal_spikes) commits it per epoch and re-derives the
    report through :func:`spikes_from_cells`, bit-exact to batch."""
    return spikes_from_cells(
        seasonal_cells(events), min_ratio_ppm, min_base_events, scale
    )


def seasonal_cells(events: DataFrame) -> DataFrame:
    """The (event_type, day, hod) hourly count cells — the mergeable
    integer partial under :func:`seasonal_spikes` (cells of shards /
    epochs merge by adding n)."""
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    hod = F.expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24")
    return (
        events.select("event_type", day.alias("day"), hod.alias("hod"))
        .groupBy("event_type", "day", "hod")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def spikes_from_cells(
    cells: DataFrame, min_ratio_ppm: int = 2_000_000,
    min_base_events: int = 8, scale: int = 1_000_000,
) -> DataFrame:
    """The baseline + ratio tail of :func:`seasonal_spikes`, shared with
    the streaming partials reader so both paths compute the ratio once,
    after all counts are merged."""
    base = cells.groupBy("event_type", "hod").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_days")
    ).filter(F.col("total") >= min_base_events)
    return (
        cells.join(base, ["event_type", "hod"])
        .select(
            "event_type", "day", "hod", "n", "total", "n_days",
            F.expr(
                f"CAST((CAST(n AS DECIMAL(38,0)) * n_days * {scale})"
                f" DIV total AS BIGINT)"
            ).alias("ratio_ppm"),
        )
        .filter(F.col("ratio_ppm") >= min_ratio_ppm)
    )


def seasonal_spikes_sql(
    min_ratio_ppm: int = 2_000_000, min_base_events: int = 8,
    scale: int = 1_000_000, table: str = "events",
) -> str:
    """DuckDB mirror of :func:`seasonal_spikes`."""
    return f"""
        WITH cells AS (
          SELECT event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
                 (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hod,
                 count(*) AS n
          FROM {table} GROUP BY 1, 2, 3
        ),
        base AS (
          SELECT event_type, hod, sum(n) AS total, count(*) AS n_days
          FROM cells GROUP BY 1, 2
          HAVING sum(n) >= {min_base_events}
        )
        SELECT c.event_type, c.day, c.hod, c.n,
               CAST(b.total AS BIGINT) AS total,
               CAST(b.n_days AS BIGINT) AS n_days,
               CAST((CAST(c.n AS HUGEINT) * b.n_days * {scale}) // b.total
                    AS BIGINT) AS ratio_ppm
        FROM cells c JOIN base b USING (event_type, hod)
        WHERE (CAST(c.n AS HUGEINT) * b.n_days * {scale}) // b.total
              >= {min_ratio_ppm}
    """


# Benford first-digit probabilities log10(1 + 1/d) in ppm, rounded to the
# nearest ppm — literal constants so no engine evaluates a log
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153,
               45757)


def benford_screen(
    orders: DataFrame, amount_col: str = "o_totalprice",
    scale: int = 1_000_000,
) -> DataFrame:
    """Benford first-digit screen over an amount column: observed
    first-significant-digit distribution of the cent amounts vs the
    Benford expectation, with the absolute deviation per digit — the
    classic fabricated-numbers tripwire (auditing, synthetic-data QA).
    Amounts are fixed to integer cents (round(v·100), the micro-grid
    contract); zero/negative amounts drop (no leading digit). The first
    digit comes from the decimal-string head — pure integer/string ops,
    identical in both engines.

    Shape: one narrow map + one 9-key aggregate + a broadcast of the
    9-row totals; everything folds map-side."""
    cents = F.round(F.col(amount_col).cast("decimal(26,6)") * 100, 0).cast(
        "long"
    )
    digits = (
        orders.select(cents.alias("c"))
        .filter(F.col("c") > 0)
        .select(
            F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias(
                "digit"
            )
        )
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    exp_arr = "array({})".format(", ".join(str(p) for p in BENFORD_PPM))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.expr(
                f"CAST((CAST(n AS DECIMAL(38,0)) * {scale}) DIV _total"
                f" AS BIGINT)"
            ).alias("obs_ppm"),
            F.expr(f"CAST(element_at({exp_arr}, digit) AS BIGINT)").alias(
                "exp_ppm"
            ),
            F.expr(
                f"abs(CAST((CAST(n AS DECIMAL(38,0)) * {scale}) DIV _total"
                f" AS BIGINT) - element_at({exp_arr}, digit))"
            ).alias("dev_ppm"),
        )
    )


def benford_screen_sql(
    amount_col: str = "o_totalprice", scale: int = 1_000_000,
    table: str = "orders",
) -> str:
    """DuckDB mirror of :func:`benford_screen`."""
    exp_list = ", ".join(str(p) for p in BENFORD_PPM)
    return f"""
        WITH d AS (
          SELECT CAST(substr(CAST(CAST(round(
                   CAST({amount_col} AS DECIMAL(26,6)) * 100, 0)
                 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
          FROM {table}
          WHERE CAST(round(CAST({amount_col} AS DECIMAL(26,6)) * 100, 0)
                AS BIGINT) > 0
        ),
        counts AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        total AS (SELECT sum(n) AS _total FROM counts),
        expd AS (SELECT CAST(generate_subscripts(l, 1) AS INT) AS digit,
                        unnest(l) AS exp_ppm
                 FROM (SELECT [{exp_list}] AS l))
        SELECT c.digit, CAST(c.n AS BIGINT) AS n,
               CAST((CAST(c.n AS HUGEINT) * {scale}) // _total AS BIGINT)
                 AS obs_ppm,
               CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
               abs(CAST((CAST(c.n AS HUGEINT) * {scale}) // _total
                   AS BIGINT) - e.exp_ppm) AS dev_ppm
        FROM counts c CROSS JOIN total JOIN expd e USING (digit)
    """
