"""The north-star transcript pipeline: grok-parse → enrich → route → agg.

BASELINE.json's north_star describes the target workload verbatim: "a
vectorized … grok/regex parse stage extracts structured fields (tool
invocations, status tokens, latency markers) from each turn's text
bytes, a broadcast-hash-join enrich stage attaches role/tool lookup
metadata, a filter-based fan-out routes turns to per-sink … tables keyed
by tool and role, and per-sink aggregations reproduce anendektos's
summarizer semantics (distinct-count, top-K frequency, and time-bucketed
counts per conv_id/tool)". This module is that pipeline over the
north-star input shape ``(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)``.

Reference parity (semantics, not code): the grok stage realizes the
reference's tokenize-then-typed-projection (parser.d:170-206,
conn.d:73-78) at transcript grain; the reject channel mirrors its
row-drop-with-reason policy; the summaries mirror its per-sink
summarizers (conn.d:233-241, dns.d:120-128).

Engine/scale notes:
- The grok stage is pure codegen ``regexp_extract`` — stronger than the
  pandas-UDF ask: zero Python boundaries, whole-stage codegen end to
  end, and the pattern evaluates once per row via Spark's subexpression
  elimination.
- Every aggregate is one shuffle keyed by tool/status/category; the
  enrich dim (6 rows) is broadcast (plan-pinned in tests/test_plans.py).
- Ratios are fixed-point BIGINT ``(x * 10^4) DIV n`` — identical floor
  semantics in Spark and DuckDB — divided by 1e4 only at the end.
- Timestamps never cross the engine boundary: the hourly bucket works on
  ``cast(ts as long)`` epoch seconds vs the mirror's ``ts_epoch``.

Like functions/convops.py, the input relation is synthesized
deterministically (``synth_transcript`` / ``synth_transcript_sql``) so
every stage gets a full DuckDB value-hash oracle at any n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .convops import BASE_EPOCH, TOOLS, TURNS_PER_CONV

# the grok pattern for a well-formed tool-invocation marker
GROK = r"\[call tool=([a-z0-9]+) status=(OK|ERR|TIMEOUT) latency_ms=(\d+)\]"
# sub-pattern for markers that lost the latency field (reject diagnosis)
GROK_NO_LAT = r"\[call tool=([a-z0-9]+) status=(OK|ERR|TIMEOUT)\]"

# tool → (category, cost_weight) lookup the enrich stage broadcasts;
# deliberately tiny (the reference's per-parser metadata analog).
TOOL_DIM = (
    ("conn", "net", 3),
    ("dns", "net", 1),
    ("ssl", "net", 2),
    ("http", "app", 4),
    ("files", "app", 5),
    ("x509", "crypto", 6),
)


def synth_transcript(
    spark: SparkSession, n: int = 20_000, partitions: int | None = None
) -> DataFrame:
    """Deterministic transcript relation whose assistant turns embed the
    structured invocation marker inside ``text`` — the payload the grok
    stage exists to parse. Same conversation/role/tool/ts scheme as
    convops.synth_conv; per assistant turn ``m = i % 19`` selects:

    - m == 7  → marker missing its latency field   (reject: missing_latency)
    - m == 11 → garbled marker ``[call tool]``      (reject: malformed_marker)
    - m == 13 → no marker at all (call not logged)  (reject: no_marker)
    - else    → well-formed ``[call tool=… status=… latency_ms=…]``

    status cycles OK/ERR/TIMEOUT via ``(i*5 + 3) % 11`` (<8 → OK, <10 →
    ERR, else TIMEOUT); latency is ``(i*13) % 1000 + 1`` ms. Distributed
    generation from ``spark.range`` — no driver collect, no Python.
    """
    rng = spark.range(n)
    if partitions:
        rng = rng.repartition(partitions)
    i = F.col("id")
    conv = ((i - i % TURNS_PER_CONV) / TURNS_PER_CONV).cast("long")
    turn = (i % TURNS_PER_CONV).cast("int")
    is_user = turn % 2 == 0
    tool_idx = ((i * 7 + conv) % 6).cast("int")
    tool = F.element_at(F.array(*[F.lit(t) for t in TOOLS]), tool_idx + 1)
    k = (i % 6 + 3).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda j: F.concat(
            F.lit("w"),
            F.substring(
                F.md5(F.concat(i.cast("string"), F.lit(":"), j.cast("string"))), 1, 6
            ),
        ),
    )
    pre = F.array_join(words, " ")
    s = (i * 5 + 3) % 11
    status = F.when(s < 8, "OK").when(s < 10, "ERR").otherwise("TIMEOUT")
    lat = ((i * 13) % 1000 + 1).cast("int")
    m = i % 19
    marker_ok = F.concat(
        F.lit(" [call tool="), tool, F.lit(" status="), status,
        F.lit(" latency_ms="), lat.cast("string"), F.lit("]"),
    )
    marker_nolat = F.concat(
        F.lit(" [call tool="), tool, F.lit(" status="), status, F.lit("]")
    )
    assistant_text = (
        F.when(m == 7, F.concat(pre, marker_nolat))
        .when(m == 11, F.concat(pre, F.lit(" [call tool]")))
        .when(m == 13, pre)
        .otherwise(F.concat(pre, marker_ok))
    )
    epoch = F.lit(BASE_EPOCH) + conv * 3600 + turn * 30 + (i * 37) % 23
    return rng.select(
        F.concat(F.lit("conv"), conv.cast("string")).alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(is_user, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
        F.when(is_user, pre).otherwise(assistant_text).alias("text"),
        F.when(is_user, F.lit(None).cast("string")).otherwise(tool).alias("tool"),
        F.timestamp_seconds(epoch).alias("ts"),
    )


def synth_transcript_sql(n: int = 20_000) -> str:
    """DuckDB mirror of :func:`synth_transcript` (ts carried as
    ``ts_epoch`` integer seconds — timestamps never cross engines)."""
    tools = ", ".join(f"'{t}'" for t in TOOLS)
    return f"""
        WITH base AS (
          SELECT i,
                 i // {TURNS_PER_CONV} AS conv,
                 CAST(i % {TURNS_PER_CONV} AS INT) AS turn,
                 ([{tools}])[CAST((i * 7 + i // {TURNS_PER_CONV}) % 6 AS INT) + 1]
                   AS tool,
                 array_to_string(
                   list_transform(range(3 + i % 6),
                     j -> 'w' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                                            CAST(j AS VARCHAR)), 1, 6)),
                   ' ') AS pre,
                 CASE WHEN (i * 5 + 3) % 11 < 8 THEN 'OK'
                      WHEN (i * 5 + 3) % 11 < 10 THEN 'ERR'
                      ELSE 'TIMEOUT' END AS status,
                 CAST((i * 13) % 1000 + 1 AS INT) AS lat,
                 i % 19 AS m
          FROM range({n}) t(i)
        )
        SELECT 'conv' || CAST(conv AS VARCHAR) AS conv_id,
               turn AS turn_idx,
               CASE WHEN turn % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
               CASE WHEN turn % 2 = 0 THEN pre
                    WHEN m = 7 THEN pre || ' [call tool=' || tool ||
                                    ' status=' || status || ']'
                    WHEN m = 11 THEN pre || ' [call tool]'
                    WHEN m = 13 THEN pre
                    ELSE pre || ' [call tool=' || tool || ' status=' || status ||
                         ' latency_ms=' || CAST(lat AS VARCHAR) || ']'
               END AS text,
               CASE WHEN turn % 2 = 0 THEN NULL ELSE tool END AS tool,
               {BASE_EPOCH} + conv * 3600 + turn * 30 + (i * 37) % 23 AS ts_epoch
        FROM base
    """


# --------------------------------------------------------------------------
# parse (grok) stage
# --------------------------------------------------------------------------

def parse_turns(df: DataFrame) -> DataFrame:
    """Grok stage: extract (tool_called, status, latency_ms) from each
    assistant turn's text; turns that fail the full pattern are dropped
    here (they surface in :func:`reject_turns` with a reason — the
    reference's row-drop error channel, conn.d:73-78).

    Pure narrow map: role filter + codegen regexp, no shuffle, no
    Python. ``epoch`` is carried as integer seconds for the downstream
    time buckets."""
    return (
        df.filter(F.col("role") == "assistant")
        .select(
            "conv_id",
            "turn_idx",
            F.regexp_extract("text", GROK, 1).alias("tool_called"),
            F.regexp_extract("text", GROK, 2).alias("status"),
            F.regexp_extract("text", GROK, 3).alias("_lat"),
            F.col("ts").cast("long").alias("epoch"),
        )
        .filter(F.col("tool_called") != "")
        .withColumn("latency_ms", F.col("_lat").cast("int"))
        .drop("_lat")
    )


def reject_turns(df: DataFrame) -> DataFrame:
    """Assistant turns the grok stage drops, with a first-failing-field
    reason (no_marker / missing_latency / malformed_marker) — mirrors
    the Zeek engine's reject channel semantics at transcript grain."""
    failed = df.filter(
        (F.col("role") == "assistant")
        & (F.regexp_extract("text", GROK, 1) == "")
    )
    reason = (
        F.when(~F.col("text").contains("[call "), "no_marker")
        .when(F.regexp_extract("text", GROK_NO_LAT, 1) != "", "missing_latency")
        .otherwise("malformed_marker")
    )
    return failed.select("conv_id", "turn_idx", reason.alias("reason"))


# --------------------------------------------------------------------------
# route / enrich / aggregate stages
# --------------------------------------------------------------------------

def route_counts(parsed: DataFrame) -> DataFrame:
    """Fan-out accounting: rows routed to each (tool, status) sink.
    One map-side-combined shuffle on the sink key."""
    return (
        parsed.groupBy(F.col("tool_called").alias("tool"), "status")
        .agg(F.count("*").alias("n_rows"))
    )


def tool_dim(spark: SparkSession) -> DataFrame:
    """The 6-row tool metadata dimension the enrich stage broadcasts."""
    return spark.createDataFrame(
        list(TOOL_DIM), schema="tool string, category string, cost_weight int"
    )


def tool_dim_sql() -> str:
    vals = ", ".join(f"('{t}', '{c}', {w})" for t, c, w in TOOL_DIM)
    return f"(VALUES {vals}) d(tool, category, cost_weight)"


def enrich_agg(parsed: DataFrame, dim: DataFrame) -> DataFrame:
    """Broadcast-hash-join enrich (tool → category/cost_weight), then a
    per-category rollup: calls, exact-distinct conversations, and an
    exact BIGINT cost-weighted latency total. The dim side is
    ``F.broadcast``-pinned so the big side never shuffles for the join;
    the only exchange is the final category aggregate."""
    return (
        parsed.join(F.broadcast(dim), parsed.tool_called == dim.tool, "inner")
        .groupBy("category")
        .agg(
            F.count("*").alias("n_calls"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.sum(
                F.col("latency_ms").cast("long") * F.col("cost_weight").cast("long")
            ).alias("weighted_latency_ms"),
        )
    )


def err_rate_col() -> F.Column:
    """Fixed-point error rate over (n_err, n_calls) — shared by the batch
    summarizer and the streaming fold so the two are bit-identical."""
    return (F.expr("(n_err * 10000) DIV n_calls")).cast("long") / F.lit(10000.0)


def tool_summary(parsed: DataFrame) -> DataFrame:
    """Per-sink summarizer (conn.d:233-241 analog per tool): call count,
    exact-distinct conversations, error count + fixed-point error rate,
    and exact latency total/max. One shuffle on tool."""
    n_err = F.sum(F.when(F.col("status") != "OK", 1).otherwise(0))
    return (
        parsed.groupBy(F.col("tool_called").alias("tool"))
        .agg(
            F.count("*").alias("n_calls"),
            F.countDistinct("conv_id").alias("n_convs"),
            n_err.alias("n_err"),
            F.sum(F.col("latency_ms").cast("long")).alias("latency_total_ms"),
            F.max("latency_ms").alias("latency_max_ms"),
        )
        .withColumn("err_rate", err_rate_col())
    )


def hourly_counts(parsed: DataFrame) -> DataFrame:
    """Time-bucketed counts per tool (the north_star's third summarizer
    semantic). Buckets are integer ``epoch DIV 3600`` — immune to
    session-timezone skew across engines."""
    return (
        parsed.groupBy(
            F.col("tool_called").alias("tool"),
            F.expr("epoch DIV 3600").cast("long").alias("bucket_hour"),
        )
        .agg(F.count("*").alias("n_rows"))
    )


def topk_tools(parsed: DataFrame, k: int = 3) -> DataFrame:
    """Top-K tools by invocation frequency with a deterministic (n desc,
    tool asc) tiebreak — the reference's top-K summarizer semantic.
    Aggregate first (6 groups), rank the tiny aggregate."""
    from pyspark.sql import Window

    counts = parsed.groupBy(F.col("tool_called").alias("tool")).agg(
        F.count("*").alias("n_calls")
    )
    w = Window.orderBy(F.col("n_calls").desc(), F.col("tool"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------------------------------------
# DuckDB oracle mirrors (each takes the synth relation SQL)
# --------------------------------------------------------------------------

def _parsed_cte(rel: str) -> str:
    return f"""
        WITH t AS ({rel}),
        p AS (
          SELECT conv_id, turn_idx,
                 regexp_extract(text, '{GROK}', 1) AS tool_called,
                 regexp_extract(text, '{GROK}', 2) AS status,
                 regexp_extract(text, '{GROK}', 3) AS _lat,
                 ts_epoch AS epoch
          FROM t WHERE role = 'assistant'
        ),
        parsed AS (
          SELECT conv_id, turn_idx, tool_called, status, epoch,
                 CAST(_lat AS INT) AS latency_ms
          FROM p WHERE tool_called <> ''
        )
    """


def parse_turns_sql(rel: str) -> str:
    return (
        _parsed_cte(rel)
        + "SELECT conv_id, turn_idx, tool_called, status, epoch, latency_ms FROM parsed"
    )


def reject_turns_sql(rel: str) -> str:
    return f"""
        WITH t AS ({rel})
        SELECT conv_id, turn_idx,
               CASE WHEN NOT contains(text, '[call ') THEN 'no_marker'
                    WHEN regexp_extract(text, '{GROK_NO_LAT}', 1) <> ''
                      THEN 'missing_latency'
                    ELSE 'malformed_marker' END AS reason
        FROM t
        WHERE role = 'assistant' AND regexp_extract(text, '{GROK}', 1) = ''
    """


def route_counts_sql(rel: str) -> str:
    return (
        _parsed_cte(rel)
        + """
        SELECT tool_called AS tool, status, count(*) AS n_rows
        FROM parsed GROUP BY tool_called, status
        """
    )


def enrich_agg_sql(rel: str) -> str:
    return (
        _parsed_cte(rel)
        + f"""
        SELECT d.category,
               count(*) AS n_calls,
               count(DISTINCT parsed.conv_id) AS n_convs,
               CAST(sum(CAST(parsed.latency_ms AS BIGINT) * d.cost_weight)
                    AS BIGINT) AS weighted_latency_ms
        FROM parsed JOIN {tool_dim_sql()} ON parsed.tool_called = d.tool
        GROUP BY d.category
        """
    )


def tool_summary_sql(rel: str) -> str:
    return (
        _parsed_cte(rel)
        + """
        , g AS (
          SELECT tool_called AS tool,
                 count(*) AS n_calls,
                 count(DISTINCT conv_id) AS n_convs,
                 CAST(sum(CASE WHEN status <> 'OK' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_err,
                 CAST(sum(CAST(latency_ms AS BIGINT)) AS BIGINT)
                   AS latency_total_ms,
                 max(latency_ms) AS latency_max_ms
          FROM parsed GROUP BY tool_called
        )
        SELECT *, (n_err * 10000) // n_calls / 10000.0 AS err_rate FROM g
        """
    )


def hourly_counts_sql(rel: str) -> str:
    return (
        _parsed_cte(rel)
        + """
        SELECT tool_called AS tool, epoch // 3600 AS bucket_hour,
               count(*) AS n_rows
        FROM parsed GROUP BY tool_called, epoch // 3600
        """
    )


def topk_tools_sql(rel: str, k: int = 3) -> str:
    return (
        _parsed_cte(rel)
        + f"""
        , g AS (
          SELECT tool_called AS tool, count(*) AS n_calls
          FROM parsed GROUP BY tool_called
        ),
        r AS (
          SELECT tool, n_calls,
                 CAST(row_number() OVER (ORDER BY n_calls DESC, tool)
                      AS INT) AS rank
          FROM g
        )
        SELECT * FROM r WHERE rank <= {k}
        """
    )
