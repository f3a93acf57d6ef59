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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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


# --------------------------------------------------------------------------
# round-3 additions: agent-behavior analytics over the parsed call stream
# --------------------------------------------------------------------------

def retry_loops(parsed: DataFrame, min_run: int = 2) -> DataFrame:
    """Stuck-agent detection: maximal runs of >= ``min_run`` CONSECUTIVE
    parsed calls (per conversation, in turn order) to the SAME tool where
    every call failed (status != OK) — the transcript-grain analog of the
    reference's repeated-connection-attempt summaries (conn.d:233-241's
    per-key counting, applied to failure bursts).

    Gaps-and-islands in two window passes: ``seq`` numbers ALL parsed
    calls per conversation (so an intervening OK call — absent from the
    failing subset — breaks an island), then ``seq - row_number() OVER
    (conv, tool)`` on the failing subset keys each maximal same-tool run.
    Both windows and the final aggregate hash on conv_id (+tool): no
    driver state, no Python, skew bounded by max calls per conversation.
    """
    from pyspark.sql import Window

    seq_w = Window.partitionBy("conv_id").orderBy("turn_idx")
    fail_w = Window.partitionBy("conv_id", "tool_called").orderBy("turn_idx")
    return (
        parsed.withColumn("seq", F.row_number().over(seq_w))
        .filter(F.col("status") != "OK")
        .withColumn("island", F.col("seq") - F.row_number().over(fail_w))
        .groupBy(
            "conv_id", F.col("tool_called").alias("tool"), F.col("island")
        )
        .agg(
            F.count("*").alias("run_len"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .filter(F.col("run_len") >= min_run)
        .drop("island")
    )


def retry_loops_sql(rel: str, min_run: int = 2) -> str:
    return (
        _parsed_cte(rel)
        + f"""
        , seqd AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS seq
          FROM parsed
        ),
        fails AS (
          SELECT conv_id, tool_called, turn_idx,
                 seq - row_number() OVER (PARTITION BY conv_id, tool_called
                                          ORDER BY turn_idx) AS island
          FROM seqd WHERE status <> 'OK'
        )
        SELECT conv_id, tool_called AS tool,
               count(*) AS run_len,
               min(turn_idx) AS first_turn, max(turn_idx) AS last_turn
        FROM fails GROUP BY conv_id, tool_called, island
        HAVING count(*) >= {min_run}
        """
    )


# nearest-rank percentiles computed exactly (no interpolation, no floats)
PCTL_PS = (50, 90, 99)


def latency_percentiles(parsed: DataFrame, ps: tuple = PCTL_PS) -> DataFrame:
    """Exact per-tool latency percentiles by the nearest-rank definition
    (value at rank ``ceil(p*n/100)`` of the sorted latencies) — integer
    end to end, so Spark and the oracle agree bit-for-bit, unlike
    interpolating quantile functions whose float blends differ per
    engine.

    Scale shape: ONE hash exchange on tool for both windows (count +
    row_number share the partitioning), then a narrow posexplode of the
    |ps|-element literal array and a codegen filter — never a per-group
    collect. Ties inside a tool are broken (latency, conv_id, turn_idx)
    so rank k is a deterministic row at any parallelism.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("tool_called")
    ow = w.orderBy("latency_ms", "conv_id", "turn_idx")
    ranked = (
        parsed.withColumn("n", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(ow))
    )
    p = F.explode(F.array(*[F.lit(int(x)) for x in ps])).alias("p")
    return (
        ranked.select("tool_called", "latency_ms", "n", "rn", p)
        .filter(F.col("rn") == F.expr("(n * p + 99) DIV 100"))
        .select(
            F.col("tool_called").alias("tool"),
            "p",
            F.col("latency_ms").alias("latency_p_ms"),
        )
    )


def latency_percentiles_sql(rel: str, ps: tuple = PCTL_PS) -> str:
    plist = ", ".join(str(int(x)) for x in ps)
    return (
        _parsed_cte(rel)
        + f"""
        , ranked AS (
          SELECT tool_called, latency_ms,
                 count(*) OVER (PARTITION BY tool_called) AS n,
                 row_number() OVER (PARTITION BY tool_called
                                    ORDER BY latency_ms, conv_id, turn_idx)
                   AS rn
          FROM parsed
        )
        SELECT tool_called AS tool, CAST(p AS INT) AS p,
               latency_ms AS latency_p_ms
        FROM ranked, unnest([{plist}]) u(p)
        WHERE rn = (n * p + 99) // 100
        """
    )


def conv_outcomes(parsed: DataFrame) -> DataFrame:
    """Per-conversation outcome attribution: total parsed calls, failures,
    the FINAL call's status (max_by over the unique turn_idx), and a
    failed flag when the conversation's last tool call did not succeed.
    One map-side-combined shuffle on conv_id."""
    return parsed.groupBy("conv_id").agg(
        F.count("*").alias("n_calls"),
        F.sum(F.when(F.col("status") != "OK", 1).otherwise(0)).alias("n_err"),
        F.expr("max_by(status, turn_idx)").alias("last_status"),
        (F.expr("max_by(status, turn_idx)") != "OK").alias("failed"),
    )


def conv_outcomes_sql(rel: str) -> str:
    return (
        _parsed_cte(rel)
        + """
        SELECT conv_id, count(*) AS n_calls,
               CAST(sum(CASE WHEN status <> 'OK' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_err,
               max_by(status, turn_idx) AS last_status,
               max_by(status, turn_idx) <> 'OK' AS failed
        FROM parsed GROUP BY conv_id
        """
    )


def tool_cooccurrence(parsed: DataFrame) -> DataFrame:
    """Market-basket over conversations: for every unordered tool pair,
    how many conversations invoked both. The distinct (conv, tool)
    relation is built once and self-joined on conv_id with a strict
    ordering predicate — Catalyst reuses the single exchange for both
    sides (same pattern as dedup's LSH self-join), and the pair aggregate
    is bounded by 6C2 = 15 groups regardless of input size."""
    ct = parsed.select("conv_id", F.col("tool_called").alias("tool")).distinct()
    a, b = ct.alias("a"), ct.alias("b")
    return (
        a.join(
            b,
            (F.col("a.conv_id") == F.col("b.conv_id"))
            & (F.col("a.tool") < F.col("b.tool")),
        )
        .groupBy(
            F.col("a.tool").alias("tool_a"), F.col("b.tool").alias("tool_b")
        )
        .agg(F.count("*").alias("n_convs"))
    )


def tool_cooccurrence_sql(rel: str) -> str:
    return (
        _parsed_cte(rel)
        + """
        , ct AS (SELECT DISTINCT conv_id, tool_called AS tool FROM parsed)
        SELECT a.tool AS tool_a, b.tool AS tool_b, count(*) AS n_convs
        FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
        GROUP BY a.tool, b.tool
        """
    )


# template canonicalization: content words (the synth corpus's
# w<md5-hex6> tokens) collapse to W, digit runs to '#'
_TMPL_WORD = "w[0-9a-f]{6}"
_TMPL_NUM = "[0-9]+"


def turn_templates(df: DataFrame, min_convs: int = 3) -> DataFrame:
    """Boilerplate-template mining over RAW turn text (both roles):
    canonicalize each turn (content words → W, digit runs → #), then
    count turns and exact-distinct conversations per template, keeping
    templates seen in >= ``min_convs`` conversations. Unlike
    convops.boilerplate_turns (exact-text grain) this clusters turns
    that differ only in parameters — the "same prompt, different IDs"
    pattern a curation pipeline strips. Narrow codegen regexp map + one
    shuffle on the template string."""
    tmpl = F.regexp_replace(
        F.regexp_replace("text", _TMPL_WORD, "W"), _TMPL_NUM, "#"
    )
    return (
        df.select(tmpl.alias("template"), "conv_id")
        .groupBy("template")
        .agg(
            F.count("*").alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .filter(F.col("n_convs") >= min_convs)
    )


def turn_templates_sql(rel: str, min_convs: int = 3) -> str:
    return f"""
        WITH t AS ({rel})
        SELECT regexp_replace(regexp_replace(text, '{_TMPL_WORD}', 'W', 'g'),
                              '{_TMPL_NUM}', '#', 'g') AS template,
               count(*) AS n_turns, count(DISTINCT conv_id) AS n_convs
        FROM t
        GROUP BY 1 HAVING count(DISTINCT conv_id) >= {min_convs}
    """


def category_retry_loops(
    parsed: DataFrame, dim: DataFrame, min_run: int = 2
) -> DataFrame:
    """:func:`retry_loops` at tool-CATEGORY grain: broadcast-enrich the
    parsed stream with the tool dimension first, then find maximal runs
    of consecutive failing calls within the same category. Composes the
    north_star's enrich stage with the islands pass — on this corpus's
    rotating tool schedule, same-TOOL retries never occur back-to-back
    but same-category ones do, so this grain is the one that yields
    non-trivial runs (tool grain is pytest-covered on a handcrafted
    stream). Plan: broadcast join (no big-side shuffle) + the two
    conv-keyed windows of retry_loops."""
    enriched = parsed.join(
        F.broadcast(dim), parsed.tool_called == dim.tool, "inner"
    ).select(
        "conv_id",
        "turn_idx",
        F.col("category").alias("tool_called"),
        "status",
    )
    return retry_loops(enriched, min_run).withColumnRenamed("tool", "category")


def category_retry_loops_sql(rel: str, min_run: int = 2) -> str:
    return (
        _parsed_cte(rel)
        + f"""
        , enr AS (
          SELECT parsed.conv_id, parsed.turn_idx, d.category, parsed.status
          FROM parsed JOIN {tool_dim_sql()} ON parsed.tool_called = d.tool
        ),
        seqd AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS seq
          FROM enr
        ),
        fails AS (
          SELECT conv_id, category, turn_idx,
                 seq - row_number() OVER (PARTITION BY conv_id, category
                                          ORDER BY turn_idx) AS island
          FROM seqd WHERE status <> 'OK'
        )
        SELECT conv_id, category,
               count(*) AS run_len,
               min(turn_idx) AS first_turn, max(turn_idx) AS last_turn
        FROM fails GROUP BY conv_id, category, island
        HAVING count(*) >= {min_run}
        """
    )


def spike_latency(parsed: DataFrame, every: int = 97, mult: int = 40) -> DataFrame:
    """Deterministic heavy-tail injection for exercising robust screens
    (the synthetic analog of a stuck tool call, in the synth_conv_dup
    fixture tradition): every parsed turn whose epoch ≡ 0 (mod
    ``every``) has its latency multiplied by ``mult``."""
    return parsed.withColumn(
        "latency_ms",
        F.when(F.col("epoch") % every == 0, F.col("latency_ms") * mult)
        .otherwise(F.col("latency_ms"))
        .cast("int"),
    )


def latency_mad_outliers(parsed: DataFrame, k: int = 3) -> DataFrame:
    """Robust per-tool latency anomalies: turns whose latency deviates
    from their tool's median by more than ``k`` MADs (median absolute
    deviation) — the tail-latency sweep a mean/stddev screen gets wrong
    under the heavy-tailed latencies agent tool calls actually have
    (one stuck call drags a mean, never a median).

    Median and MAD use the same nearest-rank definition as
    :func:`latency_percentiles` (value at rank ``(n+1) DIV 2``), so the
    whole operator is integer end-to-end and any engine agrees
    bit-for-bit; the outlier test is ``|x − med| > k · mad`` on exact
    ints. Ties at either rank are broken (value, conv_id, turn_idx).

    Output (tool, conv_id, turn_idx, latency_ms, med_ms, mad_ms),
    deviation-desc information carried by the values themselves.

    Scale shape: ONE hash exchange on tool_called serves every pass —
    both rank windows and both unbounded-frame median extractions are
    partitioned by the same key, so Catalyst plans a single Exchange
    with in-partition re-sorts (latency order, then deviation order);
    the outlier filter is a narrow codegen map. No joins, no driver
    collect, no floats."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy("tool_called")
    lat_o = w.orderBy("latency_ms", "conv_id", "turn_idx")
    n = F.count("*").over(w)
    rn1 = F.row_number().over(lat_o)
    med_rank = F.expr("(n + 1) DIV 2")
    step1 = parsed.select(
        "tool_called", "conv_id", "turn_idx", "latency_ms",
        n.alias("n"), rn1.alias("rn1"),
    )
    med = F.max(F.when(F.col("rn1") == med_rank, F.col("latency_ms"))).over(w)
    step2 = step1.withColumn("med_ms", med).withColumn(
        "dev", F.abs(F.col("latency_ms") - F.col("med_ms"))
    )
    dev_o = w.orderBy("dev", "conv_id", "turn_idx")
    step3 = step2.withColumn("rn2", F.row_number().over(dev_o))
    mad = F.max(F.when(F.col("rn2") == med_rank, F.col("dev"))).over(w)
    return (
        step3.withColumn("mad_ms", mad)
        .filter(F.col("dev") > k * F.col("mad_ms"))
        .select(
            F.col("tool_called").alias("tool"),
            "conv_id", "turn_idx", "latency_ms", "med_ms", "mad_ms",
        )
    )


def latency_mad_outliers_sql(
    rel: str, k: int = 3, spike: tuple[int, int] | None = None
) -> str:
    src = "parsed"
    spike_cte = ""
    if spike is not None:
        every, mult = spike
        src = "sp"
        spike_cte = f"""
        , sp AS (
          SELECT conv_id, turn_idx, tool_called, status, epoch,
                 CAST(CASE WHEN epoch % {every} = 0 THEN latency_ms * {mult}
                      ELSE latency_ms END AS INT) AS latency_ms
          FROM parsed
        )"""
    return (
        _parsed_cte(rel)
        + spike_cte
        + f"""
        , s1 AS (
          SELECT tool_called, conv_id, turn_idx, latency_ms,
                 count(*) OVER (PARTITION BY tool_called) AS n,
                 row_number() OVER (PARTITION BY tool_called
                                    ORDER BY latency_ms, conv_id, turn_idx)
                   AS rn1
          FROM {src}
        ),
        s2 AS (
          SELECT *, max(CASE WHEN rn1 = (n + 1) // 2 THEN latency_ms END)
                      OVER (PARTITION BY tool_called) AS med_ms
          FROM s1
        ),
        s3 AS (
          SELECT *, abs(latency_ms - med_ms) AS dev FROM s2
        ),
        s4 AS (
          SELECT *, row_number() OVER (PARTITION BY tool_called
                                       ORDER BY dev, conv_id, turn_idx) AS rn2
          FROM s3
        ),
        s5 AS (
          SELECT *, max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
                      OVER (PARTITION BY tool_called) AS mad_ms
          FROM s4
        )
        SELECT tool_called AS tool, conv_id, turn_idx, latency_ms,
               med_ms, mad_ms
        FROM s5 WHERE dev > {k} * mad_ms
        """
    )


def tool_paths(parsed: DataFrame, k: int = 3, top_n: int = 20) -> DataFrame:
    """Frequent tool-call chains: the top ``top_n`` length-``k``
    sequences of CONSECUTIVE tool invocations across conversations —
    where tool_cooccur answers "which tools appear together" and the
    Markov transitions answer "what follows what", this answers "what
    multi-step procedures do agents actually run" (the k-gram mining of
    the call stream). Ties rank deterministically by path string.

    Shape: one (conv_id, turn_idx) sort window produces the k−1
    lookahead columns (all k legs share the ONE conv_id exchange), a
    codegen filter drops window-crossing tails, and the path count is a
    map-side-combined aggregate at path grain; top-n compiles to
    TakeOrderedAndProject. Linear in calls, no joins, no explode."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cols = [F.col("tool_called").alias("_t0")] + [
        F.lead("tool_called", i).over(w).alias(f"_t{i}") for i in range(1, k)
    ]
    seq = parsed.select("conv_id", "turn_idx", *cols).filter(
        F.col(f"_t{k - 1}").isNotNull()
    )
    path = F.concat_ws(">", *[f"_t{i}" for i in range(k)])
    return (
        seq.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(top_n)
    )


def tool_paths_sql(rel: str, k: int = 3, top_n: int = 20) -> str:
    """DuckDB mirror of :func:`tool_paths`."""
    leads = ", ".join(
        f"lead(tool_called, {i}) OVER w AS t{i}" for i in range(1, k)
    )
    concat = " || '>' || ".join(f"t{i}" for i in range(k))
    return (
        _parsed_cte(rel)
        + f"""
        , seqs AS (SELECT tool_called AS t0, {leads}
                FROM parsed WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
        paths AS (SELECT {concat} AS path FROM seqs WHERE t{k - 1} IS NOT NULL)
        SELECT path, CAST(count(*) AS BIGINT) AS n
        FROM paths GROUP BY 1 ORDER BY n DESC, path LIMIT {top_n}
    """
    )


def wasted_latency(parsed: DataFrame) -> DataFrame:
    """Per-tool compute-waste attribution: total latency spent in calls,
    the share burned by non-OK calls (the retry/timeout overhead
    retry-loop detection localizes, totalled here), and the failing-call
    count — the one-line answer to "which tool wastes the fleet's time".
    waste_ppm = wasted_ms·10⁶ div total_ms, integer end to end.

    One map-side-combined aggregate over the parsed stream; nothing else
    shuffles."""
    bad = F.col("status") != "OK"
    return (
        parsed.groupBy("tool_called")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_calls"),
            F.sum("latency_ms").cast("long").alias("total_ms"),
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_failed"),
            F.sum(F.when(bad, F.col("latency_ms")).otherwise(0))
            .cast("long")
            .alias("wasted_ms"),
        )
        .select(
            "tool_called",
            "n_calls",
            "total_ms",
            "n_failed",
            "wasted_ms",
            F.expr("(wasted_ms * 1000000L) div total_ms").alias("waste_ppm"),
        )
    )


def wasted_latency_sql(rel: str) -> str:
    """DuckDB mirror of :func:`wasted_latency`."""
    return (
        _parsed_cte(rel)
        + """
        SELECT tool_called,
               CAST(count(*) AS BIGINT) AS n_calls,
               CAST(sum(latency_ms) AS BIGINT) AS total_ms,
               CAST(sum(CASE WHEN status <> 'OK' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_failed,
               CAST(sum(CASE WHEN status <> 'OK' THEN latency_ms ELSE 0 END)
                    AS BIGINT) AS wasted_ms,
               (CAST(sum(CASE WHEN status <> 'OK' THEN latency_ms ELSE 0 END)
                     AS BIGINT) * 1000000)
                 // CAST(sum(latency_ms) AS BIGINT) AS waste_ppm
        FROM parsed GROUP BY 1
    """
    )


def latency_drift(parsed: DataFrame, ps: tuple = PCTL_PS) -> DataFrame:
    """Per-tool latency drift: exact nearest-rank percentiles computed
    separately over the EARLY and LATE half of the observed time range
    (split at the integer midpoint of [min_epoch, max_epoch]) and laid
    side by side per (tool, p) with the integer delta — the
    tool-regression report an agent-platform operator reads after a
    deploy. Pure integer end to end (epoch midpoint test is
    ``epoch*2 < min+max``; percentiles are the same nearest-rank
    definition as :func:`latency_percentiles`), so the DuckDB mirror
    matches bit-for-bit.

    Scale shape: the global [min, max] epoch is ONE 1-row aggregate
    broadcast back onto the stream (no driver hop); then one hash
    exchange on (tool, period) shared by the count + row_number windows;
    the early/late pivot is a conditional aggregate on the tiny
    (tool × period × |ps|) percentile relation. Tools seen in only one
    half are dropped (no basis for a delta)."""
    from pyspark.sql import Window

    bounds = parsed.agg(F.min("epoch").alias("_mn"), F.max("epoch").alias("_mx"))
    lab = parsed.join(F.broadcast(bounds)).withColumn(
        "period",
        F.when(F.col("epoch") * 2 < F.col("_mn") + F.col("_mx"), "early").otherwise(
            "late"
        ),
    )
    w = Window.partitionBy("tool_called", "period")
    ow = w.orderBy("latency_ms", "conv_id", "turn_idx")
    ranked = lab.withColumn("n", F.count("*").over(w)).withColumn(
        "rn", F.row_number().over(ow)
    )
    p = F.explode(F.array(*[F.lit(int(x)) for x in ps])).alias("p")
    pct = ranked.select("tool_called", "period", "latency_ms", "n", "rn", p).filter(
        F.col("rn") == F.expr("(n * p + 99) DIV 100")
    )
    return (
        pct.groupBy(F.col("tool_called").alias("tool"), "p")
        .agg(
            F.max(F.when(F.col("period") == "early", F.col("latency_ms"))).alias(
                "early_ms"
            ),
            F.max(F.when(F.col("period") == "late", F.col("latency_ms"))).alias(
                "late_ms"
            ),
        )
        .filter(F.col("early_ms").isNotNull() & F.col("late_ms").isNotNull())
        .select(
            "tool",
            "p",
            "early_ms",
            "late_ms",
            (F.col("late_ms") - F.col("early_ms")).alias("delta_ms"),
        )
    )


def latency_drift_sql(rel: str, ps: tuple = PCTL_PS) -> str:
    """DuckDB mirror of :func:`latency_drift`."""
    plist = ", ".join(str(int(x)) for x in ps)
    return (
        _parsed_cte(rel)
        + f"""
        , b AS (SELECT min(epoch) AS mn, max(epoch) AS mx FROM parsed),
        lab AS (
          SELECT parsed.*, CASE WHEN epoch * 2 < b.mn + b.mx
                                THEN 'early' ELSE 'late' END AS period
          FROM parsed, b
        ),
        ranked AS (
          SELECT tool_called, period, latency_ms,
                 count(*) OVER (PARTITION BY tool_called, period) AS n,
                 row_number() OVER (PARTITION BY tool_called, period
                                    ORDER BY latency_ms, conv_id, turn_idx)
                   AS rn
          FROM lab
        ),
        pct AS (
          SELECT tool_called, period, CAST(p AS INT) AS p, latency_ms
          FROM ranked, unnest([{plist}]) u(p)
          WHERE rn = (n * p + 99) // 100
        ),
        piv AS (
          SELECT tool_called AS tool, p,
                 max(CASE WHEN period = 'early' THEN latency_ms END)
                   AS early_ms,
                 max(CASE WHEN period = 'late' THEN latency_ms END) AS late_ms
          FROM pct GROUP BY 1, 2
        )
        SELECT tool, p, early_ms, late_ms, late_ms - early_ms AS delta_ms
        FROM piv WHERE early_ms IS NOT NULL AND late_ms IS NOT NULL
        """
    )


# --------------------------------------------------------------------------
# discounted trajectory returns (fixed-point, γ = 1/2)
# --------------------------------------------------------------------------

def trajectory_returns(parsed: DataFrame, horizon: int = 8) -> DataFrame:
    """Per-call discounted return over each conversation's parsed
    tool-call sequence — the credit-assignment primitive an RL-over-
    agent-transcripts pipeline computes before advantage estimation.
    Reward is +1 for an OK call, −1 for ERR/TIMEOUT; the return at call
    t is G_t = Σ_{o=0..horizon} γ^o · r_{t+o} with γ = 1/2, truncated at
    the horizon and at conversation end.

    Exactness: γ = 1/2 with a finite horizon makes every return a dyadic
    rational, so G is computed fixed-point — ``return_fp`` = G · 2^H as
    an exact BIGINT (each lead term weighted 2^(H−o)), and ``return_g``
    = return_fp / 2^H, a division by a power of two that is exact in
    IEEE doubles — bit-identical across engines.

    100 TB shape: ONE shuffle — the horizon+1 lead() terms all share a
    single (conv_id, turn_idx) window partitioning, so Spark plans one
    exchange + one sort regardless of the horizon; no self-join, no
    per-conversation array materialization."""
    from pyspark.sql import Window

    if not 0 <= horizon <= 32:
        raise ValueError("horizon must be in [0, 32]")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    d = parsed.select(
        "conv_id",
        "turn_idx",
        "tool_called",
        "status",
        F.when(F.col("status") == "OK", 1).otherwise(-1).alias("reward"),
    )
    g = None
    for o in range(horizon + 1):
        term = F.coalesce(F.lead("reward", o).over(w), F.lit(0)).cast(
            "long"
        ) * F.lit(2 ** (horizon - o)).cast("long")
        g = term if g is None else g + term
    return d.select(
        "conv_id",
        "turn_idx",
        "tool_called",
        "status",
        "reward",
        g.alias("return_fp"),
        (g / F.lit(float(2**horizon))).alias("return_g"),
    )


def trajectory_returns_sql(rel: str, horizon: int = 8) -> str:
    """DuckDB mirror of :func:`trajectory_returns` (same lead-term sum)."""
    terms = " + ".join(
        f"coalesce(lead(reward, {o}) OVER w, 0) * {2 ** (horizon - o)}"
        for o in range(horizon + 1)
    )
    return (
        _parsed_cte(rel)
        + f""",
        r AS (SELECT conv_id, turn_idx, tool_called, status,
                     CASE WHEN status = 'OK' THEN 1 ELSE -1 END AS reward
              FROM parsed)
        SELECT conv_id, turn_idx, tool_called, status, reward,
               CAST({terms} AS BIGINT) AS return_fp,
               CAST({terms} AS BIGINT) / {float(2**horizon)} AS return_g
        FROM r WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
    """
    )


def group_advantages(parsed: DataFrame) -> DataFrame:
    """Group-relative advantage (the GRPO baseline construction):
    conversations are grouped by their FIRST tool call (the prompt-
    category proxy — trajectories answering the same kind of request),
    each conversation's return is its integer reward sum (+1 OK, −1
    ERR/TIMEOUT), and the advantage is measured against the group mean.

    Exactness: the mean is rational, so instead of dividing we scale by
    the group size — ``adv_num = conv_return · n_group − group_sum`` is
    an exact BIGINT whose sign and ordering match the float advantage
    (divide by n_group off-engine when a float is genuinely needed).

    100 TB shape: two shuffles — the conv_id aggregate (map-side
    combined; arg-min picks the first call without a sort), then one
    window exchange on the group key shared by both group statistics."""
    from pyspark.sql import Window

    r = F.when(F.col("status") == "OK", 1).otherwise(-1)
    conv = parsed.groupBy("conv_id").agg(
        F.min_by("tool_called", "turn_idx").alias("group_key"),
        F.sum(r).cast("long").alias("conv_return"),
        F.count(F.lit(1)).cast("long").alias("n_calls"),
    )
    gw = Window.partitionBy("group_key")
    return conv.select(
        "conv_id",
        "group_key",
        "conv_return",
        "n_calls",
        F.count(F.lit(1)).over(gw).cast("long").alias("n_group"),
        F.sum("conv_return").over(gw).cast("long").alias("group_sum"),
    ).withColumn(
        "adv_num",
        F.col("conv_return") * F.col("n_group") - F.col("group_sum"),
    )


def group_advantages_sql(rel: str) -> str:
    """DuckDB mirror of :func:`group_advantages`."""
    return (
        _parsed_cte(rel)
        + """,
        conv AS (SELECT conv_id,
                        arg_min(tool_called, turn_idx) AS group_key,
                        CAST(sum(CASE WHEN status = 'OK' THEN 1 ELSE -1 END)
                             AS BIGINT) AS conv_return,
                        CAST(count(*) AS BIGINT) AS n_calls
                 FROM parsed GROUP BY conv_id)
        SELECT conv_id, group_key, conv_return, n_calls,
               CAST(count(*) OVER (PARTITION BY group_key) AS BIGINT)
                 AS n_group,
               CAST(sum(conv_return) OVER (PARTITION BY group_key) AS BIGINT)
                 AS group_sum,
               conv_return * count(*) OVER (PARTITION BY group_key)
                 - sum(conv_return) OVER (PARTITION BY group_key) AS adv_num
        FROM conv
    """
    )


def tool_concentration(
    parsed: DataFrame, dim: DataFrame, scale: int = 1_000_000
) -> DataFrame:
    """Per-category tool-concentration report → (category, n_calls,
    n_tools, hhi_ppm, top_tool, top_share_ppm): the Herfindahl index
    over each category's tool-call shares — the log-free diversity
    audit (entropy needs a float log; HHI is pure count arithmetic, so
    the DuckDB mirror is bit-exact). hhi_ppm = Σ cnt_tool² · scale DIV
    n_calls² runs in DECIMAL(38,0) — safe past 10¹² calls/category.
    scale/n_tools ≤ hhi ≤ scale; a category pinned at the top means one
    tool monopolizes it (retry storms, router misconfig), the floor
    means uniform rotation.

    Shape: broadcast enrich join, ONE map-side-combined
    (category, tool) count, then the rollup + top-1 window both run on
    that tools-sized relation (≤ |dim| rows per category)."""
    ct = (
        parsed.join(F.broadcast(dim), parsed.tool_called == dim.tool, "inner")
        .groupBy("category", "tool")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("category").orderBy(
        F.col("cnt").desc(), F.col("tool").asc()
    )
    hhi = (
        f"CAST(floor((CAST(sum_sq AS DECIMAL(38,0)) * {scale})"
        f" / (CAST(n_calls AS DECIMAL(38,0)) * n_calls)) AS BIGINT)"
    )
    return (
        ct.withColumn("_rn", F.row_number().over(w))
        .groupBy("category")
        .agg(
            F.sum("cnt").cast("long").alias("n_calls"),
            F.count(F.lit(1)).cast("long").alias("n_tools"),
            F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt")).alias("sum_sq"),
            F.max(F.when(F.col("_rn") == 1, F.col("tool"))).alias("top_tool"),
            F.max(F.when(F.col("_rn") == 1, F.col("cnt")))
            .cast("long")
            .alias("top_cnt"),
        )
        .select(
            "category", "n_calls", "n_tools",
            F.expr(hhi).alias("hhi_ppm"),
            "top_tool",
            F.expr(f"(top_cnt * {scale}L) div n_calls").alias("top_share_ppm"),
        )
    )


def tool_concentration_sql(rel: str, scale: int = 1_000_000) -> str:
    """DuckDB mirror of :func:`tool_concentration`."""
    return (
        _parsed_cte(rel)
        + f"""
        , ct AS (
          SELECT d.category, d.tool, count(*) AS cnt
          FROM parsed p JOIN {tool_dim_sql()} ON p.tool_called = d.tool
          GROUP BY 1, 2
        ),
        r AS (SELECT *, row_number() OVER (PARTITION BY category
                ORDER BY cnt DESC, tool) AS rn FROM ct),
        agg AS (
          SELECT category,
                 CAST(sum(cnt) AS BIGINT) AS n_calls,
                 CAST(count(*) AS BIGINT) AS n_tools,
                 CAST(sum(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS sum_sq,
                 max(CASE WHEN rn = 1 THEN tool END) AS top_tool,
                 CAST(max(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS top_cnt
          FROM r GROUP BY 1
        )
        SELECT category, n_calls, n_tools,
               CAST((sum_sq * {scale})
                    // (CAST(n_calls AS HUGEINT) * n_calls) AS BIGINT)
                 AS hhi_ppm,
               top_tool,
               CAST((top_cnt * {scale}) // n_calls AS BIGINT)
                 AS top_share_ppm
        FROM agg
    """
    )


def tool_stationary(
    parsed: DataFrame, iters: int = 8, scale: int = 1_000_000
) -> DataFrame:
    """Stationary distribution of the tool-invocation Markov chain →
    (tool, pi_fp): where agents spend their calls asymptotically — the
    long-run complement of the per-step transition counts. Power
    iteration in integer fixed point from the uniform vector:
    π'(j) = Σ_i π(i) · p_fp(i→j) DIV scale, with
    p_fp(i→j) = cnt(i→j) · scale DIV out(i); a tool with no outgoing
    transition self-loops so mass is conserved up to DIV flooring
    (each round loses < n_states of scale — documented bias, identical
    in both engines).

    100 TB shape: the ONE corpus-sized operation is the transition
    count (a lag window + pair aggregate sharing a conv_id exchange);
    the chain itself lives on a ≤|tools|² relation, so the ``iters``
    rounds of join+agg run on dimension-sized data the optimizer
    broadcasts — the driver never sees anything data-sized."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = parsed.select(
        "conv_id", "turn_idx", F.col("tool_called").alias("tool"),
        F.lag("tool_called").over(w).alias("_prev"),
    ).filter(F.col("_prev").isNotNull())
    cnt = seq.groupBy(F.col("_prev").alias("src"), F.col("tool").alias("dst")) \
             .agg(F.count(F.lit(1)).alias("n"))
    states = (
        parsed.select(F.col("tool_called").alias("tool")).distinct()
    )
    out = cnt.groupBy("src").agg(F.sum("n").alias("out_n"))
    # dangling tools self-loop with full mass
    trans = (
        cnt.join(out, "src")
        .select("src", "dst",
                F.expr(f"(n * {scale}L) div out_n").alias("p_fp"))
        .unionByName(
            states.join(out, states.tool == out.src, "left_anti")
            .select(F.col("tool").alias("src"), F.col("tool").alias("dst"),
                    F.lit(scale).cast("long").alias("p_fp"))
        )
    )
    n_states = states.count()
    pi = states.select("tool", F.lit(scale // n_states).cast("long").alias("pi_fp"))
    for _ in range(iters):
        pi = (
            trans.join(pi, trans.src == pi.tool)
            .select(F.col("dst").alias("tool"),
                    F.expr(f"(pi_fp * p_fp) div {scale}L").alias("_m"))
            .groupBy("tool")
            .agg(F.sum("_m").cast("long").alias("pi_fp"))
        )
    return pi


def tool_stationary_sql(rel: str, iters: int = 8, scale: int = 1_000_000) -> str:
    """DuckDB mirror of :func:`tool_stationary` (unrolled rounds)."""
    rounds = []
    prev = "pi0"
    for it in range(1, iters + 1):
        rounds.append(f"""
        pi{it} AS (
          SELECT t.dst AS tool,
                 CAST(sum((p.pi_fp * t.p_fp) // {scale}) AS BIGINT) AS pi_fp
          FROM trans t JOIN {prev} p ON t.src = p.tool
          GROUP BY 1
        )""")
        prev = f"pi{it}"
    return (
        _parsed_cte(rel)
        + f"""
        , seq AS (
          SELECT lag(tool_called) OVER (PARTITION BY conv_id
                   ORDER BY turn_idx) AS src,
                 tool_called AS dst
          FROM parsed
        ),
        cnt AS (SELECT src, dst, count(*) AS n FROM seq
                WHERE src IS NOT NULL GROUP BY 1, 2),
        states AS (SELECT DISTINCT tool_called AS tool FROM parsed),
        outn AS (SELECT src, sum(n) AS out_n FROM cnt GROUP BY 1),
        trans AS (
          SELECT c.src, c.dst, CAST((c.n * {scale}) // o.out_n AS BIGINT)
                   AS p_fp
          FROM cnt c JOIN outn o ON c.src = o.src
          UNION ALL
          SELECT s.tool, s.tool, CAST({scale} AS BIGINT)
          FROM states s LEFT JOIN outn o ON s.tool = o.src
          WHERE o.src IS NULL
        ),
        nst AS (SELECT count(*) AS n FROM states),
        pi0 AS (SELECT tool, CAST({scale} // n AS BIGINT) AS pi_fp
                FROM states, nst),
        {",".join(rounds)}
        SELECT tool, pi_fp FROM {prev}
    """
    )


# --------------------------------------------------------------------------
# round-5 additions: status flaps, SLO burn, latency-by-status,
# retry recovery, user→assistant response gap, gap-based session stats
# --------------------------------------------------------------------------

def status_flaps(parsed: DataFrame) -> DataFrame:
    """Per-tool stability report: how often a tool's OUTCOME flips
    between consecutive parsed calls of that tool within a conversation
    (OK→non-OK and non-OK→OK transitions counted separately). A tool
    with a high flap rate is flaky rather than down — a different
    remediation than retry_loops' stuck-failure runs.

    Shape: one lag window over (conv_id, tool) in turn order — the same
    single conv_id-grain exchange every other transcript window op
    hashes on — then a map-side-combined per-tool aggregate. No joins,
    no Python."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id", "tool_called").orderBy("turn_idx")
    prev_ok = F.lag(F.col("status") == "OK").over(w)
    cur_ok = F.col("status") == "OK"
    return (
        parsed.withColumn("_prev_ok", prev_ok)
        .filter(F.col("_prev_ok").isNotNull())
        .groupBy(F.col("tool_called").alias("tool"))
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum((F.col("_prev_ok") & ~cur_ok).cast("long")).alias("n_degrade"),
            F.sum((~F.col("_prev_ok") & cur_ok).cast("long")).alias("n_recover"),
        )
        .select(
            "tool", "n_transitions", "n_degrade", "n_recover",
            F.expr("((n_degrade + n_recover) * 1000000) div n_transitions")
            .alias("flap_ppm"),
        )
    )


def status_flaps_sql(rel: str) -> str:
    """DuckDB mirror of :func:`status_flaps`."""
    return (
        _parsed_cte(rel)
        + """
        , lagged AS (
          SELECT tool_called, status = 'OK' AS cur_ok,
                 lag(status = 'OK') OVER (PARTITION BY conv_id, tool_called
                                          ORDER BY turn_idx) AS prev_ok
          FROM parsed
        )
        SELECT tool_called AS tool,
               count(*) AS n_transitions,
               CAST(sum(CASE WHEN prev_ok AND NOT cur_ok THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_degrade,
               CAST(sum(CASE WHEN NOT prev_ok AND cur_ok THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_recover,
               CAST(((sum(CASE WHEN prev_ok AND NOT cur_ok THEN 1 ELSE 0 END)
                      + sum(CASE WHEN NOT prev_ok AND cur_ok THEN 1 ELSE 0 END))
                     * 1000000) // count(*) AS BIGINT) AS flap_ppm
        FROM lagged WHERE prev_ok IS NOT NULL
        GROUP BY tool_called
        """
    )


def slo_burn(parsed: DataFrame, slo_ms: int = 800) -> DataFrame:
    """Per (tool, hour bucket) SLO burn: calls, breaches
    (latency_ms > slo_ms), and breach share in ppm — the error-budget
    consumption series an operator alarms on. Integer end to end.

    Shape: single map-side-combined aggregate on (tool, hour); the
    breach predicate folds into the scan (codegen conditional sum), so
    at 10¹² turns this is one exchange on a small key space."""
    if slo_ms < 1:
        raise ValueError(f"slo_ms must be >= 1, got {slo_ms}")
    hour = (F.col("epoch") - (F.col("epoch") % 3600)).alias("hour_epoch")
    return (
        parsed.groupBy(F.col("tool_called").alias("tool"), hour)
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum((F.col("latency_ms") > slo_ms).cast("long")).alias("n_breach"),
        )
        .select(
            "tool", "hour_epoch", "n_calls", "n_breach",
            F.expr("(n_breach * 1000000) div n_calls").alias("burn_ppm"),
        )
    )


def slo_burn_sql(rel: str, slo_ms: int = 800) -> str:
    """DuckDB mirror of :func:`slo_burn`."""
    return (
        _parsed_cte(rel)
        + f"""
        SELECT tool_called AS tool,
               epoch - (epoch % 3600) AS hour_epoch,
               count(*) AS n_calls,
               CAST(sum(CASE WHEN latency_ms > {slo_ms} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_breach,
               CAST((sum(CASE WHEN latency_ms > {slo_ms} THEN 1 ELSE 0 END)
                     * 1000000) // count(*) AS BIGINT) AS burn_ppm
        FROM parsed GROUP BY 1, 2
        """
    )


def latency_by_status(parsed: DataFrame, ps: tuple = PCTL_PS) -> DataFrame:
    """Exact nearest-rank latency percentiles split by OUTCOME — the
    (tool, status) refinement of :func:`latency_percentiles`: timeouts
    and errors usually have a different latency law than successes
    (timeouts pin at the deadline, fast-fail errors at the floor), and
    blending them understates both.

    Same one-exchange shape as latency_percentiles, keyed on
    (tool, status); ties broken (latency, conv_id, turn_idx) so rank k
    is deterministic at any parallelism."""
    from pyspark.sql import Window

    w = Window.partitionBy("tool_called", "status")
    ow = w.orderBy("latency_ms", "conv_id", "turn_idx")
    ranked = (
        parsed.withColumn("n", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(ow))
    )
    p = F.explode(F.array(*[F.lit(int(x)) for x in ps])).alias("p")
    return (
        ranked.select("tool_called", "status", "latency_ms", "n", "rn", p)
        .filter(F.col("rn") == F.expr("(n * p + 99) DIV 100"))
        .select(
            F.col("tool_called").alias("tool"),
            "status", "p",
            F.col("latency_ms").alias("latency_p_ms"),
        )
    )


def latency_by_status_sql(rel: str, ps: tuple = PCTL_PS) -> str:
    """DuckDB mirror of :func:`latency_by_status`."""
    plist = ", ".join(str(int(x)) for x in ps)
    return (
        _parsed_cte(rel)
        + f"""
        , ranked AS (
          SELECT tool_called, status, latency_ms,
                 count(*) OVER (PARTITION BY tool_called, status) AS n,
                 row_number() OVER (PARTITION BY tool_called, status
                                    ORDER BY latency_ms, conv_id, turn_idx)
                   AS rn
          FROM parsed
        )
        SELECT tool_called AS tool, status, CAST(p AS INT) AS p,
               latency_ms AS latency_p_ms
        FROM ranked, unnest([{plist}]) u(p)
        WHERE rn = (n * p + 99) // 100
        """
    )


def retry_recovery(parsed: DataFrame) -> DataFrame:
    """Did retrying help? For every FAILED parsed call (status != OK),
    look at the NEXT call to the same tool in the same conversation:
    per tool — failures, failures that were retried at all, retries
    whose next attempt succeeded, and recovery rate over retried
    failures in ppm. Complements retry_loops (how long agents stay
    stuck) with whether the retry was worth it.

    Shape: one lead window over (conv_id, tool) in turn order — same
    exchange family as the other transcript windows — then a per-tool
    map-side-combined aggregate."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id", "tool_called").orderBy("turn_idx")
    nxt = F.lead("status").over(w)
    return (
        parsed.withColumn("_next", nxt)
        .filter(F.col("status") != "OK")
        .groupBy(F.col("tool_called").alias("tool"))
        .agg(
            F.count(F.lit(1)).alias("n_failures"),
            F.sum(F.col("_next").isNotNull().cast("long")).alias("n_retried"),
            # eqNullSafe: a tool whose failures were never retried has all
            # NULL _next — the sum must be 0 (as in the mirror's CASE), not NULL
            F.sum(F.col("_next").eqNullSafe("OK").cast("long")).alias("n_recovered"),
        )
        .select(
            "tool", "n_failures", "n_retried", "n_recovered",
            F.when(
                F.col("n_retried") > 0,
                F.expr("(n_recovered * 1000000) div n_retried"),
            ).otherwise(F.lit(0)).cast("long").alias("recovery_ppm"),
        )
    )


def retry_recovery_sql(rel: str) -> str:
    """DuckDB mirror of :func:`retry_recovery`."""
    return (
        _parsed_cte(rel)
        + """
        , led AS (
          SELECT tool_called, status,
                 lead(status) OVER (PARTITION BY conv_id, tool_called
                                    ORDER BY turn_idx) AS nxt
          FROM parsed
        )
        SELECT tool_called AS tool,
               count(*) AS n_failures,
               CAST(sum(CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retried,
               CAST(sum(CASE WHEN nxt = 'OK' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_recovered,
               CAST(CASE WHEN sum(CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END) > 0
                    THEN (sum(CASE WHEN nxt = 'OK' THEN 1 ELSE 0 END) * 1000000)
                         // sum(CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END)
                    ELSE 0 END AS BIGINT) AS recovery_ppm
        FROM led WHERE status <> 'OK'
        GROUP BY tool_called
        """
    )


def response_gap(df: DataFrame, ps: tuple = PCTL_PS) -> DataFrame:
    """User-perceived responsiveness: the gap in seconds between each
    USER turn and the next turn in the conversation when that next turn
    is the assistant's, summarized as exact nearest-rank percentiles
    over all conversations. This is the end-to-end latency a user feels
    (queueing + model + tool time), as opposed to latency_ms which is
    the tool's own self-reported cost.

    Shape: one lead window over conv_id in turn order (role and ts led
    together), filter to user→assistant adjacencies, then a VALUE
    HISTOGRAM (map-side-combined count per distinct gap second) and a
    cumulative walk over the distinct-value relation. The only global
    ordering runs over distinct gap values — bounded by the gap range in
    seconds, not the row count — so the op never single-partition-sorts
    the data itself (the naive row_number-on-a-constant-key plan would).
    Exact nearest-rank: answer = smallest gap with cum ≥ ceil(n·p/100)."""
    from pyspark.sql import Window

    cw = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (
        df.select(
            "conv_id", "turn_idx", "role",
            F.col("ts").cast("long").alias("ep"),
        )
        .withColumn("_nrole", F.lead("role").over(cw))
        .withColumn("_nep", F.lead("ep").over(cw))
        .filter((F.col("role") == "user") & (F.col("_nrole") == "assistant"))
        .select((F.col("_nep") - F.col("ep")).alias("gap_s"))
    )
    hist = gaps.groupBy("gap_s").agg(F.count(F.lit(1)).alias("cnt"))
    cw2 = Window.orderBy("gap_s")
    cum = hist.select(
        "gap_s",
        F.sum("cnt").over(cw2).alias("cum"),
        (F.sum("cnt").over(cw2) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(
            cw2.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    p = F.explode(F.array(*[F.lit(int(x)) for x in ps])).alias("p")
    return (
        cum.select("gap_s", "cum", "cum_prev", "n", p)
        .filter(
            (F.col("cum") >= F.expr("(n * p + 99) DIV 100"))
            & (F.col("cum_prev") < F.expr("(n * p + 99) DIV 100"))
        )
        .select("p", F.col("gap_s").alias("gap_p_s"))
    )


def response_gap_sql(rel: str, ps: tuple = PCTL_PS) -> str:
    """DuckDB mirror of :func:`response_gap` (ts carried as ts_epoch)."""
    plist = ", ".join(str(int(x)) for x in ps)
    return f"""
        WITH t AS ({rel}),
        led AS (
          SELECT conv_id, turn_idx, role, ts_epoch,
                 lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS nrole,
                 lead(ts_epoch) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS nep
          FROM t
        ),
        gaps AS (
          SELECT nep - ts_epoch AS gap_s
          FROM led WHERE role = 'user' AND nrole = 'assistant'
        ),
        hist AS (
          SELECT gap_s, count(*) AS cnt FROM gaps GROUP BY gap_s
        ),
        cum AS (
          SELECT gap_s,
                 sum(cnt) OVER (ORDER BY gap_s) AS cum,
                 sum(cnt) OVER (ORDER BY gap_s) - cnt AS cum_prev,
                 sum(cnt) OVER () AS n
          FROM hist
        )
        SELECT CAST(p AS INT) AS p, gap_s AS gap_p_s
        FROM cum, unnest([{plist}]) u(p)
        WHERE cum >= (n * p + 99) // 100 AND cum_prev < (n * p + 99) // 100
    """


def session_stats(df: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch twin of streaming.stream_conv_stats, oracle-checkable: per
    conversation, total turns and the number of gap-delimited sessions
    (a new session starts when the time since the previous turn exceeds
    ``gap_seconds``). Pinned equal to the streaming op's final rows in
    tests — the batch ↔ stream reconciliation contract every other
    stateful op in streaming.py carries.

    Shape: one lag window + one aggregate, both hashing on conv_id —
    the shared conv-grain exchange. Integer seconds end to end."""
    from pyspark.sql import Window

    if gap_seconds < 1:
        raise ValueError(f"gap_seconds must be >= 1, got {gap_seconds}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ep = F.col("ts").cast("long")
    return (
        df.select("conv_id", "turn_idx", ep.alias("ep"))
        .withColumn("_prev", F.lag("ep").over(w))
        .withColumn(
            "_new_sess",
            (F.col("_prev").isNull()
             | (F.col("ep") - F.col("_prev") > gap_seconds)).cast("long"),
        )
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("_new_sess").alias("n_sessions"),
        )
    )


def session_stats_sql(rel: str, gap_seconds: int = 1800) -> str:
    """DuckDB mirror of :func:`session_stats`."""
    return f"""
        WITH t AS ({rel}),
        lagged AS (
          SELECT conv_id,
                 ts_epoch - lag(ts_epoch) OVER (PARTITION BY conv_id
                                                ORDER BY turn_idx) AS gap
          FROM t
        )
        SELECT conv_id, count(*) AS n_turns,
               CAST(sum(CASE WHEN gap IS NULL OR gap > {gap_seconds}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        FROM lagged GROUP BY conv_id
    """


def conv_concurrency(df: DataFrame) -> DataFrame:
    """Hourly conversation occupancy: for each hour bucket, how many
    conversations were ACTIVE in it (their [first turn, last turn] span
    overlaps the hour) — the capacity-planning series behind "how many
    concurrent sessions must the serving fleet hold". Interval-overlap
    counting, not event counting: a conversation spanning three hours
    counts in all three even if it has no turn in the middle one.

    Shape: per-conversation min/max (one map-side-combined aggregate on
    conv_id), then each span EXPLODES to its covered hour buckets
    (bounded by span length / 3600 — conversations are minutes-to-hours,
    so fan-out is a small constant, never corpus-sized) and a second
    count aggregate on the hour key. Two exchanges, integer end to end;
    at 10^12 turns the explode input is the per-CONVERSATION relation,
    3-4 orders smaller than the turn table."""
    ep = F.col("ts").cast("long")
    span = df.groupBy("conv_id").agg(
        F.min(ep).alias("t0"), F.max(ep).alias("t1")
    )
    hours = span.select(
        F.explode(
            F.sequence(
                F.col("t0") - F.col("t0") % 3600,
                F.col("t1") - F.col("t1") % 3600,
                F.lit(3600),
            )
        ).alias("hour_epoch")
    )
    return hours.groupBy("hour_epoch").agg(
        F.count(F.lit(1)).alias("n_active")
    )


def conv_concurrency_sql(rel: str) -> str:
    """DuckDB mirror of :func:`conv_concurrency` (ts as ts_epoch)."""
    return f"""
        WITH t AS ({rel}),
        span AS (
          SELECT conv_id, min(ts_epoch) AS t0, max(ts_epoch) AS t1
          FROM t GROUP BY conv_id
        ),
        hours AS (
          SELECT unnest(range(t0 - t0 % 3600, t1 - t1 % 3600 + 1, 3600))
            AS hour_epoch
          FROM span
        )
        SELECT hour_epoch, count(*) AS n_active FROM hours GROUP BY hour_epoch
    """


def error_cascade(parsed: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Failure-cascade report: per tool, the probability (ppm) that the
    NEXT parsed call in the same conversation fails GIVEN this tool's
    call failed, beside the tool's unconditional next-call failure rate
    and the lift between them — the signal that separates "one bad call
    poisons the conversation" cascades (kill the episode early, retrain
    the recovery behavior) from independent flakiness (route the tool to
    retry_recovery instead). Conversations contribute only consecutive
    parsed-call pairs; a tool's final calls have no successor and drop.

    Scale shape: the lead() window rides the SAME single conv_id hash
    exchange every transcript window op shares (plan-pinned family,
    test_plans.py), then ONE map-side-combined groupBy on the small tool
    domain. All probability arithmetic runs ppm fixed-point with the
    count product cast to DECIMAL(38,0) BEFORE the multiply — identical
    to the HUGEINT DuckDB mirror at any count (the ADVICE-r4 wrap
    lesson); div-by-zero is CASE-guarded so ANSI mode agrees."""
    from pyspark.sql import Window

    wl = Window.partitionBy("conv_id").orderBy("turn_idx")
    nx = parsed.select(
        "tool_called",
        (F.col("status") != "OK").alias("f"),
        F.lead("status").over(wl).alias("ns"),
    )
    pairs = nx.filter(F.col("ns").isNotNull()).select(
        "tool_called", "f", (F.col("ns") != "OK").alias("nf")
    )
    agg = pairs.groupBy("tool_called").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("f").cast("long")).alias("n_fail"),
        F.sum((F.col("f") & F.col("nf")).cast("long")).alias("n_ff"),
        F.sum(F.col("nf").cast("long")).alias("n_nf"),
    )
    casc = (
        f"CASE WHEN n_fail = 0 THEN NULL ELSE "
        f"(cast(n_ff as decimal(38,0)) * {scale}) div n_fail END"
    )
    base = f"(cast(n_nf as decimal(38,0)) * {scale}) div n_pairs"
    return agg.select(
        F.col("tool_called").alias("tool"),
        "n_pairs",
        "n_fail",
        F.expr(casc).alias("cascade_ppm"),
        F.expr(base).alias("base_next_fail_ppm"),
        (F.expr(casc) - F.expr(base)).alias("lift_ppm"),
    )


def error_cascade_sql(rel: str, scale: int = 1_000_000) -> str:
    """DuckDB mirror of :func:`error_cascade` (HUGEINT ppm products,
    floor-div == Spark's truncating div on the all-non-negative
    operands)."""
    casc = (
        f"CASE WHEN n_fail = 0 THEN NULL ELSE CAST("
        f"CAST(n_ff AS HUGEINT) * {scale} // n_fail AS BIGINT) END"
    )
    base = f"CAST(CAST(n_nf AS HUGEINT) * {scale} // n_pairs AS BIGINT)"
    return (
        _parsed_cte(rel)
        + f"""
        , nx AS (
          SELECT tool_called, (status <> 'OK') AS f,
                 lead(status) OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS ns
          FROM parsed
        ),
        pairs AS (SELECT tool_called, f, (ns <> 'OK') AS nf
                  FROM nx WHERE ns IS NOT NULL),
        agg AS (
          SELECT tool_called, count(*) AS n_pairs,
                 sum(CASE WHEN f THEN 1 ELSE 0 END) AS n_fail,
                 sum(CASE WHEN f AND nf THEN 1 ELSE 0 END) AS n_ff,
                 sum(CASE WHEN nf THEN 1 ELSE 0 END) AS n_nf
          FROM pairs GROUP BY tool_called
        )
        SELECT tool_called AS tool,
               n_pairs, CAST(n_fail AS BIGINT) AS n_fail,
               {casc} AS cascade_ppm,
               {base} AS base_next_fail_ppm,
               {casc} - {base} AS lift_ppm
        FROM agg
        """
    )


def outcome_by_depth(parsed: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Failure rate by conversation depth: conversations bucketed by
    parsed-call count into power-of-two buckets (1, 2-3, 4-7, ...), per
    bucket the conversation count and the share (ppm) whose FINAL call
    failed — the curve that tells you whether long agent sessions rot
    (failure share climbing with depth → context or loop pathology) or
    whether failures are front-loaded. Folds :func:`conv_outcomes`, so
    the whole operator is one conv_id shuffle + one tiny bucket groupBy;
    the bucket key is floor(log2(n_calls)) computed as the bit length of
    a BIGINT (integer end-to-end, no float log)."""
    oc = conv_outcomes(parsed)
    # bit-length bucket: 1→0, 2-3→1, 4-7→2 ... (n_calls >= 1 by grouping);
    # derived from the integer's binary-string length, not float log2,
    # to be engine-exact at any depth
    bucket = (
        "(case when n_calls >= 1 then cast(length(bin(n_calls)) as int) - 1 "
        "else null end)"
    )
    b = oc.select(
        F.expr(bucket).alias("depth_bucket"),
        F.col("failed").cast("long").alias("fl"),
    )
    return (
        b.groupBy("depth_bucket")
        .agg(F.count(F.lit(1)).alias("n_convs"), F.sum("fl").alias("n_failed"))
        .select(
            "depth_bucket",
            F.expr("cast(pow(2, depth_bucket) as long)").alias("min_calls"),
            "n_convs",
            "n_failed",
            F.expr(
                f"(cast(n_failed as decimal(38,0)) * {scale}) div n_convs"
            ).alias("failed_ppm"),
        )
    )


def outcome_by_depth_sql(rel: str, scale: int = 1_000_000) -> str:
    """DuckDB mirror of :func:`outcome_by_depth` (bit_length-derived
    bucket; DuckDB's bit_length counts the BIGINT's fixed 64 bits, so the
    bucket is 63 - leading zeros via the bin-string trim, identical to
    Spark's length(bin(n)) - 1)."""
    return (
        _parsed_cte(rel)
        + f"""
        , oc AS (
          SELECT conv_id, count(*) AS n_calls,
                 max_by(status, turn_idx) <> 'OK' AS failed
          FROM parsed GROUP BY conv_id
        ),
        b AS (
          SELECT length(ltrim(bin(CAST(n_calls AS BIGINT)), '0')) - 1
                   AS depth_bucket,
                 CASE WHEN failed THEN 1 ELSE 0 END AS fl
          FROM oc
        )
        SELECT CAST(depth_bucket AS INT) AS depth_bucket,
               CAST(2 ** depth_bucket AS BIGINT) AS min_calls,
               count(*) AS n_convs,
               CAST(sum(fl) AS BIGINT) AS n_failed,
               CAST(CAST(sum(fl) AS HUGEINT) * {scale} // count(*) AS BIGINT)
                 AS failed_ppm
        FROM b GROUP BY depth_bucket
        """
    )


def handoff_outcomes(parsed: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Tool-handoff failure matrix: for every (tool → next tool) pair of
    consecutive parsed calls in a conversation, how often the RECEIVING
    call fails — the directional refinement of tool_transitions (which
    counts handoffs) and error_cascade (which conditions on the sender's
    status): a clean sender whose specific successor tool still fails is
    an interface bug between the two, not flakiness in either alone.

    Shape: one lead() on the shared conv_id exchange (sender's tool,
    successor's tool + status led together), then ONE map-side-combined
    groupBy on the ≤tools² pair domain; failure share in ppm with the
    DECIMAL(38,0) product contract."""
    from pyspark.sql import Window

    wl = Window.partitionBy("conv_id").orderBy("turn_idx")
    nx = parsed.select(
        F.col("tool_called").alias("tool_from"),
        F.lead("tool_called").over(wl).alias("tool_to"),
        F.lead("status").over(wl).alias("to_status"),
    ).filter(F.col("tool_to").isNotNull())
    return (
        nx.groupBy("tool_from", "tool_to")
        .agg(
            F.count(F.lit(1)).alias("n_handoffs"),
            F.sum((F.col("to_status") != "OK").cast("long")).alias(
                "n_to_fail"
            ),
        )
        .select(
            "tool_from", "tool_to", "n_handoffs", "n_to_fail",
            F.expr(
                f"(cast(n_to_fail as decimal(38,0)) * {scale})"
                f" div n_handoffs"
            ).alias("to_fail_ppm"),
        )
    )


def handoff_outcomes_sql(rel: str, scale: int = 1_000_000) -> str:
    """DuckDB mirror of :func:`handoff_outcomes`."""
    return (
        _parsed_cte(rel)
        + f"""
        , nx AS (
          SELECT tool_called AS tool_from,
                 lead(tool_called) OVER w AS tool_to,
                 lead(status) OVER w AS to_status
          FROM parsed
          WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        )
        SELECT tool_from, tool_to, count(*) AS n_handoffs,
               CAST(sum(CASE WHEN to_status <> 'OK' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_to_fail,
               CAST(CAST(sum(CASE WHEN to_status <> 'OK' THEN 1 ELSE 0 END)
                         AS HUGEINT) * {scale} // count(*) AS BIGINT)
                 AS to_fail_ppm
        FROM nx WHERE tool_to IS NOT NULL
        GROUP BY 1, 2
        """
    )

def abandon_hazard(parsed: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Discrete termination-hazard curve over conversation depth: for
    each exact depth t (parsed-call count), the number of conversations
    that END at t, the number still alive entering t (at-risk set), and
    the hazard n_ended·scale DIV n_at_risk — P(conversation stops here |
    it got this far). The session-survival diagnostic that separates
    "users bail after the first failed call" (early hazard spike) from
    "agents grind until context exhaustion" (late ramp); the exact-depth
    complement of :func:`outcome_by_depth`'s bucketed failure shares.

    Shape: ONE conv_id count aggregate (map-side combined), then a
    depth-grain histogram whose reverse-cumulative at-risk walk runs
    over the DISTINCT DEPTH relation — bounded by the longest
    conversation, never the conversation count (the reorder_gap
    contract). Integer throughout; truncating div matches HUGEINT."""
    lens = parsed.groupBy("conv_id").agg(F.count(F.lit(1)).alias("depth"))
    hist = lens.groupBy("depth").agg(F.count(F.lit(1)).alias("n_ended"))
    w = Window.orderBy(F.col("depth").desc())
    return (
        hist.select(
            "depth", "n_ended",
            F.sum("n_ended").over(w).alias("n_at_risk"),
        )
        .select(
            "depth",
            F.col("n_ended").cast("long").alias("n_ended"),
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.expr(
                f"CAST((CAST(n_ended AS DECIMAL(38,0)) * {scale})"
                f" DIV n_at_risk AS BIGINT)"
            ).alias("hazard_ppm"),
        )
    )


def abandon_hazard_sql(rel: str, scale: int = 1_000_000) -> str:
    """DuckDB mirror of :func:`abandon_hazard`."""
    return (
        _parsed_cte(rel)
        + f"""
        , lens AS (
          SELECT conv_id, count(*) AS depth FROM parsed GROUP BY 1
        ),
        hist AS (
          SELECT depth, count(*) AS n_ended FROM lens GROUP BY 1
        )
        SELECT depth, CAST(n_ended AS BIGINT) AS n_ended,
               CAST(sum(n_ended) OVER (ORDER BY depth DESC)
                    AS BIGINT) AS n_at_risk,
               CAST((CAST(n_ended AS HUGEINT) * {scale})
                    // sum(n_ended) OVER (ORDER BY depth DESC)
                    AS BIGINT) AS hazard_ppm
        FROM hist
        """
    )
