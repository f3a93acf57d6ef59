"""Conversation-level operators over multi-turn transcript relations.

The input shape is the north-star transcript table (BASELINE.json
input_hint): ``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``. The reference summarizes per-connection
streams (conn.d:233-241, dns.d:120-128); these operators are the
conversation-native analogues a transcript pipeline needs on top of the
per-turn parse stage: reassembly, tool-sequence Markov transitions,
response-latency profiles, and role balance.

Because the driver's parquet tables don't include a transcript table,
``synth_conv`` builds one deterministically from ``spark.range`` — pure
integer arithmetic + md5-derived words — and ``synth_conv_sql`` is the
byte-identical DuckDB mirror, so every operator here still gets a full
driver hash-check (same pattern as functions/zeek_oracle.py's committed
golden parquet, but generator-based so it scales with one parameter).

Engine-parity notes (see __spark_entry__ module docstring):
- averages/ratios are fixed-point: ``(sum * 10^4) DIV n`` in BIGINT
  (identical floor semantics both engines), divided by 10^4.0 only at
  the end — one exact-integer-to-double conversion, no decimal-division
  scale ambiguity;
- timestamps never cross the engine boundary: latency math happens on
  ``unix_seconds`` integers.

Scale shape: every operator is one shuffle (groupBy conv_id or the
lag-window partition) over a relation already keyed by conv_id — on a
real cluster the transcript table is bucketed/partitioned by conv_id
(FIXTURES.md §3), so these become shuffle-free map-side windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import textstats

TURNS_PER_CONV = 16
TOOLS = ("conn", "dns", "http", "files", "ssl", "x509")
BASE_EPOCH = 1_767_225_600  # 2026-01-01T00:00:00Z


def synth_conv(spark: SparkSession, n: int = 20_000, partitions: int | None = None) -> DataFrame:
    """Deterministic transcript relation: ``n`` turns in conversations of
    TURNS_PER_CONV, alternating user/assistant roles, tool invocations on
    assistant turns, strictly increasing in-conversation timestamps
    (30s stride + 0-22s jitter), and 3-8 md5-derived word tokens per
    turn. Distributed generation (spark.range), no driver collect."""
    rng = spark.range(n)
    if partitions:
        rng = rng.repartition(partitions)
    i = F.col("id")
    conv = ((i - i % TURNS_PER_CONV) / TURNS_PER_CONV).cast("long")
    turn = (i % TURNS_PER_CONV).cast("int")
    is_user = turn % 2 == 0
    tool_idx = ((i * 7 + conv) % 6).cast("int")
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
    epoch = F.lit(BASE_EPOCH) + conv * 3600 + turn * 30 + (i * 37) % 23
    return rng.select(
        F.concat(F.lit("conv"), conv.cast("string")).alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(is_user, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
        F.array_join(words, " ").alias("text"),
        F.when(is_user, F.lit(None).cast("string"))
        .otherwise(F.element_at(F.array(*[F.lit(t) for t in TOOLS]), tool_idx + 1))
        .alias("tool"),
        F.timestamp_seconds(epoch).alias("ts"),
    )


def synth_conv_sql(n: int = 20_000) -> str:
    """DuckDB mirror of :func:`synth_conv` (ts carried as epoch seconds —
    timestamps never cross the engine boundary)."""
    tools = ", ".join(f"'{t}'" for t in TOOLS)
    return f"""
        SELECT 'conv' || CAST(i // {TURNS_PER_CONV} AS VARCHAR) AS conv_id,
               CAST(i % {TURNS_PER_CONV} AS INT) AS turn_idx,
               CASE WHEN (i % {TURNS_PER_CONV}) % 2 = 0 THEN 'user'
                    ELSE 'assistant' END AS role,
               array_to_string(
                 list_transform(range(3 + i % 6),
                   j -> 'w' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                                          CAST(j AS VARCHAR)), 1, 6)),
                 ' ') AS text,
               CASE WHEN (i % {TURNS_PER_CONV}) % 2 = 0 THEN NULL
                    ELSE ([{tools}])[CAST((i * 7 + i // {TURNS_PER_CONV}) % 6 AS INT) + 1]
               END AS tool,
               {BASE_EPOCH} + (i // {TURNS_PER_CONV}) * 3600
                 + (i % {TURNS_PER_CONV}) * 30 + (i * 37) % 23 AS ts_epoch
        FROM range({n}) t(i)
    """


def _fixed_point_avg(sum_expr: str, alias: str) -> F.Column:
    """round-toward-zero fixed-point average with 4 decimal digits —
    ``(sum * 10^4) DIV count`` is exact BIGINT floor-division in both
    Spark and DuckDB; the final /10^4.0 is one exact int→double
    conversion (no decimal-division scale ambiguity)."""
    return (
        F.expr(f"({sum_expr} * 10000) DIV count(*)").cast("long") / F.lit(10000.0)
    ).alias(alias)


def conv_reconstruct(df: DataFrame) -> DataFrame:
    """Reassemble each conversation: turn count, total whitespace tokens,
    the full transcript text in turn order, and its md5 fingerprint.

    One shuffle on conv_id; ordering comes from ``array_sort`` over
    (turn_idx, text) structs — a deterministic in-group sort with no
    second window pass (the north_rule stable-order invariant,
    reference parser.d:170-180, realized at conversation grain)."""
    toks = textstats.tokens(F.col("text"))
    per = df.select("conv_id", "turn_idx", "text", F.size(toks).alias("_nt"))
    return (
        per.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum("_nt").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("transcript"),
        )
        .withColumn("transcript_md5", F.md5("transcript"))
    )


def conv_reconstruct_sql(rel: str) -> str:
    return f"""
        WITH c AS ({rel}),
        g AS (
          SELECT conv_id,
                 count(*) AS n_turns,
                 CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
                   AS n_tokens,
                 string_agg(text, ' ' ORDER BY turn_idx) AS transcript
          FROM c GROUP BY conv_id
        )
        SELECT conv_id, n_turns, n_tokens, transcript,
               md5(transcript) AS transcript_md5
        FROM g
    """


def tool_transitions(df: DataFrame) -> DataFrame:
    """Markov transition counts over each conversation's tool-invocation
    sequence (null-tool turns are not invocations and are skipped, so
    transitions link consecutive *invocations*, not consecutive turns).
    The first invocation of a conversation transitions from '<start>'.

    Shape: filter → one lag window partitioned by conv_id → global
    count per (prev, cur) pair. The window and the final groupBy are the
    only shuffles; the pair-count agg is map-side partial."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = (
        df.filter(F.col("tool").isNotNull())
        .select("conv_id", "turn_idx", "tool", F.lag("tool").over(w).alias("_prev"))
    )
    return seq.groupBy(
        F.coalesce("_prev", F.lit("<start>")).alias("prev_tool"), F.col("tool")
    ).agg(F.count("*").alias("n_transitions"))


def tool_transitions_sql(rel: str) -> str:
    return f"""
        WITH c AS ({rel}),
        s AS (
          SELECT conv_id, turn_idx, tool,
                 lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
          FROM c WHERE tool IS NOT NULL
        )
        SELECT coalesce(prev, '<start>') AS prev_tool, tool,
               count(*) AS n_transitions
        FROM s GROUP BY 1, 2
    """


def turn_latency(df: DataFrame) -> DataFrame:
    """Per-tool response-latency profile: the wait between a tool turn
    and the previous turn of its conversation (the reference's latency
    markers — conn.d:34 duration — at transcript grain). Latency math is
    pure ``unix_seconds`` integer arithmetic; the average is fixed-point
    (see module docstring)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    d = df.select(
        "conv_id", "turn_idx", "tool", F.unix_seconds("ts").alias("_e")
    ).withColumn("_delta", F.col("_e") - F.lag("_e").over(w))
    d = d.filter(F.col("_delta").isNotNull() & F.col("tool").isNotNull())
    return d.groupBy("tool").agg(
        F.count("*").alias("n_waits"),
        F.sum("_delta").alias("total_wait_s"),
        F.min("_delta").alias("min_wait_s"),
        F.max("_delta").alias("max_wait_s"),
        _fixed_point_avg("sum(_delta)", "avg_total_wait_s"),
    )


def turn_latency_sql(rel: str) -> str:
    return f"""
        WITH c AS ({rel}),
        d AS (
          SELECT conv_id, turn_idx, tool,
                 ts_epoch - lag(ts_epoch) OVER (PARTITION BY conv_id
                                                ORDER BY turn_idx) AS delta
          FROM c
        )
        SELECT tool,
               count(*) AS n_waits,
               CAST(sum(delta) AS BIGINT) AS total_wait_s,
               CAST(min(delta) AS BIGINT) AS min_wait_s,
               CAST(max(delta) AS BIGINT) AS max_wait_s,
               CAST((CAST(sum(delta) AS BIGINT) * 10000)
                    // count(*) AS BIGINT) / 10000.0 AS avg_total_wait_s
        FROM d
        WHERE delta IS NOT NULL AND tool IS NOT NULL
        GROUP BY tool
    """


def role_balance(df: DataFrame) -> DataFrame:
    """Per-conversation role mix: user/assistant turn and token counts
    and the assistant share of tokens (fixed-point ratio). The single
    groupBy(conv_id) shuffle carries conditional partial aggregates —
    no per-role re-scan."""
    toks = textstats.tokens(F.col("text"))
    per = df.select(
        "conv_id", "role", F.size(toks).alias("_nt")
    )
    is_a = F.col("role") == "assistant"
    return per.groupBy("conv_id").agg(
        F.sum(F.when(is_a, 0).otherwise(1)).alias("n_user_turns"),
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_assistant_turns"),
        F.sum(F.when(is_a, 0).otherwise(F.col("_nt"))).alias("user_tokens"),
        F.sum(F.when(is_a, F.col("_nt")).otherwise(0)).alias("assistant_tokens"),
        (
            F.expr(
                "(sum(CASE WHEN role = 'assistant' THEN _nt ELSE 0 END) * 10000)"
                " DIV sum(_nt)"
            ).cast("long")
            / F.lit(10000.0)
        ).alias("assistant_token_share"),
    )


def role_balance_sql(rel: str) -> str:
    toks = "len(regexp_split_to_array(trim(text), '\\s+'))"
    return f"""
        WITH c AS ({rel}),
        p AS (SELECT conv_id, role, {toks} AS nt FROM c)
        SELECT conv_id,
               CAST(sum(CASE WHEN role = 'assistant' THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_user_turns,
               CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_assistant_turns,
               CAST(sum(CASE WHEN role = 'assistant' THEN 0 ELSE nt END) AS BIGINT)
                 AS user_tokens,
               CAST(sum(CASE WHEN role = 'assistant' THEN nt ELSE 0 END) AS BIGINT)
                 AS assistant_tokens,
               CAST((CAST(sum(CASE WHEN role = 'assistant' THEN nt ELSE 0 END)
                          AS BIGINT) * 10000)
                    // CAST(sum(nt) AS BIGINT) AS BIGINT) / 10000.0
                 AS assistant_token_share
        FROM p GROUP BY conv_id
    """


def context_growth(df: DataFrame, budget_chars: int = 400) -> DataFrame:
    """Per-turn running context size → (conv_id, turn_idx, turn_chars,
    ctx_chars, over_budget): ctx_chars is the cumulative character count
    of the conversation up to and INCLUDING this turn — the quantity a
    training pipeline tracks to decide truncation/packing of multi-turn
    transcripts against a context window.

    One window over (conv_id ORDER BY turn_idx) — a single hash exchange
    on conv_id, no joins; integers only, so the DuckDB mirror is exact."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.length("text").cast("long")
    return df.select(
        "conv_id",
        "turn_idx",
        n.alias("turn_chars"),
        F.sum(n).over(w).alias("ctx_chars"),
    ).withColumn("over_budget", F.col("ctx_chars") > budget_chars)


def sft_pairs(df: DataFrame, budget_chars: int = 2000) -> DataFrame:
    """Extract supervised-fine-tuning training pairs from transcripts:
    one row per assistant turn with ``prompt`` = every preceding turn of
    the conversation rendered in order as ``role: text`` lines, and
    ``response`` = the assistant turn's text — the conversation→(input,
    target) flattening step of an instruction-tuning data pipeline.
    ``pair_chars``/``fits_budget`` report the pair's size against a
    context budget so a downstream packer can filter or truncate.

    One hash shuffle on conv_id; the prefix context comes from a
    collect_list window over (conv_id ORDER BY turn_idx, frame = rows
    preceding) with an array_sort on (turn_idx, line) structs, so the
    rendered prompt order is deterministic regardless of partitioning
    (same stable-order trick as :func:`conv_reconstruct`)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    line = F.concat(F.col("role"), F.lit(": "), F.col("text"))
    ctx = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("turn_idx"), line.alias("line"))).over(w)
            ),
            lambda s: s["line"],
        ),
        "\n",
    )
    return (
        df.select("conv_id", "turn_idx", "role", "text", ctx.alias("prompt"))
        .filter(F.col("role") == "assistant")
        .select(
            "conv_id",
            "turn_idx",
            "prompt",
            F.col("text").alias("response"),
            (F.length("prompt") + F.length("text")).cast("long").alias("pair_chars"),
        )
        .withColumn("fits_budget", F.col("pair_chars") <= budget_chars)
    )


def sft_pairs_sql(rel: str, budget_chars: int = 2000) -> str:
    """DuckDB mirror of :func:`sft_pairs` (windowed string_agg aggregates
    in frame order; COALESCE matches Spark's empty-array→'' join)."""
    return f"""
        WITH t AS ({rel}),
        p AS (
          SELECT conv_id, turn_idx, role, text,
                 COALESCE(string_agg(role || ': ' || text, chr(10)) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), '') AS prompt
          FROM t
        )
        SELECT conv_id, turn_idx, prompt, text AS response,
               CAST(length(prompt) + length(text) AS BIGINT) AS pair_chars,
               length(prompt) + length(text) <= {budget_chars} AS fits_budget
        FROM p WHERE role = 'assistant'
    """


def context_growth_sql(rel: str, budget_chars: int = 400) -> str:
    """DuckDB mirror of :func:`context_growth`."""
    return f"""
        SELECT conv_id, turn_idx,
               CAST(length(text) AS BIGINT) AS turn_chars,
               CAST(sum(length(text)) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS ctx_chars,
               sum(length(text)) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) > {budget_chars} AS over_budget
        FROM ({rel})
    """
