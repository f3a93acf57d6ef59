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
from .joins import _check_reserved

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


def truncate_context(df: DataFrame, budget_chars: int = 400) -> DataFrame:
    """Context-budget truncation — the actionable counterpart of
    :func:`context_growth`: mark the maximal turn SUFFIX of each
    conversation whose cumulative character count fits ``budget_chars``
    (training keeps the most recent context; history is what gets cut),
    force-keeping the final turn so truncation never empties a
    conversation even when that turn alone exceeds the budget.

    Output is the per-turn relation (conv_id, turn_idx, turn_chars,
    suffix_chars, kept): ``suffix_chars`` is the cumulative size from the
    conversation END back to this turn, ``kept`` the truncation verdict.
    Both windows share one (conv_id, turn_idx DESC) partition+sort, so
    the plan is a single hash exchange and a single sort — no joins, no
    second scan; pure integers, so the DuckDB mirror is bit-exact."""
    _check_reserved(
        df.columns, ("turn_chars", "suffix_chars", "kept"), "output columns"
    )
    wdesc = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").desc())
    wsum = wdesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n = F.length("text").cast("long")
    suffix = F.sum(n).over(wsum)
    return df.select(
        "conv_id",
        "turn_idx",
        n.alias("turn_chars"),
        suffix.alias("suffix_chars"),
        (
            (suffix <= budget_chars) | (F.row_number().over(wdesc) == 1)
        ).alias("kept"),
    )


def truncate_context_sql(rel: str, budget_chars: int = 400) -> str:
    """DuckDB mirror of :func:`truncate_context`."""
    return f"""
        SELECT conv_id, turn_idx,
               CAST(length(text) AS BIGINT) AS turn_chars,
               CAST(sum(length(text)) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS suffix_chars,
               (sum(length(text)) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) <= {budget_chars}
                OR row_number() OVER (
                 PARTITION BY conv_id ORDER BY turn_idx DESC) = 1) AS kept
        FROM ({rel})
    """


# --- conversation-grain duplication / curation operators -------------------

DUP_TEMPLATES = 40


def synth_conv_dup(
    spark: SparkSession, n: int = 8_000, templates: int = DUP_TEMPLATES
) -> DataFrame:
    """Deterministic transcript relation with injected conversation-grain
    duplication: turn text derives from ``template = conv % templates``
    instead of the global turn id, so the conversations of one template
    are exact copies of each other — except every third conversation,
    which mutates the first word of one turn (turn ``conv % TURNS``),
    yielding near-duplicates (one word of ~90 ⇒ shingle Jaccard ≈ 0.93).
    Roles/tools/timestamps keep :func:`synth_conv`'s per-turn formulas.

    This is the workload generator for conversation-grain dedup,
    boilerplate-turn detection, and preference mining — the transcript
    analogue of a crawl corpus's template/mirror duplication."""
    rng = spark.range(n)
    i = F.col("id")
    conv = ((i - i % TURNS_PER_CONV) / TURNS_PER_CONV).cast("long")
    turn = (i % TURNS_PER_CONV).cast("int")
    tmpl = (conv % templates).cast("long")
    is_user = turn % 2 == 0
    tool_idx = ((i * 7 + conv) % 6).cast("int")
    k = ((tmpl * 7 + turn) % 6 + 3).cast("int")
    mutated = (conv % 3 == 0) & (turn == (conv % TURNS_PER_CONV).cast("int"))
    base_word = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", tmpl.cast("string"), turn.cast("string"), j.cast("string")
                )
            ),
            1,
            6,
        ),
    )
    mut_word = F.concat(
        F.lit("m"),
        F.substring(
            F.md5(F.concat_ws(":", conv.cast("string"), turn.cast("string"))), 1, 6
        ),
    )
    words = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda j: F.when(mutated & (j == 0), mut_word).otherwise(base_word(j)),
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


def synth_conv_dup_sql(n: int = 8_000, templates: int = DUP_TEMPLATES) -> str:
    """DuckDB mirror of :func:`synth_conv_dup`."""
    tools = ", ".join(f"'{t}'" for t in TOOLS)
    C = TURNS_PER_CONV
    return f"""
        SELECT 'conv' || CAST(i // {C} AS VARCHAR) AS conv_id,
               CAST(i % {C} AS INT) AS turn_idx,
               CASE WHEN (i % {C}) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
               array_to_string(
                 list_transform(range(3 + ((i // {C}) % {templates} * 7 + i % {C}) % 6),
                   j -> CASE WHEN (i // {C}) % 3 = 0
                              AND i % {C} = (i // {C}) % {C} AND j = 0
                        THEN 'm' || substr(md5(CAST(i // {C} AS VARCHAR) || ':' ||
                                               CAST(i % {C} AS VARCHAR)), 1, 6)
                        ELSE 'w' || substr(md5(CAST((i // {C}) % {templates} AS VARCHAR)
                                               || ':' || CAST(i % {C} AS VARCHAR)
                                               || ':' || CAST(j AS VARCHAR)), 1, 6)
                        END),
                 ' ') AS text,
               CASE WHEN (i % {C}) % 2 = 0 THEN NULL
                    ELSE ([{tools}])[CAST((i * 7 + i // {C}) % 6 AS INT) + 1]
               END AS tool,
               {BASE_EPOCH} + (i // {C}) * 3600 + (i % {C}) * 30 + (i * 37) % 23 AS ts_epoch
        FROM range({n}) t(i)
    """


def boilerplate_turns(df: DataFrame, min_convs: int = 3) -> DataFrame:
    """Boilerplate-turn detection: a turn whose normalized text recurs in
    ≥ ``min_convs`` distinct conversations is template/boilerplate (the
    transcript analogue of C4's repeated-line removal — canned greetings,
    tool preambles, system banners). Emits per-conversation counts and
    the fixed-point boilerplate fraction, the per-doc signal a curation
    filter thresholds on.

    100 TB shape: one fingerprint-keyed shuffle with map-side partial
    distinct (the fp relation is one row per *distinct* turn text), a
    shuffle-hash join back on fp (Zipf-headed fps are AQE's skew case),
    one conv-keyed aggregate. No driver collect, no Python."""
    fp = F.md5(textstats.normalize_text(F.col("text")))
    turns = df.select("conv_id", fp.alias("fp"))
    per_fp = turns.groupBy("fp").agg(
        F.countDistinct("conv_id").alias("n_convs_with_fp")
    )
    flagged = turns.join(per_fp, "fp").select(
        "conv_id",
        (F.col("n_convs_with_fp") >= min_convs).cast("int").alias("is_boiler"),
    )
    return flagged.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum("is_boiler").cast("long").alias("n_boiler"),
        _fixed_point_avg("sum(is_boiler)", "boiler_frac"),
    )


def boilerplate_turns_sql(rel: str, min_convs: int = 3) -> str:
    """DuckDB mirror of :func:`boilerplate_turns`."""
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return f"""
        WITH t AS (SELECT conv_id, md5({norm}) AS fp FROM ({rel})),
        per_fp AS (
          SELECT fp, count(DISTINCT conv_id) AS n_convs_with_fp
          FROM t GROUP BY fp
        ),
        flagged AS (
          SELECT t.conv_id,
                 CASE WHEN p.n_convs_with_fp >= {min_convs} THEN 1 ELSE 0 END
                   AS is_boiler
          FROM t JOIN per_fp p USING (fp)
        )
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(sum(is_boiler) AS BIGINT) AS n_boiler,
               CAST((sum(is_boiler) * 10000) // count(*) AS BIGINT) / 10000.0
                 AS boiler_frac
        FROM flagged GROUP BY conv_id
    """


def pref_pairs(df: DataFrame) -> DataFrame:
    """Preference-pair mining for DPO-style training data: group assistant
    responses by the fingerprint of the user prompt they answer; where a
    prompt has ≥ 2 *distinct* responses across the corpus, emit one
    (chosen, rejected) pair — best and worst DISTINCT response under a
    deterministic quality score (token count, then distinct-token count,
    fixed point; md5 fingerprint as the total-order tiebreak). Ranking
    runs over one representative row per (prompt, response fingerprint) —
    the best-scoring occurrence — so chosen and rejected are always
    different responses, never two normalization-variants of one.

    100 TB shape: one lag window keyed on conv_id (co-partitioned with
    the transcript table's conv_id bucketing ⇒ map-side), then one
    prompt_fp-keyed shuffle where both extremes come from the SAME hash
    exchange (two ranks over one window partition — Catalyst reuses the
    exchange); repeated prompts are Zipf-headed, AQE's skew case."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_role = F.lag("role").over(w)
    prev_text = F.lag("text").over(w)
    toks = textstats.tokens(F.col("text"))
    resp = (
        df.select("conv_id", "turn_idx", "role", "text", prev_role.alias("p_role"),
                  prev_text.alias("p_text"))
        .filter((F.col("role") == "assistant") & (F.col("p_role") == "user"))
        .select(
            "conv_id",
            "turn_idx",
            F.md5(textstats.normalize_text(F.col("p_text"))).alias("prompt_fp"),
            F.md5(textstats.normalize_text(F.col("text"))).alias("resp_fp"),
            (F.size(toks).cast("long") * 10000
             + F.size(F.array_distinct(toks)).cast("long")).alias("score_fp"),
        )
    )
    # rank DISTINCT responses, not rows: normalization collapses case/
    # whitespace variants onto one resp_fp, and ranking raw rows could
    # pick two variants of the SAME response as (chosen, rejected) — a
    # degenerate preference pair — while skipping the real alternative.
    # One row per (prompt_fp, resp_fp): its best-scoring occurrence.
    rep = resp.groupBy("prompt_fp", "resp_fp").agg(
        F.min(
            F.struct(
                (-F.col("score_fp")).alias("neg_score"),
                F.col("conv_id"),
                F.col("turn_idx"),
            )
        ).alias("rep")
    )
    cand = rep.select(
        "prompt_fp",
        "resp_fp",
        (-F.col("rep.neg_score")).alias("score_fp"),
        F.col("rep.conv_id").alias("conv_id"),
        F.col("rep.turn_idx").alias("turn_idx"),
    )
    wc = Window.partitionBy("prompt_fp").orderBy(F.desc("score_fp"), F.asc("resp_fp"))
    wr = Window.partitionBy("prompt_fp").orderBy(F.asc("score_fp"), F.desc("resp_fp"))
    wd = Window.partitionBy("prompt_fp")
    ranked = cand.select(
        "*",
        F.row_number().over(wc).alias("rk_best"),
        F.row_number().over(wr).alias("rk_worst"),
        F.count(F.lit(1)).over(wd).alias("n_distinct"),
    ).filter(F.col("n_distinct") >= 2)
    best = ranked.filter(F.col("rk_best") == 1).select(
        "prompt_fp",
        F.col("conv_id").alias("chosen_conv"),
        F.col("turn_idx").alias("chosen_turn"),
        F.col("resp_fp").alias("chosen_fp"),
        F.col("score_fp").alias("chosen_score_fp"),
    )
    worst = ranked.filter(F.col("rk_worst") == 1).select(
        "prompt_fp",
        F.col("conv_id").alias("rejected_conv"),
        F.col("turn_idx").alias("rejected_turn"),
        F.col("resp_fp").alias("rejected_fp"),
        F.col("score_fp").alias("rejected_score_fp"),
    )
    return best.join(worst, "prompt_fp").withColumn(
        "score_gap_fp", F.col("chosen_score_fp") - F.col("rejected_score_fp")
    )


def pref_pairs_sql(rel: str) -> str:
    """DuckDB mirror of :func:`pref_pairs`."""
    norm_p = "trim(regexp_replace(lower(p_text), '\\s+', ' ', 'g'))"
    norm_t = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return f"""
        WITH t AS (
          SELECT conv_id, turn_idx, role, text,
                 lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS p_role,
                 lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS p_text
          FROM ({rel})
        ),
        resp AS (
          SELECT conv_id, turn_idx,
                 md5({norm_p}) AS prompt_fp,
                 md5({norm_t}) AS resp_fp,
                 CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) * 10000
                   + len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                   AS score_fp
          FROM t WHERE role = 'assistant' AND p_role = 'user'
        ),
        rep AS (
          SELECT prompt_fp, resp_fp, score_fp, conv_id, turn_idx,
                 row_number() OVER (PARTITION BY prompt_fp, resp_fp
                   ORDER BY score_fp DESC, conv_id ASC, turn_idx ASC) AS rr
          FROM resp
        ),
        cand AS (SELECT prompt_fp, resp_fp, score_fp, conv_id, turn_idx
                 FROM rep WHERE rr = 1),
        ranked AS (
          SELECT *,
                 row_number() OVER (PARTITION BY prompt_fp
                   ORDER BY score_fp DESC, resp_fp ASC) AS rk_best,
                 row_number() OVER (PARTITION BY prompt_fp
                   ORDER BY score_fp ASC, resp_fp DESC) AS rk_worst,
                 count(*) OVER (PARTITION BY prompt_fp) AS n_distinct
          FROM cand
        )
        SELECT b.prompt_fp,
               b.conv_id AS chosen_conv, b.turn_idx AS chosen_turn,
               b.resp_fp AS chosen_fp, b.score_fp AS chosen_score_fp,
               w.conv_id AS rejected_conv, w.turn_idx AS rejected_turn,
               w.resp_fp AS rejected_fp, w.score_fp AS rejected_score_fp,
               b.score_fp - w.score_fp AS score_gap_fp
        FROM (SELECT * FROM ranked WHERE rk_best = 1 AND n_distinct >= 2) b
        JOIN (SELECT * FROM ranked WHERE rk_worst = 1 AND n_distinct >= 2) w
          USING (prompt_fp)
    """


def conv_dedup_pairs_sql(rel: str, num_hashes: int = 16, rows_per_band: int = 2) -> str:
    """DuckDB mirror of conversation-grain LSH near-dup detection:
    reassemble each conversation's transcript in turn order, then the
    exact MinHash/band/Jaccard chain of functions/dedup.py — the hash
    family and band slicing come from dedup.sig_sql_expr/band_sql_expr,
    the same builders the documents mirror in __spark_entry__ uses, so
    the two oracles cannot silently diverge."""
    from . import dedup as _dedup

    sig_expr = _dedup.sig_sql_expr(num_hashes)
    band_expr = _dedup.band_sql_expr(rows_per_band)
    n_bands = num_hashes // rows_per_band
    return f"""
        WITH tx AS ({rel}),
        conv AS (
          SELECT conv_id, string_agg(text, ' ' ORDER BY turn_idx) AS text
          FROM tx GROUP BY conv_id
        ),
        t AS (SELECT conv_id,
                     regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM conv),
        sh AS (SELECT conv_id,
                      list_distinct(list_transform(range(len(toks) - 2),
                        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
                        AS shd
               FROM t WHERE len(toks) >= 3),
        sig AS (SELECT conv_id, {sig_expr} AS sigs FROM sh),
        bands AS (
          SELECT conv_id, j, {band_expr} AS band_hash
          FROM sig, range({n_bands}) AS r(j)
        ),
        cand AS (
          SELECT DISTINCT a.conv_id AS id_a, b.conv_id AS id_b
          FROM bands a JOIN bands b
            ON a.j = b.j AND a.band_hash = b.band_hash AND a.conv_id < b.conv_id
        )
        SELECT c.id_a, c.id_b,
               round(CAST(len(list_intersect(sa.shd, sb.shd)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(sa.shd, sb.shd)))
                            AS DOUBLE), 4) AS jaccard
        FROM cand c
        JOIN sh sa ON c.id_a = sa.conv_id
        JOIN sh sb ON c.id_b = sb.conv_id
    """


# branch-point probe depths: powers of two so a shared prefix of any
# length is bracketed within 2x
PREFIX_DEPTHS = (1, 2, 4, 8)


def prefix_groups(
    df: DataFrame,
    depths: tuple = PREFIX_DEPTHS,
    min_convs: int = 2,
) -> DataFrame:
    """Conversation branch-point detection: groups of conversations that
    share an EXACT turn-prefix at each probe depth — the signature of
    regenerated/retried conversations that fork from a common context
    (a conversation tree flattened into independent rows). A group at
    depth d that shrinks at depth 2d brackets the branch point.

    One shuffle builds each conversation's ordered turn array (the
    conv_reconstruct array_sort idiom — no second window pass); the
    depth probe is a narrow |depths|-literal explode + md5 of the
    unit-separator-joined turn-prefix slice; the group aggregate keys on
    (depth, prefix_fp). Prefix fingerprints use chr(31) joins so turn
    boundaries cannot alias (' a b' + 'c' vs 'a' + 'b c').
    Output: (depth, prefix_fp, n_convs, example_conv)."""
    base = df.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
            lambda s: s["text"],
        ).alias("texts")
    )
    d = F.explode(F.array(*[F.lit(int(x)) for x in depths])).alias("depth")
    probed = base.select("conv_id", "texts", d).filter(
        F.size("texts") >= F.col("depth")
    )
    fp = F.md5(F.array_join(F.slice("texts", 1, F.col("depth")), "\x1f"))
    return (
        probed.select(F.col("depth").cast("int").alias("depth"),
                      fp.alias("prefix_fp"), "conv_id")
        .groupBy("depth", "prefix_fp")
        .agg(
            F.count("*").alias("n_convs"),
            F.min("conv_id").alias("example_conv"),
        )
        .filter(F.col("n_convs") >= min_convs)
    )


def prefix_groups_sql(
    rel: str, depths: tuple = PREFIX_DEPTHS, min_convs: int = 2
) -> str:
    dlist = ", ".join(str(int(x)) for x in depths)
    return f"""
        WITH c AS ({rel}),
        g AS (
          SELECT conv_id, list(text ORDER BY turn_idx) AS texts
          FROM c GROUP BY conv_id
        ),
        probed AS (
          SELECT CAST(u.d AS INT) AS depth,
                 md5(array_to_string(g.texts[1:CAST(u.d AS INT)], chr(31)))
                   AS prefix_fp,
                 g.conv_id
          FROM g, unnest([{dlist}]) u(d)
          WHERE len(g.texts) >= u.d
        )
        SELECT depth, prefix_fp, count(*) AS n_convs,
               min(conv_id) AS example_conv
        FROM probed GROUP BY depth, prefix_fp
        HAVING count(*) >= {min_convs}
    """


def synth_conv_degen(spark: SparkSession, n: int = 20_000) -> DataFrame:
    """:func:`synth_conv` with deterministic generation loops injected
    (the synth_conv_dup fixture tradition): in the quarter of
    conversations whose conv_id md5 starts with hex 0-3, turns 4..9
    collapse to one stuck text — a 6-turn echo loop."""
    base = synth_conv(spark, n)
    stuck = F.substring(F.md5("conv_id"), 1, 1).isin("0", "1", "2", "3") & (
        F.col("turn_idx").between(4, 9)
    )
    return base.withColumn(
        "text", F.when(stuck, F.lit("stuck loop detected")).otherwise(F.col("text"))
    )


def synth_conv_degen_sql(n: int = 20_000) -> str:
    return f"""
        SELECT conv_id, turn_idx, role,
               CASE WHEN substr(md5(conv_id), 1, 1) IN ('0','1','2','3')
                     AND turn_idx BETWEEN 4 AND 9
                    THEN 'stuck loop detected' ELSE text END AS text,
               tool, ts_epoch
        FROM ({synth_conv_sql(n)})
    """


def degenerate_runs(df: DataFrame, min_run: int = 3) -> DataFrame:
    """Generation-loop detection: maximal runs of ``min_run``-or-more
    CONSECUTIVE turns in a conversation with byte-identical text — the
    stuck-model / echo-loop sweep of a transcript curation pass (a
    per-conversation sequential analogue of boilerplate_turns, which
    screens across conversations).

    Output (conv_id, text_fp, start_turn, end_turn, run_len), text
    carried as its md5 fingerprint.

    Scale shape: ONE hash exchange on conv_id — run boundaries come
    from a lag window and run ids from a running sum over the SAME
    (conv_id, turn_idx) sort, and the closing groupBy keys on
    (conv_id, run_id, …), a superset of conv_id, so Catalyst's
    ClusteredDistribution check reuses the window's exchange. Linear in
    turns; no joins; no driver collect."""
    if min_run < 2:
        raise ValueError(f"min_run must be >= 2, got {min_run}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    per = df.select("conv_id", "turn_idx", F.md5("text").alias("text_fp"))
    prev = F.lag("text_fp").over(w)
    new_run = F.when(prev.isNull() | (prev != F.col("text_fp")), 1).otherwise(0)
    stamped = per.select("*", new_run.alias("_nr")).select(
        "*",
        F.sum("_nr")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_run"),
    )
    return (
        stamped.groupBy("conv_id", "_run", "text_fp")
        .agg(
            F.min("turn_idx").alias("start_turn"),
            F.max("turn_idx").alias("end_turn"),
            F.count("*").alias("run_len"),
        )
        .filter(F.col("run_len") >= min_run)
        .select("conv_id", "text_fp", "start_turn", "end_turn", "run_len")
    )


def degenerate_runs_sql(rel: str, min_run: int = 3) -> str:
    return f"""
        WITH c AS ({rel}),
        f AS (SELECT conv_id, turn_idx, md5(text) AS text_fp FROM c),
        l AS (SELECT *,
                     CASE WHEN lag(text_fp) OVER w IS NULL
                            OR lag(text_fp) OVER w <> text_fp
                          THEN 1 ELSE 0 END AS nr
              FROM f WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
        r AS (SELECT *, sum(nr) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                      ROWS UNBOUNDED PRECEDING) AS run_id
              FROM l)
        SELECT conv_id, text_fp,
               min(turn_idx) AS start_turn, max(turn_idx) AS end_turn,
               count(*) AS run_len
        FROM r GROUP BY conv_id, run_id, text_fp
        HAVING count(*) >= {min_run}
    """


def pack_with_masks(
    df: DataFrame, budget_tokens: int = 256, n_buckets: int = 16
) -> DataFrame:
    """Conversation packing with SFT loss masks: lay WHOLE conversations
    into fixed token-budget training bins and emit every turn's token
    span inside its bin with a loss mask (assistant tokens train, 1;
    user/system tokens are context, 0) — the batch-construction step
    between curation and the trainer.

    Bin layout follows sampling.pack_sequences semantics at
    conversation grain: within a shard bucket (md5(conv_id) % n_buckets)
    conversations are laid out in conv_id order and a conversation
    belongs to ``bin = floor(start_offset / budget)`` — fixed cumulative
    boundaries (deterministic, O(1) state), so a conversation may
    straddle its bin's end rather than split mid-conversation.

    Output (bucket, bin_id, conv_id, turn_idx, role, seq_start,
    seq_end, loss_mask); spans are token offsets inside the bin,
    whitespace-token counts as in conv_reconstruct.

    Scale shape: the per-turn cumulative window takes one conv_id
    exchange; conversation totals are a separate partial-combining
    aggregate whose exchange carries conv-grain sums only (see inline
    note); the packing window then shuffles just that conv-grain
    relation on its bucket key — parallelism = n_buckets, so size
    buckets to the cluster; the assignment joins back to turns as a
    keyed hash join on conv_id (broadcast when conv count allows). No
    driver collect, no floats."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    toks = textstats.tokens(F.col("text"))
    per = df.select("conv_id", "turn_idx", "role", F.size(toks).alias("_nt"))
    wc = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    turns = per.select(
        "*", (F.sum("_nt").over(wc) - F.col("_nt")).cast("long").alias("_turn_off")
    )
    # conversation totals as a plain aggregate, NOT a window off the
    # turns subtree: map-side partial combine means this branch's
    # exchange carries conv-grain partial sums only, where a shared
    # window would re-shuffle every turn (the source is scanned twice,
    # but the second scan is pruned to (conv_id, text) — cheap columnar
    # read vs. a full-relation shuffle)
    convs = per.groupBy("conv_id").agg(F.sum("_nt").cast("long").alias("_conv_len"))
    bucket = (
        F.conv(F.substring(F.md5("conv_id"), 1, 2), 16, 10).cast("int")
        % n_buckets
    )
    wb = (
        Window.partitionBy("bucket")
        .orderBy("conv_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = (
        convs.withColumn("bucket", bucket)
        .select(
            "*",
            (F.sum("_conv_len").over(wb) - F.col("_conv_len")).alias("_start"),
        )
        .select(
            "conv_id",
            "bucket",
            F.floor(F.col("_start") / budget_tokens).cast("int").alias("bin_id"),
            (F.col("_start") % budget_tokens).cast("long").alias("_bin_off"),
        )
    )
    return turns.join(assigned, "conv_id").select(
        "bucket",
        "bin_id",
        "conv_id",
        "turn_idx",
        "role",
        (F.col("_bin_off") + F.col("_turn_off")).alias("seq_start"),
        (F.col("_bin_off") + F.col("_turn_off") + F.col("_nt")).alias("seq_end"),
        F.when(F.col("role") == "assistant", 1).otherwise(0).cast("int")
        .alias("loss_mask"),
    )


def pack_with_masks_sql(
    rel: str, budget_tokens: int = 256, n_buckets: int = 16
) -> str:
    hx = lambda p: (  # noqa: E731 — hex digit p of md5(conv_id) → int
        f"(strpos('0123456789abcdef', substr(md5(conv_id), {p}, 1)) - 1)"
    )
    return f"""
        WITH c AS ({rel}),
        per AS (SELECT conv_id, turn_idx, role,
                       len(regexp_split_to_array(trim(text), '\\s+')) AS nt
                FROM c),
        t AS (SELECT conv_id, turn_idx, role, nt,
                     CAST(sum(nt) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                        ROWS UNBOUNDED PRECEDING) - nt
                          AS BIGINT) AS turn_off
              FROM per),
        cl AS (SELECT conv_id, CAST(sum(nt) AS BIGINT) AS conv_len
               FROM per GROUP BY conv_id),
        b AS (SELECT conv_id, conv_len,
                     CAST(({hx(1)} * 16 + {hx(2)}) % {n_buckets} AS INT)
                       AS bucket
              FROM cl),
        p AS (SELECT conv_id, bucket,
                     CAST(sum(conv_len) OVER (PARTITION BY bucket
                                              ORDER BY conv_id
                                              ROWS UNBOUNDED PRECEDING)
                          - conv_len AS BIGINT) AS start
              FROM b),
        a AS (SELECT conv_id, bucket,
                     CAST(start // {budget_tokens} AS INT) AS bin_id,
                     CAST(start % {budget_tokens} AS BIGINT) AS bin_off
              FROM p)
        SELECT a.bucket, a.bin_id, t.conv_id, t.turn_idx, t.role,
               CAST(a.bin_off + t.turn_off AS BIGINT) AS seq_start,
               CAST(a.bin_off + t.turn_off + t.nt AS BIGINT) AS seq_end,
               CAST(CASE WHEN t.role = 'assistant' THEN 1 ELSE 0 END AS INT)
                 AS loss_mask
        FROM t JOIN a ON t.conv_id = a.conv_id
    """


def synth_conv_corrupt(spark: SparkSession, n: int = 20_000) -> DataFrame:
    """:func:`synth_conv` with deterministic sequence corruption injected
    (synth_conv_dup tradition), keyed on the conv_id md5's first hex:

    - 0-3 → turn 3 DROPPED (a gap in the turn index sequence);
    - 4-7 → turn 7 DUPLICATED (same turn_idx, ts +1s);
    - 8-9 → turn 11's ts pulled 2h EARLIER (a timestamp regression).
    """
    base = synth_conv(spark, n)
    h = F.substring(F.md5("conv_id"), 1, 1)
    with_reg = base.withColumn(
        "ts",
        F.when(
            h.isin("8", "9") & (F.col("turn_idx") == 11),
            F.col("ts") - F.expr("INTERVAL 2 HOURS"),
        ).otherwise(F.col("ts")),
    )
    dropped = with_reg.filter(
        ~(h.isin("0", "1", "2", "3") & (F.col("turn_idx") == 3))
    )
    dups = base.filter(
        h.isin("4", "5", "6", "7") & (F.col("turn_idx") == 7)
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 SECOND"))
    return dropped.unionByName(dups)


def synth_conv_corrupt_sql(n: int = 20_000) -> str:
    return f"""
        WITH base AS ({synth_conv_sql(n)}),
        h AS (SELECT *, substr(md5(conv_id), 1, 1) AS hx FROM base),
        reg AS (SELECT conv_id, turn_idx, role, text, tool,
                       CASE WHEN hx IN ('8','9') AND turn_idx = 11
                            THEN ts_epoch - 7200 ELSE ts_epoch END AS ts_epoch,
                       hx
                FROM h),
        dropped AS (SELECT conv_id, turn_idx, role, text, tool, ts_epoch
                    FROM reg
                    WHERE NOT (hx IN ('0','1','2','3') AND turn_idx = 3)),
        dups AS (SELECT conv_id, turn_idx, role, text, tool, ts_epoch + 1
                 FROM h WHERE hx IN ('4','5','6','7') AND turn_idx = 7)
        SELECT * FROM dropped UNION ALL SELECT * FROM dups
    """


def conv_integrity(df: DataFrame) -> DataFrame:
    """Sequence-integrity audit at conversation grain — the log
    pipeline's answer to "can I trust turn ordering before I window on
    it?" (the north_rule stable-order invariant, made checkable).
    Flags every conversation with a gap in its 0-based turn-index
    sequence, a duplicated turn index, or a timestamp that moves
    backwards in turn order.

    Output (conv_id, n_turns, max_turn, n_missing, n_dup_idx,
    n_ts_regressions) for VIOLATING conversations only:
    n_missing = max_turn + 1 − distinct indexes; n_dup_idx = rows −
    distinct indexes; a regression is a strict ts decrease between
    consecutive rows ordered by (turn_idx, ts) — integer seconds, so
    every engine counts the same pairs.

    Scale shape: ONE conv_id exchange — the lag window sorts on
    (conv_id, turn_idx, ts) and the closing groupBy clusters on
    conv_id, reusing the exchange. Pure Column arithmetic, no joins."""
    ts_s = F.col("ts").cast("long")
    w = Window.partitionBy("conv_id").orderBy("turn_idx", ts_s)
    per = df.select(
        "conv_id",
        "turn_idx",
        ts_s.alias("_ts"),
        F.when(F.lag(ts_s).over(w) > ts_s, 1).otherwise(0).alias("_reg"),
    )
    return (
        per.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.max("turn_idx").alias("max_turn"),
            (F.max("turn_idx") + 1 - F.countDistinct("turn_idx")).alias(
                "n_missing"
            ),
            (F.count("*") - F.countDistinct("turn_idx")).alias("n_dup_idx"),
            F.sum("_reg").alias("n_ts_regressions"),
        )
        .filter(
            (F.col("n_missing") > 0)
            | (F.col("n_dup_idx") > 0)
            | (F.col("n_ts_regressions") > 0)
        )
    )


def conv_integrity_sql(rel: str) -> str:
    return f"""
        WITH c AS ({rel}),
        p AS (SELECT conv_id, turn_idx, ts_epoch,
                     CASE WHEN lag(ts_epoch) OVER (PARTITION BY conv_id
                                ORDER BY turn_idx, ts_epoch) > ts_epoch
                          THEN 1 ELSE 0 END AS reg
              FROM c),
        g AS (SELECT conv_id,
                     count(*) AS n_turns,
                     max(turn_idx) AS max_turn,
                     max(turn_idx) + 1 - count(DISTINCT turn_idx) AS n_missing,
                     count(*) - count(DISTINCT turn_idx) AS n_dup_idx,
                     CAST(sum(reg) AS BIGINT) AS n_ts_regressions
              FROM p GROUP BY conv_id)
        SELECT conv_id, n_turns, max_turn, n_missing, n_dup_idx,
               n_ts_regressions
        FROM g
        WHERE n_missing > 0 OR n_dup_idx > 0 OR n_ts_regressions > 0
    """


def collapse_degenerate_runs(df: DataFrame, min_run: int = 3) -> DataFrame:
    """The removal counterpart of :func:`degenerate_runs`: rewrite the
    transcript keeping only the FIRST turn of every
    ``min_run``-or-longer byte-identical consecutive run (the echo said
    it once; the loop said nothing new), all other turns untouched —
    the curation pass applied after detection flags a corpus.

    Output = the input columns for surviving turns plus ``run_len`` (1
    for turns outside any collapsed run... the run's length on the kept
    representative), so downstream reweighting can see what was folded.

    Same single-exchange shape as the detector: run boundaries, run ids
    and the in-run position all come from windows over the ONE
    (conv_id, turn_idx) sort; the filter is codegen. Linear in turns,
    no joins, no second scan."""
    if min_run < 2:
        raise ValueError(f"min_run must be >= 2, got {min_run}")
    _check_reserved(
        df.columns, ("run_len", "_nr", "_run", "_pos", "_len"), "output columns"
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag(F.md5("text")).over(w)
    new_run = F.when(prev.isNull() | (prev != F.md5("text")), 1).otherwise(0)
    stamped = df.select("*", new_run.alias("_nr")).select(
        "*",
        F.sum("_nr")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_run"),
    )
    wr = Window.partitionBy("conv_id", "_run")
    pos = F.row_number().over(wr.orderBy("turn_idx"))
    run_len = F.count(F.lit(1)).over(wr)
    out_cols = df.columns
    return (
        stamped.select("*", pos.alias("_pos"), run_len.alias("_len"))
        .filter((F.col("_len") < min_run) | (F.col("_pos") == 1))
        .select(
            *out_cols,
            F.when(F.col("_len") >= min_run, F.col("_len"))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("run_len"),
        )
    )


def collapse_degenerate_runs_sql(rel: str, min_run: int = 3) -> str:
    """DuckDB mirror of :func:`collapse_degenerate_runs` (ts carried as
    ts_epoch, like every conv mirror)."""
    return f"""
        WITH c AS ({rel}),
        l AS (SELECT *,
                     CASE WHEN lag(md5(text)) OVER w IS NULL
                            OR lag(md5(text)) OVER w <> md5(text)
                          THEN 1 ELSE 0 END AS nr
              FROM c WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
        r AS (SELECT *, sum(nr) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                      ROWS UNBOUNDED PRECEDING) AS run_id
              FROM l),
        p AS (SELECT *,
                     row_number() OVER (PARTITION BY conv_id, run_id
                                        ORDER BY turn_idx) AS pos,
                     count(*) OVER (PARTITION BY conv_id, run_id) AS len
              FROM r)
        SELECT conv_id, turn_idx, role, text, tool, ts_epoch,
               CAST(CASE WHEN len >= {min_run} THEN len ELSE 1 END
                    AS BIGINT) AS run_len
        FROM p WHERE len < {min_run} OR pos = 1
    """


def split_conversations(df: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Idle-gap re-sessionization at conversation grain: a long-running
    agent session is ONE conv_id but many logical episodes — split it
    wherever consecutive turns are more than ``gap_s`` apart, emitting
    ``sub_conv_id = conv_id || '#' || episode`` (episodes numbered from
    0 in turn order). The transcript analogue of logops.sessionize,
    keyed by the conversation rather than the user.

    One (conv_id, turn_idx) sort: the gap flag is a lag window and the
    episode number a running sum over the same exchange; pure integer
    epoch math. Output = input columns + episode + sub_conv_id."""
    if gap_s <= 0:
        raise ValueError(f"gap_s must be positive, got {gap_s}")
    _check_reserved(df.columns, ("episode", "sub_conv_id", "_ne"), "output columns")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_ts = F.lag(F.unix_timestamp("ts")).over(w)
    new_ep = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - prev_ts) > gap_s),
        1,
    ).otherwise(0)
    out_cols = df.columns
    return (
        df.select("*", new_ep.alias("_ne"))
        .select(
            "*",
            (
                F.sum("_ne")
                .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
                - 1
            )
            .cast("int")
            .alias("episode"),
        )
        .select(
            *out_cols,
            "episode",
            F.concat_ws("#", "conv_id", F.col("episode").cast("string")).alias(
                "sub_conv_id"
            ),
        )
    )


def split_conversations_sql(rel: str, gap_s: int = 1800) -> str:
    """DuckDB mirror (ts carried as ts_epoch, like every conv mirror)."""
    return f"""
        WITH c AS ({rel}),
        l AS (SELECT *,
                     CASE WHEN lag(ts_epoch) OVER w IS NULL
                            OR ts_epoch - lag(ts_epoch) OVER w > {gap_s}
                          THEN 1 ELSE 0 END AS ne
              FROM c WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
        e AS (SELECT *, CAST(sum(ne) OVER (PARTITION BY conv_id
                               ORDER BY turn_idx ROWS UNBOUNDED PRECEDING)
                             - 1 AS INT) AS episode
              FROM l)
        SELECT conv_id, turn_idx, role, text, tool, ts_epoch, episode,
               conv_id || '#' || CAST(episode AS VARCHAR) AS sub_conv_id
        FROM e
    """


def episode_stats(df: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Per-episode rollup over :func:`split_conversations`: turn count,
    wall-clock duration, distinct tools touched, and role mix — the
    relation a curation pass filters when selecting complete,
    tool-using episodes as training units (an episode, not the raw
    conv_id, is the natural SFT example boundary for long-running
    agents).

    The splitter's window and this groupBy both key on conv_id
    (sub_conv grain is a superset), so the whole composition executes on
    the splitter's ONE exchange; integer epoch math throughout."""
    eps = split_conversations(df, gap_s)
    return (
        eps.groupBy("conv_id", "episode", "sub_conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            (
                F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))
            ).cast("long").alias("duration_s"),
            F.count_distinct("tool").cast("long").alias("n_tools"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
            .cast("long")
            .alias("n_assistant"),
        )
    )


def episode_stats_sql(rel: str, gap_s: int = 1800) -> str:
    """DuckDB mirror of :func:`episode_stats`."""
    return f"""
        WITH eps AS ({split_conversations_sql(rel, gap_s)})
        SELECT conv_id, episode, sub_conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(max(ts_epoch) - min(ts_epoch) AS BIGINT) AS duration_s,
               CAST(count(DISTINCT tool) AS BIGINT) AS n_tools,
               CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_assistant
        FROM eps GROUP BY 1, 2, 3
    """


def repair_turn_order(df: DataFrame) -> DataFrame:
    """Repair companion of :func:`conv_integrity`: reassign each
    conversation's turn_idx as a dense 0-based sequence in (ts,
    turn_idx, text) order — duplicates and gaps close up, timestamp
    regressions resolve to arrival order, and the original index is
    kept as ``orig_turn_idx`` so the rewrite is auditable. Idempotent:
    repairing repaired output is the identity (an existing
    orig_turn_idx column is REPLACED, not duplicated).

    One (conv_id) exchange + one local sort; the tie chain makes the
    new ordering total, so the output is partition- and engine-
    deterministic. Input columns pass through."""
    _check_reserved(df.columns, ("_new_idx",), "output columns")
    if "orig_turn_idx" in df.columns:
        df = df.drop("orig_turn_idx")
    w = Window.partitionBy("conv_id").orderBy(
        F.unix_timestamp("ts"), F.col("turn_idx"), F.col("text")
    )
    out_cols = [c for c in df.columns if c != "turn_idx"]
    return df.select(
        "*",
        (F.row_number().over(w) - 1).cast("int").alias("_new_idx"),
    ).select(
        "conv_id",
        F.col("_new_idx").alias("turn_idx"),
        F.col("turn_idx").alias("orig_turn_idx"),
        *[c for c in out_cols if c != "conv_id"],
    )


def repair_turn_order_sql(rel: str) -> str:
    """DuckDB mirror (ts carried as ts_epoch)."""
    return f"""
        WITH c AS ({rel})
        SELECT conv_id,
               CAST(row_number() OVER (PARTITION BY conv_id
                      ORDER BY ts_epoch, turn_idx, text) - 1 AS INT)
                 AS turn_idx,
               turn_idx AS orig_turn_idx,
               role, text, tool, ts_epoch
        FROM c
    """
