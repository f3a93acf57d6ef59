"""Structured Streaming front-end for the parse→route→aggregate pipeline.

The reference is strictly batch (one directory walk, parser.d:57-91), but
its operational shape — logs continuously appended to a directory — is a
streaming workload. This module runs the SAME parse/route/aggregate logic
(parse.py is pure Column expressions, so it composes with streaming
DataFrames unchanged) over a file-source stream:

- ``stream_transcripts``: readStream over a transcript parquet directory
  (``maxFilesPerTrigger`` bounds batch size; schema is explicit — no
  streaming inference).
- ``stream_route_sinks``: foreachBatch fan-out — each micro-batch routes
  to per-sink parquet appends + a rejects channel, exactly the batch
  pipeline's split. foreachBatch (not N writeStreams) keeps one source
  scan per batch and one checkpoint.
- ``stream_windowed_counts``: the aggregate stage as a watermarked
  sliding/tumbling-window count per (tool, window) — late rows beyond
  the watermark are dropped, the streaming analog of the reference's
  row-drop late-data policy (§1.3.4).

Tests drive it with ``trigger(availableNow=True)`` so a bounded input
drains deterministically; production would run continuous triggers with
the same code. Checkpointing is the engine's own WAL/state-store (exactly
the per-stage resume contract checkpoint.py gives the batch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .parse import ParseOptions, parse_sink
from .schemas import KNOWN_TOOLS, SINKS, TRANSCRIPTS_SCHEMA


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API so it works on
    HDFS/S3A/local alike (driver-local os.path is always-False off-box)."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _fs_has_epoch_partitions(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists and contains at least one ``epoch=*`` child,
    checked through the Hadoop FileSystem API (spark's own filesystem
    abstraction) so the probe works on HDFS/S3A/local alike. A driver-local
    ``os.path`` probe would be always-False on any non-local store, which
    for stream_incremental_dedup would silently read the signature index as
    empty every epoch (ADVICE r3, medium)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    statuses = fs.globStatus(jvm.org.apache.hadoop.fs.Path(path + "/epoch=*"))
    return statuses is not None and len(statuses) > 0


def stream_transcripts(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of transcript rows (explicit schema)."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def route_batch(
    batch: DataFrame,
    output_root: str,
    dialect=None,
    opts: ParseOptions | None = None,
    epoch_id: int | None = None,
    require_epoch: bool = True,
) -> None:
    """One micro-batch of the fan-out: parse each tool, write good rows
    to <root>/sink_<tool>, rejects (parse failures + unknown tools) to
    <root>/rejects.

    With ``epoch_id`` (what stream_route_sinks passes): exactly-once —
    every write targets the batch's OWN epoch_id-keyed partition
    directory in overwrite mode, so a crash-replay of the batch
    (foreachBatch is at-least-once per epoch) replaces that epoch's files
    instead of appending duplicates — the same commit-per-epoch
    idempotence Iceberg/Delta sinks implement natively. Readers scan the
    sink root; the epoch partition column is lineage, for free.

    Without ``epoch_id`` (ad-hoc batch use): plain appends that
    ACCUMULATE across calls — at-least-once; replaying the same batch
    duplicates rows. Because that's a silent double-write footgun, the
    default is STRICT: callers must either pass ``epoch_id`` or opt into
    append semantics explicitly with ``require_epoch=False``."""
    if epoch_id is None and require_epoch:
        raise ValueError(
            "route_batch without epoch_id is at-least-once (appends "
            "accumulate across replays); pass epoch_id for exactly-once, "
            "or require_epoch=False to opt into append semantics"
        )
    suffix = "" if epoch_id is None else f"/epoch={epoch_id}"
    mode = "append" if epoch_id is None else "overwrite"
    batch = batch.persist()
    try:
        for tool in KNOWN_TOOLS:
            parsed = parse_sink(batch.filter(F.col("tool") == tool), tool, dialect, opts=opts)
            good_cols = ["conv_id", "turn_idx", "role", "tool", "src_ts"] + [
                c.name for c in SINKS[tool]
            ]
            parsed.filter(F.col("reject_reason").isNull()).select(*good_cols).write.mode(
                mode
            ).parquet(f"{output_root}/sink_{tool}{suffix}")
        rej_parts = [
            parse_sink(batch.filter(F.col("tool") == t), t, dialect, opts=opts)
            .filter(F.col("reject_reason").isNotNull())
            .select(
                "conv_id", "turn_idx", "role", "tool", "src_ts", "text", "reject_reason"
            )
            for t in KNOWN_TOOLS
        ]
        rejects = batch.filter(~F.col("tool").isin(list(KNOWN_TOOLS))).select(
            "conv_id", "turn_idx", "role", "tool",
            F.col("ts").alias("src_ts"), "text",
            F.lit("unimplemented_tool").alias("reject_reason"),
        )
        for p in rej_parts:
            rejects = rejects.unionByName(p)
        rejects.write.mode(mode).parquet(f"{output_root}/rejects{suffix}")
    finally:
        batch.unpersist()


def stream_route_sinks(
    stream: DataFrame,
    output_root: str,
    checkpoint_dir: str,
    dialect=None,
    opts: ParseOptions | None = None,
    available_now: bool = False,
):
    """Start the routing fan-out as a foreachBatch streaming query."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, epoch: route_batch(b, output_root, dialect, opts, epoch_id=epoch)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_counts(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per tool — the streaming form
    of aggregate.time_bucketed. State is bounded by the watermark; late
    rows beyond it are dropped (reference row-drop policy analog)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("tool", F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n"))
        .select("tool", F.col("w.start").alias("bucket_start"), "n")
    )


def stream_turn_pairs(
    stream: DataFrame,
    watermark: str = "10 minutes",
    max_wait: str = "5 minutes",
) -> DataFrame:
    """Stream-stream inner self-join: each assistant (tool-invoking)
    turn paired with the user request turn immediately before it in the
    same conversation — the streaming form of the request/response
    pairing behind ``convops.turn_latency``.

    Both sides are watermarked and the join carries a TIME-RANGE
    condition (``resp_ts`` within [req_ts, req_ts + max_wait]) on top of
    the (conv_id, adjacent turn_idx) equality — that range bound is what
    lets Spark evict both state stores as the watermark advances, so
    state is O(traffic within the wait window), not O(stream history).
    A request whose response never arrives inside ``max_wait`` emits
    nothing and its state ages out (inner-join semantics); pairs that
    STRADDLE micro-batches join from state — pinned in
    test_streaming.py by forcing each side into its own file/trigger.

    Append output mode; ``wait_s`` is integer epoch arithmetic
    (engine-exact, same rule as convops)."""
    req = (
        stream.filter(F.col("role") == "user")
        .select(
            F.col("conv_id").alias("r_conv"),
            F.col("turn_idx").alias("r_turn"),
            F.col("ts").alias("req_ts"),
        )
        .withWatermark("req_ts", watermark)
    )
    resp = (
        stream.filter((F.col("role") == "assistant") & F.col("tool").isNotNull())
        .select("conv_id", "turn_idx", "tool", F.col("ts").alias("resp_ts"))
        .withWatermark("resp_ts", watermark)
    )
    return (
        resp.join(
            req,
            (F.col("conv_id") == F.col("r_conv"))
            & (F.col("turn_idx") == F.col("r_turn") + 1)
            & (F.col("resp_ts") >= F.col("req_ts"))
            & (F.col("resp_ts") <= F.col("req_ts") + F.expr(f"INTERVAL {max_wait}")),
            "inner",
        )
        .select(
            "conv_id",
            "turn_idx",
            "tool",
            "req_ts",
            "resp_ts",
            (F.unix_seconds("resp_ts") - F.unix_seconds("req_ts")).alias("wait_s"),
        )
    )


def stream_dedup(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    available_now: bool = False,
):
    """Streaming exact dedup on the turn identity (conv_id, turn_idx)
    within the event-time watermark: re-delivered rows (at-least-once
    sources, replayed batches) are dropped by state-store lookup, and
    state is bounded because rows older than the watermark age out —
    the streaming form of dedup.exact_dups for ingest pipelines."""
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", output_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_conv_stats(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    idle_timeout_min: float = 1440,
    available_now: bool = False,
):
    """Custom stateful operator via applyInPandasWithState: per-conversation
    running turn count + gap-based session count, state persisted in the
    engine's state store (survives restarts through the checkpoint — the
    streaming analog of checkpoint.py's resume contract).

    Emits one row per conversation per micro-batch in update mode; the
    foreachBatch parquet append keeps each batch's emissions, so the
    latest row per conv_id is the current state. The update function is a
    closure with no module-global references (pickled by value).

    State is O(1) per conversation but the conv_id space is unbounded on
    a real stream, so conversations idle for ``idle_timeout_min`` minutes
    are EVICTED via ProcessingTimeTimeout (default 24 h; ``0`` disables
    eviction and the store grows without bound — only for tests/bounded
    replays). Eviction emits nothing: the conversation's last emitted row
    already carries its final totals. Semantics caveat: a conversation
    that resumes AFTER eviction restarts its running counts from zero —
    its pre-eviction rows remain in the output, so a reader that wants
    lifetime totals must treat eviction-separated segments as distinct
    epochs (or set the timeout long relative to conversation lifetimes,
    which is why the default is a day)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_seconds * 1_000_000
    timeout_ms = int(idle_timeout_min * 60_000)
    out_schema = "conv_id string, n_turns long, n_sessions long"
    state_schema = "n_turns long, n_sessions long, last_ts long"

    def update(key, pdfs, state):
        import pandas as _pd

        if state.hasTimedOut:
            state.remove()
            yield _pd.DataFrame(
                {"conv_id": [], "n_turns": [], "n_sessions": []}
            )
            return
        total, sessions, last = (state.get if state.exists else (0, 0, None))
        rows = _pd.concat(list(pdfs))
        for t in sorted(int(x) for x in rows["ts_us"]):
            if last is None or t - last > gap_us:
                sessions += 1
            last = t
            total += 1
        state.update((total, sessions, last))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield _pd.DataFrame(
            {"conv_id": [key[0]], "n_turns": [total], "n_sessions": [sessions]}
        )

    keyed = stream.select(
        "conv_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    stats = keyed.groupBy("conv_id").applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.ProcessingTimeTimeout if timeout_ms > 0
        else GroupStateTimeout.NoTimeout,
    )
    writer = (
        stats.writeStream.foreachBatch(
            lambda b, _e: b.write.mode("append").parquet(output_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_rollup_partials(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Continuously maintained hierarchical rollup, streaming form: each
    micro-batch aggregates to minute-level mergeable partials
    (logops.time_rollup_partials) and commits them to an epoch-keyed
    partition — the same exactly-once overwrite-per-epoch protocol as
    route_batch, so crash replays replace rather than double-count.

    The stored table is append-only partials; ``read_rollup`` merges at
    read time (sum of counts + decimal sums is associative), then runs
    the standard cascade. This is the streaming realization of the
    incremental-maintenance property time_rollup_merge pins in batch:
    state per epoch is O(touched minute buckets), never a history scan."""
    from .functions.logops import time_rollup_partials

    def commit(batch: DataFrame, epoch_id: int) -> None:
        time_rollup_partials(batch).write.mode("overwrite").parquet(
            f"{output_dir}/epoch={epoch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Merge the streamed per-epoch minute partials and emit the full
    minute/hour/day/total hierarchy (identical to batch time_rollup over
    the union of all streamed rows)."""
    from pyspark.sql import functions as SF

    from .functions.logops import time_rollup

    merged = (
        spark.read.parquet(partials_dir)
        .groupBy("event_type", "bucket")
        .agg(SF.sum("n").alias("n"), SF.sum("s").cast("decimal(20,6)").alias("s"))
    )
    return time_rollup(minute_partials=merged)


def stream_cms_partials(
    stream: DataFrame,
    key_col: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Continuously maintained Count-Min sketch: each micro-batch builds
    its own ≤ depth×width counter partial (sketches.cms_build — the
    shuffle is O(sketch)) and commits it to an epoch-keyed partition with
    the same exactly-once overwrite-per-epoch protocol as route_batch /
    stream_rollup_partials. The stored table is append-only integer
    partials; ``read_cms`` folds them with cms_merge at read time —
    frequency estimates over an unbounded stream with O(1 KiB) state per
    epoch and no history re-scan."""
    from .functions.sketches import cms_build

    def commit(batch: DataFrame, epoch_id: int) -> None:
        cms_build(batch, key_col).write.mode("overwrite").parquet(
            f"{output_dir}/epoch={epoch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Fold the streamed per-epoch sketch partials into one counter
    table (identical to a batch cms_build over the union of all rows)."""
    from .functions.sketches import cms_merge

    return cms_merge(spark.read.parquet(partials_dir).select("row", "bucket", "cnt"))


def stream_drift_partials(
    stream: DataFrame,
    value_col: str,
    period_b_col: str,
    lo: float,
    hi: float,
    checkpoint_dir: str,
    output_dir: str,
    n_bins: int = 10,
    available_now: bool = False,
):
    """Continuously maintained distribution-drift monitor: each
    micro-batch bins its values (logops.drift_bin_counts — the mergeable
    half of histogram_drift) and commits the ≤ n_bins+2-row per-bin
    period counts to an epoch-keyed partition with the same exactly-once
    overwrite-per-epoch protocol as the other partial streams. State per
    epoch is O(n_bins) integers; ``read_drift`` merges by per-bin
    addition and finishes the integer ppm report — bit-identical to a
    batch histogram_drift over the union of all streamed rows.

    ``period_b_col`` names a column in the stream (foreachBatch closures
    must not capture unresolved Column objects from another plan)."""
    from pyspark.sql import functions as SF

    from .functions.logops import drift_bin_counts

    def commit(batch: DataFrame, epoch_id: int) -> None:
        drift_bin_counts(
            batch, value_col, SF.col(period_b_col), lo, hi, n_bins
        ).write.mode("overwrite").parquet(f"{output_dir}/epoch={epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_drift(
    spark: SparkSession, partials_dir: str, lo: float, hi: float, n_bins: int = 10
) -> DataFrame:
    """Merge the streamed per-epoch bin partials and emit the full
    integer drift report (identical to batch histogram_drift over the
    union of all streamed rows — drift_report's leading per-bin sum IS
    the merge)."""
    from .functions.logops import drift_report

    return drift_report(
        spark.read.parquet(partials_dir).select("bin", "n_a", "n_b"), lo, hi, n_bins
    )


def run_streaming_counts(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    available_now: bool = False,
):
    """Write the windowed counts to parquet in append mode (rows emitted
    once their window is past the watermark — finalized, exactly-once)."""
    counts = stream_windowed_counts(stream, window, watermark)
    writer = (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", output_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_grok_partials(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Streaming form of the north_star grok summary
    (functions/transcript.py): each micro-batch grok-parses its turns
    (codegen regexp, zero Python) and commits (tool, conv_id)-grain
    mergeable partials to an epoch-keyed partition — the exactly-once
    overwrite-per-epoch protocol of stream_rollup_partials. Keeping
    conv_id in the partial grain preserves EXACT distinct-conversation
    counts across epochs with no driver-side state; state per epoch is
    O(tools × touched conversations), never a history scan.
    ``read_grok_summary`` folds the partials to the batch answer."""
    from .functions import transcript

    def commit(batch: DataFrame, epoch_id: int) -> None:
        (
            transcript.parse_turns(batch)
            .groupBy("tool_called", "conv_id")
            .agg(
                F.count("*").alias("n_calls"),
                F.sum(F.when(F.col("status") != "OK", 1).otherwise(0)).alias("n_err"),
                F.sum(F.col("latency_ms").cast("long")).alias("latency_total_ms"),
                F.max("latency_ms").alias("latency_max_ms"),
            )
            .write.mode("overwrite")
            .parquet(f"{output_dir}/epoch={epoch_id}")
        )

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_grok_summary(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Fold the streamed grok partials into per-tool summaries —
    bit-identical to batch ``transcript.tool_summary`` over the union of
    all streamed rows (pinned by tests/test_streaming.py). Two-level
    fold: merge epochs at (tool, conv) grain first, so distinct-conv
    counts stay exact and the latency max is a max-of-max."""
    from .functions import transcript

    per_conv = (
        spark.read.parquet(partials_dir)
        .groupBy("tool_called", "conv_id")
        .agg(
            F.sum("n_calls").alias("n_calls"),
            F.sum("n_err").alias("n_err"),
            F.sum("latency_total_ms").alias("latency_total_ms"),
            F.max("latency_max_ms").alias("latency_max_ms"),
        )
    )
    return (
        per_conv.groupBy(F.col("tool_called").alias("tool"))
        .agg(
            F.sum("n_calls").alias("n_calls"),
            F.count(F.lit(1)).alias("n_convs"),  # rows are distinct convs
            F.sum("n_err").alias("n_err"),
            F.sum("latency_total_ms").alias("latency_total_ms"),
            F.max("latency_max_ms").alias("latency_max_ms"),
        )
        .withColumn("err_rate", transcript.err_rate_col())
    )


def stream_rate_spikes(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    history_dir: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    trailing: int = 8,
    factor: int = 3,
    min_history: int = 4,
    available_now: bool = False,
):
    """Streaming volume-spike detection per tool: watermarked tumbling-
    window counts (append mode — each bucket is emitted exactly once,
    when finalized) feed an incremental spike check against the
    persisted count history, applying the SAME integer-exact rule as the
    batch operator (functions/logops.spike_flags) — a bucket is a spike
    when count·n_prev > factor·sum_prev over the trailing observed
    buckets, given >= min_history of them.

    Exactly-once: both the verdicts and the history increments are
    written to the micro-batch's OWN epoch-keyed partition in overwrite
    mode (the route_batch convention) — crash-replay replaces the
    epoch's files instead of duplicating them. The history table grows
    by finalized buckets only, so each batch re-reads a compact count
    relation (buckets, not events); the per-batch spike_flags window
    recomputes trailing sums over history ∪ new and keeps verdicts for
    the new buckets only (left_semi on the batch's keys)."""
    from .functions import logops

    counts = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("tool"), F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "tool",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n_events",
        )
    )

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        s = batch.sparkSession
        batch = batch.persist()
        try:
            # first-epoch detection is an explicit existence check; any
            # OTHER read failure (corrupt file, permissions, partial
            # write) propagates and fails the micro-batch so the
            # checkpoint retries it — silently computing spike verdicts
            # with no history would be wrong-but-green (round-3 ADVICE).
            if not _fs_exists(s, history_dir):
                hist = None
            else:
                hist = s.read.parquet(history_dir)
                # crash-replay: this epoch's history increment may already
                # be on disk (crash after the history write, before the
                # checkpoint commit) — exclude it or the replayed verdict
                # would double-count the batch. epoch is the partition
                # column, so the filter is partition pruning, not a scan.
                if "epoch" in hist.columns:
                    hist = hist.filter(F.col("epoch") != epoch_id)
                hist = hist.select("tool", "bucket", "n_events")
            combined = (
                batch if hist is None else hist.unionByName(batch)
            )
            flags = logops.spike_flags(
                combined, "tool", window=trailing, factor=factor,
                min_history=min_history,
            )
            new_keys = batch.select("tool", "bucket")
            out = flags.join(new_keys, ["tool", "bucket"], "left_semi")
            out.write.mode("overwrite").parquet(f"{output_dir}/epoch={epoch_id}")
            batch.write.mode("overwrite").parquet(f"{history_dir}/epoch={epoch_id}")
        finally:
            batch.unpersist()

    writer = (
        counts.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_session_counts(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
    available_now: bool = False,
):
    """Native session windows over the transcript stream: per (conv_id,
    session) turn counts via ``F.session_window`` — Spark merges events
    closer than ``gap`` into one window and finalizes a session once the
    watermark passes its close (append mode), which is the streaming
    realization of the batch gap-sessionize (logops.sessionize_events).
    State is per open session, bounded by the watermark — no custom
    stateful code needed; this is the built-in the custom
    applyInPandasWithState op (stream_conv_stats) should NOT be used to
    reimplement."""
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            "conv_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_turns",
        )
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_retry_loops(
    parsed_stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    min_run: int = 2,
    available_now: bool = False,
):
    """Streaming twin of functions/transcript.retry_loops: a per-conversation
    state machine over the parsed call stream that tracks the CURRENT maximal
    run of consecutive same-tool failing calls across micro-batch boundaries
    (state = the open run), via applyInPandasWithState.

    Emission protocol (idempotent to reconcile at read time):
    - a run that CLOSES in this batch (an OK call or a different tool
      arrives) is emitted once with ``open = false`` iff run_len >= min_run;
    - a run still OPEN at batch end is emitted as a snapshot with
      ``open = true`` at ANY length (it may still grow next batch).
    :func:`read_retry_loops` folds snapshots by (conv_id, tool, first_turn)
    — run_len/last_turn are monotone per run, so max() reconciles open
    snapshots with the final closed row bit-exactly, and the min_run cut
    happens after the fold. test_streaming.py pins streaming == batch
    retry_loops with conversations split mid-run across micro-batches.

    Ordering contract (same as stream_conv_stats): rows are sorted by
    turn_idx WITHIN a batch; across batches the source must deliver a
    conversation's turns in nondecreasing turn order (true for append-only
    transcript logs). State is one open run per conversation — O(1) per key
    — and is REMOVED whenever a conversation has no open run, so the state
    store holds only conversations currently mid-run, not every key ever
    seen (bounded state on an unbounded conv_id space).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "conv_id string, tool string, run_len long, first_turn long, "
        "last_turn long, open boolean"
    )
    state_schema = "cur_tool string, cur_len long, first_turn long, last_turn long"
    need = int(min_run)

    def update(key, pdfs, state):
        import pandas as _pd

        cur_tool, cur_len, first, last = (
            state.get if state.exists else (None, 0, 0, 0)
        )
        out = {c: [] for c in
               ("conv_id", "tool", "run_len", "first_turn", "last_turn", "open")}

        def close():
            nonlocal cur_len
            if cur_len >= need:
                out["conv_id"].append(key[0])
                out["tool"].append(cur_tool)
                out["run_len"].append(cur_len)
                out["first_turn"].append(first)
                out["last_turn"].append(last)
                out["open"].append(False)
            cur_len = 0

        rows = _pd.concat(list(pdfs)).sort_values("turn_idx")
        for tool, status, turn in zip(
            rows["tool_called"], rows["status"], rows["turn_idx"]
        ):
            turn = int(turn)
            if status != "OK":
                if cur_len > 0 and tool == cur_tool:
                    cur_len += 1
                    last = turn
                else:
                    close()
                    cur_tool, cur_len, first, last = tool, 1, turn, turn
            elif cur_len > 0:
                close()
        if cur_len > 0:
            out["conv_id"].append(key[0])
            out["tool"].append(cur_tool)
            out["run_len"].append(cur_len)
            out["first_turn"].append(first)
            out["last_turn"].append(last)
            out["open"].append(True)
            state.update((cur_tool, cur_len, first, last))
        elif state.exists:
            # no open run → drop the key's state entirely; keeping a
            # (None,0,0,0) tombstone per conversation ever seen would grow
            # the state store without bound on an unbounded conv_id space
            # (ADVICE r3). state.get's (None,0,0,0) default on a missing
            # key reproduces the tombstone's semantics exactly.
            state.remove()
        yield _pd.DataFrame(out)

    keyed = parsed_stream.select("conv_id", "turn_idx", "tool_called", "status")
    runs = keyed.groupBy("conv_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    writer = (
        runs.writeStream.foreachBatch(
            lambda b, _e: b.write.mode("append").parquet(output_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_retry_loops(
    spark: SparkSession, output_dir: str, min_run: int = 2
) -> DataFrame:
    """Fold stream_retry_loops emissions into current run rows, schema- and
    value-compatible with the batch op (conv_id, tool, run_len, first_turn,
    last_turn). One shuffle on the (conv, tool, first_turn) run key."""
    return (
        spark.read.parquet(output_dir)
        .groupBy("conv_id", "tool", "first_turn")
        .agg(
            F.max("run_len").alias("run_len"),
            F.max("last_turn").alias("last_turn"),
        )
        .filter(F.col("run_len") >= min_run)
        .select("conv_id", "tool", "run_len", "first_turn", "last_turn")
    )


def stream_degenerate_runs(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    min_run: int = 3,
    idle_timeout_min: int = 60,
    available_now: bool = False,
):
    """Streaming twin of functions/convops.degenerate_runs: a
    per-conversation state machine tracking the CURRENT run of
    consecutive byte-identical turns across micro-batch boundaries
    (state = the open run's fingerprint + span), via
    applyInPandasWithState. Fingerprints are computed JVM-side (F.md5)
    before the stateful op — the Python boundary carries 32-char
    digests, never turn text.

    Emission protocol (read_degenerate_runs reconciles):
    - a run that CLOSES in this batch (a different text arrives) is
      emitted once with ``open = false`` iff run_len >= min_run;
    - a run still OPEN at batch end is emitted as an ``open = true``
      snapshot iff it has ALREADY reached min_run (unlike
      stream_retry_loops' any-length snapshots: here EVERY conversation
      always has an open run — its latest turn — so any-length
      snapshots would emit one row per conversation per batch; the
      >= min_run gate keeps output proportional to loops found, and the
      fold stays exact because a cross-batch run is re-snapshotted with
      its full span in whichever batch it reaches the gate).
    Folding by (conv_id, text_fp, start_turn) with max(run_len/end_turn)
    reconciles snapshots with the final closed row bit-exactly.

    Ordering contract as stream_retry_loops: rows sorted by turn_idx
    within a batch; the source delivers a conversation's turns in
    nondecreasing turn order across batches.

    State is one open run per conversation — O(1) per key — but unlike
    retry loops there is no "no open run" point at which state can be
    dropped, so idle conversations are expired via
    ProcessingTimeTimeout after ``idle_timeout_min`` minutes with no new
    turns (the bounded-state answer on an unbounded conv_id space; a
    conversation resuming AFTER expiry starts a fresh run, so set the
    timeout long relative to conversation lifetimes — an expired-then-
    resumed identical run would surface as two shorter runs where batch
    mode sees one). Timeout expiry emits nothing: any >= min_run open
    run was already snapshotted at the batch end that reached the gate.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "conv_id string, text_fp string, start_turn long, end_turn long, "
        "run_len long, open boolean"
    )
    state_schema = "cur_fp string, cur_len long, first_turn long, last_turn long"
    need = int(min_run)
    timeout_ms = int(idle_timeout_min) * 60 * 1000

    def update(key, pdfs, state):
        import pandas as _pd

        cols = ("conv_id", "text_fp", "start_turn", "end_turn", "run_len", "open")
        out = {c: [] for c in cols}
        if state.hasTimedOut:
            state.remove()
            yield _pd.DataFrame(out)
            return
        cur_fp, cur_len, first, last = (
            state.get if state.exists else (None, 0, 0, 0)
        )

        def emit(is_open):
            out["conv_id"].append(key[0])
            out["text_fp"].append(cur_fp)
            out["start_turn"].append(first)
            out["end_turn"].append(last)
            out["run_len"].append(cur_len)
            out["open"].append(is_open)

        rows = _pd.concat(list(pdfs)).sort_values("turn_idx")
        for fp, turn in zip(rows["text_fp"], rows["turn_idx"]):
            turn = int(turn)
            if cur_len > 0 and fp == cur_fp:
                cur_len += 1
                last = turn
            else:
                if cur_len >= need:
                    emit(False)
                cur_fp, cur_len, first, last = fp, 1, turn, turn
        if cur_len > 0:
            if cur_len >= need:
                emit(True)
            state.update((cur_fp, cur_len, first, last))
            state.setTimeoutDuration(timeout_ms)
        elif state.exists:
            state.remove()
        yield _pd.DataFrame(out)

    keyed = stream.select(
        "conv_id", "turn_idx", F.md5("text").alias("text_fp")
    )
    runs = keyed.groupBy("conv_id").applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
    writer = (
        runs.writeStream.foreachBatch(
            lambda b, _e: b.write.mode("append").parquet(output_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_degenerate_runs(
    spark: SparkSession, output_dir: str, min_run: int = 3
) -> DataFrame:
    """Fold stream_degenerate_runs emissions into current run rows,
    schema- and value-compatible with the batch op (conv_id, text_fp,
    start_turn, end_turn, run_len). One shuffle on the run key."""
    return (
        spark.read.parquet(output_dir)
        .groupBy("conv_id", "text_fp", "start_turn")
        .agg(
            F.max("end_turn").alias("end_turn"),
            F.max("run_len").alias("run_len"),
        )
        .filter(F.col("run_len") >= min_run)
        .select("conv_id", "text_fp", "start_turn", "end_turn", "run_len")
    )


def stream_incremental_dedup(
    stream: DataFrame,
    index_dir: str,
    dups_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 16,
    rows_per_band: int = 2,
    n: int = 3,
    threshold: float = 0.25,
    available_now: bool = False,
):
    """Continuous conversation-grain near-dup detection: each micro-batch
    reassembles its conversations (conv_reconstruct), MinHash-signs them,
    LSH-matches them against the persisted signature index AND within the
    batch (functions/dedup.incremental_dedup), writes the matches and
    appends the batch's signatures — both epoch-keyed with the
    overwrite-per-epoch exactly-once protocol of stream_grok_partials
    (a replayed epoch rewrites its own partitions bit-identically; the
    index read excludes the current epoch so a replay never matches a
    batch against its own half-written signatures).

    Corpus text is never re-read: the index carries fixed-width
    signatures only (~H·32 bytes/conversation), so each epoch costs one
    scan of the NEW turns plus band joins against the index — the shape
    that lets a 10^12-turn corpus dedup its daily increment without
    touching history. Conversations are assumed batch-complete (route
    upstream micro-batches by conversation, or use session-window
    assembly, before this operator). Index discovery goes through the
    Hadoop FileSystem API (_fs_has_epoch_partitions), not driver-local
    os.path, so the index is found on HDFS/S3 exactly as on local disk."""
    from .functions import convops, dedup

    def commit(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():  # idle trigger: no junk epoch partitions
            return
        spark = batch.sparkSession
        conv = convops.conv_reconstruct(batch).select("conv_id", "transcript")
        # cache=False: the inner shingle-set persist is never released and
        # each micro-batch has a fresh plan, so the long-lived stream
        # would leak one cache entry per epoch; the one reuse it would
        # buy is covered by persisting new_sig (released in finally)
        new_sig = dedup.signature_index(
            conv, id_col="conv_id", text_col="transcript",
            num_hashes=num_hashes, n=n, cache=False,
        ).persist()
        try:
            if _fs_has_epoch_partitions(spark, index_dir):
                index = (
                    spark.read.option("basePath", index_dir)
                    .parquet(index_dir)
                    .filter(F.col("epoch") != epoch_id)
                    .drop("epoch")
                )
            else:
                index = new_sig.limit(0)
            matches = dedup.incremental_dedup(
                None,
                index,
                id_col="conv_id",
                num_hashes=num_hashes,
                rows_per_band=rows_per_band,
                threshold=threshold,
                new_sig=new_sig,
            )
            matches.write.mode("overwrite").parquet(f"{dups_dir}/epoch={epoch_id}")
            new_sig.write.mode("overwrite").parquet(f"{index_dir}/epoch={epoch_id}")
        finally:
            new_sig.unpersist()

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hdr_partials(
    stream: DataFrame,
    value_col: str,
    group_col: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Continuously maintained quantile sketch: each micro-batch builds
    its own per-group log-bucket histogram (sketches.hdr_histogram — the
    shuffle is O(sketch)) and commits it to an epoch-keyed partition
    under the same exactly-once overwrite-per-epoch protocol as
    stream_cms_partials. ``read_hdr`` folds the partials by integer sum
    at read time, so latency percentile estimates over an unbounded
    transcript stream cost O(groups × log-range) state per epoch and
    never re-scan history."""
    from .functions.sketches import hdr_histogram

    def commit(batch: DataFrame, epoch_id: int) -> None:
        hdr_histogram(batch, value_col, group_col).write.mode(
            "overwrite"
        ).parquet(f"{output_dir}/epoch={epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hdr(spark: SparkSession, partials_dir: str, group_col: str) -> DataFrame:
    """Fold the streamed per-epoch histogram partials into one sketch
    (identical to a batch hdr_histogram over the union of all rows)."""
    from .functions.sketches import hdr_merge

    return hdr_merge(
        spark.read.parquet(partials_dir).select(group_col, "bucket", "cnt")
    )


def stream_datacard_partials(
    stream: DataFrame,
    checkpoint_dir: str,
    output_dir: str,
    available_now: bool = False,
):
    """Continuously maintained corpus data card: each micro-batch
    aggregates its documents to the (source, lang) integer partial sums
    (textstats.datacard_partials — the mergeable half of
    corpus_datacard) and commits the sources×langs-row relation to an
    epoch-keyed partition under the same exactly-once
    overwrite-per-epoch protocol as the other partial streams. State
    per epoch is O(sources×langs); ``read_datacard`` merges by per-key
    addition and finishes the card — bit-identical to a batch
    corpus_datacard over the union of all streamed rows (pure integer
    sums commute)."""
    from .functions.textstats import datacard_partials

    def commit(batch: DataFrame, epoch_id: int) -> None:
        datacard_partials(batch).write.mode("overwrite").parquet(
            f"{output_dir}/epoch={epoch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_datacard(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Merge the streamed per-epoch (source, lang) partials by integer
    addition and emit the full per-source data card."""
    from pyspark.sql import functions as SF

    from .functions.textstats import datacard_finish

    merged = (
        spark.read.parquet(partials_dir)
        .groupBy("grp", "lng")
        .agg(
            SF.sum("n_docs").alias("n_docs"),
            SF.sum("n_chars").alias("n_chars"),
            SF.sum("n_toks").alias("n_toks"),
        )
    )
    return datacard_finish(merged)


def stream_pr_partials(
    stream: DataFrame,
    score_col: str,
    label_col: str,
    checkpoint_dir: str,
    output_dir: str,
    available_now: bool = False,
):
    """Continuously maintained precision/recall curve: each micro-batch
    aggregates to the per-distinct-score (pos, neg) integer counts
    (classify.pr_partials — the mergeable half of pr_curve) and commits
    the distinct-scores-row relation under the epoch-keyed exactly-once
    overwrite protocol. ``read_pr_curve`` merges by per-key addition
    and runs the cumulative windows — bit-identical to a batch pr_curve
    over the union of all streamed rows (pure integer sums commute).
    State per epoch is O(distinct scores) — quantize continuous scores
    upstream, same contract as the batch op."""
    from .functions.classify import pr_partials

    def commit(batch: DataFrame, epoch_id: int) -> None:
        pr_partials(batch, score_col, label_col).write.mode(
            "overwrite"
        ).parquet(f"{output_dir}/epoch={epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_pr_curve(
    spark: SparkSession, partials_dir: str, scale: int = 1_000_000
) -> DataFrame:
    """Merge the streamed per-epoch (threshold, pos, neg) partials by
    integer addition and emit the full precision/recall curve."""
    from pyspark.sql import functions as SF

    from .functions.classify import pr_finish

    merged = (
        spark.read.parquet(partials_dir)
        .groupBy("threshold")
        .agg(SF.sum("_pos").alias("_pos"), SF.sum("_neg").alias("_neg"))
    )
    return pr_finish(merged, scale)


def stream_slo_partials(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    slo_ms: int = 800,
    available_now: bool = False,
):
    """Continuously maintained SLO error-budget burn: each micro-batch
    grok-parses its transcript turns and aggregates them to the
    (tool, hour) call/breach integer partials (transcript.slo_burn minus
    the final ratio), committed to an epoch-keyed partition under the
    same exactly-once overwrite-per-epoch protocol as the other partial
    streams. State per epoch is O(tools × hours-in-batch);
    ``read_slo_burn`` merges by integer addition and re-derives burn_ppm
    — bit-identical to a batch slo_burn over the union of all streamed
    turns (counts commute; the ratio is computed once, after the merge)."""
    from .functions.transcript import parse_turns, slo_burn

    def commit(batch: DataFrame, epoch_id: int) -> None:
        slo_burn(parse_turns(batch), slo_ms).drop("burn_ppm").write.mode(
            "overwrite"
        ).parquet(f"{output_dir}/epoch={epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_slo_burn(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Merge the streamed per-epoch (tool, hour) partials by integer
    addition and emit the full burn report (transcript.slo_burn shape)."""
    return (
        spark.read.parquet(partials_dir)
        .groupBy("tool", "hour_epoch")
        .agg(
            F.sum("n_calls").alias("n_calls"),
            F.sum("n_breach").alias("n_breach"),
        )
        .select(
            "tool", "hour_epoch", "n_calls", "n_breach",
            F.expr("(n_breach * 1000000) div n_calls").alias("burn_ppm"),
        )
    )


def stream_label_partials(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    label_col: str = "label",
    available_now: bool = False,
):
    """Continuously maintained class-balance datacard: each micro-batch
    aggregates its labeled rows to (label, cnt) integer partials —
    similarity.label_balance minus the final share arithmetic — committed
    to an epoch-keyed partition under the same exactly-once
    overwrite-per-epoch protocol as the other partial streams. State per
    epoch is O(labels); ``read_label_balance`` merges by integer
    addition and re-derives the shares through the SAME code path as the
    batch operator, so stream == batch bit-for-bit (counts commute; the
    DECIMAL(38,0) ratio is computed once, after the merge)."""

    def commit(batch: DataFrame, epoch_id: int) -> None:
        batch.groupBy(label_col).agg(
            F.count(F.lit(1)).alias("cnt")
        ).write.mode("overwrite").parquet(f"{output_dir}/epoch={epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_label_balance(
    spark: SparkSession,
    partials_dir: str,
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Merge the streamed per-epoch (label, cnt) partials by integer
    addition and emit the full class-balance report (shape and
    arithmetic of similarity.label_balance — same shared tail)."""
    from .functions.similarity import _balance_from_counts

    by = (
        spark.read.parquet(partials_dir)
        .groupBy(label_col)
        .agg(F.sum("cnt").alias("cnt"))
    )
    return _balance_from_counts(by, label_col, scale)

def stream_debounce(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    window_s: int = 60,
    idle_timeout_min: float = 60,
    available_now: bool = False,
):
    """KEPT-ANCHORED debounce as a stateful stream: an event is kept iff
    it is ≥ ``window_s`` seconds after the last KEPT event of the same
    (user, event_type) — the true throttle semantics a billing/alerting
    ingest wants, which the batch screen
    (functions/logops.debounce_events) deliberately approximates with
    the immediate-predecessor gap because the kept-anchored chain is a
    SEQUENTIAL fold (each verdict depends on the previous verdict, not
    just the previous row) and belongs exactly here, in
    applyInPandasWithState.

    Every event is emitted once, annotated ``kept`` — the op is a
    row-grain annotator, so downstream sinks filter kept (billing) or
    ¬kept (abuse forensics). State is ONE long per live (user, type)
    key — the last kept second — and idle keys are expired via
    ProcessingTimeTimeout after ``idle_timeout_min`` minutes (the
    bounded-state contract of stream_degenerate_runs; a user resuming
    after expiry has their first event kept, so set the timeout ≫
    window_s — with the default 60 min vs 60 s the approximation only
    affects a user silent for an hour, whose next event a fresh fold
    would keep anyway; ``0`` disables eviction, tests/bounded replays
    only). Timeout expiry emits nothing.

    Ordering contract as the other stateful ops: rows are sorted by
    (sec, event_id) within a batch; the source delivers a key's events
    in nondecreasing time order across batches."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if window_s < 1:
        raise ValueError(f"window_s must be >= 1, got {window_s}")
    out_schema = (
        "user_id long, event_type string, event_id long, sec long, "
        "kept boolean"
    )
    state_schema = "last_kept long"
    win = int(window_s)
    timeout_ms = int(idle_timeout_min * 60_000)

    def update(key, pdfs, state):
        import pandas as _pd

        cols = ("user_id", "event_type", "event_id", "sec", "kept")
        out = {c: [] for c in cols}
        if state.hasTimedOut:
            state.remove()
            yield _pd.DataFrame(out)
            return
        (last_kept,) = state.get if state.exists else (None,)
        rows = _pd.concat(list(pdfs)).sort_values(["sec", "event_id"])
        for eid, sec in zip(rows["event_id"], rows["sec"]):
            sec = int(sec)
            kept = last_kept is None or sec - last_kept >= win
            if kept:
                last_kept = sec
            out["user_id"].append(key[0])
            out["event_type"].append(key[1])
            out["event_id"].append(int(eid))
            out["sec"].append(sec)
            out["kept"].append(kept)
        state.update((int(last_kept),))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield _pd.DataFrame(out)

    keyed = stream.select(
        "user_id", "event_type", "event_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000").alias("sec"),
    )
    annotated = keyed.groupBy("user_id", "event_type").applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.ProcessingTimeTimeout if timeout_ms > 0
        else GroupStateTimeout.NoTimeout,
    )
    writer = (
        annotated.writeStream.foreachBatch(
            lambda b, _e: b.write.mode("append").parquet(output_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_debounced(spark: SparkSession, output_dir: str) -> DataFrame:
    """Fold stream_debounce emissions: every event exactly once with its
    kept verdict (events are emitted in exactly one batch, so this is a
    plain read — no reconciling aggregate needed)."""
    return spark.read.parquet(output_dir).select(
        "user_id", "event_type", "event_id", "sec", "kept"
    )

def stream_seasonal_partials(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Continuously maintained seasonal-anomaly baseline: each
    micro-batch aggregates its events to (event_type, day, hod) hourly
    count cells (logops.seasonal_cells — the mergeable integer partial
    under seasonal_spikes) committed to an epoch-keyed partition under
    the same exactly-once overwrite-per-epoch protocol as the other
    partial streams. ``read_seasonal_spikes`` merges by integer addition
    and re-derives the spike report through the SAME shared tail
    (logops.spikes_from_cells) — bit-identical to a batch
    seasonal_spikes over the union of all streamed events (counts
    commute; the baseline and ratio are computed once, after the
    merge)."""
    from .functions.logops import seasonal_cells

    def commit(batch: DataFrame, epoch_id: int) -> None:
        seasonal_cells(batch).write.mode("overwrite").parquet(
            f"{output_dir}/epoch={epoch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_seasonal_spikes(
    spark: SparkSession,
    partials_dir: str,
    min_ratio_ppm: int = 2_000_000,
    min_base_events: int = 8,
) -> DataFrame:
    """Merge the streamed per-epoch (type, day, hod) cells by integer
    addition and emit the full spike report (logops.seasonal_spikes
    shape) through the shared baseline/ratio tail."""
    from .functions.logops import spikes_from_cells

    merged = (
        spark.read.parquet(partials_dir)
        .groupBy("event_type", "day", "hod")
        .agg(F.sum("n").alias("n"))
    )
    return spikes_from_cells(merged, min_ratio_ppm, min_base_events)
