"""Structured Streaming pipeline: routed sinks + watermarked counts.

Drives the stream with availableNow triggers over a bounded directory —
results must equal the batch pipeline's on the same input, plus resume
semantics across a second start (checkpoint replay, no duplicates).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anendektos_spark import streaming
from anendektos_spark.fixtures import fixture_transcripts
from anendektos_spark.schemas import KNOWN_TOOLS

GOLDEN_COUNTS = {"conn": 6, "dns": 4, "http": 3, "files": 4, "ssl": 4, "x509": 3}


@pytest.fixture()
def input_dir(spark, tmp_path):
    d = str(tmp_path / "in")
    fixture_transcripts(spark).write.parquet(d)
    return d


def test_stream_route_matches_batch(spark, tmp_path, input_dir):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = streaming.stream_route_sinks(
        streaming.stream_transcripts(spark, input_dir), out, ckpt, available_now=True
    )
    q.awaitTermination(120)
    for tool, n in GOLDEN_COUNTS.items():
        got = spark.read.parquet(f"{out}/sink_{tool}")
        assert got.count() == n, tool
        assert got.filter(F.col("tool") != tool).count() == 0
    rejects = spark.read.parquet(f"{out}/rejects")
    assert rejects.filter(F.col("reject_reason") == "unimplemented_tool").count() == 2

    # restart on the same checkpoint: nothing new to process, no dupes
    q2 = streaming.stream_route_sinks(
        streaming.stream_transcripts(spark, input_dir), out, ckpt, available_now=True
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/sink_conn").count() == GOLDEN_COUNTS["conn"]


def test_stream_incremental_new_files(spark, tmp_path, input_dir):
    """New files appearing after the first drain are processed exactly once."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run = lambda: streaming.stream_route_sinks(  # noqa: E731
        streaming.stream_transcripts(spark, input_dir), out, ckpt, available_now=True
    ).awaitTermination(120)
    run()
    fixture_transcripts(spark).filter(F.col("tool") == "conn").withColumn(
        "conv_id", F.concat_ws("#", "conv_id", F.lit("r2"))
    ).write.mode("append").parquet(input_dir)
    run()
    assert spark.read.parquet(f"{out}/sink_conn").count() == 2 * GOLDEN_COUNTS["conn"]
    assert spark.read.parquet(f"{out}/sink_dns").count() == GOLDEN_COUNTS["dns"]


def test_route_batch_replay_is_idempotent(spark, tmp_path):
    """A crashed-then-replayed epoch (foreachBatch is at-least-once per
    epoch) must not duplicate rows: the epoch-keyed overwrite replaces its
    own files. Replaying the SAME batch under the same epoch_id twice ==
    writing it once."""
    out = str(tmp_path / "out")
    batch = fixture_transcripts(spark)
    streaming.route_batch(batch, out, epoch_id=0)
    streaming.route_batch(batch, out, epoch_id=0)  # simulated replay
    for tool, n in GOLDEN_COUNTS.items():
        assert spark.read.parquet(f"{out}/sink_{tool}").count() == n, tool
    rejects = spark.read.parquet(f"{out}/rejects")
    assert rejects.count() == 2  # the two unknown-tool rows, once
    # a genuinely new epoch appends
    streaming.route_batch(batch.filter(F.col("tool") == "conn"), out, epoch_id=1)
    assert spark.read.parquet(f"{out}/sink_conn").count() == 2 * GOLDEN_COUNTS["conn"]


def test_route_batch_without_epoch_accumulates(spark, tmp_path):
    """Ad-hoc batch use (no epoch_id) keeps legacy append semantics —
    but only behind an explicit require_epoch=False opt-in; the strict
    default refuses rather than silently double-writing on replay."""
    import pytest as _pt

    out = str(tmp_path / "out")
    conn = fixture_transcripts(spark).filter(F.col("tool") == "conn")
    with _pt.raises(ValueError, match="at-least-once"):
        streaming.route_batch(conn, out)
    streaming.route_batch(conn, out, require_epoch=False)
    streaming.route_batch(conn, out, require_epoch=False)
    assert spark.read.parquet(f"{out}/sink_conn").count() == 2 * GOLDEN_COUNTS["conn"]


def test_stream_windowed_counts(spark, tmp_path, input_dir):
    """Append-mode windowed counts emit once the watermark passes a
    window. The first drain emits nothing (the watermark only advances
    on the NEXT batch); a later-timestamped second batch pushes the
    watermark past every fixture window, finalizing them all — the
    late-data-drop contract made visible."""
    out, ckpt = str(tmp_path / "wc"), str(tmp_path / "wckpt")
    drain = lambda: streaming.run_streaming_counts(  # noqa: E731
        streaming.stream_transcripts(spark, input_dir), out, ckpt,
        window="1 minute", watermark="0 seconds", available_now=True,
    ).awaitTermination(120)
    drain()

    # watermark-advancing row, one hour after every fixture timestamp
    fixture_transcripts(spark).filter(F.col("tool") == "conn").limit(1).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")
    ).write.mode("append").parquet(input_dir)
    drain()

    got = spark.read.parquet(out)
    totals = {r.tool: r.total for r in got.groupBy("tool").agg(
        F.sum("n").alias("total")).collect()}
    for tool, n in GOLDEN_COUNTS.items():
        assert totals.get(tool, 0) == n, (tool, totals)


def test_stateful_conv_stats_survives_restart(spark, tmp_path, input_dir):
    """applyInPandasWithState: running per-conversation counts persist in
    the state store across a stop/start (second drain resumes from the
    checkpointed state, not from zero)."""
    out, ckpt = str(tmp_path / "cs"), str(tmp_path / "csck")
    drain = lambda: streaming.stream_conv_stats(  # noqa: E731
        streaming.stream_transcripts(spark, input_dir), out, ckpt,
        gap_seconds=1800, available_now=True,
    ).awaitTermination(120)
    drain()
    fx = fixture_transcripts(spark)
    expected1 = {r.conv_id: r.n for r in fx.groupBy("conv_id").agg(
        F.count("*").alias("n")).collect()}
    first = {r.conv_id: r.n_turns for r in spark.read.parquet(out).collect()}
    assert first == expected1

    # append the conn rows again → those conversations accumulate state
    conn = fx.filter(F.col("tool") == "conn")
    conn.write.mode("append").parquet(input_dir)
    extra = {r.conv_id: r.n for r in conn.groupBy("conv_id").agg(
        F.count("*").alias("n")).collect()}
    drain()
    latest = (
        spark.read.parquet(out)
        .groupBy("conv_id").agg(F.max("n_turns").alias("n_turns"))
        .collect()
    )
    got = {r.conv_id: r.n_turns for r in latest}
    for conv, n in expected1.items():
        assert got[conv] == n + extra.get(conv, 0), conv


def test_stream_dedup_drops_redelivered_rows(spark, tmp_path, input_dir):
    """The same fixture file content appended twice → second drain's
    duplicates are suppressed by dropDuplicatesWithinWatermark state."""
    out, ckpt = str(tmp_path / "dd"), str(tmp_path / "ddck")
    drain = lambda: streaming.stream_dedup(  # noqa: E731
        streaming.stream_transcripts(spark, input_dir), out, ckpt,
        watermark="1 hour", available_now=True,
    ).awaitTermination(120)
    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 == 26  # 24 fixture turns + 2 unknown-tool rows

    # redeliver the identical rows as new files (at-least-once source)
    fixture_transcripts(spark).write.mode("append").parquet(input_dir)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 26  # no duplicates emitted
    assert got.select("conv_id", "turn_idx").distinct().count() == 26


def test_stream_rollup_partials_match_batch_rollup(spark, tmp_path):
    from anendektos_spark.functions import logops

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "ts", "value"
    )
    d = str(tmp_path / "evin")
    # two writes -> several files; maxFilesPerTrigger=1 forces multiple
    # micro-batches so the read-side merge actually merges across epochs
    ev.filter(F.dayofmonth("ts") <= 15).write.parquet(d)
    ev.filter(F.dayofmonth("ts") > 15).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema("event_type string, ts timestamp_ntz, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out, ckpt = str(tmp_path / "roll"), str(tmp_path / "ck")
    q = streaming.stream_rollup_partials(stream, out, ckpt, available_now=True)
    q.awaitTermination(120)
    assert len(spark.read.parquet(out).inputFiles()) >= 2  # multiple epochs

    key = lambda r: (r.level, r.event_type, r.bucket)  # noqa: E731
    got = {key(r): (r.n_events, r.sum_value)
           for r in streaming.read_rollup(spark, out).collect()}
    want = {key(r): (r.n_events, r.sum_value)
            for r in logops.time_rollup(ev).collect()}
    assert got == want  # streamed partials merge to the exact batch answer


def test_stream_rate_spikes_incremental_matches_batch(spark, tmp_path):
    """Drive the streaming spike detector through MULTIPLE micro-batches
    (maxFilesPerTrigger=1) so the spike hour is judged against history
    persisted by EARLIER epochs, then check every emitted verdict equals
    the batch rule (logops.spike_flags) on the same counts."""
    import datetime as dt
    import time as _time

    from anendektos_spark.functions import logops

    ind = str(tmp_path / "in")
    out, ck, hist = (str(tmp_path / p) for p in ("spikes", "ckpt", "hist"))

    def write(rows):
        spark.createDataFrame(rows, "tool string, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(ind)
        _time.sleep(0.05)  # distinct mtimes -> deterministic file order

    T = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    quiet = [("conn", T(h, m)) for h in range(6) for m in (0, 1)]
    spike = [("conn", T(6, m)) for m in range(10)]
    write(quiet)          # batch 1: hours 0-5, 2 events each
    write(spike)          # batch 2: hour 6, 10 events
    write([("conn", T(9, 0))])   # watermark pushers: flush hours 5, 6
    write([("conn", T(10, 0))])

    stream = (
        spark.readStream.schema("tool string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(ind)
    )
    q = streaming.stream_rate_spikes(
        stream, out, ck, hist, window="1 hour", watermark="0 seconds",
        trailing=8, factor=3, min_history=4, available_now=True,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    rows = {r.bucket: r for r in got.collect()}
    # hours 0-6 and 9 finalized (hour 9's window end == final watermark;
    # hour 10 still pending at shutdown)
    assert set(rows) == {f"2024-01-01 0{h}:00:00" for h in range(7)} | {
        "2024-01-01 09:00:00"
    }
    sp = rows["2024-01-01 06:00:00"]
    assert sp.is_spike and sp.n_prev == 6 and sp.sum_prev == 12
    assert sp.ratio_x10k == (10 * 6 * 10000) // 12
    assert not any(r.is_spike for b, r in rows.items() if b != sp.bucket)
    # incrementality: verdicts were produced across multiple epochs
    assert got.select("epoch").distinct().count() >= 2

    # every emitted verdict == the batch rule on the full count relation
    all_rows = quiet + spike + [("conn", T(9, 0)), ("conn", T(10, 0))]
    counts = (
        spark.createDataFrame(all_rows, "tool string, ts timestamp")
        .groupBy(
            "tool",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    batch_rows = {
        r.bucket: r
        for r in logops.spike_flags(counts, "tool", window=8, factor=3,
                                    min_history=4).collect()
        if r.bucket in rows
    }
    for b, r in rows.items():
        e = batch_rows[b]
        assert (r.n_events, r.sum_prev, r.n_prev, r.is_spike, r.ratio_x10k) == (
            e.n_events, e.sum_prev, e.n_prev, e.is_spike, e.ratio_x10k), b


def test_stream_turn_pairs_joins_across_epochs(spark, tmp_path):
    """Stream-stream self-join: with each role written to its OWN file
    and maxFilesPerTrigger=1, every request/response pair straddles
    micro-batches — matches must come from the join state store, and the
    full result must equal the static-relation join."""
    from anendektos_spark import streaming
    from anendektos_spark.functions import convops

    conv = convops.synth_conv(spark, 400)
    d = str(tmp_path / "in")
    conv.filter(F.col("role") == "user").coalesce(1).write.mode("append").parquet(d)
    conv.filter(F.col("role") == "assistant").coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(conv.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        streaming.stream_turn_pairs(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.conv_id, r.turn_idx): (r.tool, r.wait_s)
        for r in spark.read.parquet(out).collect()
    }
    u = conv.filter(F.col("role") == "user").select(
        F.col("conv_id").alias("c"),
        F.col("turn_idx").alias("t"),
        F.col("ts").alias("req_ts"),
    )
    a = conv.filter(F.col("role") == "assistant").select(
        "conv_id", "turn_idx", "tool", F.col("ts").alias("resp_ts")
    )
    exp_rows = a.join(
        u,
        (F.col("conv_id") == F.col("c"))
        & (F.col("turn_idx") == F.col("t") + 1)
        & (F.col("resp_ts") >= F.col("req_ts"))
        & (F.col("resp_ts") <= F.col("req_ts") + F.expr("INTERVAL 5 minutes")),
    ).select(
        "conv_id", "turn_idx", "tool",
        (F.unix_seconds("resp_ts") - F.unix_seconds("req_ts")).alias("wait_s"),
    ).collect()
    exp = {(r.conv_id, r.turn_idx): (r.tool, r.wait_s) for r in exp_rows}
    assert len(exp) > 100  # the fixture really produces pairs
    assert got == exp


def test_stream_cms_partials_match_batch_sketch(spark, tmp_path):
    """Multi-epoch CMS maintenance: the merged streamed partials must
    equal the batch sketch over the same rows, and estimates from the
    streamed sketch must match batch estimates."""
    from anendektos_spark import streaming
    from anendektos_spark.functions import sketches

    df = spark.range(600).select((F.col("id") % 53).cast("string").alias("k"))
    d = str(tmp_path / "in")
    # several files -> several epochs with maxFilesPerTrigger=1
    df.filter(F.col("k").cast("int") < 20).coalesce(1).write.mode("append").parquet(d)
    df.filter(F.col("k").cast("int") >= 20).coalesce(1).write.mode("append").parquet(d)
    stream = spark.readStream.schema("k string").option("maxFilesPerTrigger", 1).parquet(d)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = streaming.stream_cms_partials(stream, "k", out, ckpt, available_now=True)
    q.awaitTermination(180)
    assert len(list(__import__("pathlib").Path(out).glob("epoch=*"))) >= 2
    streamed = {
        (r.row, r.bucket): r.cnt for r in streaming.read_cms(spark, out).collect()
    }
    batch = {(r.row, r.bucket): r.cnt for r in sketches.cms_build(df, "k").collect()}
    assert streamed == batch
    est_s = {
        r.k: r.cms_count
        for r in sketches.cms_estimate(
            streaming.read_cms(spark, out), df.select("k").distinct(), "k"
        ).collect()
    }
    exact = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert all(est_s[k] >= n for k, n in exact.items())


def test_stream_session_counts(spark, tmp_path):
    """Native session windows: turns closer than the gap merge into one
    session per conv; a quiet period opens a new one. Sessions finalize
    (append mode) once the watermark passes their close — driven by a
    late watermark-advancing row, same protocol as the windowed test."""
    in_dir = str(tmp_path / "sess_in")
    out, ckpt = str(tmp_path / "sess_out"), str(tmp_path / "sess_ckpt")
    base = "2024-01-01 10:{m:02d}:00"
    rows = [
        # convA: turns at 10:00/10:01/10:02 (one session), then 10:30 (new)
        ("convA", 0, "user", "t", None, base.format(m=0)),
        ("convA", 1, "assistant", "t", "conn", base.format(m=1)),
        ("convA", 2, "user", "t", None, base.format(m=2)),
        ("convA", 3, "user", "t", None, base.format(m=30)),
        # convB: single turn
        ("convB", 0, "user", "t", None, base.format(m=5)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_s string"
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.col("ts_s").cast("timestamp").alias("ts"),
    )
    df.write.mode("overwrite").parquet(in_dir)

    drain = lambda: streaming.stream_session_counts(  # noqa: E731
        streaming.stream_transcripts(spark, in_dir), out, ckpt,
        gap="10 minutes", watermark="0 seconds", available_now=True,
    ).awaitTermination(120)
    drain()
    # advance the watermark far past every session close
    df.limit(1).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 HOURS")).write.mode(
        "append"
    ).parquet(in_dir)
    drain()

    got = {
        (r.conv_id, r.session_start): r.n_turns
        for r in spark.read.parquet(out).collect()
    }
    assert got[("convA", "2024-01-01 10:00:00")] == 3
    assert got[("convA", "2024-01-01 10:30:00")] == 1
    assert got[("convB", "2024-01-01 10:05:00")] == 1


def test_stream_grok_partials_match_batch_tool_summary(spark, tmp_path):
    """The streaming grok pipeline's folded partials must equal batch
    transcript.tool_summary over the same rows, across multiple epochs
    (conversations deliberately split across micro-batches so the
    distinct-conv fold is exercised)."""
    from anendektos_spark.functions import transcript

    tx = transcript.synth_transcript(spark, 4000)
    d = str(tmp_path / "txin")
    # split WITHIN conversations (odd/even turns) -> every conversation
    # spans both epochs; a naive sum of per-epoch distinct counts would
    # double-count and fail this test
    tx.filter(F.col("turn_idx") % 2 == 0).write.parquet(d)
    tx.filter(F.col("turn_idx") % 2 == 1).write.mode("append").parquet(d)
    stream = streaming.stream_transcripts(spark, d, max_files_per_trigger=1)
    out, ckpt = str(tmp_path / "grok"), str(tmp_path / "gck")
    q = streaming.stream_grok_partials(stream, out, ckpt, available_now=True)
    q.awaitTermination(120)
    assert len(spark.read.parquet(out).inputFiles()) >= 2  # multiple epochs

    cols = ("n_calls", "n_convs", "n_err", "latency_total_ms",
            "latency_max_ms", "err_rate")
    got = {r.tool: tuple(r[c] for c in cols)
           for r in streaming.read_grok_summary(spark, out).collect()}
    want = {r.tool: tuple(r[c] for c in cols)
            for r in transcript.tool_summary(
                transcript.parse_turns(tx)).collect()}
    assert got == want


def test_fs_helpers_use_hadoop_filesystem(spark, tmp_path):
    """Index/history discovery must go through the Hadoop FileSystem API
    (works on HDFS/S3A/local alike), not driver-local os.path — the
    round-3 ADVICE hazard was an always-False probe off-box that made
    stream_incremental_dedup silently read the index as empty."""
    missing = str(tmp_path / "nope")
    assert not streaming._fs_exists(spark, missing)
    assert not streaming._fs_has_epoch_partitions(spark, missing)

    empty = tmp_path / "empty"
    empty.mkdir()
    assert streaming._fs_exists(spark, str(empty))
    assert not streaming._fs_has_epoch_partitions(spark, str(empty))

    # a non-epoch child does not count; an epoch=K child does
    (empty / "_SUCCESS").write_text("")
    assert not streaming._fs_has_epoch_partitions(spark, str(empty))
    (empty / "epoch=0").mkdir()
    assert streaming._fs_has_epoch_partitions(spark, str(empty))

    # explicit scheme resolves through the same API (the off-box shape)
    assert streaming._fs_exists(spark, "file://" + str(empty))
    assert streaming._fs_has_epoch_partitions(spark, "file://" + str(empty))


def test_stream_incremental_dedup_matches_batch(spark, tmp_path):
    """Streaming conversation dedup must find, per epoch, exactly the
    new-vs-indexed and new-vs-new matches the batch incremental_dedup
    finds for the same batch split — with the index carrying signatures
    only (no text re-read). Epoch membership is read back from the
    written index so the test is robust to file-discovery order."""
    from anendektos_spark.functions import convops, dedup

    tx = convops.synth_conv_dup(spark, 640, templates=4)
    half = [f"conv{i}" for i in range(20)]
    d = str(tmp_path / "src")
    # one file per batch: conversations must be micro-batch-complete
    tx.filter(F.col("conv_id").isin(half)).coalesce(1).write.parquet(d)
    tx.filter(~F.col("conv_id").isin(half)).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    stream = streaming.stream_transcripts(spark, d, max_files_per_trigger=1)
    idx, dups, ckpt = (
        str(tmp_path / "idx"),
        str(tmp_path / "dups"),
        str(tmp_path / "ck"),
    )
    q = streaming.stream_incremental_dedup(
        stream, idx, dups, ckpt, available_now=True
    )
    q.awaitTermination(180)

    by_epoch = {
        r.conv_id: r.epoch
        for r in spark.read.option("basePath", idx).parquet(idx).collect()
    }
    epochs = sorted(set(by_epoch.values()))
    assert len(epochs) >= 2  # the split actually exercised multiple epochs

    conv = convops.conv_reconstruct(tx).select("conv_id", "transcript")
    sig_all = dedup.signature_index(
        conv, id_col="conv_id", text_col="transcript"
    ).persist()
    expected = set()
    for e in epochs:
        new_ids = [c for c, ep in by_epoch.items() if ep == e]
        old_ids = [c for c, ep in by_epoch.items() if ep < e]
        new_sig = sig_all.filter(F.col("conv_id").isin(new_ids))
        old_sig = sig_all.filter(F.col("conv_id").isin(old_ids))
        expected |= {
            (r.dup_id, r.match_id, r.est_jaccard)
            for r in dedup.incremental_dedup(
                None, old_sig, id_col="conv_id", new_sig=new_sig
            ).collect()
        }
    got = {
        (r.dup_id, r.match_id, r.est_jaccard)
        for r in spark.read.parquet(dups).collect()
    }
    assert got == expected
    assert got  # non-vacuous: the dup generator guarantees matches
    sig_all.unpersist()


def test_stream_retry_loops_matches_batch_across_splits(spark, tmp_path):
    """Stateful retry-run detection: conversations split across three
    micro-batches (turn ranges 0-5 / 6-11 / 12-15, so failing runs straddle
    batch boundaries) must reconcile to EXACTLY the batch op's output."""
    from anendektos_spark.functions import transcript

    tx = transcript.synth_transcript(spark, 19 * 16 * 2)
    parsed = transcript.parse_turns(tx)
    dim = transcript.tool_dim(spark)
    enriched = (
        parsed.join(F.broadcast(dim), parsed.tool_called == dim.tool)
        .select(
            "conv_id",
            "turn_idx",
            F.col("category").alias("tool_called"),
            "status",
        )
        .cache()
    )

    d = str(tmp_path / "pin")
    for lo, hi in ((0, 6), (6, 12), (12, 16)):
        (
            enriched.filter(
                (F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi)
            )
            .coalesce(1)
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("append")
            .parquet(d)
        )

    out, ckpt = str(tmp_path / "runs"), str(tmp_path / "runsck")
    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, tool_called string, status string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    streaming.stream_retry_loops(
        stream, out, ckpt, min_run=2, available_now=True
    ).awaitTermination(180)

    # the stream emitted open snapshots in earlier batches for runs that
    # later closed or grew — the read-time fold must collapse them
    raw = spark.read.parquet(out)
    assert raw.filter(F.col("open")).count() > 0, "no cross-batch open runs"

    got = {
        (r.conv_id, r.tool, r.run_len, r.first_turn, r.last_turn)
        for r in streaming.read_retry_loops(spark, out, 2).collect()
    }
    want = {
        (r.conv_id, r.category, r.run_len, r.first_turn, r.last_turn)
        for r in transcript.category_retry_loops(parsed, dim, 2).collect()
    }
    assert got == want and want, (len(got), len(want))


def test_stream_drift_partials_match_batch_report(spark, tmp_path):
    """Multi-epoch drift maintenance: the merged streamed bin partials
    must reproduce the batch histogram_drift report bit-for-bit over the
    union of all streamed rows."""
    from anendektos_spark import streaming
    from anendektos_spark.functions import logops

    df = spark.range(400).select(
        (F.col("id") % 17).cast("double").alias("value"),
        (F.col("id") % 3 == 0).alias("isb"),
    )
    d = str(tmp_path / "in")
    df.filter(F.col("id") < 200).coalesce(1).write.mode("append").parquet(d)
    df.filter(F.col("id") >= 200).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema("value double, isb boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = streaming.stream_drift_partials(
        stream, "value", "isb", 0.0, 10.0, ckpt, out, n_bins=5, available_now=True
    )
    q.awaitTermination(180)
    assert len(list(__import__("pathlib").Path(out).glob("epoch=*"))) >= 2
    streamed = {
        r.bin: (r.n_a, r.n_b, r.ppm_a, r.ppm_b, r.drift_ppm)
        for r in streaming.read_drift(spark, out, 0.0, 10.0, n_bins=5).collect()
    }
    batch = {
        r.bin: (r.n_a, r.n_b, r.ppm_a, r.ppm_b, r.drift_ppm)
        for r in logops.histogram_drift(
            df, "value", F.col("isb"), 0.0, 10.0, 5
        ).collect()
    }
    assert streamed == batch


def test_stream_degenerate_runs_matches_batch_across_splits(spark, tmp_path):
    """Stateful generation-loop detection: the injected 6-turn echo runs
    (turns 4..9) straddle the 0-5 / 6-11 / 12-15 micro-batch boundaries
    and must reconcile to EXACTLY the batch op's output."""
    from anendektos_spark.functions import convops

    tx = convops.synth_conv_degen(spark, 16 * 40).select(
        "conv_id", "turn_idx", "text"
    ).cache()

    d = str(tmp_path / "degen_in")
    for lo, hi in ((0, 6), (6, 12), (12, 16)):
        (
            tx.filter((F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi))
            .coalesce(1)
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("append")
            .parquet(d)
        )

    out, ckpt = str(tmp_path / "degen_out"), str(tmp_path / "degen_ck")
    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    streaming.stream_degenerate_runs(
        stream, out, ckpt, min_run=3, available_now=True
    ).awaitTermination(180)

    got = sorted(
        tuple(r)
        for r in streaming.read_degenerate_runs(spark, out, 3).collect()
    )
    want = sorted(
        (r.conv_id, r.text_fp, r.start_turn, r.end_turn, r.run_len)
        for r in convops.degenerate_runs(tx, min_run=3).collect()
    )
    assert got and got == want
    # straddling runs really were split: some run crosses turn 5/6
    assert any(s <= 5 and e >= 6 for (_, _, s, e, _) in got)


def test_stream_hdr_partials_match_batch_sketch(spark, tmp_path):
    """Multi-epoch quantile-sketch maintenance: merged streamed partials
    must equal the batch histogram over the same rows, and percentile
    estimates from the streamed sketch must match batch estimates."""
    from anendektos_spark import streaming
    from anendektos_spark.functions import sketches

    df = spark.range(800).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 13) % 997 + 1).cast("long").alias("v"),
    )
    d = str(tmp_path / "in")
    df.filter(F.col("v") < 500).coalesce(1).write.mode("append").parquet(d)
    df.filter(F.col("v") >= 500).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema("g string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = streaming.stream_hdr_partials(stream, "v", "g", out, ckpt,
                                      available_now=True)
    q.awaitTermination(180)
    assert len(list(__import__("pathlib").Path(out).glob("epoch=*"))) >= 2
    streamed = {(r.g, r.bucket): r.cnt
                for r in streaming.read_hdr(spark, out, "g").collect()}
    batch = {(r.g, r.bucket): r.cnt
             for r in sketches.hdr_histogram(df, "v", "g").collect()}
    assert streamed == batch
    ps = {(r.g, r.p): r.value_lb for r in sketches.hdr_percentiles(
        streaming.read_hdr(spark, out, "g"), (50, 99), "g").collect()}
    pb = {(r.g, r.p): r.value_lb for r in sketches.hdr_percentiles(
        sketches.hdr_histogram(df, "v", "g"), (50, 99), "g").collect()}
    assert ps == pb and len(ps) == 6


def test_stream_datacard_partials_match_batch(spark, tmp_path):
    """Continuously maintained corpus data card: merging the streamed
    per-epoch (source, lang) integer partials must reproduce the batch
    corpus_datacard over the same rows bit-exactly (pure integer sums
    commute across micro-batch splits)."""
    from anendektos_spark import streaming
    from anendektos_spark.functions import textstats

    rows = [
        (1, "a b c", "en", "s1", 5),
        (2, "d e", "en", "s1", 3),
        (3, "f", "fr", "s1", 1),
        (4, "g h i j", "de", "s2", 7),
        (5, "k l", "en", "s2", 4),
        (6, "m", "en", "s1", 2),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    df = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "in")
    # split so the same (source, lang) key appears in BOTH epochs —
    # the merge-by-addition path is actually exercised
    df.filter(F.col("doc_id") <= 3).coalesce(1).write.mode("append").parquet(d)
    df.filter(F.col("doc_id") > 3).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    streaming.stream_datacard_partials(
        stream, ckpt, out, available_now=True
    ).awaitTermination(180)
    assert len(list(__import__("pathlib").Path(out).glob("epoch=*"))) >= 2
    got = sorted(tuple(r) for r in streaming.read_datacard(spark, out).collect())
    want = sorted(tuple(r) for r in textstats.corpus_datacard(df).collect())
    assert got and got == want


def test_stream_pr_partials_match_batch(spark, tmp_path):
    """Continuously maintained PR curve: merging the streamed per-epoch
    (threshold, pos, neg) integer partials must reproduce the batch
    pr_curve over the same rows bit-exactly."""
    from anendektos_spark import streaming
    from anendektos_spark.functions import classify

    rows = [(i, (i * 7) % 5, 1 if (i * 13) % 3 == 0 else 0)
            for i in range(200)]
    schema = "rid long, score long, label int"
    df = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "in")
    # every score value appears in BOTH epochs → merge-by-addition is
    # actually exercised
    df.filter(F.col("rid") < 100).coalesce(1).write.mode("append").parquet(d)
    df.filter(F.col("rid") >= 100).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    streaming.stream_pr_partials(
        stream, "score", "label", ckpt, out, available_now=True
    ).awaitTermination(180)
    assert len(list(__import__("pathlib").Path(out).glob("epoch=*"))) >= 2
    got = sorted(tuple(r) for r in streaming.read_pr_curve(spark, out).collect())
    want = sorted(
        tuple(r) for r in classify.pr_curve(df, "score", "label").collect()
    )
    assert got and got == want


def test_stateful_conv_stats_idle_state_evicted(spark, tmp_path):
    """Bounded state on an unbounded conv_id space: a conversation idle
    past ``idle_timeout_min`` is evicted from the state store — observable
    because a post-eviction resume restarts its running counts from zero
    instead of accumulating (the documented semantics caveat)."""
    import time

    d = str(tmp_path / "ev_in")
    mk = lambda conv, ts0, n: spark.createDataFrame(  # noqa: E731
        [(conv, f"2026-01-01 00:{ts0 + i:02d}:00") for i in range(n)],
        "conv_id string, ts string",
    ).select("conv_id", F.col("ts").cast("timestamp").alias("ts"))
    out, ckpt = str(tmp_path / "ev_out"), str(tmp_path / "ev_ck")
    drain = lambda: streaming.stream_conv_stats(  # noqa: E731
        spark.readStream.schema("conv_id string, ts timestamp").parquet(d),
        out, ckpt, gap_seconds=1800,
        idle_timeout_min=0.0005,  # 30 ms — expire between drains
        available_now=True,
    ).awaitTermination(120)

    mk("A", 0, 3).coalesce(1).write.mode("append").parquet(d)
    drain()
    time.sleep(2)  # A idles past the timeout
    # a batch with data for B only → A's expired state is evicted
    mk("B", 10, 1).coalesce(1).write.mode("append").parquet(d)
    drain()
    time.sleep(2)
    mk("A", 20, 2).coalesce(1).write.mode("append").parquet(d)
    drain()

    a_rows = sorted(
        r.n_turns
        for r in spark.read.parquet(out).filter(F.col("conv_id") == "A").collect()
    )
    # pre-eviction row (3 turns) + post-eviction RESTART (2 turns, not 5)
    assert a_rows == [2, 3], a_rows


def test_stateful_conv_stats_timeout_zero_disables_eviction(spark, tmp_path):
    """idle_timeout_min=0 keeps the legacy unbounded accumulation."""
    import time

    d = str(tmp_path / "nv_in")
    mk = lambda conv, ts0, n: spark.createDataFrame(  # noqa: E731
        [(conv, f"2026-01-01 00:{ts0 + i:02d}:00") for i in range(n)],
        "conv_id string, ts string",
    ).select("conv_id", F.col("ts").cast("timestamp").alias("ts"))
    out, ckpt = str(tmp_path / "nv_out"), str(tmp_path / "nv_ck")
    drain = lambda: streaming.stream_conv_stats(  # noqa: E731
        spark.readStream.schema("conv_id string, ts timestamp").parquet(d),
        out, ckpt, gap_seconds=1800, idle_timeout_min=0, available_now=True,
    ).awaitTermination(120)

    mk("A", 0, 3).coalesce(1).write.mode("append").parquet(d)
    drain()
    time.sleep(1)
    mk("A", 20, 2).coalesce(1).write.mode("append").parquet(d)
    drain()
    a_rows = sorted(
        r.n_turns
        for r in spark.read.parquet(out).filter(F.col("conv_id") == "A").collect()
    )
    assert a_rows == [3, 5], a_rows


def test_stream_conv_stats_matches_batch_session_stats(spark, tmp_path):
    """Batch ↔ stream reconciliation: stream_conv_stats' latest row per
    conversation equals the batch transcript.session_stats over the same
    data — the contract every other stateful op in streaming.py carries."""
    from anendektos_spark.functions import convops, transcript

    d, out, ckpt = (str(tmp_path / x) for x in ("rc_in", "rc_out", "rc_ck"))
    conv = convops.synth_conv(spark, 2000).select("conv_id", "ts")
    conv.write.parquet(d)
    streaming.stream_conv_stats(
        spark.readStream.schema("conv_id string, ts timestamp").parquet(d),
        out, ckpt, gap_seconds=40, available_now=True,
    ).awaitTermination(180)
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out)
        .groupBy("conv_id")
        .agg(F.max("n_turns").alias("n_turns"), F.max("n_sessions").alias("n_sessions"))
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in transcript.session_stats(
            convops.synth_conv(spark, 2000), gap_seconds=40
        ).collect()
    )
    assert got and got == want


def test_stream_slo_partials_match_batch(spark, tmp_path):
    """Epoch-partial SLO burn folded at read time equals the batch
    transcript.slo_burn over the union of all streamed turns."""
    from anendektos_spark.functions import transcript

    d, out, ckpt = (str(tmp_path / x) for x in ("slo_in", "slo_out", "slo_ck"))
    tx = transcript.synth_transcript(spark, 4000)
    # two appends → two epochs, so the read-side merge genuinely folds
    tx.filter(F.col("conv_id") < "conv7").write.mode("append").parquet(d)
    drain = lambda: streaming.stream_slo_partials(  # noqa: E731
        spark.readStream.schema(tx.schema).parquet(d),
        out, ckpt, slo_ms=500, available_now=True,
    ).awaitTermination(120)
    drain()
    tx.filter(F.col("conv_id") >= "conv7").write.mode("append").parquet(d)
    drain()

    got = sorted(
        tuple(r) for r in streaming.read_slo_burn(spark, out).collect()
    )
    want = sorted(
        tuple(r)
        for r in transcript.slo_burn(transcript.parse_turns(tx), 500).collect()
    )
    assert got and got == want


def test_stream_label_partials_match_batch(spark, tmp_path):
    """Epoch-partial label counts folded at read time equal the batch
    similarity.label_balance over the union of all streamed rows."""
    from anendektos_spark.functions import similarity

    d, out, ckpt = (str(tmp_path / x) for x in ("lb_in", "lb_out", "lb_ck"))
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.filter(F.col("vec_id") < 30).write.mode("append").parquet(d)
    drain = lambda: streaming.stream_label_partials(  # noqa: E731
        spark.readStream.schema(emb.schema).parquet(d),
        out, ckpt, available_now=True,
    ).awaitTermination(120)
    drain()
    emb.filter(F.col("vec_id") >= 30).write.mode("append").parquet(d)
    drain()

    got = sorted(
        tuple(r) for r in streaming.read_label_balance(spark, out).collect()
    )
    want = sorted(
        tuple(r) for r in similarity.label_balance(emb).collect()
    )
    assert got and got == want


def test_stream_debounce_kept_anchored_across_batches(spark, tmp_path):
    """Kept-anchored throttle: verdicts must match a sequential Python
    fold of the SAME semantics, including a chain that straddles the
    micro-batch boundary (u1's 30s-spaced burst: the batch lag screen
    would drop every 30s event, the kept-anchored chain re-keeps every
    other one)."""
    rows = [
        # u1 click at 0,30,60,90,120 -> kept 0, drop 30, kept 60,
        # drop 90, kept 120 (kept-anchored; lag-screen would drop all 4)
        (1, 1, "click", 0), (2, 1, "click", 30), (3, 1, "click", 60),
        (4, 1, "click", 90), (5, 1, "click", 120),
        # u2: isolated events far apart -> all kept
        (6, 2, "click", 0), (7, 2, "click", 400),
        # u1 view: independent key
        (8, 1, "view", 10), (9, 1, "view", 20),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ep long"
    ).select("event_id", "user_id", "event_type",
             F.timestamp_seconds("ep").alias("ts"))
    d = str(tmp_path / "db_in")
    # split mid-chain: u1's 0-60 in batch 1, 90-120 in batch 2
    df.filter(F.col("event_id") <= 3).coalesce(1).write.mode("append").parquet(d)
    df.filter(F.col("event_id") > 3).coalesce(1).write.mode("append").parquet(d)
    out, ckpt = str(tmp_path / "db_out"), str(tmp_path / "db_ck")
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    streaming.stream_debounce(
        stream, out, ckpt, window_s=60, available_now=True
    ).awaitTermination(180)

    got = {r.event_id: r.kept
           for r in streaming.read_debounced(spark, out).collect()}

    # sequential reference fold over the full input
    want, last = {}, {}
    for eid, uid, typ, ep in sorted(rows, key=lambda t: (t[3], t[0])):
        k = (uid, typ)
        kept = k not in last or ep - last[k] >= 60
        if kept:
            last[k] = ep
        want[eid] = kept
    assert len(got) == len(rows)
    assert got == want
    assert got[3] is True and got[4] is False  # the cross-batch re-keep


def test_stream_debounce_idle_state_evicted(spark, tmp_path):
    """Bounded state: a (user, type) key idle past idle_timeout_min is
    evicted — observable because the key's next event is kept even
    though it arrives inside window_s of the last kept event."""
    import time

    mk = lambda eid, ep: spark.createDataFrame(  # noqa: E731
        [(eid, 1, "click", ep)],
        "event_id long, user_id long, event_type string, ep long",
    ).select("event_id", "user_id", "event_type",
             F.timestamp_seconds("ep").alias("ts"))
    d = str(tmp_path / "ev_in")
    out, ckpt = str(tmp_path / "ev_out"), str(tmp_path / "ev_ck")
    drain = lambda: streaming.stream_debounce(  # noqa: E731
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp"
        ).parquet(d),
        out, ckpt, window_s=3600,
        idle_timeout_min=0.0005,  # 30 ms — expire between drains
        available_now=True,
    ).awaitTermination(120)

    mk(1, 0).coalesce(1).write.mode("append").parquet(d)
    drain()
    time.sleep(2)  # the key idles past the timeout
    mk(2, 10).coalesce(1).write.mode("append").parquet(d)  # other key? no — same key
    drain()

    got = {r.event_id: r.kept
           for r in streaming.read_debounced(spark, out).collect()}
    # without eviction event 2 (10s after the kept event, window 3600s)
    # would be dropped; the evicted key treats it as fresh -> kept
    assert got == {1: True, 2: True}


def test_stream_debounce_validation(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        streaming.stream_debounce(
            None, str(tmp_path / "o"), str(tmp_path / "c"), window_s=0
        )


def test_stream_seasonal_partials_match_batch(spark, tmp_path):
    """Continuously maintained seasonal baseline: merging the streamed
    per-epoch (type, day, hod) cells must reproduce the batch
    seasonal_spikes report bit-for-bit (counts commute; the baseline and
    ratio compute once, after the merge)."""
    from anendektos_spark.functions import logops

    d86 = 86_400
    rows = (
        [(i, 1, "click", day * d86 + i) for day, cnt in
         [(0, 1), (1, 1), (2, 1)] for i in range(cnt)]
        + [(100 + i, 1, "click", 3 * d86 + i) for i in range(5)]
        + [(200, 1, "view", 0), (201, 1, "view", d86)]
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ep long"
    ).select("event_id", "user_id", "event_type",
             F.timestamp_seconds("ep").alias("ts"))
    d = str(tmp_path / "ssp_in")
    # split so the spiking hour's counts straddle epochs
    df.filter(F.col("event_id") < 102).coalesce(1).write.mode("append").parquet(d)
    df.filter(F.col("event_id") >= 102).coalesce(1).write.mode("append").parquet(d)
    out, ckpt = str(tmp_path / "ssp_out"), str(tmp_path / "ssp_ck")
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    streaming.stream_seasonal_partials(
        stream, out, ckpt, available_now=True
    ).awaitTermination(180)
    assert len(list(__import__("pathlib").Path(out).glob("epoch=*"))) >= 2

    streamed = sorted(
        tuple(r)
        for r in streaming.read_seasonal_spikes(spark, out).collect()
    )
    batch = sorted(
        tuple(r) for r in logops.seasonal_spikes(df).collect()
    )
    assert streamed and streamed == batch
