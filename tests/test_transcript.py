"""Tests for the north-star transcript grok pipeline
(anendektos_spark/functions/transcript.py): generator structure, parse ↔
generator cross-validation, reject reasons, summaries, and the plan
shapes the 100 TB design depends on (codegen-only parse, broadcast
enrich)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from anendektos_spark.functions import transcript
from tests.test_plans import plan_of

N = 19 * 16 * 2  # 608 turns / 38 conversations — covers every (m, turn) cell


@pytest.fixture(scope="module")
def tx(spark):
    return transcript.synth_transcript(spark, N).cache()


@pytest.fixture(scope="module")
def parsed(tx):
    return transcript.parse_turns(tx).cache()


def test_generator_structure(tx):
    rows = tx.collect()
    assert len(rows) == N
    for r in rows:
        if r.role == "user":
            assert r.tool is None and "[call" not in r.text
        else:
            assert r.tool in transcript.TOOLS


def test_parse_cross_validates_against_generator(tx, parsed):
    # every parsed tool_called must equal the generator's tool column,
    # and status/latency must match the generator's arithmetic
    joined = parsed.join(tx, ["conv_id", "turn_idx"])
    assert joined.filter(F.col("tool_called") != F.col("tool")).count() == 0
    n_assistant = tx.filter(F.col("role") == "assistant").count()
    n_rejects = transcript.reject_turns(tx).count()
    assert parsed.count() + n_rejects == n_assistant
    assert parsed.filter(F.col("latency_ms").isNull()).count() == 0
    assert parsed.filter(~F.col("status").isin("OK", "ERR", "TIMEOUT")).count() == 0


def test_reject_reasons_exact(tx):
    # assistant turns are odd i; m = i % 19 → 7, 11, 13 are the rejects.
    expected = {"missing_latency": 0, "malformed_marker": 0, "no_marker": 0}
    for i in range(N):
        if (i % 16) % 2 == 1:
            m = i % 19
            if m == 7:
                expected["missing_latency"] += 1
            elif m == 11:
                expected["malformed_marker"] += 1
            elif m == 13:
                expected["no_marker"] += 1
    got = {
        r.reason: r.n
        for r in transcript.reject_turns(tx)
        .groupBy("reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {k: v for k, v in expected.items() if v}


def test_tool_summary_err_rate_fixed_point(parsed):
    rows = {r.tool: r for r in transcript.tool_summary(parsed).collect()}
    assert set(rows) <= set(transcript.TOOLS)
    for r in rows.values():
        assert r.err_rate == (r.n_err * 10000 // r.n_calls) / 10000.0
        assert 0.0 <= r.err_rate <= 1.0
        assert r.n_convs <= r.n_calls


def test_enrich_agg_weighted(parsed, spark):
    dim = transcript.tool_dim(spark)
    got = {r.category: r for r in transcript.enrich_agg(parsed, dim).collect()}
    assert set(got) == {"net", "app", "crypto"}
    # weighted latency equals the manual per-tool recomputation
    weights = {t: w for t, _, w in transcript.TOOL_DIM}
    cats = {t: c for t, c, _ in transcript.TOOL_DIM}
    manual: dict[str, int] = {}
    for r in parsed.collect():
        manual[cats[r.tool_called]] = (
            manual.get(cats[r.tool_called], 0) + r.latency_ms * weights[r.tool_called]
        )
    for c, r in got.items():
        assert r.weighted_latency_ms == manual[c]


def test_topk_tools_deterministic_tiebreak(parsed):
    rows = transcript.topk_tools(parsed, 3).collect()
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3]
    ordered = sorted(rows, key=lambda r: (-r.n_calls, r.tool))
    assert [r.rank for r in ordered] == [1, 2, 3]


def test_parse_plan_is_pure_codegen_narrow_map(spark):
    df = transcript.parse_turns(transcript.synth_transcript(spark, 1000))
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_enrich_plan_broadcasts_dim(spark):
    parsed = transcript.parse_turns(transcript.synth_transcript(spark, 1000))
    df = transcript.enrich_agg(parsed, transcript.tool_dim(spark))
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pipeline_single_shuffle_per_aggregate(spark):
    parsed = transcript.parse_turns(transcript.synth_transcript(spark, 1000))
    for op in (transcript.route_counts, transcript.tool_summary,
               transcript.hourly_counts):
        plan = plan_of(op(parsed))
        # partial agg + final agg around exactly one exchange of the
        # aggregate key (countDistinct legitimately adds an expand round)
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_ex <= 2, f"{op.__name__}: {n_ex} exchanges"


def test_grok_pipeline_commit_and_resume(spark, tmp_path):
    """run_grok_pipeline commits every stage, resumes idempotently on
    re-run (zero rebuilds), and its committed summary equals the direct
    batch computation."""
    from anendektos_spark.grok_pipeline import GrokPipelineConfig, run_grok_pipeline

    in_dir = str(tmp_path / "in")
    transcript.synth_transcript(spark, 2000).write.parquet(in_dir)
    cfg = GrokPipelineConfig(
        input_path=in_dir, output_root=str(tmp_path / "stages"),
        sink_partition_by="day", repartition=4, salt_buckets=4,
    )
    m1 = run_grok_pipeline(spark, cfg)
    assert all(not s["resumed"] for s in m1["stages"].values())
    m2 = run_grok_pipeline(spark, cfg)
    assert all(s["resumed"] for s in m2["stages"].values())
    assert {k: v["rows"] for k, v in m2["stages"].items()} == {
        k: v["rows"] for k, v in m1["stages"].items()
    }

    from anendektos_spark.checkpoint import StageStore

    store = StageStore(cfg.output_root)
    tx = spark.read.parquet(in_dir)
    want = {r.tool: (r.n_calls, r.n_convs, r.err_rate)
            for r in transcript.tool_summary(transcript.parse_turns(tx)).collect()}
    got = {r.tool: (r.n_calls, r.n_convs, r.err_rate)
           for r in store.read(spark, "grok_summary").collect()}
    assert got == want
    # fan-out accounting: sink rows sum to parsed rows
    n_parsed = m1["stages"]["grok_parsed"]["rows"]
    n_sinks = sum(v["rows"] for k, v in m1["stages"].items()
                  if k.startswith("grok_sink_"))
    assert n_sinks == n_parsed
    # day-partitioned sinks actually wrote partition directories
    import glob
    assert glob.glob(str(tmp_path / "stages" / "grok_sink_conn" / "data" /
                         "part_bucket=*"))
