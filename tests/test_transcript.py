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
    # round-3 analytics stages: committed outputs equal the direct batch ops
    p = transcript.parse_turns(tx)
    assert sorted(map(tuple, store.read(spark, "grok_retry_loops").collect())) == \
        sorted(map(tuple, transcript.category_retry_loops(
            p, transcript.tool_dim(spark), 2).collect()))
    assert sorted(map(tuple, store.read(spark, "grok_latency_pctl").collect())) == \
        sorted(map(tuple, transcript.latency_percentiles(p).collect()))
    assert store.read(spark, "grok_outcomes").count() == \
        p.select("conv_id").distinct().count()


# --------------------------------------------------------------------------
# round-3 agent-behavior analytics
# --------------------------------------------------------------------------

def _mk_parsed(spark, rows):
    return spark.createDataFrame(
        rows,
        schema="conv_id string, turn_idx int, tool_called string, "
        "status string, epoch long, latency_ms int",
    )


def test_retry_loops_tool_grain_handcrafted(spark):
    # c1: dns fails at turns 1,3 consecutively (parsed stream has no
    # intervening call) → one run of 2; its later dns failure at turn 9
    # is separated by an OK call → its own singleton run (dropped).
    # c2: an OK breaks same-tool adjacency even when statuses fail.
    rows = [
        ("c1", 1, "dns", "ERR", 0, 5),
        ("c1", 3, "dns", "TIMEOUT", 0, 5),
        ("c1", 5, "http", "OK", 0, 5),
        ("c1", 7, "dns", "ERR", 0, 5),
        ("c2", 1, "ssl", "ERR", 0, 5),
        ("c2", 3, "ssl", "OK", 0, 5),
        ("c2", 5, "ssl", "ERR", 0, 5),
    ]
    out = transcript.retry_loops(_mk_parsed(spark, rows), 2).collect()
    assert [(r.conv_id, r.tool, r.run_len, r.first_turn, r.last_turn) for r in out] == [
        ("c1", "dns", 2, 1, 3)
    ]


def test_retry_loops_min_run_one_keeps_singletons(spark):
    rows = [("c1", 1, "dns", "ERR", 0, 5), ("c1", 3, "http", "OK", 0, 5)]
    out = transcript.retry_loops(_mk_parsed(spark, rows), 1).collect()
    assert len(out) == 1 and out[0].run_len == 1


def test_category_retry_loops_nonempty_on_synth(spark, parsed):
    # the rotating tool schedule guarantees same-CATEGORY adjacency;
    # every run must be genuinely consecutive failing calls
    runs = transcript.category_retry_loops(
        parsed, transcript.tool_dim(spark), 2
    )
    rows = runs.collect()
    assert rows, "synth corpus must produce category-grain retry runs"
    assert all(r.run_len >= 2 and r.first_turn < r.last_turn for r in rows)


def test_latency_percentiles_nearest_rank(spark, parsed):
    out = {
        (r.tool, r.p): r.latency_p_ms
        for r in transcript.latency_percentiles(parsed).collect()
    }
    lats = {}
    for r in parsed.select("tool_called", "latency_ms").collect():
        lats.setdefault(r.tool_called, []).append(r.latency_ms)
    for tool, xs in lats.items():
        xs.sort()
        for p in transcript.PCTL_PS:
            k = -(-len(xs) * p // 100)  # ceil
            assert out[(tool, p)] == xs[k - 1]
    assert len(out) == len(lats) * len(transcript.PCTL_PS)


def test_conv_outcomes_last_status(spark):
    rows = [
        ("c1", 1, "dns", "ERR", 0, 5),
        ("c1", 3, "dns", "OK", 0, 5),
        ("c2", 1, "ssl", "OK", 0, 5),
        ("c2", 9, "ssl", "TIMEOUT", 0, 5),
    ]
    out = {r.conv_id: r for r in transcript.conv_outcomes(_mk_parsed(spark, rows)).collect()}
    assert out["c1"].last_status == "OK" and not out["c1"].failed
    assert out["c1"].n_calls == 2 and out["c1"].n_err == 1
    assert out["c2"].last_status == "TIMEOUT" and out["c2"].failed


def test_tool_cooccurrence_pairs(spark, parsed):
    out = transcript.tool_cooccurrence(parsed)
    rows = out.collect()
    # unordered pairs, strictly ordered columns, no self-pairs
    assert all(r.tool_a < r.tool_b for r in rows)
    # cross-check one pair by brute force
    per_conv = {}
    for r in parsed.select("conv_id", "tool_called").distinct().collect():
        per_conv.setdefault(r.conv_id, set()).add(r.tool_called)
    a, b = rows[0].tool_a, rows[0].tool_b
    expect = sum(1 for s in per_conv.values() if a in s and b in s)
    assert rows[0].n_convs == expect


def test_turn_templates_collapse_parameters(spark, tx):
    out = transcript.turn_templates(tx, 3)
    rows = out.collect()
    assert rows
    for r in rows:
        assert "w" not in r.template or "W" in r.template
        assert not re.search(r"[0-9]", r.template)
        assert r.n_convs >= 3


def test_new_ops_plan_shapes(spark, parsed):
    # co-occurrence must reuse one exchange for both self-join sides and
    # never go cartesian; percentiles must not collect per group
    co = plan_of(transcript.tool_cooccurrence(parsed))
    assert "CartesianProduct" not in co and "BroadcastNestedLoop" not in co
    pc = plan_of(transcript.latency_percentiles(parsed))
    assert "collect_list" not in pc
    cat = plan_of(
        transcript.category_retry_loops(parsed, transcript.tool_dim(spark), 2)
    )
    assert "BroadcastHashJoin" in cat


def test_latency_mad_outliers_golden(spark):
    # tool A: four 10ms calls + one 1000ms spike → med 10, MAD 0, spike
    # flagged (990 > 3·0); the flat rows are not (0 > 0 is false).
    # tool B: uniform ladder → MAD covers every deviation, nothing flagged.
    rows = [("c0", i, "a", "OK", 100 + i, lat)
            for i, lat in enumerate([10, 10, 10, 10, 1000])]
    rows += [("c1", i, "b", "OK", 200 + i, lat)
             for i, lat in enumerate([100, 200, 300, 400, 500])]
    parsed = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool_called string, "
              "status string, epoch long, latency_ms int")
    out = transcript.latency_mad_outliers(parsed, k=3).collect()
    assert [(r.tool, r.turn_idx, r.latency_ms, r.med_ms, r.mad_ms)
            for r in out] == [("a", 4, 1000, 10, 0)]
    with pytest.raises(ValueError):
        transcript.latency_mad_outliers(parsed, k=0)


def test_spike_latency_multiplies_on_epoch_modulus(spark):
    parsed = spark.createDataFrame(
        [("c", 0, "a", "OK", 97, 5), ("c", 1, "a", "OK", 98, 5)],
        "conv_id string, turn_idx int, tool_called string, "
        "status string, epoch long, latency_ms int")
    got = {r.turn_idx: r.latency_ms
           for r in transcript.spike_latency(parsed, 97, 40).collect()}
    assert got == {0: 200, 1: 5}


def test_latency_mad_outliers_sql_matches(spark):
    import duckdb
    df = transcript.latency_mad_outliers(
        transcript.spike_latency(
            transcript.parse_turns(transcript.synth_transcript(spark, 4000))))
    rows = sorted(tuple(r) for r in df.collect())
    orows = sorted(tuple(t) for t in duckdb.sql(
        transcript.latency_mad_outliers_sql(
            transcript.synth_transcript_sql(4000), spike=(97, 40))).fetchall())
    assert rows and rows == orows


def test_tool_paths_hand_computed(spark):
    from pyspark.sql import Row

    rows = [
        ("c1", 1, "a"), ("c1", 3, "b"), ("c1", 5, "c"), ("c1", 7, "a"),
        ("c2", 1, "a"), ("c2", 3, "b"), ("c2", 5, "c"),
        ("c3", 1, "x"), ("c3", 3, "y"),  # too short for k=3
    ]
    parsed = spark.createDataFrame(
        [(c, t, tool, "OK", 0, 1) for c, t, tool in rows],
        "conv_id string, turn_idx int, tool_called string, status string, "
        "epoch long, latency_ms int",
    )
    out = [(r.path, r.n) for r in transcript.tool_paths(parsed, k=3).collect()]
    # c1 contributes a>b>c and b>c>a; c2 contributes a>b>c; c3 nothing
    assert out == [("a>b>c", 2), ("b>c>a", 1)]
    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        transcript.tool_paths(parsed, k=1)


def test_wasted_latency_hand_computed(spark):
    parsed = spark.createDataFrame(
        [("c", 1, "conn", "OK", 0, 100), ("c", 3, "conn", "ERR", 0, 300),
         ("c", 5, "conn", "TIMEOUT", 0, 600), ("d", 1, "dns", "OK", 0, 50)],
        "conv_id string, turn_idx int, tool_called string, status string, "
        "epoch long, latency_ms int",
    )
    out = {r.tool_called: r for r in transcript.wasted_latency(parsed).collect()}
    c = out["conn"]
    assert (c.n_calls, c.total_ms, c.n_failed, c.wasted_ms) == (3, 1000, 2, 900)
    assert c.waste_ppm == 900_000
    assert out["dns"].wasted_ms == 0 and out["dns"].waste_ppm == 0


def test_latency_drift_hand_computed(spark):
    # epochs 0..3, mid-test: epoch*2 < 0+3 → epochs 0,1 early; 2,3 late.
    # tool a early lats [10, 30] → p50 = rank ceil(0.5*2)=1 → 10,
    #   p99 → rank ceil(.99*2)=2 → 30; late [20, 40] → 20 / 40.
    # tool b appears only late → dropped.
    rows = [
        ("c", 0, "a", "OK", 0, 10), ("c", 1, "a", "OK", 1, 30),
        ("c", 2, "a", "OK", 2, 40), ("c", 3, "a", "OK", 3, 20),
        ("c", 4, "b", "OK", 3, 99),
    ]
    parsed = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool_called string, "
              "status string, epoch long, latency_ms int")
    got = sorted(
        tuple(r)
        for r in transcript.latency_drift(parsed, ps=(50, 99)).collect()
    )
    assert got == [("a", 50, 10, 20, 10), ("a", 99, 30, 40, 10)]


def test_latency_drift_sql_matches(spark):
    import duckdb
    df = transcript.latency_drift(
        transcript.parse_turns(transcript.synth_transcript(spark, 4000)))
    rows = sorted(tuple(r) for r in df.collect())
    orows = sorted(tuple(t) for t in duckdb.sql(
        transcript.latency_drift_sql(
            transcript.synth_transcript_sql(4000))).fetchall())
    assert rows and rows == orows
