"""Physical-plan regression tests — the scale contract as assertions.

PLANS.md documents the plan shapes the 100 TB design depends on; these
tests pin them so a refactor that silently breaks pushdown, broadcasts a
big side, or introduces a cartesian product fails CI instead of a
cluster run. Also enforces the SURVEY §7 rule that the only Python in
the repo's hot paths is Arrow-batched (no row-at-a-time ``udf()``, no
RDD logic)."""

from __future__ import annotations

import io
import pathlib
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from anendektos_spark.enrich import enrich
from anendektos_spark.fixtures import fixture_transcripts, tool_role_lookup
from anendektos_spark.functions import dedup, similarity
from anendektos_spark.parse import ParseOptions, parse_sink


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def tx_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "tx")
    fixture_transcripts(spark).write.parquet(p)
    return p


def test_parse_pushes_tool_filter_to_scan(spark, tx_parquet):
    tx = spark.read.parquet(tx_parquet)
    parsed = parse_sink(
        tx.filter(F.col("tool") == "conn"), "conn",
        opts=ParseOptions(addr_mode="passthrough"),
    )
    plan = plan_of(parsed)
    assert "PushedFilters" in plan and "EqualTo(tool,conn)" in plan.replace(" ", "")
    # the zero-Python parse is a pure narrow map: no shuffle anywhere
    assert "Exchange" not in plan


def test_parse_normalize_has_exactly_one_python_boundary(spark, tx_parquet):
    tx = spark.read.parquet(tx_parquet)
    parsed = parse_sink(tx.filter(F.col("tool") == "conn"), "conn")
    plan = plan_of(parsed)
    # formatted mode lists each node twice (tree + detail): count stages
    import re

    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python


def test_enrich_is_broadcast_join(spark, tx_parquet):
    tx = spark.read.parquet(tx_parquet)
    good = parse_sink(tx.filter(F.col("tool") == "conn"), "conn",
                      opts=ParseOptions(addr_mode="passthrough"))
    plan = plan_of(enrich(good.filter(F.col("reject_reason").isNull()),
                          tool_role_lookup(spark)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact side must never shuffle


def test_scale_dedup_paths_have_no_cartesian(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"some text number {i} with shared tokens") for i in range(50)],
        "doc_id long, text string",
    )
    for df in (dedup.lsh_jaccard(docs, use_cache=False), dedup.lsh_candidates(docs)):
        plan = plan_of(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_ann_broadcasts_query_side(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    plan = plan_of(similarity.brute_topk(emb, emb.filter(F.col("vec_id") < 2), 3))
    assert "BroadcastExchange" in plan


def test_no_row_at_a_time_python_in_library():
    """Static guard (SURVEY §7): no ``F.udf(``/``@udf`` row UDFs and no
    RDD-based logic in the library — Python stages must be Arrow-batched
    (pandas_udf / mapInPandas / applyInPandas*). ``.rdd`` appears only in
    textstats.spread's partition-count probe, which is allowed."""
    root = pathlib.Path(__file__).resolve().parent.parent / "anendektos_spark"
    offenders = []
    for py in root.rglob("*.py"):
        src = py.read_text()
        if "F.udf(" in src or "@udf" in src or "functions.udf(" in src:
            offenders.append(f"{py}: row udf")
        for line in src.splitlines():
            if ".rdd" in line and "getNumPartitions" not in line:
                offenders.append(f"{py}: rdd usage: {line.strip()}")
    assert not offenders, offenders


def test_chunk_documents_is_shuffle_free(spark, tmp_path):
    from anendektos_spark.functions import textstats

    p = str(tmp_path / "docs")
    spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string").write.parquet(p)
    plan = plan_of(textstats.chunk_documents(spark.read.parquet(p), chunk_tokens=4, overlap=1))
    assert "Exchange" not in plan  # pure narrow map + generate


def test_tfidf_pushes_topk_below_shuffle(spark, tmp_path):
    from anendektos_spark.functions import textstats

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "w x y z") for i in range(10)], "doc_id long, text string"
    ).write.parquet(p)
    df = textstats.tfidf_topk(spark.read.parquet(p), cache=False)
    plan = plan_of(df)
    # rank<=k must become a WindowGroupLimit (partial top-k before the
    # window shuffle) — at corpus scale this is the difference between
    # shuffling k terms per doc and shuffling the whole vocabulary
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop is the deliberate 1-row corpus-size join
    # (simple mode prints each node once; formatted lists nodes twice)
    assert plan_of(df, "simple").count("BroadcastNestedLoopJoin") <= 1


def test_funnel_and_dupgram_have_no_cartesian(spark, tmp_path):
    from anendektos_spark.functions import logops, textstats

    ed = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, None, 1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(ed)
    plan = plan_of(logops.funnel(spark.read.parquet(ed)))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    dd = str(tmp_path / "docs")
    spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string").write.parquet(dd)
    plan = plan_of(textstats.dup_gram_fraction(spark.read.parquet(dd), cache=False))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_conv_reconstruct_needs_no_window_pass(spark):
    from anendektos_spark.functions import convops

    df = convops.synth_conv(spark, 64)
    plan = plan_of(convops.conv_reconstruct(df))
    # in-group ordering comes from array_sort inside the aggregate — a
    # separate Window (global per-conv sort pass) would be a second
    # shuffle+sort the operator is designed to avoid
    assert "Window" not in plan
    assert "ObjectHashAggregate" in plan  # collect_list agg


def test_scd2_windows_share_one_exchange(spark, tmp_path):
    from anendektos_spark.functions import logops

    p = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, 1, "A", 0.0), (1, 2, "B", 9.0)],
        "user_id int, event_id int, event_type string, v double",
    ).select(
        "user_id", "event_id", "event_type", F.timestamp_seconds("v").alias("ts")
    ).write.parquet(p)
    df = logops.scd2_intervals(
        spark.read.parquet(p), ["user_id"], "event_type", "ts", tie_col="event_id"
    )
    plan = plan_of(df, "simple")
    # the change-detect lag window and the interval-close lead window are
    # both keyed on user_id: ONE hash exchange, the second window only
    # re-sorts the (much smaller) change rows
    assert plan.count("Exchange hashpartitioning") == 1


def test_semantic_dup_pairs_broadcasts_centroids(spark):
    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.5]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "centroid_id int, embedding array<double>",
    )
    df = similarity.semantic_dup_pairs(emb, cents)
    plan = plan_of(df, "simple")
    # centroid model is inlined as literals → assignment is a narrow map:
    # the ONLY corpus shuffles are the self-join's two identical
    # centroid_id exchanges (runtime-deduped to one ReusedExchange)
    assert plan.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    df.collect()
    assert "ReusedExchange" in df._jdf.queryExecution().executedPlan().toString()


def test_inverted_index_single_shuffle(spark, tmp_path):
    from anendektos_spark.functions import textstats

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    ).write.parquet(p)
    plan = plan_of(textstats.inverted_index(spark.read.parquet(p), max_postings=4), "simple")
    # explode → rank/df windows → final aggregate all key on `term`:
    # one hash exchange end-to-end (the cap filter and collect_list reuse
    # the windows' partitioning)
    assert plan.count("Exchange hashpartitioning") == 1


def test_cms_estimate_broadcasts_sketch(spark, tmp_path):
    from anendektos_spark.functions import sketches

    p = str(tmp_path / "keys")
    spark.range(100).select(F.col("id").cast("string").alias("k")).write.parquet(p)
    keys = spark.read.parquet(p)
    cms = sketches.cms_build(keys, "k")
    plan = plan_of(sketches.cms_estimate(cms, keys, "k"))
    # the counter table joins broadcast (it is <= depth*256 rows by
    # construction) — estimating any number of keys never shuffles them
    # against the sketch
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # build side: partial+final hash aggregate (map-side combine caps the
    # shuffle at depth*width rows per task)
    assert plan_of(cms).count("HashAggregate") >= 2


def test_lm_score_no_cartesian(spark, tmp_path):
    from anendektos_spark.functions import textstats

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "a b c a b") for i in range(6)], "doc_id long, text string"
    ).write.parquet(p)
    plan = plan_of(textstats.lm_score(spark.read.parquet(p), cache=False), "simple")
    assert "CartesianProduct" not in plan
    # the only nested-loop is the deliberate 1-row vocabulary-size join
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_cosine_pairs_and_spans_no_cartesian(spark, tmp_path):
    from anendektos_spark.functions import dedup, textstats

    p = str(tmp_path / "docs_pairs")
    spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(6)], "doc_id long, text string"
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    # all-pairs cosine: docs meet only through shared terms — the only
    # nested-loop join allowed is the broadcast of the 1-row corpus count
    plan = plan_of(textstats.tfidf_cosine_pairs(docs, threshold=0.0), "simple")
    assert "CartesianProduct" not in plan
    plan2 = plan_of(dedup.dedup_spans(docs, block_tokens=2), "simple")
    assert "CartesianProduct" not in plan2


def test_classifier_gradient_single_shuffle_and_narrow_scoring(spark):
    from pyspark.sql import functions as F

    from anendektos_spark.functions import classify

    emb = spark.createDataFrame(
        [(i, [0.1, -0.2]) for i in range(6)], "vec_id long, embedding array<float>"
    )
    xy = classify.quantize_features(emb).select(
        "vec_id", "x", classify.derived_target(1).alias("y")
    )
    rel = xy.select("x", F.col("y").cast("long").alias("y"))
    resid = (
        F.col("y") * F.lit(classify.FP * classify.WS).cast("long")
        - classify._dot([0, 0, 0])
    ).alias("r")
    grads = (
        rel.select(resid, F.posexplode("x").alias("j", "xv"))
        .groupBy("j")
        .agg(
            F.sum(
                F.col("xv").cast("decimal(19,0)") * F.col("r").cast("decimal(19,0)")
            ).alias("g")
        )
    )
    plan = plan_of(grads, "simple")
    # ONE shuffle keyed on the dim index, partial+final aggregate (the
    # map-side combine caps shuffle rows at dims × partitions)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2
    # scoring against literal weights is a pure narrow map
    score_plan = plan_of(classify.linear_score(xy, [1, 2, 3]), "simple")
    assert "Exchange" not in score_plan


def test_conv_dedup_no_cartesian(spark):
    from anendektos_spark.functions import convops

    conv = convops.conv_reconstruct(convops.synth_conv_dup(spark, 320, templates=4))
    p = plan_of(
        dedup.lsh_jaccard(conv, id_col="conv_id", text_col="transcript"),
        "extended",
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_pq_topk_broadcasts_codebook_and_table(spark):
    emb = spark.range(64).select(
        F.col("id").cast("int").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), 97) / 97.0),
        ).alias("embedding"),
    )
    cb = similarity.pq_codebook(emb, n_codes=8, m_sub=4, dims=16)
    df = similarity.pq_topk(emb, emb.filter(F.col("vec_id") < 2), cb, 3, m_sub=4, dims=16)
    df.collect()  # executed plan (post-AQE)
    p = df._jdf.queryExecution().executedPlan().toString()
    # codebook + ADC table arrive as broadcasts; candidates via hash join
    assert p.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in p
    # top-k never sorts the corpus into one partition
    assert "TakeOrderedAndProject" in p or "WindowGroupLimit" in p


def test_bm25_filters_postings_before_shuffle(spark, tmp_path):
    from anendektos_spark.functions import textstats

    d = str(tmp_path / "docs")
    spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.lit("join"), F.md5(F.col("id").cast("string"))).alias("text"),
    ).write.parquet(d)
    df = textstats.bm25_topk(spark.read.parquet(d), ["join"], 5, cache=False)
    p = plan_of(df, "extended")
    # the IN-list lands between the explode and the (doc, term) exchange:
    # physical plan shows the Filter applied to the generated term column
    assert "term#" in p and "Filter term" in p.replace("(", " ").replace(")", " ") or (
        "Filter" in p and "IN (join" in p.replace("'", "")
    )
    assert "CartesianProduct" not in p


def test_prefix_jaccard_has_no_cartesian(spark):
    docs = spark.createDataFrame(
        [(i, f"some text number {i} with shared tokens") for i in range(50)],
        "doc_id long, text string",
    )
    plan = plan_of(dedup.prefix_jaccard_pairs(docs, threshold=0.5, cache=False))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_importance_sample_broadcasts_model_sides(spark):
    from anendektos_spark.functions import sampling

    df = spark.createDataFrame(
        [(i, f"word{i % 7} common tokens here", i % 3 == 0) for i in range(60)],
        "doc_id long, text string, is_tgt boolean",
    )
    plan = plan_of(sampling.importance_sample(df, "is_tgt", 5))
    # the B-bucket ratio table and the 1-row totals both arrive broadcast;
    # the corpus side must never shuffle for them
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan
    # deterministic top-k compiles to a partial top-k, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_random_projection_zero_shuffle_narrow_map(spark, tmp_path):
    spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    ).write.parquet(str(tmp_path / "emb"))
    emb = spark.read.parquet(str(tmp_path / "emb"))
    plan = plan_of(similarity.random_projection(emb, out_dim=4, in_dim=8))
    # sign matrix folds into the projection as literals: no exchange of
    # any kind, no Python boundary
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_histogram_drift_single_data_exchange_broadcast_totals(spark, tmp_path):
    from anendektos_spark.functions import logops

    spark.createDataFrame(
        [(float(i % 13), i % 2 == 0) for i in range(200)],
        "value double, isb boolean",
    ).write.parquet(str(tmp_path / "drift"))
    df = spark.read.parquet(str(tmp_path / "drift"))
    out = logops.histogram_drift(df, "value", F.col("isb"), 0.0, 10.0, 5)
    plan = plan_of(out)
    # the raw data is scanned ONCE and crosses exactly ONE hash exchange
    # (the bin aggregate); the period totals are a window over the
    # ≤ n_bins+2-row bin relation (Exchange SinglePartition of bin
    # counts), never a second scan+aggregate of the input
    # one Location: line per scan node in formatted mode
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert plan.count("hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


def test_mad_outliers_single_exchange(spark):
    from anendektos_spark.functions import transcript

    parsed = transcript.parse_turns(transcript.synth_transcript(spark, 2000))
    plan = plan_of(transcript.latency_mad_outliers(parsed))
    # every window pass (both rank sorts, both median extractions) is
    # partitioned by tool_called → ONE hash exchange, re-sorts only
    assert plan.count("hashpartitioning") == 1
    assert "Python" not in plan and "CartesianProduct" not in plan


def test_degenerate_runs_single_exchange(spark):
    from anendektos_spark.functions import convops

    df = convops.synth_conv_degen(spark, 2000)
    plan = plan_of(convops.degenerate_runs(df))
    # lag + running-sum windows and the closing groupBy all cluster on
    # conv_id (superset-key reuse) → ONE hash exchange
    assert plan.count("hashpartitioning") == 1
    assert "Python" not in plan and "CartesianProduct" not in plan


def test_pack_with_masks_conv_grain_shuffles_only(spark):
    from anendektos_spark.functions import convops

    out = convops.pack_with_masks(convops.synth_conv(spark, 2000))
    plan = plan_of(out)
    # three hash exchanges: the turn window (conv_id), the conv-total
    # partial aggregate (conv-grain sums only), the bucket packing
    # window (conv-grain); the turns↔assignment join must never go
    # cartesian, and the whole operator is JVM-only
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3
    assert "partial_sum" in plan or "partial sum" in plan.lower()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


def test_editdist_refine_no_cartesian(spark):
    docs = spark.createDataFrame(
        [(i, f"some text number {i} with shared tokens") for i in range(50)],
        "doc_id long, text string",
    )
    plan = plan_of(
        dedup.editdist_refine(docs, dedup.lsh_candidates(docs), max_dist=10)
    )
    # both text sides attach to the banded candidate relation through
    # id-keyed equi-joins; the pair set is never formed by a cross join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_round4_single_exchange_window_ops(spark):
    """truncate_context and calibrate_scores must each run on ONE hash
    exchange (shared by their windows); tool_paths on one conv_id
    exchange with no joins or explodes."""
    from anendektos_spark.functions import convops, sampling, transcript

    tx = convops.synth_conv(spark, 640)
    d1 = convops.truncate_context(tx)
    d1.collect()
    # executedPlan prints Final + Initial under AQE: count the final only
    p1 = d1._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert p1.count("Exchange hashpartitioning") == 1
    assert "Join" not in p1

    sc = spark.createDataFrame(
        [(i, "s%d" % (i % 3), float(i % 7) / 7) for i in range(60)],
        "doc_id long, source string, quality double",
    )
    d2 = sampling.calibrate_scores(sc, "quality")
    d2.collect()
    p2 = d2._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert p2.count("Exchange hashpartitioning") == 1
    assert "Join" not in p2

    parsed = transcript.parse_turns(transcript.synth_transcript(spark, 640))
    d3 = transcript.tool_paths(parsed, k=3)
    d3.collect()
    p3 = d3._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert "Join" not in p3 and "Generate" not in p3
    assert "TakeOrderedAndProject" in p3


def test_hdr_histogram_partial_combine_and_sketch_grain_walk(spark):
    """The histogram shuffle must be map-side combined (partial_count
    below the exchange); the percentile walk must add no exchange beyond
    the sketch's own window partitioning."""
    from anendektos_spark.functions import sketches

    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 13) % 997 + 1).cast("long").alias("v"),
    )
    h = sketches.hdr_histogram(df, "v", "g")
    h.collect()
    ph = h._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in ph  # map-side combine below the exchange
    p = sketches.hdr_percentiles(h, (50, 99), "g")
    p.collect()
    pp = p._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in pp and "Join" not in pp


def test_round5_plan_shapes(spark):
    """Executed-plan pins for the round-5 ops' 100-TB contracts:

    - status_flaps / retry_recovery: TWO hash exchanges — the
      (conv, tool) window sort, then the tool-grain rollup — with a
      partial (map-side) aggregate BEFORE the second exchange and no
      joins; the rollup's shuffle moves pre-combined per-task rows,
      never the turn relation twice;
    - slo_burn: ONE exchange (the (tool, hour) aggregate), no window,
      no join;
    - session_stats: ONE conv_id exchange shared by the lag window and
      the final aggregate;
    - cohort_retention: joins run at USER grain only — the events scan
      feeds exactly one corpus-sized aggregate, and no plan node joins
      two corpus-sized relations (no events self-join)."""
    from anendektos_spark.functions import convops, logops, transcript

    parsed = transcript.parse_turns(transcript.synth_transcript(spark, 640))

    for op in (transcript.status_flaps, transcript.retry_recovery):
        d = op(parsed)
        d.collect()
        p = d._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan ==")[0]
        assert p.count("Exchange hashpartitioning") == 2, op.__name__
        # map-side combine before the rollup exchange
        ex2 = p.index("Exchange hashpartitioning")
        assert "partial_count" in p[ex2:], op.__name__
        assert "Join" not in p, op.__name__

    d = transcript.slo_burn(parsed, 800)
    d.collect()
    p = d._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p and "Window" not in p

    d = transcript.session_stats(convops.synth_conv(spark, 640))
    d.collect()
    p = d._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p

    ev = spark.createDataFrame(
        [(i % 50, i * 3600) for i in range(400)], "user_id long, ep long"
    ).select("user_id", F.timestamp_seconds("ep").alias("ts"))
    d = logops.cohort_retention(ev)
    d.collect()
    p = d._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    # joins exist (user-grain + cohort-size), but never a cartesian
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_response_gap_rank_window_is_post_aggregate(spark):
    """The scale contract of response_gap: the SinglePartition exchange
    that feeds the percentile rank must consume the OUTPUT of the gap_s
    hash aggregate (distinct-value histogram), never the raw gap rows —
    pin by asserting the single-partition exchange sits ABOVE a
    HashAggregate on gap_s in the executed tree."""
    from anendektos_spark.functions import convops, transcript

    d = transcript.response_gap(convops.synth_conv(spark, 2000))
    d.collect()
    p = d._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    sp = p.index("Exchange SinglePartition")
    # a partial_count(1) keyed by gap_s must appear AFTER (deeper than)
    # the single-partition exchange in the printed tree
    agg = p.index("partial_count")
    assert agg > sp, "rank window must run over the gap_s histogram"
    assert "gap_s" in p[agg - 400:agg + 200]
