"""Round-5 regression tests for the ADVICE r4 findings: 64-bit wrap
points in tool_concentration / datacard_finish / collocations dice (all
now DECIMAL(38,0) like their HUGEINT DuckDB mirrors) and single-quote
escaping in phrase_search_sql."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anendektos_spark.functions import textstats, transcript

from tests.test_plans import plan_of


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _parsed(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool_called string, "
              "status string, epoch long, latency_ms int"
    )


# --------------------------------------------------------------------------
# DECIMAL(38,0) wrap fixes (ADVICE r4 #1/#2): the squared / scaled
# products must run in decimal, not 64-bit long, so the Spark arithmetic
# matches the HUGEINT DuckDB mirrors at any count. Counts large enough
# to wrap a long (>3e9 rows per key) can't be materialized in a unit
# test, so we pin the analyzed plan: the sum_sq / dice aggregation
# expressions must be decimal(38,0)-typed, and the result must still be
# hand-exact at small counts.
# --------------------------------------------------------------------------

def test_tool_concentration_sum_sq_is_decimal(spark):
    rows = [("c", i, t, "OK", 0, 1)
            for i, t in enumerate(["dns", "dns", "dns", "conn"])]
    df = transcript.tool_concentration(
        _parsed(spark, rows), transcript.tool_dim(spark))
    plan = plan_of(df, "extended")
    assert "decimal(38,0)" in plan  # cnt squared in decimal, not long
    net = {r.category: r for r in df.collect()}["net"]
    assert net.hhi_ppm == (9 + 1) * 1_000_000 // 16  # still hand-exact


def test_datacard_sum_sq_is_decimal(spark):
    rows = [
        (1, "a b c", "en", "s1", 5),
        (2, "d e", "en", "s1", 3),
        (3, "f", "fr", "s1", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = textstats.corpus_datacard(df)
    plan = plan_of(out, "extended")
    assert "decimal(38,0)" in plan
    s1 = {r.source: r for r in out.collect()}["s1"]
    assert s1.lang_hhi_ppm == 5 * 1_000_000 // 9


def test_collocations_dice_is_decimal(spark):
    df = _docs(spark, ["new york city", "new york", "new jersey"])
    out = textstats.collocations(df, min_count=2, top_n=10)
    plan = plan_of(out, "extended")
    # both fixed-point numerators (score AND dice) run in decimal(38,0)
    assert plan.count("cast(cnt_pair") >= 1 and "decimal(38,0)" in plan
    got = {(r.w1, r.w2): r for r in out.collect()}
    ny = got[("new", "york")]
    # dice = 2·2·1e6 // (3 + 2) = 800000 — unchanged by the width fix
    assert ny.dice_ppm == 2 * 2 * 1_000_000 // (3 + 2)


# --------------------------------------------------------------------------
# phrase_search_sql quote escaping (ADVICE r4 #3)
# --------------------------------------------------------------------------

def test_phrase_search_sql_escapes_single_quotes(spark):
    import duckdb

    texts = [
        "it's a fine day",
        "say it's a fine day twice it's a",
        "its a fine day without the quote",
    ]
    phrase = "it's a"
    rel = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            "({}, '{}')".format(i, t.replace("'", "''"))
            for i, t in enumerate(texts)
        )
        + ") AS v(doc_id, text)"
    )
    sql = textstats.phrase_search_sql(rel, phrase)
    assert "''" in sql  # the escape actually happened
    orows = sorted(tuple(t) for t in duckdb.sql(sql).fetchall())
    srows = sorted(
        tuple(r)
        for r in textstats.phrase_search(_docs(spark, texts), phrase).collect()
    )
    assert srows == orows
    assert srows == [(0, 1, 0), (1, 2, 1)]


# --------------------------------------------------------------------------
# round-5 transcript operators: status flaps, SLO burn, latency by
# status, retry recovery, response gap, session stats — hand-computed
# semantics + DuckDB mirror equivalence on the synth corpus.
# --------------------------------------------------------------------------

def test_status_flaps_hand_computed(spark):
    rows = [
        ("c", 0, "a", "OK", 0, 1), ("c", 2, "a", "ERR", 0, 1),
        ("c", 4, "a", "OK", 0, 1), ("c", 6, "a", "OK", 0, 1),
        ("d", 0, "b", "ERR", 0, 1),  # lone call: no transitions
    ]
    out = {r.tool: r for r in transcript.status_flaps(_parsed(spark, rows)).collect()}
    a = out["a"]
    assert (a.n_transitions, a.n_degrade, a.n_recover) == (3, 1, 1)
    assert a.flap_ppm == 2 * 1_000_000 // 3
    assert "b" not in out


def test_slo_burn_hand_computed(spark):
    rows = [
        ("c", 0, "a", "OK", 10, 50), ("c", 2, "a", "OK", 20, 150),
        ("c", 4, "a", "TIMEOUT", 3700, 150),
    ]
    out = {(r.tool, r.hour_epoch): r
           for r in transcript.slo_burn(_parsed(spark, rows), slo_ms=100).collect()}
    h0 = out[("a", 0)]
    assert (h0.n_calls, h0.n_breach, h0.burn_ppm) == (2, 1, 500_000)
    h1 = out[("a", 3600)]
    assert (h1.n_calls, h1.n_breach, h1.burn_ppm) == (1, 1, 1_000_000)
    with pytest.raises(ValueError):
        transcript.slo_burn(_parsed(spark, rows), slo_ms=0)


def test_latency_by_status_hand_computed(spark):
    rows = [
        ("c", 0, "a", "OK", 0, 10), ("c", 2, "a", "OK", 0, 20),
        ("c", 4, "a", "OK", 0, 30), ("c", 6, "a", "ERR", 0, 5),
    ]
    got = sorted(
        tuple(r)
        for r in transcript.latency_by_status(
            _parsed(spark, rows), ps=(50, 100)
        ).collect()
    )
    assert got == [
        ("a", "ERR", 50, 5), ("a", "ERR", 100, 5),
        ("a", "OK", 50, 20), ("a", "OK", 100, 30),
    ]


def test_retry_recovery_hand_computed(spark):
    rows = [
        ("c", 0, "a", "ERR", 0, 1), ("c", 2, "a", "OK", 0, 1),
        ("c", 1, "b", "ERR", 0, 1),                       # never retried
        ("d", 0, "a", "ERR", 0, 1), ("d", 2, "a", "ERR", 0, 1),
        ("d", 4, "a", "OK", 0, 1),
    ]
    out = {r.tool: r for r in transcript.retry_recovery(_parsed(spark, rows)).collect()}
    a = out["a"]
    assert (a.n_failures, a.n_retried, a.n_recovered) == (3, 3, 2)
    assert a.recovery_ppm == 2 * 1_000_000 // 3
    b = out["b"]
    assert (b.n_failures, b.n_retried, b.n_recovered, b.recovery_ppm) == (1, 0, 0, 0)


def _conv(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ep long"
    ).select("conv_id", "turn_idx", "role", F.timestamp_seconds("ep").alias("ts"))


def test_response_gap_hand_computed(spark):
    rows = [
        ("c", 0, "user", 0), ("c", 1, "assistant", 5),
        ("c", 2, "user", 10), ("c", 3, "assistant", 30),
        ("d", 0, "user", 0), ("d", 1, "user", 100),       # user→user skipped
        ("d", 2, "assistant", 107),
    ]
    got = {r.p: r.gap_p_s for r in transcript.response_gap(_conv(spark, rows)).collect()}
    # gaps = [5, 7, 20]; nearest-rank p50 → rank 2 → 7, p90/p99 → rank 3 → 20
    assert got == {50: 7, 90: 20, 99: 20}


def test_response_gap_no_full_data_global_sort(spark):
    """The global ordering must run over the distinct-gap histogram, not
    the raw gap rows: the physical plan's single-partition window sits
    above the gap_s aggregate (scale contract for the constant-key rank)."""
    from anendektos_spark.functions import convops

    df = transcript.response_gap(convops.synth_conv(spark, 2000))
    plan = plan_of(df, "simple")
    # the single-partition exchange that feeds the rank window must sit
    # ABOVE (earlier in the printed top-down tree than) the gap_s hash
    # aggregate it consumes — i.e. the rank runs over the histogram, not
    # the raw gap rows (see also test_plans.
    # test_response_gap_rank_window_is_post_aggregate on the executed
    # plan)
    sp = plan.index("Exchange SinglePartition")
    agg = plan.index("HashAggregate")
    assert sp < agg, "rank window must consume the gap_s histogram"
    assert "gap_s" in plan[agg:agg + 400]


def test_response_gap_sql_matches(spark):
    import duckdb
    from anendektos_spark.functions import convops

    df = transcript.response_gap(convops.synth_conv(spark, 4000))
    rows = sorted(tuple(r) for r in df.collect())
    orows = sorted(tuple(t) for t in duckdb.sql(
        transcript.response_gap_sql(convops.synth_conv_sql(4000))).fetchall())
    assert rows and rows == orows


def test_session_stats_hand_computed(spark):
    rows = [
        ("c", 0, "user", 0), ("c", 1, "assistant", 30), ("c", 2, "user", 120),
        ("d", 0, "user", 7),
    ]
    out = {r.conv_id: r for r in transcript.session_stats(
        _conv(spark, rows), gap_seconds=60).collect()}
    assert (out["c"].n_turns, out["c"].n_sessions) == (3, 2)
    assert (out["d"].n_turns, out["d"].n_sessions) == (1, 1)
    with pytest.raises(ValueError):
        transcript.session_stats(_conv(spark, rows), gap_seconds=0)


def test_session_stats_sql_matches(spark):
    import duckdb
    from anendektos_spark.functions import convops

    df = transcript.session_stats(convops.synth_conv(spark, 4000), gap_seconds=40)
    rows = sorted(tuple(r) for r in df.collect())
    orows = sorted(tuple(t) for t in duckdb.sql(
        transcript.session_stats_sql(
            convops.synth_conv_sql(4000), gap_seconds=40)).fetchall())
    assert rows and rows == orows


def test_flaps_slo_recovery_latencybystatus_sql_match(spark):
    import duckdb

    n = 4000
    parsed = transcript.parse_turns(transcript.synth_transcript(spark, n)).cache()
    rel = transcript.synth_transcript_sql(n)
    for fn, sql in [
        (transcript.status_flaps(parsed), transcript.status_flaps_sql(rel)),
        (transcript.slo_burn(parsed, 800), transcript.slo_burn_sql(rel, 800)),
        (transcript.latency_by_status(parsed),
         transcript.latency_by_status_sql(rel)),
        (transcript.retry_recovery(parsed), transcript.retry_recovery_sql(rel)),
    ]:
        rows = sorted(tuple(r) for r in fn.collect())
        orows = sorted(tuple(t) for t in duckdb.sql(sql).fetchall())
        assert rows and rows == orows


# --------------------------------------------------------------------------
# hapax rate (textstats)
# --------------------------------------------------------------------------

def test_hapax_rate_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a b a", "s1"), (2, "b c", "s1"), (3, "x x x", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in textstats.hapax_rate(df).collect()}
    s1 = out["s1"]
    # s1 vocab {a:2, b:2, c:1} → vocab 3, hapax 1, tokens 5
    assert (s1.vocab, s1.n_hapax, s1.n_tokens) == (3, 1, 5)
    assert s1.hapax_ppm == 1_000_000 // 3
    s2 = out["s2"]
    assert (s2.vocab, s2.n_hapax, s2.hapax_ppm) == (1, 0, 0)


def test_hapax_rate_sql_matches(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    rows = sorted(tuple(r) for r in textstats.hapax_rate(docs).collect())
    rel = f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
    orows = sorted(tuple(t) for t in duckdb.sql(
        textstats.hapax_rate_sql(rel)).fetchall())
    assert rows and rows == orows


def test_conv_concurrency_hand_computed(spark):
    rows = [
        ("c", 0, "user", 100), ("c", 1, "assistant", 7300),  # spans h0..h2
        ("d", 0, "user", 3700),                              # h1 only
    ]
    got = {r.hour_epoch: r.n_active
           for r in transcript.conv_concurrency(_conv(spark, rows)).collect()}
    assert got == {0: 1, 3600: 2, 7200: 1}


def test_conv_concurrency_sql_matches(spark):
    import duckdb
    from anendektos_spark.functions import convops

    df = transcript.conv_concurrency(convops.synth_conv(spark, 4000))
    rows = sorted(tuple(r) for r in df.collect())
    orows = sorted(tuple(t) for t in duckdb.sql(
        transcript.conv_concurrency_sql(convops.synth_conv_sql(4000))).fetchall())
    assert rows and rows == orows


# --------------------------------------------------------------------------
# cohort retention (logops)
# --------------------------------------------------------------------------

def test_cohort_retention_hand_computed(spark):
    from anendektos_spark.functions import logops

    d = 86_400  # seconds per day
    rows = [  # (user, epoch_s): u1 day0+day1+day2, u2 day0 only, u3 day1+day3
        (1, 10), (1, d + 5), (1, 2 * d + 1), (1, 2 * d + 2),
        (2, 20),
        (3, d + 9), (3, 3 * d),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s long").select(
        "user_id", F.timestamp_seconds("ts_s").alias("ts")
    )
    out = {(r.cohort_day, r.age_days): r
           for r in logops.cohort_retention(df).collect()}
    # cohort day0 = {u1, u2}: age0 → 2, age1 → 1 (u1), age2 → 1 (u1)
    assert out[(0, 0)].n_users == 2 and out[(0, 0)].cohort_size == 2
    assert out[(0, 0)].retention_ppm == 1_000_000
    assert out[(0, 1)].n_users == 1 and out[(0, 1)].retention_ppm == 500_000
    assert out[(0, 2)].n_users == 1
    # cohort day1 = {u3}: age0 → 1, age2 → 1
    assert out[(1, 0)].n_users == 1 and out[(1, 2)].n_users == 1
    assert len(out) == 5


def test_cohort_retention_sql_matches(spark):
    import duckdb
    from anendektos_spark.functions import logops

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    rows = sorted(tuple(r) for r in logops.cohort_retention(ev).collect())
    orows = sorted(tuple(t) for t in duckdb.sql(logops.cohort_retention_sql(
        f"SELECT * FROM read_parquet('{sf}/events.parquet')")).fetchall())
    assert rows and rows == orows


# --------------------------------------------------------------------------
# embed_label_balance: class-balance datacard (round-5 slot 10)
# --------------------------------------------------------------------------

def test_label_balance_hand_exact(spark):
    from anendektos_spark.functions import similarity

    df = spark.createDataFrame(
        [(i, "a" if i < 6 else ("b" if i < 9 else "c")) for i in range(10)],
        "vec_id long, label string",
    )
    out = {r.label: r for r in similarity.label_balance(df).collect()}
    assert out["a"].cnt == 6 and out["a"].share_ppm == 600_000
    assert out["b"].share_ppm == 300_000 and out["c"].share_ppm == 100_000
    # uniform share over k=3 labels is 333333 ppm (floor)
    assert out["a"].dev_uniform_ppm == 600_000 - 333_333
    assert out["c"].dev_uniform_ppm == 333_333 - 100_000


def test_label_balance_plan_decimal_and_broadcast(spark):
    from anendektos_spark.functions import similarity
    from tests.test_plans import plan_of

    df = spark.createDataFrame([(1, "a"), (2, "b")], "vec_id long, label string")
    out = similarity.label_balance(df)
    ext = plan_of(out, "extended")
    assert "decimal(38,0)" in ext  # share product runs in decimal, not long
    phys = plan_of(out)
    assert "BroadcastNestedLoopJoin" in phys or "BroadcastExchange" in phys
    assert out.schema["share_ppm"].dataType.typeName() == "long"


# --------------------------------------------------------------------------
# late round-5 operators: error cascade, outcome-by-depth, length outliers
# --------------------------------------------------------------------------

def test_error_cascade_hand_exact(spark):
    # conv A: dns FAIL -> dns FAIL -> dns OK ; conv B: dns OK -> dns OK
    rows = [
        ("A", 0, "dns", "TIMEOUT", 0, 1), ("A", 1, "dns", "TIMEOUT", 0, 1),
        ("A", 2, "dns", "OK", 0, 1),
        ("B", 0, "dns", "OK", 0, 1), ("B", 1, "dns", "OK", 0, 1),
    ]
    out = {r.tool: r for r in transcript.error_cascade(
        _parsed(spark, rows)).collect()}
    d = out["dns"]
    # pairs with a successor: A0->A1, A1->A2, B0->B1 = 3
    assert d.n_pairs == 3 and d.n_fail == 2
    # after a failure: A0->A1 (fail), A1->A2 (ok) => cascade 1/2
    assert d.cascade_ppm == 500_000
    # next-call failure overall: only A0->A1 => 1/3
    assert d.base_next_fail_ppm == 333_333
    assert d.lift_ppm == 500_000 - 333_333


def test_error_cascade_no_failures_null_cascade(spark):
    rows = [("A", 0, "conn", "OK", 0, 1), ("A", 1, "conn", "OK", 0, 1)]
    r = transcript.error_cascade(_parsed(spark, rows)).collect()[0]
    assert r.n_fail == 0 and r.cascade_ppm is None and r.lift_ppm is None


def test_outcome_by_depth_hand_exact(spark):
    # conv lengths: 1 (failed), 2, 3 (failed), 4 -> buckets 0,1,1,2
    rows = []
    for cid, n, fail in [("a", 1, True), ("b", 2, False),
                         ("c", 3, True), ("d", 4, False)]:
        for i in range(n):
            last = i == n - 1
            rows.append((cid, i, "dns", "FAIL" if (fail and last) else "OK",
                         0, 1))
    out = {r.depth_bucket: r for r in transcript.outcome_by_depth(
        _parsed(spark, rows)).collect()}
    assert out[0].min_calls == 1 and out[0].n_convs == 1
    assert out[0].failed_ppm == 1_000_000
    assert out[1].min_calls == 2 and out[1].n_convs == 2
    assert out[1].failed_ppm == 500_000
    assert out[2].min_calls == 4 and out[2].failed_ppm == 0


def test_length_outliers_hand_exact(spark):
    # source s1: lengths 10x8 and one 500 -> med 10, mad 0 edge avoided by
    # adding spread: use 8,9,10,11,12 and 500
    rows = [(i, "t", "en", "s1", c)
            for i, c in enumerate([8, 9, 10, 11, 12, 500])]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    r = textstats.length_outliers(df, k=4).collect()[0]
    # n=6, med rank (6+1) DIV 2 = 3 -> value 10; devs sorted 0,1,1,2,2,490
    # mad rank 3 -> 1; outliers: dev > 4 -> only 500 (dev 490)
    assert r.n_docs == 6 and r.med_chars == 10 and r.mad_chars == 1
    assert r.n_outliers == 1 and r.outlier_ppm == 166_666


def test_round5_late_single_exchange_plans(spark):
    """Plan pins: cascade/depth ride one conv_id exchange; length
    outliers ride one source exchange; ppm math is decimal(38,0)."""
    from tests.test_plans import plan_of

    rows = [("A", 0, "dns", "OK", 0, 1), ("A", 1, "dns", "OK", 0, 1)]
    casc = transcript.error_cascade(_parsed(spark, rows))
    ext = plan_of(casc, "extended")
    assert "decimal(38,0)" in ext
    docs = spark.createDataFrame(
        [(1, "t", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    lo = textstats.length_outliers(docs)
    phys = plan_of(lo)
    # both rank windows + both median extractions share ONE source exchange
    assert phys.count("hashpartitioning(source") <= 1 or \
        phys.count("Exchange hashpartitioning(source") == 1
    assert "decimal(38,0)" in plan_of(lo, "extended")


# --------------------------------------------------------------------------
# embed_pca_top: fixed-point power-iteration principal component
# --------------------------------------------------------------------------

def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_pca_power_axis_aligned(spark):
    from anendektos_spark.functions import similarity

    # variance lives entirely on axis 1; axis 0 constant, axis 2 zero
    vecs = [[0.5, -0.8, 0.0], [0.5, 0.8, 0.0], [0.5, -0.4, 0.0],
            [0.5, 0.4, 0.0]]
    out = {r.dim: r for r in similarity.pca_power(
        _emb(spark, vecs), iters=4, dims=3).collect()}
    assert out[0].mean_q == 5000 and out[1].mean_q == 0
    assert out[0].component_q == 0 and out[2].component_q == 0
    assert abs(out[1].component_q) == 1_000_000


def test_pca_power_degenerate_zero_vector(spark):
    from anendektos_spark.functions import similarity

    vecs = [[0.3, 0.7], [0.3, 0.7], [0.3, 0.7]]
    out = {r.dim: r for r in similarity.pca_power(
        _emb(spark, vecs), iters=3, dims=2).collect()}
    assert out[0].component_q == 0 and out[1].component_q == 0
    # float32(0.7) = 0.69999998..., so the floor-quantized mean is 6999
    assert out[0].mean_q == 3000 and out[1].mean_q == 6999


def test_pca_power_dominant_axis_wins(spark):
    from anendektos_spark.functions import similarity

    # axis 0 spread ±0.9, axis 1 spread ±0.1 -> component max-abs on axis 0
    vecs = [[0.9, 0.1], [-0.9, -0.1], [0.9, -0.1], [-0.9, 0.1]]
    out = {r.dim: r for r in similarity.pca_power(
        _emb(spark, vecs), iters=4, dims=2).collect()}
    assert abs(out[0].component_q) == 1_000_000
    assert abs(out[1].component_q) < 200_000


def test_pca_power_sql_matches(spark):
    import duckdb
    from anendektos_spark.functions import similarity

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    rows = sorted(tuple(r) for r in similarity.pca_power(
        emb, iters=3, dims=64).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    sql = similarity.pca_power_sql(
        "SELECT embedding FROM embeddings", iters=3, dims=64
    )
    orows = sorted(tuple(t) for t in con.sql(sql).fetchall())
    assert rows == orows


def test_pca_power_validation(spark):
    from anendektos_spark.functions import similarity

    with pytest.raises(ValueError):
        similarity.pca_power(_emb(spark, [[0.1]]), iters=0, dims=1)
    with pytest.raises(ValueError):
        similarity.pca_power(_emb(spark, []), iters=2, dims=2)


# --------------------------------------------------------------------------
# embed_whiten: all-but-the-top removal of the fitted component
# --------------------------------------------------------------------------

def test_whiten_removes_dominant_axis(spark):
    from anendektos_spark.functions import similarity

    vecs = [[0.9, 0.1], [-0.9, -0.1], [0.9, -0.1], [-0.9, 0.1]]
    emb = _emb(spark, vecs)
    comp = similarity.pca_power(emb, iters=4, dims=2)
    out = {r.vec_id: list(r.whitened) for r in
           similarity.whiten_top_component(emb, comp, dims=2).collect()}
    v = {r.dim: r.component_q for r in comp.collect()}
    sum_abs_v = abs(v[0]) + abs(v[1])
    for i, vec in enumerate(vecs):
        # projection of the whitened vector onto the component is zero up
        # to the truncation remainder (< sum |v_j| per construction)
        resid = out[i][0] * v[0] + out[i][1] * v[1]
        assert abs(resid) < sum_abs_v
    # the dominant axis-0 magnitude collapsed (was ~9000 fp units)
    assert all(abs(out[i][0]) < 2000 for i in range(4))


def test_whiten_zero_component_returns_centered(spark):
    from anendektos_spark.functions import similarity

    vecs = [[0.3, 0.7], [0.3, 0.7]]
    emb = _emb(spark, vecs)
    comp = similarity.pca_power(emb, iters=2, dims=2)
    out = similarity.whiten_top_component(emb, comp, dims=2).collect()
    for r in out:
        assert list(r.whitened) == [0, 0]  # centered, nothing projected


def test_whiten_component_validation(spark):
    from anendektos_spark.functions import similarity

    emb = _emb(spark, [[0.1, 0.2]])
    bad = spark.createDataFrame(
        [(0, 0, 1_000_000)], "dim int, mean_q long, component_q long"
    )
    with pytest.raises(ValueError):
        similarity.whiten_top_component(emb, bad, dims=2)


def test_whiten_sql_matches(spark):
    import duckdb
    from anendektos_spark.functions import similarity

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    got = sorted(
        (r.vec_id, tuple(r.whitened)) for r in
        similarity.whiten_top_component(
            emb, similarity.pca_power(emb, iters=3, dims=64)
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    sql = similarity.whiten_top_component_sql(
        "SELECT vec_id, embedding FROM embeddings", iters=3, dims=64
    )
    orows = sorted((t[0], tuple(t[1])) for t in con.sql(sql).fetchall())
    assert got == orows


# --------------------------------------------------------------------------
# funnel_latency: time-to-convert percentiles per funnel leg
# --------------------------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ep long"
    ).select("user_id", "event_type", F.timestamp_seconds("ep").alias("ts"))


def test_funnel_latency_hand_computed(spark):
    from anendektos_spark.functions import logops

    rows = [
        (1, "view", 0), (1, "click", 10), (1, "purchase", 25),
        (2, "view", 0), (2, "click", 30),
        (3, "view", 0),                       # never clicked
        (4, "click", 5), (4, "view", 7),      # click BEFORE view: no leg
    ]
    out = {(r.stage, r.p): r for r in logops.funnel_latency(
        _events(spark, rows), ps=(50, 99)).collect()}
    # view->click gaps: u1=10, u2=30 (u4 ordered-funnel violation excluded)
    vc50 = out[("view->click", 50)]
    assert vc50.gap_p_s == 10 and vc50.n_users == 2
    assert out[("view->click", 99)].gap_p_s == 30
    # click->purchase: only u1, gap 15
    cp = out[("click->purchase", 50)]
    assert cp.gap_p_s == 15 and cp.n_users == 1


def test_funnel_latency_sql_matches(spark):
    import duckdb
    from anendektos_spark.functions import logops

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = sorted(tuple(r) for r in logops.funnel_latency(ev).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    orows = sorted(tuple(t) for t in con.sql(
        logops.funnel_latency_sql()).fetchall())
    assert got and got == orows


# --------------------------------------------------------------------------
# events_session_paths: top in-session event-type trigrams
# --------------------------------------------------------------------------

def _tev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ep long"
    ).select("user_id", "event_id", "event_type",
             F.timestamp_seconds("ep").alias("ts"))


def test_session_paths_hand_computed(spark):
    from anendektos_spark.functions import logops

    rows = [
        # u1 session A: view click view click  -> trigrams VCV, CVC
        (1, 0, "view", 0), (1, 1, "click", 10), (1, 2, "view", 20),
        (1, 3, "click", 30),
        # u1 session B (gap > 1800s): view click purchase -> VCP
        (1, 4, "view", 10_000), (1, 5, "click", 10_010),
        (1, 6, "purchase", 10_020),
        # u2: view click view -> VCV
        (2, 7, "view", 0), (2, 8, "click", 5), (2, 9, "view", 9),
    ]
    out = {(r.step_1, r.step_2, r.step_3): r for r in
           logops.session_paths(_tev(spark, rows)).collect()}
    assert out[("view", "click", "view")].n_paths == 2
    assert out[("view", "click", "view")].path_rank == 1
    assert out[("click", "view", "click")].n_paths == 1
    assert out[("view", "click", "purchase")].n_paths == 1
    # nothing crosses the A/B session seam: the cross-seam
    # (view@20, click@30, view@10000) would otherwise lift
    # view->click->view to 3, and exactly 3 in-session trigrams exist
    assert len(out) == 3


def test_session_paths_single_exchange_plan(spark):
    from anendektos_spark.functions import logops
    from tests.test_plans import plan_of

    ev = _tev(spark, [(1, 0, "view", 0)])
    phys = plan_of(logops.session_paths(ev), "simple")
    # one user_id exchange feeds the session lag, the running ordinal,
    # and both leads (stacked Windows over a single Sort); the only other
    # exchange is on the type^3-bounded path key
    assert phys.count("Exchange hashpartitioning(user_id") == 1


def test_session_paths_sql_matches(spark):
    import duckdb
    from anendektos_spark.functions import logops

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = sorted(tuple(r) for r in logops.session_paths(ev).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    orows = sorted(tuple(t) for t in con.sql(
        logops.session_paths_sql()).fetchall())
    assert got and got == orows


def test_embed_dup_clusters_composition(spark):
    """Big-star CC over the embedding LSH pair graph: two near-identical
    vectors land in one cluster labeled by the min vec_id; a far vector
    stays isolated (labels itself)."""
    from anendektos_spark.functions import dedup, similarity

    # exact duplicate pair (identical vectors share every hyperplane
    # bucket by construction; a merely-near pair can straddle a plane
    # whose projection is close to zero) + one far vector
    near = [0.5] * 64
    near2 = [0.5] * 64
    far = [(-1.0) ** j * 0.9 for j in range(64)]
    emb = _emb(spark, [near, near2, far])
    out = {r.vec_id: r.cluster_id for r in dedup.dup_clusters_bigstar(
        emb.select("vec_id"),
        similarity.lsh_dup_pairs(emb, threshold=0.25, n_planes=12, dims=64),
        id_col="vec_id",
    ).collect()}
    assert out[0] == 0 and out[1] == 0   # merged, min-id label
    assert out[2] == 2                   # isolated


# --------------------------------------------------------------------------
# orders_basket_pairs: market-basket co-occurrence with integer lift
# --------------------------------------------------------------------------

def test_basket_pairs_hand_computed(spark):
    from anendektos_spark.functions import logops

    rows = [  # (orderkey, partkey) with a duplicate line to dedup
        (1, 10), (1, 20), (1, 20),
        (2, 10), (2, 20),
        (3, 10), (3, 30),
        (4, 40),
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    )
    out = {(r.part_a, r.part_b): r for r in logops.basket_pairs(
        df, min_pairs=2, top_n=5).collect()}
    # only (10,20) reaches min_pairs=2: together in orders 1,2
    assert list(out) == [(10, 20)]
    r = out[(10, 20)]
    assert r.n_together == 2 and r.pair_rank == 1
    # support = 2/4 orders; lift = (2·4)/(3·2) = 4/3
    assert r.support_ppm == 500_000
    assert r.lift_ppm == 2 * 4 * 1_000_000 // (3 * 2)


def test_basket_pairs_dedups_lines_and_validates(spark):
    from anendektos_spark.functions import logops

    df = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20)], "l_orderkey long, l_partkey long"
    )
    r = logops.basket_pairs(df, min_pairs=1, top_n=5).collect()[0]
    assert r.n_together == 1  # duplicate line didn't inflate the pair
    with pytest.raises(ValueError):
        logops.basket_pairs(df, top_n=0)


# --------------------------------------------------------------------------
# events_stickiness + orders_reorder_gap
# --------------------------------------------------------------------------

def test_stickiness_hand_computed(spark):
    from anendektos_spark.functions import logops

    d = 86_400
    rows = [  # u1 active day0,1; u2 day0; u3 day2
        (1, "view", 5), (1, "view", d + 5), (2, "view", 9),
        (3, "view", 2 * d + 1), (1, "view", d + 99),  # same (user, day) dedups
    ]
    out = {r.day: r for r in logops.stickiness(
        _events(spark, [(u, t, e) for u, t, e in rows]),
        window_days=2).collect()}
    # day0: dau {u1,u2}=2, wau(trailing 2d = day-1..day0 actives) = {u1,u2}
    assert (out[0].dau, out[0].wau) == (2, 2)
    assert out[0].stickiness_ppm == 1_000_000
    # day1: dau {u1}; wau = actives on day0 or day1 = {u1,u2}
    assert (out[1].dau, out[1].wau) == (1, 3 - 1)
    assert out[1].stickiness_ppm == 500_000
    # day2: dau {u3}; wau = day1..day2 = {u1,u3}
    assert (out[2].dau, out[2].wau) == (1, 2)
    with pytest.raises(ValueError):
        logops.stickiness(_events(spark, rows), window_days=0)


def test_reorder_gap_hand_computed(spark):
    from anendektos_spark.functions import logops

    d = 86_400
    rows = [  # cust1 orders day0, day3, day4 -> gaps 3,1; cust2 day0 only
        (101, 1, 0), (102, 1, 3 * d), (103, 1, 4 * d),
        (104, 2, 0),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, ep long"
    ).select("o_orderkey", "o_custkey",
             F.timestamp_seconds("ep").alias("o_orderdate"))
    out = {r.p: r for r in logops.reorder_gap(df, ps=(50, 99)).collect()}
    # gaps [1, 3]: p50 -> rank 1 -> 1; p99 -> rank 2 -> 3
    assert out[50].gap_p_days == 1 and out[99].gap_p_days == 3
    assert out[50].n_gaps == 2


def test_handoff_outcomes_hand_computed(spark):
    rows = [
        ("c", 0, "a", "OK", 0, 1), ("c", 1, "b", "ERR", 0, 1),
        ("c", 2, "a", "OK", 0, 1), ("c", 3, "b", "OK", 0, 1),
        ("d", 0, "a", "OK", 0, 1), ("d", 1, "b", "ERR", 0, 1),
    ]
    out = {(r.tool_from, r.tool_to): r for r in
           transcript.handoff_outcomes(_parsed(spark, rows)).collect()}
    ab = out[("a", "b")]
    # a->b handoffs: c0->c1 (fail), c2->c3 (ok), d0->d1 (fail)
    assert (ab.n_handoffs, ab.n_to_fail) == (3, 2)
    assert ab.to_fail_ppm == 2 * 1_000_000 // 3
    ba = out[("b", "a")]
    assert (ba.n_handoffs, ba.n_to_fail, ba.to_fail_ppm) == (1, 0, 0)


def test_cohort_ltv_hand_computed(spark):
    from anendektos_spark.functions import logops

    day = 86_400
    rows = [  # cust1 first month0: orders m0 ($10), m0 ($5), m1 ($20)
        (1, 1, 0, 10.0), (2, 1, 5 * day, 5.0), (3, 1, 31 * day, 20.0),
        # cust2 first month1: one order ($7)
        (4, 2, 31 * day, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, ep long, o_totalprice double"
    ).select("o_orderkey", "o_custkey", "o_totalprice",
             F.timestamp_seconds("ep").alias("o_orderdate"))
    out = {(r.cohort_month, r.age_months): r
           for r in logops.cohort_ltv(df).collect()}
    assert out[(0, 0)].n_orders == 2 and out[(0, 0)].revenue == 15.0
    assert out[(0, 1)].revenue == 20.0 and out[(0, 1)].cum_revenue == 35.0
    assert out[(1, 0)].revenue == 7.0 and out[(1, 0)].cum_revenue == 7.0
    with pytest.raises(ValueError):
        logops.cohort_ltv(df, max_age_months=-1)


# --------------------------------------------------------------------------
# boilerplate-line detection + removal
# --------------------------------------------------------------------------

def test_boilerplate_lines_hand_computed(spark):
    docs = _docs(spark, [
        "unique alpha\nCopyright Corp\nbody one",
        "unique beta\nCopyright Corp",
        "Copyright Corp\nunique gamma",
        "no chrome here",
    ])
    out = {r.line: r for r in textstats.boilerplate_lines(
        docs, min_docs=3, min_chars=5).collect()}
    assert list(out) == ["Copyright Corp"]
    assert out["Copyright Corp"].n_docs == 3
    assert out["Copyright Corp"].line_rank == 1
    with pytest.raises(ValueError):
        textstats.boilerplate_lines(docs, min_docs=1)


def test_boilerplate_clean_hand_computed(spark):
    docs = _docs(spark, [
        "keep one\nCopyright Corp\nkeep two",
        "Copyright Corp\nkeep three",
        "Copyright Corp",
        "  Copyright Corp  \nkeep four",   # trimmed form matches too
    ])
    out = {r.doc_id: r for r in textstats.boilerplate_clean(
        docs, min_docs=3, min_chars=5).collect()}
    assert out[0].clean_text == "keep one\nkeep two" and out[0].n_removed == 1
    assert out[1].clean_text == "keep three"
    # a fully-boilerplate document survives as an empty string
    assert out[2].clean_text == "" and out[2].n_removed == 1
    # original bytes (untrimmed) are dropped when the TRIMMED form matches
    assert out[3].clean_text == "keep four" and out[3].n_removed == 1
