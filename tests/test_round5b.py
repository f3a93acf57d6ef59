"""Round-5 final-batch operators: RFM grid, Pareto revenue share,
event debounce, inter-arrival burstiness, unigram source divergence,
k-core peeling and the conversation termination-hazard curve — each
hand-computed on a tiny frame (the DuckDB mirrors are swept by
scripts/check_oracle.py like every other registered query)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anendektos_spark.functions import graph, logops, textstats, transcript

from tests.test_plans import plan_of


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, epoch_s)."""
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ep long"
    ).select("event_id", "user_id", "event_type",
             F.timestamp_seconds("ep").alias("ts"))


def _orders(spark, rows):
    """rows: (orderkey, custkey, price, epoch_day)."""
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, d long"
    ).select("o_orderkey", "o_custkey", "o_totalprice",
             F.timestamp_seconds(F.col("d") * 86_400).alias("o_orderdate"))


def _parsed(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool_called string, "
              "status string, epoch long, latency_ms int"
    )


# --------------------------------------------------------------------------
# orders_rfm_segments
# --------------------------------------------------------------------------

def test_rfm_segments_hand_computed(spark):
    # four customers engineered onto the quartile diagonal:
    # recency 3/2/1/0 days, frequency 1/2/3/4 orders, monetary 10/20/30/40 $
    rows = [
        (1, 1, 10.0, 27),
        (2, 2, 12.0, 28), (3, 2, 8.0, 20),
        (4, 3, 10.0, 29), (5, 3, 10.0, 5), (6, 3, 10.0, 6),
        (7, 4, 10.0, 30), (8, 4, 10.0, 1), (9, 4, 10.0, 2), (10, 4, 10.0, 3),
    ]
    out = {(r.r_score, r.f_score, r.m_score): r
           for r in logops.rfm_segments(_orders(spark, rows)).collect()}
    # nearest-rank quartiles of 4 distinct values are v1/v2/v3 sorted asc,
    # so the whale (recent, frequent, big) lands 444 and the lapsed
    # one-shot buyer 111
    assert set(out) == {(1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 4, 4)}
    assert out[(4, 4, 4)].n_customers == 1
    assert out[(4, 4, 4)].revenue_cents == 4000
    assert out[(1, 1, 1)].revenue_cents == 1000
    assert sum(r.n_customers for r in out.values()) == 4


# --------------------------------------------------------------------------
# orders_pareto_share
# --------------------------------------------------------------------------

def test_pareto_share_hand_computed(spark):
    rows = [(1, 1, 40.0, 0), (2, 2, 30.0, 0), (3, 3, 20.0, 0),
            (4, 4, 10.0, 0)]
    out = {r.k: r for r in logops.pareto_share(
        _orders(spark, rows), n_buckets=2).collect()}
    # top half (2 of 4 customers) = $70 of $100
    assert out[1].n_customers == 2
    assert out[1].cum_revenue_cents == 7000
    assert out[1].share_ppm == 700_000
    assert out[2].cum_revenue_cents == 10_000
    assert out[2].share_ppm == 1_000_000


def test_pareto_share_intra_class_apportionment(spark):
    # two customers share the $10 dollar class with different cents;
    # the bucket boundary splits the class -> its exact cents apportion
    # by count: (1050 + 1040) * 1 // 2 = 1045
    rows = [(1, 1, 10.50, 0), (2, 2, 10.40, 0), (3, 3, 1.0, 0)]
    out = {r.k: r for r in logops.pareto_share(
        _orders(spark, rows), n_buckets=3).collect()}
    assert out[1].n_customers == 1 and out[1].cum_revenue_cents == 1045
    assert out[3].cum_revenue_cents == 1050 + 1040 + 100
    assert out[3].share_ppm == 1_000_000
    with pytest.raises(ValueError):
        logops.pareto_share(_orders(spark, rows), n_buckets=0)


# --------------------------------------------------------------------------
# events_debounce
# --------------------------------------------------------------------------

def test_debounce_hand_computed(spark):
    rows = [
        (1, 1, "click", 0), (2, 1, "click", 30),    # 30s gap -> bounced
        (3, 1, "click", 100),                        # 70s gap -> kept
        (4, 1, "click", 130),                        # 30s gap -> bounced
        (5, 2, "click", 0),                          # other user: first
        (6, 1, "view", 0),                           # other type: first
    ]
    out = {r.event_type: r for r in logops.debounce_events(
        _events(spark, rows), window_s=60).collect()}
    assert (out["click"].n_events, out["click"].n_bounced) == (5, 2)
    assert out["click"].kept_ppm == 3 * 1_000_000 // 5
    assert (out["view"].n_events, out["view"].n_bounced) == (1, 0)
    assert out["view"].kept_ppm == 1_000_000
    with pytest.raises(ValueError):
        logops.debounce_events(_events(spark, rows), window_s=0)


# --------------------------------------------------------------------------
# events_burstiness
# --------------------------------------------------------------------------

def test_burstiness_hand_computed(spark):
    rows = (
        # u1: metronome every 10s -> CV^2 = 0
        [(i, 1, "view", 10 * i) for i in range(4)]
        # u2: burst 0,1,2 then a 98s silence -> gaps 1,1,98
        + [(10, 2, "view", 0), (11, 2, "view", 1), (12, 2, "view", 2),
           (13, 2, "view", 100)]
        # u3: too few events to qualify
        + [(20, 3, "view", 0), (21, 3, "view", 5)]
    )
    out = logops.burstiness(_events(spark, rows), min_events=4).collect()
    assert [r.user_id for r in out] == [2, 1]  # burstiest first
    u2, u1 = out[0], out[1]
    assert (u1.n_gaps, u1.mean_gap_s, u1.cv2_ppm) == (3, 10, 0)
    # n*sum(g^2)*1e6 // sum(g)^2 - 1e6 = 3*9606*1e6 // 10000 - 1e6
    assert (u2.n_gaps, u2.mean_gap_s) == (3, 33)
    assert u2.cv2_ppm == 3 * 9606 * 1_000_000 // 10_000 - 1_000_000
    with pytest.raises(ValueError):
        logops.burstiness(_events(spark, rows), min_events=1)


# --------------------------------------------------------------------------
# text_source_divergence
# --------------------------------------------------------------------------

def test_source_divergence_hand_computed(spark):
    df = spark.createDataFrame(
        [("A", "a b"), ("B", "a a"), ("C", "a b")],
        "source string, text string",
    )
    out = {(r.source_a, r.source_b): r
           for r in textstats.source_divergence(df).collect()}
    # p_A = (a:1/2, b:1/2), p_B = (a:1, b:0) -> TV = 1/2
    ab = out[("A", "B")]
    assert ab.n_common_tokens == 1 and ab.tv_ppm == 500_000
    # identical mixes -> 0
    assert out[("A", "C")].tv_ppm == 0
    assert out[("B", "C")].tv_ppm == 500_000


def test_source_divergence_disjoint_pairs_absent(spark):
    # pairs sharing no vocabulary are by definition at TV = 1e6 and are
    # ABSENT from the result (the inner token join never sees them) —
    # the documented contract that keeps the sparse union un-materialized
    df = spark.createDataFrame(
        [("A", "x x"), ("B", "y")], "source string, text string"
    )
    assert textstats.source_divergence(df).collect() == []


# --------------------------------------------------------------------------
# graph_kcore
# --------------------------------------------------------------------------

def test_kcore_hand_computed(spark):
    # triangle 1-2-3 with a tail 3-4: the 2-core peels the tail only;
    # a duplicate reversed edge checks symmetrize+dedup
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    out = {r.node: r.core_deg for r in graph.kcore(
        edges, k=2, rounds=2, cache=False).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # k=3: the triangle is only a 2-core -> everything peels
    assert graph.kcore(edges, k=3, rounds=3, cache=False).collect() == []
    with pytest.raises(ValueError):
        graph.kcore(edges, k=0)
    with pytest.raises(ValueError):
        graph.kcore(edges, rounds=0)


def test_kcore_plan_no_cartesian(spark):
    edges = graph.synth_links_skewed(spark, 2_000, 100)
    plan = plan_of(graph.kcore(edges, k=8, rounds=3, cache=False))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# --------------------------------------------------------------------------
# transcript_abandon_hazard
# --------------------------------------------------------------------------

def test_abandon_hazard_hand_computed(spark):
    rows = (
        [("c1", 0, "conn", "OK", 0, 1)]
        + [("c2", i, "conn", "OK", 0, 1) for i in range(2)]
        + [("c3", i, "conn", "OK", 0, 1) for i in range(2)]
        + [("c4", i, "conn", "OK", 0, 1) for i in range(3)]
    )
    out = {r.depth: r for r in transcript.abandon_hazard(
        _parsed(spark, rows)).collect()}
    # lens {1:1, 2:2, 3:1}; at-risk walking down: 4, 3, 1
    assert (out[1].n_ended, out[1].n_at_risk) == (1, 4)
    assert out[1].hazard_ppm == 250_000
    assert (out[2].n_ended, out[2].n_at_risk) == (2, 3)
    assert out[2].hazard_ppm == 2 * 1_000_000 // 3
    assert (out[3].n_ended, out[3].n_at_risk) == (1, 1)
    assert out[3].hazard_ppm == 1_000_000


# --------------------------------------------------------------------------
# graph_clustering_coeff
# --------------------------------------------------------------------------

def test_clustering_coeff_hand_computed(spark):
    # triangle 1-2-3 plus tail 3-4: corners of the triangle close fully,
    # node 3's neighborhood (1,2,4) has 1 of 3 possible links
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    out = {r.node: r for r in graph.clustering_coeff(edges).collect()}
    assert set(out) == {1, 2, 3}  # deg-1 node 4 excluded
    assert (out[1].cc_ppm, out[2].cc_ppm) == (1_000_000, 1_000_000)
    assert out[3].deg == 3 and out[3].n_triangles == 1
    assert out[3].cc_ppm == 2 * 1_000_000 // (3 * 2)


def test_clustering_coeff_no_triangles(spark):
    # path graph: every deg>=2 node reports 0 via the left join
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r.node: r.cc_ppm for r in graph.clustering_coeff(edges).collect()}
    assert out == {2: 0}


# --------------------------------------------------------------------------
# hist_equidepth_values
# --------------------------------------------------------------------------

def test_hist_equidepth_hand_computed(spark):
    df = spark.createDataFrame(
        [(1.0,), (1.0,), (2.0,), (3.0,), (None,)], "value double"
    )
    out = {r.bin: r for r in logops.hist_equidepth(df, n_bins=2).collect()}
    # n=4 (null drops): median boundary = rank 2 -> 1.0; max -> 3.0
    assert (out[1].upper, out[1].n_cum) == (1.0, 2)
    assert out[1].upper_micro == 1_000_000
    assert (out[2].upper, out[2].n_cum) == (3.0, 4)
    with pytest.raises(ValueError):
        logops.hist_equidepth(df, n_bins=0)


# --------------------------------------------------------------------------
# orders_ship_sla
# --------------------------------------------------------------------------

def test_ship_sla_hand_computed(spark):
    o = _orders(spark, [(1, 1, 10.0, 0)]).withColumn(
        "o_orderpriority", F.lit("1-URGENT")
    )
    li = spark.createDataFrame(
        [(1, 10), (1, 40), (1, 100)], "l_orderkey long, d long"
    ).select("l_orderkey",
             F.timestamp_seconds(F.col("d") * 86_400).alias("l_shipdate"))
    r = logops.ship_sla(o, li).collect()[0]
    assert r.o_orderpriority == "1-URGENT" and r.n_items == 3
    assert r.within30_ppm == 1_000_000 // 3
    assert r.within60_ppm == 2_000_000 // 3
    assert r.within90_ppm == 2_000_000 // 3
    with pytest.raises(ValueError):
        logops.ship_sla(o, li, slas=())


# --------------------------------------------------------------------------
# events_seasonal_spikes
# --------------------------------------------------------------------------

def test_seasonal_spikes_hand_computed(spark):
    d = 86_400
    rows = (
        # "click" hour 0 over four days: 1,1,1,5 events -> day-3 ratio
        # 5·4/8 = 2.5x fires; the 1-count days sit at 0.5x
        [(i, 1, "click", day * d + i) for day, cnt in
         [(0, 1), (1, 1), (2, 1)] for i in range(cnt)]
        + [(100 + i, 1, "click", 3 * d + i) for i in range(5)]
        # sparse type below min_base_events: never reported
        + [(200, 1, "view", 0), (201, 1, "view", d)]
    )
    out = logops.seasonal_spikes(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.event_type, r.day, r.hod) == ("click", 3, 0)
    assert (r.n, r.total, r.n_days) == (5, 8, 4)
    assert r.ratio_ppm == 5 * 4 * 1_000_000 // 8


# --------------------------------------------------------------------------
# orders_benford
# --------------------------------------------------------------------------

def test_benford_hand_computed(spark):
    rows = [(i + 1, 1, p, 0) for i, p in
            enumerate([1.00, 1.50, 2.00, 19.99, 0.0, -5.0])]
    out = {r.digit: r for r in logops.benford_screen(
        _orders(spark, rows)).collect()}
    # cents 100,150,200,1999 (zero/negative drop): digits 1,1,2,1
    assert set(out) == {1, 2}
    assert (out[1].n, out[1].obs_ppm) == (3, 750_000)
    assert out[1].exp_ppm == 301_030
    assert out[1].dev_ppm == 750_000 - 301_030
    assert (out[2].n, out[2].obs_ppm) == (1, 250_000)
    assert out[2].dev_ppm == 250_000 - 176_091


def test_kcore_symmetrized_input_equivalent(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    und = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    a = sorted(map(tuple, graph.kcore(edges, k=2, rounds=2,
                                      cache=False).collect()))
    b = sorted(map(tuple, graph.kcore(und, k=2, rounds=2, cache=False,
                                      symmetrized=True).collect()))
    assert a == b and a


# --------------------------------------------------------------------------
# scale-contract plan pins for the value-histogram family (the global
# ordering must consume the bounded-domain histogram, never the row
# stream — the response_gap contract)
# --------------------------------------------------------------------------

def _single_partition_above_aggregate(df, needle):
    plan = plan_of(df, "simple")
    sp = plan.index("Exchange SinglePartition")
    agg = plan.index("HashAggregate")
    assert sp < agg, "rank window must consume the histogram aggregate"
    assert needle in plan[agg:agg + 500]


def test_hist_equidepth_no_row_stream_global_sort(spark):
    df = spark.range(4000).select((F.col("id") % 97).cast("double")
                                  .alias("value"))
    _single_partition_above_aggregate(logops.hist_equidepth(df), "keys=[v")


def test_pareto_share_no_row_stream_global_sort(spark):
    o = _orders(spark, [(i, i % 50, float(i % 97) + 1, 0)
                        for i in range(1, 400)])
    _single_partition_above_aggregate(logops.pareto_share(o),
                                      "keys=[dollars")


def test_abandon_hazard_no_row_stream_global_sort(spark):
    rows = [(f"c{i}", j, "conn", "OK", 0, 1)
            for i in range(200) for j in range(i % 5 + 1)]
    _single_partition_above_aggregate(
        transcript.abandon_hazard(_parsed(spark, rows)), "keys=[depth")
