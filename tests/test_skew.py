"""Hot-conversation skew: salting spreads load without changing results.

north_rule requires conversations salted-repartitioned on conv_id to
defuse hot-conversation skew while keeping per-turn ordering exact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anendektos_spark.fixtures import synth_transcripts
from anendektos_spark.ordering import salted_repartition, with_ordinal
from anendektos_spark.parse import parse_sink


@pytest.fixture(scope="module")
def skewed(spark):
    # 20% of replicas collapse onto one conv_id → a very hot conversation
    return synth_transcripts(spark, replicas=400, hot_fraction=0.2).persist()


def test_salt_spreads_hot_conversation(skewed):
    """The hot conv_id must land on >1 partition after salted
    repartition (plain repartition by conv_id pins it to exactly 1)."""
    n_parts = 8

    def partitions_holding_hot(df):
        return (
            df.withColumn("pid", F.spark_partition_id())
            .filter(F.col("conv_id") == "HOTCONV")
            .select("pid").distinct().count()
        )

    plain = skewed.repartition(n_parts, F.col("conv_id"))
    salted = salted_repartition(skewed, n_parts, salt_buckets=8)
    assert partitions_holding_hot(plain) == 1
    assert partitions_holding_hot(salted) > 1


def test_salting_preserves_parse_results(skewed):
    """Salting touches partitioning only — routed-row multisets are
    identical with and without it (north_rule routed-row equality)."""
    base = parse_sink(skewed.filter(F.col("tool") == "conn"), "conn")
    salted = parse_sink(
        salted_repartition(skewed, 8, 8).filter(F.col("tool") == "conn"), "conn"
    )
    a = base.groupBy("conv_id", "turn_idx", "text").count()
    b = salted.groupBy("conv_id", "turn_idx", "text").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ordinal_exact_under_skew(skewed):
    """with_ordinal after salting still yields 0..n-1 per conversation in
    turn_idx order — the sort keys are never salted."""
    conn = salted_repartition(skewed.filter(F.col("tool") == "conn"), 8, 8)
    ordered = with_ordinal(conn.select("conv_id", "turn_idx", "text"))
    hot = ordered.filter(F.col("conv_id") == "HOTCONV").orderBy("ord").collect()
    assert [r.ord for r in hot] == list(range(len(hot)))
    assert all(
        hot[i].turn_idx <= hot[i + 1].turn_idx for i in range(len(hot) - 1)
    )
    # a normal conversation: exactly the 6 conn turns, ordinal == rank
    one = ordered.filter(F.col("conv_id").startswith("CuVIzg")).groupBy("conv_id").agg(
        F.count("*").alias("n"), F.max("ord").alias("mx")
    )
    bad = one.filter(F.col("mx") != F.col("n") - 1).count()
    assert bad == 0


def test_parse_validate_all_matches_per_sink(spark, skewed):
    """One-pass validation agrees with the six per-sink parses on every
    row's reject verdict, and tags unknown tools."""
    from anendektos_spark.parse import parse_validate_all
    from anendektos_spark.schemas import KNOWN_TOOLS

    allv = parse_validate_all(skewed)
    got = {
        (r.tool, r.ok): r.n
        for r in allv.groupBy(
            "tool", F.col("reject_reason").isNull().alias("ok")
        ).agg(F.count("*").alias("n")).collect()
    }
    for tool in KNOWN_TOOLS:
        per = parse_sink(skewed.filter(F.col("tool") == tool), tool)
        good = per.filter(F.col("reject_reason").isNull()).count()
        bad = per.filter(F.col("reject_reason").isNotNull()).count()
        assert got.get((tool, True), 0) == good, tool
        assert got.get((tool, False), 0) == bad, tool
    unk = allv.filter(F.col("reject_reason") == "unimplemented_tool")
    assert unk.count() == skewed.filter(~F.col("tool").isin(list(KNOWN_TOOLS))).count()
