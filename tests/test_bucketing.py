"""Bucketed tables: the join really runs without a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anendektos_spark.functions import bucketing


@pytest.fixture()
def no_broadcast(spark):
    """Small test tables would broadcast (also exchange-free but not the
    mechanism under test); force the shuffle-join path."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )

    # baseline: plain parquet join shuffles BOTH sides
    left.write.parquet(str(tmp_path / "l"))
    right.write.parquet(str(tmp_path / "r"))
    plain = spark.read.parquet(str(tmp_path / "l")).join(
        spark.read.parquet(str(tmp_path / "r")), "k"
    )
    plain.collect()
    assert bucketing.shuffle_exchanges(plain) == 2

    # bucketed on the join key: zero exchanges, same result
    bucketing.write_bucketed(left, "tb_left", "k", 8, path=str(tmp_path / "bl"))
    bucketing.write_bucketed(
        right, "tb_right", "k", 8, path=str(tmp_path / "br"), sort_col="k"
    )
    try:
        joined = bucketing.bucketed_join(spark, "tb_left", "tb_right", "k")
        rows = joined.collect()
        assert bucketing.shuffle_exchanges(joined) == 0
        assert len(rows) == 2000
        assert {(r.k, r.a, r.b) for r in rows} == {
            (i, 2 * i, 3 * i) for i in range(2000)
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_left")
        spark.sql("DROP TABLE IF EXISTS tb_right")


def test_bucketed_groupby_skips_exchange(spark, tmp_path):
    df = spark.range(0, 1000).select((F.col("id") % 97).alias("k"),
                                     F.col("id").alias("v"))
    bucketing.write_bucketed(df, "tb_g", "k", 4, path=str(tmp_path / "g"))
    try:
        agg = spark.table("tb_g").groupBy("k").agg(F.sum("v").alias("s"))
        out = {r.k: r.s for r in agg.collect()}
        assert bucketing.shuffle_exchanges(agg) == 0
        assert out[0] == sum(i for i in range(1000) if i % 97 == 0)
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_g")


def test_write_bucketed_validates(spark):
    with pytest.raises(ValueError):
        bucketing.write_bucketed(spark.range(1), "t", "id", 0)
