"""End-to-end pipeline + checkpoint/resume + CLI config tests."""

from __future__ import annotations

import json

import pytest

from anendektos_spark.checkpoint import StageStore
from anendektos_spark.fixtures import fixture_transcripts, synth_transcripts
from anendektos_spark.main import load_config
from anendektos_spark.pipeline import PipelineConfig, run_pipeline

GOLDEN_COUNTS = {"conn": 6, "dns": 4, "http": 3, "files": 4, "ssl": 4, "x509": 3}


@pytest.fixture(scope="module")
def golden_input(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tx") / "transcripts")
    fixture_transcripts(spark).write.mode("overwrite").parquet(path)
    return path


def test_pipeline_end_to_end(spark, golden_input, tmp_path):
    cfg = PipelineConfig(input_path=golden_input, output_root=str(tmp_path / "out"))
    metrics = run_pipeline(spark, cfg)
    for tool, n in GOLDEN_COUNTS.items():
        assert metrics["stages"][f"sink_{tool}"]["rows"] == n
    assert metrics["stages"]["rejects"]["rows"] == 2  # the unknown_tool rows
    assert metrics["stages"]["agg_counts"]["rows"] == 6
    assert not any(s["resumed"] for s in metrics["stages"].values())

    store = StageStore(cfg.output_root)
    counts = {r["tool"]: r["n_records"] for r in store.read(spark, "agg_counts").collect()}
    assert counts == GOLDEN_COUNTS
    # enrich columns landed on the sinks
    sink = store.read(spark, "sink_dns")
    assert {"tool_family", "role_rank", "sink_table", "ord"} <= set(sink.columns)
    assert sink.filter("tool_family = 'network'").count() == 4


def test_pipeline_resume_is_idempotent(spark, golden_input, tmp_path):
    cfg = PipelineConfig(input_path=golden_input, output_root=str(tmp_path / "out"))
    first = run_pipeline(spark, cfg)
    store = StageStore(cfg.output_root)
    before = sorted(
        (r["tool"], r["value"], r["n"], r["rank"])
        for r in store.read(spark, "agg_topk").collect()
    )

    # simulate a crash that lost the sink_conn and agg stages
    store.invalidate("sink_conn")
    store.invalidate("agg_topk")
    second = run_pipeline(spark, cfg)

    # untouched stages resumed from their manifests, lost ones re-ran
    assert second["stages"]["parsed_conn"]["resumed"] is True
    assert second["stages"]["sink_conn"]["resumed"] is False
    assert second["stages"]["agg_topk"]["resumed"] is False
    assert second["stages"]["sink_conn"]["rows"] == first["stages"]["sink_conn"]["rows"]
    after = sorted(
        (r["tool"], r["value"], r["n"], r["rank"])
        for r in store.read(spark, "agg_topk").collect()
    )
    assert after == before  # identical final snapshots


def test_fingerprint_change_invalidates(spark, golden_input, tmp_path):
    out = str(tmp_path / "out")
    run_pipeline(spark, PipelineConfig(input_path=golden_input, output_root=out))
    m2 = run_pipeline(
        spark,
        PipelineConfig(input_path=golden_input, output_root=out, addr_mode="passthrough"),
    )
    assert m2["stages"]["parsed_conn"]["resumed"] is False


def test_manifest_lineage_counts(spark, golden_input, tmp_path):
    cfg = PipelineConfig(input_path=golden_input, output_root=str(tmp_path / "out"))
    run_pipeline(spark, cfg)
    m = StageStore(cfg.output_root).manifest("sink_conn")
    assert m["rows"] == 6 and m["committed"]
    assert sum(e["rows"] for e in m["lineage"]) == 6


def test_rejects_with_malformed_rows(spark, tmp_path):
    tx = synth_transcripts(spark, replicas=8, malformed_fraction=0.25)
    path = str(tmp_path / "tx")
    tx.write.parquet(path)
    cfg = PipelineConfig(input_path=path, output_root=str(tmp_path / "out"))
    metrics = run_pipeline(spark, cfg)
    store = StageStore(cfg.output_root)
    reasons = {
        r["reject_reason"]: r["n"]
        for r in store.read(spark, "agg_reject_counts")
        .groupBy("reject_reason")
        .sum("n")
        .withColumnRenamed("sum(n)", "n")
        .collect()
    }
    assert reasons.get("bad_ts", 0) > 0
    assert reasons.get("unimplemented_tool", 0) == 16  # 2 per replica
    total_in = 26 * 8
    total_out = sum(
        metrics["stages"][f"sink_{t}"]["rows"] for t in GOLDEN_COUNTS
    ) + metrics["stages"]["rejects"]["rows"]
    assert total_out == total_in  # nothing silently dropped


def test_sink_partitioned_by_time_bucket(spark, golden_input, tmp_path):
    """sink_partition_by writes hive-partitioned sink tables (time-ranged
    reads become partition-pruned at scale) without changing contents."""
    import glob

    cfg = PipelineConfig(
        input_path=golden_input, output_root=str(tmp_path / "out"),
        sink_partition_by="hour",
    )
    run_pipeline(spark, cfg)
    store = StageStore(cfg.output_root)
    part_dirs = glob.glob(f"{store.data_path('sink_conn')}/part_bucket=*")
    assert part_dirs, "no partition directories written"
    sink = store.read(spark, "sink_conn")
    assert sink.count() == GOLDEN_COUNTS["conn"]
    assert "part_bucket" in sink.columns


def test_stage_store_format_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="parquet.*iceberg|iceberg.*parquet"):
        StageStore(str(tmp_path), format="csv")
    with pytest.raises(ValueError, match="iceberg_table_prefix"):
        StageStore(str(tmp_path), format="iceberg")
    # iceberg mode fails fast with guidance when the catalog isn't
    # configured (the jar isn't in this image)
    store = StageStore(str(tmp_path), format="iceberg", iceberg_table_prefix="ice.db")
    with pytest.raises(RuntimeError, match="spark.sql.catalog.ice"):
        store.commit(fixture_transcripts(spark), "stage_x", "fp0")


def test_cli_config_roundtrip(tmp_path):
    ini = tmp_path / "p.ini"
    ini.write_text(
        "[application]\ninput_path = /in\noutput_root = /out\n"
        "addr_mode = passthrough\nsalt_buckets = 8\nadd_ordinal = false\n"
    )
    cfg = load_config(str(ini))
    assert cfg.input_path == "/in" and cfg.addr_mode == "passthrough"
    assert cfg.salt_buckets == 8 and cfg.add_ordinal is False

    js = tmp_path / "p.json"
    js.write_text(json.dumps({"input_path": "/in", "output_root": "/out", "top_k": 3}))
    cfg = load_config(str(js))
    assert cfg.top_k == 3


def test_plan_salted_repartition_splits_only_hot_keys(spark):
    from anendektos_spark import ordering
    from anendektos_spark.functions import logops
    from pyspark.sql import functions as F

    rows = [("hot", i) for i in range(400)] + [("cold", i) for i in range(5)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    # 1 MiB target, 16 KB rows: hot = 6.25 MB -> salt_factor 7; cold absent
    plan = logops.shuffle_plan(df, "conv_id", row_bytes=16_384, target_mb=1)
    assert {r.key: r.salt_factor for r in plan.collect()} == {"hot": 7}
    out = ordering.plan_salted_repartition(df, plan, 16)
    assert out.count() == 405 and set(out.columns) == {"conv_id", "turn_idx"}
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("conv_id")
        .agg(F.countDistinct("pid").alias("np"))
    )
    got = {r.conv_id: r.np for r in parts.collect()}
    assert got["cold"] == 1          # un-salted keys keep co-location
    assert 2 <= got["hot"] <= 7      # hot key spreads across its salts
