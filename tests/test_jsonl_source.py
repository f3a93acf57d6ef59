"""JSONL transcript source: parse contract + reject channel."""

from pyspark.sql import functions as F

from anendektos_spark.sources.jsonl import read_jsonl


def test_read_jsonl_rows_and_rejects(spark, tmp_path):
    lines = [
        '{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi",'
        ' "tool": null, "ts_epoch": 1767225600}',
        '{"conv_id": "c1", "turn_idx": 1, "role": "assistant",'
        ' "text": "run", "tool": "conn", "ts_epoch": 1767225630,'
        ' "extra_key": 42}',
        "",  # blank: silently skipped
        "not json at all {",
        '{"role": "user", "text": "orphan"}',  # missing identity
    ]
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(lines) + "\n")
    r = read_jsonl(spark, str(p))
    rows = {(x.conv_id, x.turn_idx): x for x in r.rows.collect()}
    assert set(rows) == {("c1", 0), ("c1", 1)}
    assert rows[("c1", 1)].tool == "conn"
    assert rows[("c1", 0)].ts.isoformat().startswith("2026-01-01")
    rej = {x.reject_reason for x in r.rejects.collect()}
    assert rej == {"bad_json", "missing_identity"}
    assert r.rejects.count() == 2


def test_read_jsonl_feeds_pipeline_shape(spark, tmp_path):
    """The source output drives conversation operators unchanged."""
    from anendektos_spark.functions import convops

    lines = [
        f'{{"conv_id": "c", "turn_idx": {i}, "role": "user",'
        f' "text": "w{i}", "tool": null, "ts_epoch": {1767225600 + i * 30}}}'
        for i in range(4)
    ]
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(lines) + "\n")
    r = read_jsonl(spark, str(p))
    out = convops.conv_reconstruct(r.rows).collect()
    assert len(out) == 1 and out[0].n_turns == 4


def test_stream_jsonl_equals_batch(spark, tmp_path):
    from anendektos_spark.sources.jsonl import stream_jsonl

    lines = [
        '{"conv_id": "c", "turn_idx": 0, "role": "user", "text": "a",'
        ' "tool": null, "ts_epoch": 1767225600}',
        "garbage {",
        '{"conv_id": "c", "turn_idx": 1, "role": "assistant", "text": "b",'
        ' "tool": "dns", "ts_epoch": 1767225630}',
    ]
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join(lines) + "\n")
    out_rows = str(tmp_path / "rows")
    out_rej = str(tmp_path / "rej")
    s = stream_jsonl(spark, str(d))
    q1 = (s.rows.writeStream.format("parquet")
          .option("path", out_rows)
          .option("checkpointLocation", str(tmp_path / "ck1"))
          .trigger(availableNow=True).start())
    q1.awaitTermination(120)
    q2 = (s.rejects.writeStream.format("parquet")
          .option("path", out_rej)
          .option("checkpointLocation", str(tmp_path / "ck2"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    batch = read_jsonl(spark, str(d))
    sr = {(r.conv_id, r.turn_idx, r.text) for r in
          spark.read.parquet(out_rows).collect()}
    br = {(r.conv_id, r.turn_idx, r.text) for r in batch.rows.collect()}
    assert sr == br and len(sr) == 2
    assert spark.read.parquet(out_rej).collect()[0].reject_reason == "bad_json"


def test_pipeline_runs_on_jsonl_input(spark, tmp_path):
    """The full zeek pipeline over a JSONL delivery: same sink counts as
    the parquet path on identical rows, plus the committed source-grain
    reject stage."""
    import json as _json

    from anendektos_spark.fixtures import fixture_transcripts
    from anendektos_spark.pipeline import PipelineConfig, run_pipeline

    tx = fixture_transcripts(spark)
    rows = [
        _json.dumps({
            "conv_id": r.conv_id, "turn_idx": r.turn_idx, "role": r.role,
            "text": r.text, "tool": r.tool,
            "ts_epoch": int(r.ts.timestamp()),
        })
        for r in tx.collect()
    ] + ["busted {"]
    d = tmp_path / "in"
    d.mkdir()
    (d / "t.jsonl").write_text("\n".join(rows) + "\n")

    cfg = PipelineConfig(
        input_path=str(d), output_root=str(tmp_path / "out"),
        input_format="jsonl", addr_mode="passthrough",
    )
    m = run_pipeline(spark, cfg)
    st = m["stages"]
    assert st["source_rejects"]["rows"] == 1
    for tool, n in (("conn", 6), ("dns", 4), ("http", 3),
                    ("files", 4), ("ssl", 4), ("x509", 3)):
        assert st[f"parsed_{tool}"]["rows"] == n, tool
    # resume: second run touches nothing
    m2 = run_pipeline(spark, cfg)
    assert all(v["resumed"] for v in m2["stages"].values())
