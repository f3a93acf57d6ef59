"""Zeek TSV directory source: sniff + distributed read + route parity
with the embedded-fixture path (O1/O2)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

import pytest

from anendektos_spark.route import route
from anendektos_spark.sources.zeek_tsv import read_zeek_dir, sniff_file_header

REF_LOGS = "/root/reference/tests/logs"
GOLDEN_COUNTS = {"conn": 6, "dns": 4, "http": 3, "files": 4, "ssl": 4, "x509": 3}


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("zeek_logs")
    for tool in GOLDEN_COUNTS:
        shutil.copy(f"{REF_LOGS}/{tool}.log", d / f"{tool}.log")
    return str(d)


def test_sniff(log_dir):
    h = sniff_file_header(f"{log_dir}/conn.log")
    assert h.path == "conn" and h.dialect.separator == "\t"
    assert len(h.fields) == 21


def test_read_dir_counts_and_route(spark, log_dir):
    tx = read_zeek_dir(spark, log_dir)
    assert tx.count() == sum(GOLDEN_COUNTS.values())
    r = route(tx)
    got = {t: df.count() for t, df in r.sinks.items()}
    assert got == GOLDEN_COUNTS
    assert r.rejects.count() == 0
    # turn ordinals are per-file arrival order
    conn = r.sinks["conn"].orderBy("turn_idx").collect()
    assert [x["turn_idx"] for x in conn] == list(range(6))
    assert conn[0]["uid"] == "CI3wQF1KHxU6G7VmTj"


def test_ordinals_split_safe(spark, tmp_path):
    """One file forced into many input splits must still get ordinals ==
    line numbers (the stable-order invariant at real file sizes; the
    VERDICT r01 finding on monotonically_increasing_id)."""
    n = 4000
    header = (
        "#separator \\x09\n#set_separator\t,\n#empty_field\t(empty)\n"
        "#unset_field\t-\n#path\tconn\n"
    )
    lines = [f"15316871{i % 100:02d}.5\tL{i:05d}\tpayload{'x' * 20}" for i in range(n)]
    d = tmp_path / "biglog"
    d.mkdir()
    (d / "conn.log").write_text(header + "\n".join(lines) + "\n")

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
    try:
        raw = spark.read.text(str(d / "conn.log"))
        assert raw.rdd.getNumPartitions() >= 4, "file did not split; test is vacuous"
        tx = read_zeek_dir(spark, str(d))
        rows = tx.select("conv_id", "turn_idx").collect()
        assert len(rows) == n
        bad = [r for r in rows if r["turn_idx"] != int(r["conv_id"][1:])]
        assert not bad, f"{len(bad)} misordered ordinals, first: {bad[:3]}"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_missing_dir_fatal(spark):
    with pytest.raises(FileNotFoundError):
        read_zeek_dir(spark, "/nonexistent/bro_path")


def test_reference_fixture_logs_end_to_end(spark):
    """Integration: the reference repo's own golden log files
    (/root/reference/tests/logs, read-only test DATA) through source →
    route → parse must reproduce the reference's asserted record counts
    (conn.d:233-237, dns.d:242-246, http.d:259-263, files.d:250-254,
    ssl.d:187-191, x509.d:210-214)."""
    import os

    ref_logs = "/root/reference/tests/logs"
    if not os.path.isdir(ref_logs):
        pytest.skip("reference fixtures not present")
    from anendektos_spark.parse import parse_sink
    from anendektos_spark.sources.zeek_tsv import read_zeek_dir

    tx = read_zeek_dir(spark, ref_logs)
    expected = {"conn": 6, "dns": 4, "http": 3, "files": 4, "ssl": 4, "x509": 3}
    got_route = {r.tool: r.n for r in
                 tx.groupBy("tool").agg(F.count("*").alias("n")).collect()}
    assert got_route == expected
    for tool, n in expected.items():
        parsed = parse_sink(tx.filter(F.col("tool") == tool), tool)
        good = parsed.filter(F.col("reject_reason").isNull())
        assert good.count() == n, tool
        assert parsed.filter(F.col("reject_reason").isNotNull()).count() == 0, tool
