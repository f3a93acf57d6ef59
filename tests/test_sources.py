"""Zeek TSV directory source: sniff + distributed read + route parity
with the embedded-fixture path (O1/O2)."""

from __future__ import annotations

import shutil

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


def test_missing_dir_fatal(spark):
    with pytest.raises(FileNotFoundError):
        read_zeek_dir(spark, "/nonexistent/bro_path")
