"""ANSI-mode matrix: the parse plan must behave identically with
``spark.sql.ansi.enabled`` on (the Spark 4 default on a bare session —
exactly what the driver harness runs) and off (the pinned test default).

parse.py claims ANSI-proofness via try_cast + F.get; these tests prove it
by re-running the golden contract and the malformed-row reject paths with
the conf flipped at runtime.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anendektos_spark.data.zeek_fixture_lines import FIXTURE_LINES
from anendektos_spark.fixtures import fixture_transcripts
from anendektos_spark.parse import parse_sink
from anendektos_spark.route import route
from anendektos_spark.schemas import SINKS

from .pyref import parse_fixture

GOLDEN_COUNTS = {"conn": 6, "dns": 4, "http": 3, "files": 4, "ssl": 4, "x509": 3}


@pytest.fixture()
def ansi(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", old)


def test_golden_counts_and_rejects_under_ansi(ansi):
    r = route(fixture_transcripts(ansi))
    got = {t: df.count() for t, df in r.sinks.items()}
    assert got == GOLDEN_COUNTS
    assert r.rejects.count() == 2  # the unknown-tool rows


def test_full_field_equality_under_ansi(ansi):
    r = route(fixture_transcripts(ansi))
    got = {row["uid"]: row for row in r.sinks["conn"].collect()}
    want = {rec["uid"]: rec for rec in parse_fixture("conn", FIXTURE_LINES["conn"])}
    assert set(got) == set(want)
    for k, rec in want.items():
        for c in SINKS["conn"]:
            assert got[k][c.name] == rec[c.name], (c.name, k)


def test_malformed_rows_reject_not_crash_under_ansi(ansi):
    """Bad casts and short lines must become row-level rejects, never
    ANSI task failures (CAST_INVALID_INPUT / INVALID_ARRAY_INDEX)."""
    line0 = FIXTURE_LINES["conn"][0]
    toks = line0.split("\t")
    padded = list(toks)
    padded[3] = " " + padded[3]
    rows = [
        ("A", 0, "user", line0, "conn", 1.0),                      # good
        ("B", 1, "user", "NOT_A_TS\t" + "\t".join(toks[1:]), "conn", 1.0),
        ("C", 2, "user", "\t".join(padded), "conn", 1.0),          # padded int
        ("D", 3, "user", "short\tline", "conn", 1.0),              # field_count
    ]
    df = ansi.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts double"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    parsed = parse_sink(df, "conn")
    reasons = {r["conv_id"]: r["reject_reason"] for r in parsed.collect()}
    assert reasons == {"A": None, "B": "bad_ts", "C": "bad_orig_p", "D": "field_count"}
