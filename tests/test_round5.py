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
