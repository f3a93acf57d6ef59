"""BPE tokenizer training (functions/bpe.py): merge learning, greedy
application semantics, and the unrolled-CTE DuckDB mirror."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from anendektos_spark.functions import bpe

ROWS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the hat and the cat"),
    ("d3", "low lower lowest newer newest"),
    ("d4", "the THE The  the"),
]
REL = (
    "SELECT * FROM (VALUES "
    + ",".join(f"('{i}','{t}')" for i, t in ROWS)
    + ") AS t(doc_id, text)"
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id string, text string")


def test_word_vocab_counts_and_symbols(spark, corpus):
    v = {r.word: (r.wfreq, r.syms) for r in bpe.word_vocab(corpus).collect()}
    # normalize_text lowercases, so THE/The/the collapse: 2+2+4
    assert v["the"][0] == 8
    assert v["cat"] == (2, ["c", "a", "t", bpe.END])
    assert "low" in v and v["low"][1] == ["l", "o", "w", bpe.END]


def test_word_vocab_filters_non_ascii_words(spark):
    df = spark.createDataFrame(
        [("d", "héllo naïve plain words plain")], "doc_id string, text string"
    )
    words = {r.word for r in bpe.word_vocab(df).collect()}
    assert words == {"plain", "words"}


def test_apply_merge_greedy_nonoverlapping(spark):
    out = spark.range(1).select(
        bpe.apply_merge(F.split(F.lit("a a a a"), " "), "a", "a").alias("m"),
        bpe.apply_merge(F.split(F.lit("a b a b c"), " "), "a", "b").alias("m2"),
        bpe.apply_merge(F.array().cast("array<string>"), "a", "b").alias("m3"),
    ).collect()[0]
    assert out.m == ["aa", "aa"]  # non-overlapping: [a,a,a,a] -> [aa,aa]
    assert out.m2 == ["ab", "ab", "c"]
    assert out.m3 == []


def test_bpe_merges_overlap_counting(spark):
    # one word "aaaa" (freq 1): adjacent pairs (a,a)x3 inside chars;
    # winner must be (a,a) with the overlapping count 3
    df = spark.createDataFrame([("d", "aaaa")], "doc_id string, text string")
    m = bpe.bpe_merges(df, 1).collect()[0]
    assert (m.lhs, m.rhs, m.pair_count) == ("a", "a", 3)


def test_bpe_merges_learns_the(spark, corpus):
    got = [(r.step, r.lhs, r.rhs, r.pair_count) for r in
           bpe.bpe_merges(corpus, 5).orderBy("step").collect()]
    # 'the' is the most frequent word (7) -> its merges lead
    assert got[0] == (1, "e", bpe.END, 8)
    assert got[1] == (2, "h", "e" + bpe.END, 8)
    assert got[2] == (3, "t", "he" + bpe.END, 8)
    # max pair count never increases round over round (new pairs are
    # sub-counts of the merged pair; old pairs only lose occurrences)
    counts = [g[3] for g in got]
    assert counts == sorted(counts, reverse=True)


def test_bpe_merges_matches_duckdb(spark, corpus):
    got = [tuple(r) for r in bpe.bpe_merges(corpus, 5).orderBy("step").collect()]
    want = [tuple(r) for r in duckdb.sql(bpe.bpe_merges_sql(REL, 5)).fetchall()]
    assert got == want


def test_bpe_token_counts_matches_duckdb(spark, corpus):
    got = {r.token: r.token_count for r in bpe.bpe_token_counts(corpus, 5).collect()}
    want = dict(duckdb.sql(bpe.bpe_token_counts_sql(REL, 5)).fetchall())
    assert got == want
    # after 3+ merges "the</w>" is a single token with count 8
    assert got["the" + bpe.END] == 8


def test_bpe_token_counts_conserves_word_mass(spark, corpus):
    # every word instance ends in exactly one END-bearing symbol, so the
    # total count of END-suffixed tokens equals total word instances
    toks = bpe.bpe_token_counts(corpus, 4)
    end_mass = (
        toks.filter(F.col("token").endswith(bpe.END))
        .agg(F.sum("token_count").alias("s"))
        .collect()[0]["s"]
    )
    n_words = (
        bpe.word_vocab(corpus).agg(F.sum("wfreq").alias("s")).collect()[0]["s"]
    )
    assert end_mass == n_words


def test_bpe_merges_early_stop_and_validation(spark):
    df = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    # vocab = {x</w>}: one pair (x, </w>) -> merges exhaust after 1 round
    m = bpe.bpe_merges(df, 5).collect()
    assert [(r.step, r.lhs, r.rhs) for r in m] == [(1, "x", bpe.END)]
    with pytest.raises(ValueError):
        bpe.bpe_merges(df, 0)
