"""Semantic tests for all-pairs tf·idf cosine and duplicated-span removal
— hand-built inputs with independently computed expected outputs (the
DuckDB cross-check runs separately via the driver contract)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row

from anendektos_spark.functions import dedup, textstats


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --------------------------------------------------------------------------
# tfidf_cosine_pairs
# --------------------------------------------------------------------------

def _py_cosine_pairs(docs, threshold, ngram=1, max_df=None, fp_scale=1000):
    """Independent pure-python mirror of the fixed-point contract."""
    toks = {i: t.split() for i, t in docs.items()}
    terms = {}
    for i, ts in toks.items():
        if ngram == 1:
            arr = ts
        else:
            arr = [
                " ".join(ts[j : j + ngram])
                for j in range(len(ts) - ngram + 1)
            ] if len(ts) >= ngram else []
        tf = {}
        for t in arr:
            if t:
                tf[t] = tf.get(t, 0) + 1
        terms[i] = tf
    df_ = {}
    for tf in terms.values():
        for t in tf:
            df_[t] = df_.get(t, 0) + 1
    n = len(docs)
    w = {
        i: {
            t: (c * n * fp_scale) // df_[t]
            for t, c in tf.items()
            if max_df is None or df_[t] <= max_df
        }
        for i, tf in terms.items()
    }
    norm2 = {i: sum(v * v for v in ws.values()) for i, ws in w.items()}
    out = {}
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            cos = round(dot / (math.sqrt(norm2[a]) * math.sqrt(norm2[b])), 6)
            if cos >= threshold:
                out[(a, b)] = (len(shared), cos)
    return out


DOCS = {
    1: "red fish blue fish",
    2: "red fish blue fish",          # exact dup of 1 -> cosine 1.0
    3: "red cat blue cat red dog",    # partial overlap
    4: "quantum flux capacitor",      # disjoint vocabulary
    5: "blue fish",                   # subset of 1
}


def _docs_df(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in DOCS.items()]
    )


def test_cosine_pairs_match_python_reference(spark):
    got = {
        (r.doc_a, r.doc_b): (r.n_shared_terms, r.cosine)
        for r in textstats.tfidf_cosine_pairs(
            _docs_df(spark), threshold=0.0, cache=False
        ).collect()
    }
    want = _py_cosine_pairs(DOCS, threshold=0.0)
    assert got == want
    assert got[(1, 2)][1] == 1.0          # identical docs
    assert (1, 4) not in got              # disjoint docs never pair
    assert 0 < got[(1, 5)][1] < 1.0       # subset overlaps partially


def test_cosine_pairs_threshold_and_ngram(spark):
    df = _docs_df(spark)
    all_pairs = textstats.tfidf_cosine_pairs(df, threshold=0.0, cache=False)
    high = textstats.tfidf_cosine_pairs(df, threshold=0.99, cache=False)
    kept = {(r.doc_a, r.doc_b) for r in high.collect()}
    assert kept == {
        (r.doc_a, r.doc_b) for r in all_pairs.collect() if r.cosine >= 0.99
    }
    # bigram terms: only the exact duplicates share any bigram-weighted mass
    bi = {
        (r.doc_a, r.doc_b): (r.n_shared_terms, r.cosine)
        for r in textstats.tfidf_cosine_pairs(
            df, threshold=0.0, ngram=2, cache=False
        ).collect()
    }
    assert bi == _py_cosine_pairs(DOCS, threshold=0.0, ngram=2)
    assert bi[(1, 2)][1] == 1.0


def test_cosine_pairs_max_df_stop_band(spark):
    # 'fish' and 'blue' appear in 3 docs; with max_df=2 they are banded
    # out and pairs that only shared banded terms disappear.
    got = {
        (r.doc_a, r.doc_b): (r.n_shared_terms, r.cosine)
        for r in textstats.tfidf_cosine_pairs(
            _docs_df(spark), threshold=0.0, max_df=2, cache=False
        ).collect()
    }
    assert got == _py_cosine_pairs(DOCS, threshold=0.0, max_df=2)
    assert (1, 5) not in got  # only shared 'blue fish' tokens, both banded


def test_cosine_pairs_validation(spark):
    df = _docs_df(spark)
    with pytest.raises(ValueError):
        textstats.tfidf_cosine_pairs(df, ngram=0)
    with pytest.raises(ValueError):
        textstats.tfidf_cosine_pairs(df, fp_scale=0)


# --------------------------------------------------------------------------
# dedup_spans
# --------------------------------------------------------------------------

def test_dedup_spans_hand_computed(spark):
    # block_tokens=2: doc A = [ab][cd][ef] + tail 'x'; doc B = [ab][cd];
    # doc C = [zz][cd]; 'ab' x2, 'cd' x3 -> dup; 'ef','zz' unique.
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f x"),
            Row(doc_id=2, text="a b c d"),
            Row(doc_id=3, text="z z c d"),
        ]
    )
    got = {
        r.doc_id: r
        for r in dedup.dedup_spans(
            df, block_tokens=2, min_count=2, cache=False
        ).collect()
    }
    assert got[1].n_blocks == 3 and got[1].n_dup_blocks == 2
    assert got[1].cleaned_text == "e f x"           # tail 'x' kept
    assert got[1].n_tokens_kept == 3
    assert got[2].cleaned_text == "" and got[2].n_tokens_kept == 0
    assert got[3].cleaned_text == "z z"             # unique block survives
    for r in got.values():
        assert r.cleaned_md5 == _md5(r.cleaned_text)


def test_dedup_spans_short_doc_and_intra_doc_repeat(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="q"),                # shorter than one block
            Row(doc_id=2, text="p p p p"),          # block repeats WITHIN doc
        ]
    )
    got = {
        r.doc_id: r
        for r in dedup.dedup_spans(
            df, block_tokens=2, min_count=2, cache=False
        ).collect()
    }
    assert got[1].n_blocks == 0 and got[1].cleaned_text == "q"
    # 'p p' occurs twice corpus-wide (both inside doc 2) -> removed
    assert got[2].n_dup_blocks == 2 and got[2].cleaned_text == ""


def test_dedup_spans_min_count_and_validation(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b a b")])
    relaxed = dedup.dedup_spans(
        df, block_tokens=2, min_count=3, cache=False
    ).collect()[0]
    assert relaxed.n_dup_blocks == 0 and relaxed.cleaned_text == "a b a b"
    with pytest.raises(ValueError):
        dedup.dedup_spans(df, block_tokens=0)
    with pytest.raises(ValueError):
        dedup.dedup_spans(df, min_count=0)


def test_source_overlap_matrix_hand_computed(spark):
    from anendektos_spark.functions import dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),
            (2, "b c d e", "s2"),
            (3, "x y z", "s3"),
            (4, "a b c", "s1"),  # duplicate shingle within s1: counted once
        ],
        "doc_id int, text string, source string",
    )
    got = {
        (r.src_a, r.src_b): r
        for r in dedup.source_overlap_matrix(docs).collect()
    }
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    r12 = got[("s1", "s2")]
    # s1 = {abc, bcd}, s2 = {bcd, cde}: common 1, union 3
    assert (r12.n_a, r12.n_b, r12.n_common, r12.jaccard) == (2, 2, 1, 0.3333)
    r13 = got[("s1", "s3")]
    assert (r13.n_common, r13.jaccard) == (0, 0.0)  # zero-overlap pair kept


def test_source_overlap_keeps_shingle_less_sources(spark):
    # regression: a source whose docs are all shorter than n tokens has
    # zero shingles but must still appear in every pair with n_sh = 0
    from anendektos_spark.functions import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "b c d e", "s2"), (3, "x y", "s3")],
        "doc_id int, text string, source string",
    )
    got = {(r.src_a, r.src_b): r for r in dedup.source_overlap_matrix(docs).collect()}
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    r13 = got[("s1", "s3")]
    assert (r13.n_a, r13.n_b, r13.n_common, r13.jaccard) == (2, 0, 0, 0.0)
