"""Round-4 late additions: exact duplicated-substring spans, per-source
token-budget selection, heaps-law vocab growth, and fixed-point
discounted trajectory returns. Functional semantics here; oracle parity
runs in scripts/check_oracle.py; plan pins at the bottom."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anendektos_spark.functions import dedup, sampling, textstats, transcript

from tests.test_plans import plan_of


# --------------------------------------------------------------------------
# exact_substring_spans
# --------------------------------------------------------------------------

def _spans(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_substring_spans(df, k=kw.pop("k", 8), **kw).collect()
    return {
        (r.doc_id, r.span_start): (r.span_end, r.span_len, r.n_anchors)
        for r in out
    }


def test_substring_spans_cross_doc_and_merge(spark):
    # docs 1 and 2 share the 16-char run "ABCDEFGHIJKLMNOP"; with k=8 the
    # 9 anchor windows inside it overlap pairwise → ONE merged span
    shared = "ABCDEFGHIJKLMNOP"
    rows = [
        (1, "xx" + shared + "yy"),
        (2, "qqqq" + shared + "rrrr"),
        (3, "completely-unrelated-text-z"),
    ]
    got = _spans(spark, rows)
    # doc 1: span covers [2, 18); doc 2: [4, 20); doc 3: nothing
    assert got == {
        (1, 2): (18, 16, 9),
        (2, 4): (20, 16, 9),
    }


def test_substring_spans_within_doc_repeat_flagged(spark):
    # the duplicate occurs twice inside ONE doc — still ≥2 occurrences
    rows = [(7, "AAAABBBBCCCC....AAAABBBBCCCC")]
    got = _spans(spark, rows)
    assert (7, 0) in got and (7, 16) in got
    assert got[(7, 0)][1] == 12 and got[(7, 16)][1] == 12


def test_substring_spans_disjoint_islands_stay_separate(spark):
    # two shared 8-char runs separated by unique text → two spans per doc
    a, b = "11223344", "99887766"
    rows = [(1, a + "-unique-left-" + b), (2, a + "=other=middle=" + b)]
    got = _spans(spark, rows)
    spans_doc1 = sorted(k[1] for k in got if k[0] == 1)
    assert spans_doc1 == [0, 21]
    assert got[(1, 0)] == (8, 8, 1)


def test_substring_spans_short_docs_and_params(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    assert dedup.exact_substring_spans(df, k=8).count() == 0
    with pytest.raises(ValueError):
        dedup.exact_substring_spans(df, k=8, min_count=1)
    with pytest.raises(ValueError):
        dedup.exact_substring_spans(df, k=8, stride=0)


def test_substring_spans_stride_catches_long_runs(spark):
    # stride=4 with k=8 still catches every duplicated run ≥ k+s-1 = 11
    shared = "ABCDEFGHIJKLMNOP"  # 16 ≥ 11
    rows = [(1, shared + "xxxx"), (2, "yyy-" + shared)]
    got = _spans(spark, rows, stride=4)
    assert any(k[0] == 1 for k in got) and any(k[0] == 2 for k in got)


# --------------------------------------------------------------------------
# token_budget_select
# --------------------------------------------------------------------------

def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens int, quality double"
    )


def test_token_budget_prefix_semantics(spark):
    rows = [
        (1, "a", 100, 0.9),
        (2, "a", 100, 0.8),
        (3, "a", 100, 0.7),  # cum 300 > 250 → cut, and everything after
        (4, "a", 10, 0.6),   # would fit, but selection is a ranked prefix
        (5, "b", 200, 0.5),
    ]
    out = sampling.token_budget_select(_scored(spark, rows), budget=250)
    got = {r.doc_id: r.cum_tokens for r in out.collect()}
    assert got == {1: 100, 2: 200, 5: 200}


def test_token_budget_tie_break_is_doc_id(spark):
    rows = [(9, "a", 60, 0.5), (2, "a", 60, 0.5), (5, "a", 60, 0.5)]
    out = sampling.token_budget_select(_scored(spark, rows), budget=120)
    assert sorted(r.doc_id for r in out.collect()) == [2, 5]


def test_token_budget_first_doc_over_budget_empty_group(spark):
    rows = [(1, "a", 500, 0.9), (2, "b", 10, 0.1)]
    out = sampling.token_budget_select(_scored(spark, rows), budget=100)
    assert [r.doc_id for r in out.collect()] == [2]


# --------------------------------------------------------------------------
# vocab_growth
# --------------------------------------------------------------------------

def test_vocab_growth_curve(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat"),
            (1, "the dog"),
            (2, "THE cat runs"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = textstats.vocab_growth(docs, checkpoints=(1, 2, 3, 100))
    got = {r.cp: (r.n_docs, r.total_tokens, r.vocab_size) for r in out.collect()}
    # doc 0: {the, cat}; doc 1 adds {dog}; doc 2 adds {runs} (THE folds
    # into 'the'); doc 3 is empty (0 tokens, counted as a doc)
    assert got == {
        1: (1, 2, 2),
        2: (2, 4, 3),
        3: (3, 7, 4),
        100: (4, 7, 4),
    }


def test_vocab_growth_checkpoint_below_min_id(spark):
    docs = spark.createDataFrame([(10, "a b")], "doc_id long, text string")
    out = textstats.vocab_growth(docs, checkpoints=(5, 11))
    got = {r.cp: (r.n_docs, r.vocab_size) for r in out.collect()}
    assert got == {5: (0, 0), 11: (1, 2)}


# --------------------------------------------------------------------------
# trajectory_returns
# --------------------------------------------------------------------------

def _parsed(spark, statuses):
    rows = [
        ("c1", i, "conn", st, 1, 0) for i, st in enumerate(statuses)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, tool_called string, status string,"
        " latency_ms int, epoch long",
    )


def _py_returns(rewards, horizon):
    out = []
    for t in range(len(rewards)):
        g = 0
        for o in range(horizon + 1):
            if t + o < len(rewards):
                g += rewards[t + o] * 2 ** (horizon - o)
        out.append(g)
    return out


def test_trajectory_returns_match_python_fold(spark):
    statuses = ["OK", "ERR", "OK", "OK", "TIMEOUT", "OK"]
    rewards = [1 if s == "OK" else -1 for s in statuses]
    out = (
        transcript.trajectory_returns(_parsed(spark, statuses), horizon=3)
        .orderBy("turn_idx")
        .collect()
    )
    assert [r.return_fp for r in out] == _py_returns(rewards, 3)
    assert all(r.return_g == r.return_fp / 8.0 for r in out)
    assert [r.reward for r in out] == rewards


def test_trajectory_returns_horizon_truncates(spark):
    # with horizon 0 the return IS the reward (scaled by 2^0 = 1)
    statuses = ["OK", "ERR"]
    out = (
        transcript.trajectory_returns(_parsed(spark, statuses), horizon=0)
        .orderBy("turn_idx")
        .collect()
    )
    assert [r.return_fp for r in out] == [1, -1]
    with pytest.raises(ValueError):
        transcript.trajectory_returns(_parsed(spark, statuses), horizon=33)


def test_trajectory_returns_per_conversation_isolation(spark):
    # two single-call conversations must not discount into each other
    rows = [
        ("a", 0, "conn", "OK", 1, 0),
        ("b", 0, "conn", "ERR", 1, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, tool_called string, status string,"
        " latency_ms int, epoch long",
    )
    got = {
        r.conv_id: r.return_fp
        for r in transcript.trajectory_returns(df, horizon=4).collect()
    }
    assert got == {"a": 16, "b": -16}


# --------------------------------------------------------------------------
# plan pins (the 100 TB shapes)
# --------------------------------------------------------------------------

def test_substring_spans_no_pairs_no_python(spark):
    # spark.range source so the scan itself is JVM-only (createDataFrame
    # scans print applySchemaToPythonRDD, which would trip the pin)
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared-prefix-text-"),
            (F.col("id") % 3).cast("string"),
            F.lit("-tail"),
        ).alias("text"),
    )
    plan = plan_of(dedup.exact_substring_spans(docs, k=8))
    # anchor count, anchor join-back, per-doc window — hash exchanges
    # only, never a pair-forming cross join, never a Python boundary
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


def test_token_budget_single_exchange(spark):
    scored = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
        (F.col("id") + 10).cast("int").alias("n_tokens"),
        (F.col("id") % 7).cast("double").alias("quality"),
    )
    plan = plan_of(sampling.token_budget_select(scored, budget=200))
    # one window partitioned by source → exactly one hash exchange
    assert plan.count("hashpartitioning") == 1
    assert "Python" not in plan


def test_trajectory_returns_single_exchange(spark):
    parsed = transcript.parse_turns(transcript.synth_transcript(spark, 2000))
    plan = plan_of(transcript.trajectory_returns(parsed, horizon=8))
    # all 9 lead() terms share ONE (conv_id, turn_idx) window spec
    assert plan.count("hashpartitioning") == 1
    assert "Python" not in plan and "CartesianProduct" not in plan


def test_vocab_growth_broadcast_checkpoints_no_global_window(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 5} common") for i in range(200)],
        "doc_id long, text string",
    )
    plan = plan_of(textstats.vocab_growth(docs, checkpoints=(50, 100)))
    # the checkpoint fan-out must be broadcast range joins; no global
    # row_number (no SinglePartition window) anywhere
    assert "BroadcastNestedLoopJoin" in plan  # range join on tiny cp side
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# substring_dup_rate
# --------------------------------------------------------------------------

def test_substring_dup_rate_per_source(spark):
    shared = "ABCDEFGHIJKLMNOP"  # 16 dup chars with k=8
    docs = spark.createDataFrame(
        [
            (1, "x" * 4 + shared, "a"),   # 20 chars, 16 flagged
            (2, shared + "y" * 4, "a"),   # 20 chars, 16 flagged
            (3, "unique-text-here-ok", "b"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.source: (r.n_docs, r.n_chars, r.dup_chars, r.dup_ppm)
        for r in dedup.substring_dup_rate(docs, k=8).collect()
    }
    assert out["a"] == (2, 40, 32, 800_000)
    assert out["b"] == (1, 19, 0, 0)


# --------------------------------------------------------------------------
# epoch_shuffle
# --------------------------------------------------------------------------

def test_epoch_shuffle_deterministic_and_complete(spark):
    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    a = sampling.epoch_shuffle(docs, epochs=2, n_shards=4).collect()
    b = sampling.epoch_shuffle(docs, epochs=2, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    # every (doc, epoch) appears exactly once
    assert len(a) == 80
    assert len({(r.doc_id, r.epoch) for r in a}) == 80
    # positions are dense 1..n within each (epoch, shard)
    from collections import defaultdict

    by = defaultdict(list)
    for r in a:
        by[(r.epoch, r.shard_id)].append(r.pos)
    for ps in by.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_epoch_shuffle_orders_differ_across_epochs(spark):
    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    rows = sampling.epoch_shuffle(docs, epochs=2, n_shards=1).collect()
    order = {
        e: [r.doc_id for r in sorted(rows, key=lambda r: r.pos) if r.epoch == e]
        for e in (0, 1)
    }
    assert order[0] != order[1]
    with pytest.raises(ValueError):
        sampling.epoch_shuffle(docs, epochs=0)


# --------------------------------------------------------------------------
# group_advantages
# --------------------------------------------------------------------------

def test_group_advantages_exact_numerator(spark):
    rows = [
        # group 'conn': returns 2, 0  → sum 2, n 2
        ("c1", 0, "conn", "OK", 1, 0), ("c1", 1, "dns", "OK", 1, 0),
        ("c2", 0, "conn", "OK", 1, 0), ("c2", 1, "dns", "ERR", 1, 0),
        # group 'http': single conv, return -1 → adv 0
        ("c3", 0, "http", "ERR", 1, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, tool_called string, status string,"
        " latency_ms int, epoch long",
    )
    got = {r.conv_id: r for r in transcript.group_advantages(df).collect()}
    assert got["c1"].group_key == "conn" and got["c1"].conv_return == 2
    # adv_num = r·n − Σ: c1 → 2·2−2 = 2; c2 → 0·2−2 = −2; c3 → 0
    assert got["c1"].adv_num == 2
    assert got["c2"].adv_num == -2
    assert got["c3"].adv_num == 0 and got["c3"].n_group == 1


# --------------------------------------------------------------------------
# matryoshka_recall
# --------------------------------------------------------------------------

def test_matryoshka_recall_identity_at_full_dims(spark):
    from anendektos_spark.functions import similarity

    emb = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda j: ((F.col("id") * j) % 7).cast("float") + F.lit(0.5),
        ).alias("embedding"),
    )
    qs = emb.filter(F.col("vec_id") < 3)
    # truncating to the FULL width must reproduce ground truth exactly
    r = similarity.matryoshka_recall(emb, qs, k=3, dims=8).collect()[0]
    assert r.recall_ppm == 1_000_000 and r.n_queries == 3
    # a 1-dim prefix of this construction collapses ranks → recall < 1
    r1 = similarity.matryoshka_recall(emb, qs, k=3, dims=1).collect()[0]
    assert r1.recall_ppm < 1_000_000
    with pytest.raises(ValueError):
        similarity.matryoshka_recall(emb, qs, k=3, dims=0)


# --------------------------------------------------------------------------
# lsh_containment / cluster_size_histogram / retrieval_effectiveness
# --------------------------------------------------------------------------

def test_containment_detects_subset_jaccard_dilutes(spark):
    # doc 2 is doc 1's text wholly embedded in a much longer document:
    # jaccard is low, containment(1→2) is 1.0. An extreme size ratio is
    # exactly what MinHash banding under-recalls (documented caveat), so
    # this case feeds the refine an explicit candidate relation — the
    # winnow-sourced pattern the docstring prescribes at corpus scale.
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"filler{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = dedup.lsh_containment(
        docs, min_containment_ppm=900_000, use_cache=False, candidates=cand
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.contain_a_ppm == 1_000_000  # all of doc 1's shingles shared
    assert r.contain_b_ppm < 500_000
    # n_shared = all 4 of doc 1's distinct 3-gram shingles
    assert r.n_shared == r.n_a == 4


def test_containment_via_lsh_candidates_moderate_overlap(spark):
    # near-dup regime (high jaccard) where banding recall IS reliable:
    # doc 2 extends doc 1 by a suffix → contain(1→2) = 1.0, contain(2→1)
    # < 1.0, and the pair surfaces through the band chain itself
    base = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " nine ten")], "doc_id long, text string"
    )
    out = dedup.lsh_containment(
        docs, min_containment_ppm=900_000, use_cache=False
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.contain_a_ppm == 1_000_000 and r.contain_b_ppm < 1_000_000


def test_cluster_size_histogram_counts(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20)],
        "doc_id long, cluster_id long",
    )
    got = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in dedup.cluster_size_histogram(clusters).collect()
    }
    assert got == {3: (1, 3), 2: (2, 4)}


def test_retrieval_effectiveness_hand_corpus(spark):
    # 3 docs contain both terms (relevant); BM25 over 'rare common'
    # must place them in the top-k of this tiny corpus
    rows = [
        (1, "rare common filler one"),
        (2, "rare common filler two"),
        (3, "common only here"),
        (4, "rare only here"),
        (5, "neither term at all"),
        (6, "rare common rare common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = textstats.retrieval_effectiveness(
        docs, ["rare", "common"], k=3
    ).collect()[0]
    assert r.n_relevant == 3 and r.n_topk == 3
    assert r.n_hits == 3 and r.first_rank == 1
    assert r.recall_ppm == 1_000_000 and r.precision_ppm == 1_000_000
    assert r.rr_fp == 1_000_000


def test_retrieval_effectiveness_no_relevant(spark):
    docs = spark.createDataFrame(
        [(1, "just some words"), (2, "more words here")],
        "doc_id long, text string",
    )
    r = textstats.retrieval_effectiveness(docs, ["absent"], k=3).collect()[0]
    assert r.n_relevant == 0 and r.n_topk == 0 and r.n_hits == 0
    assert r.recall_ppm == 0 and r.precision_ppm == 0 and r.rr_fp == 0


# --------------------------------------------------------------------------
# apply_substring_removal
# --------------------------------------------------------------------------

def test_apply_substring_removal_rewrites(spark):
    shared = "ABCDEFGHIJKLMNOP"
    docs = spark.createDataFrame(
        [
            (1, "xx" + shared + "yy"),       # span [2,18) → keep "xx"+"yy"
            (2, shared + "tailtail"),        # span at doc start
            (3, "headhead" + shared),        # span at doc end
            (4, "no duplicates here at all"),
        ],
        "doc_id long, text string",
    )
    spans = dedup.exact_substring_spans(docs, k=8)
    got = {
        r.doc_id: (r.cleaned_text, r.n_spans, r.chars_removed)
        for r in dedup.apply_substring_removal(docs, spans).collect()
    }
    assert got[1] == ("xxyy", 1, 16)
    assert got[2] == ("tailtail", 1, 16)
    assert got[3] == ("headhead", 1, 16)
    assert got[4] == ("no duplicates here at all", 0, 0)


def test_apply_substring_removal_multiple_spans(spark):
    a, b = "11223344", "99887766"
    docs = spark.createDataFrame(
        [(1, a + "-keep-this-" + b), (2, a + "=and=this==" + b)],
        "doc_id long, text string",
    )
    spans = dedup.exact_substring_spans(docs, k=8)
    got = {
        r.doc_id: (r.cleaned_text, r.n_spans)
        for r in dedup.apply_substring_removal(docs, spans).collect()
    }
    assert got[1] == ("-keep-this-", 2)
    assert got[2] == ("=and=this==", 2)
