"""Round-4 session-3 additions: collocation mining (word2phrase +
Dice), positional exact-phrase search, label-propagation communities,
degree-distribution report, per-category tool-concentration HHI,
per-source corpus data card, tool-chain stationary distribution, and
directed BFS seed-distance labeling. Functional semantics here; oracle parity runs in
scripts/check_oracle.py; plan pins at the bottom."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anendektos_spark.functions import graph, textstats, transcript

from tests.test_plans import plan_of


# --------------------------------------------------------------------------
# collocations
# --------------------------------------------------------------------------

def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_collocations_hand_counts(spark):
    # "new york" ×3; unigrams: new=4 (one stray), york=3, total=13
    df = _docs(spark, [
        "new york new york",
        "new york",
        "new spark",
        "table spark",
    ])
    rows = {(r.w1, r.w2): r for r in
            textstats.collocations(df, min_count=2, top_n=10).collect()}
    assert set(rows) == {("new", "york")}
    r = rows[("new", "york")]
    assert (r.cnt_pair, r.cnt_w1, r.cnt_w2) == (3, 4, 3)
    # total unigrams = 10; score = (3-2)*10*1e6 // (4*3) = 833_333
    assert r.score_fp == (3 - 2) * 10 * 1_000_000 // (4 * 3)
    # dice = 2*3*1e6 // (4+3)
    assert r.dice_ppm == 2 * 3 * 1_000_000 // 7
    # "york new" occurs only once (inside doc 0) → below min_count
    # and never emitted


def test_collocations_min_count_is_delta_and_prunes(spark):
    # pair at exactly min_count survives with score (cnt-min_count)=0
    df = _docs(spark, ["a b", "a b", "c d"])
    rows = textstats.collocations(df, min_count=2, top_n=10).collect()
    got = {(r.w1, r.w2): r.score_fp for r in rows}
    assert got == {("a", "b"): 0}


def test_collocations_top_n_orders_by_score_then_pair(spark):
    # (p,q)=3/(4·3) and (x,y)=2/(3·2) tie at score 2_000_000 —
    # the deterministic tie-break (w1, w2 asc) must order them
    df = _docs(spark, ["x y", "x y", "p q", "p q", "p p q x"])
    rows = textstats.collocations(df, min_count=1, top_n=2).collect()
    assert [(r.w1, r.w2) for r in rows] == [("p", "q"), ("x", "y")]
    assert rows[0].score_fp == rows[1].score_fp == 2_000_000


def test_collocations_validation(spark):
    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="min_count"):
        textstats.collocations(df, min_count=0)
    with pytest.raises(ValueError, match="top_n"):
        textstats.collocations(df, top_n=0)


# --------------------------------------------------------------------------
# phrase_search
# --------------------------------------------------------------------------

def test_phrase_search_adjacency_required(spark):
    df = _docs(spark, [
        "san francisco bay",          # match at 0
        "francisco san",              # terms present, wrong order
        "san x francisco",            # terms present, not adjacent
        "say san francisco twice san francisco",  # two matches
    ])
    got = {r.doc_id: (r.n_matches, r.first_pos) for r in
           textstats.phrase_search(df, "san francisco").collect()}
    assert got == {0: (1, 0), 3: (2, 1)}


def test_phrase_search_repeated_term_phrase(spark):
    # phrase with a repeated token: "a b a" — offsets must be distinct
    df = _docs(spark, ["a b a b a", "a b b a", "b a b a b"])
    got = {r.doc_id: (r.n_matches, r.first_pos) for r in
           textstats.phrase_search(df, "a b a").collect()}
    # doc 0: starts 0 and 2 (overlapping); doc 2: start 1
    assert got == {0: (2, 0), 2: (1, 1)}


def test_phrase_search_single_token_and_validation(spark):
    df = _docs(spark, ["only one hit here", "none"])
    got = {r.doc_id: r.n_matches for r in
           textstats.phrase_search(df, "hit").collect()}
    assert got == {0: 1}
    with pytest.raises(ValueError, match="phrase"):
        textstats.phrase_search(df, "   ")


def test_phrase_search_matches_conjunctive_superset(spark):
    # every phrase match must also be a conjunctive (AND) match
    df = _docs(spark, [
        "stream table hash join", "table stream hash", "stream table hash",
    ])
    phrase = {r.doc_id for r in
              textstats.phrase_search(df, "stream table").collect()}
    conj = {r.doc_id for r in
            textstats.search_conjunctive(df, ("stream", "table")).collect()}
    assert phrase <= conj
    assert phrase == {0, 2}


# --------------------------------------------------------------------------
# label_propagation
# --------------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_lpa_two_cliques_separate(spark):
    # two 4-cliques joined by a single bridge edge: LPA must converge to
    # one community per clique (bridge too weak to flip anyone)
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    got = graph.label_propagation(
        _edges(spark, c1 + c2 + [(3, 10)]), iters=4
    ).collect()
    comm = {r.node: r.community for r in got}
    assert len({comm[n] for n in range(4)}) == 1
    assert len({comm[n] for n in range(10, 14)}) == 1
    assert comm[0] != comm[10]


def test_lpa_tie_break_deterministic_min_label(spark):
    # path 0-1-2: node 1 sees labels {0, 2} once each → ties to 0
    got = graph.label_propagation(_edges(spark, [(0, 1), (1, 2)]),
                                  iters=1).collect()
    comm = {r.node: r.community for r in got}
    assert comm[1] == 0
    # endpoints adopt their only neighbor's label
    assert comm[0] == 1 and comm[2] == 1


def test_lpa_validation_and_self_loop_dropped(spark):
    with pytest.raises(ValueError, match="iters"):
        graph.label_propagation(_edges(spark, [(0, 1)]), iters=0)
    # a pure self-loop node contributes no undirected edge at all
    got = graph.label_propagation(
        _edges(spark, [(0, 1), (5, 5)]), iters=2
    ).collect()
    assert {r.node for r in got} == {0, 1}


# --------------------------------------------------------------------------
# degree_histogram
# --------------------------------------------------------------------------

def test_degree_histogram_hand_buckets(spark):
    # out-degrees: node 0 → 5 edges (bucket 4), node 1 → 1 (bucket 1)
    # in-degrees: node 9 ← 6 edges (bucket 4)
    edges = [(0, 9)] * 5 + [(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.direction, r.bucket_lo): (r.n_nodes, r.sum_degree)
           for r in graph.degree_histogram(df).collect()}
    assert got == {
        ("out", 4): (1, 5),
        ("out", 1): (1, 1),
        ("in", 4): (1, 6),
    }


def test_degree_histogram_power_of_two_boundary(spark):
    # degree exactly 2^k must land in bucket 2^k, not 2^(k-1)
    edges = [(0, i) for i in range(8)] + [(1, i) for i in range(7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.direction, r.bucket_lo): r.n_nodes
           for r in graph.degree_histogram(df).collect()}
    assert got[("out", 8)] == 1   # deg 8 → bucket 8
    assert got[("out", 4)] == 1   # deg 7 → bucket 4


# --------------------------------------------------------------------------
# tool_concentration
# --------------------------------------------------------------------------

def _parsed(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool_called string, "
              "status string, epoch long, latency_ms int"
    )


def test_tool_concentration_hand_hhi(spark):
    # category net: dns ×3, conn ×1 → hhi = (9+1)*1e6 // 16 = 625000
    rows = [("c", i, t, "OK", 0, 1)
            for i, t in enumerate(["dns", "dns", "dns", "conn"])]
    got = {r.category: r for r in transcript.tool_concentration(
        _parsed(spark, rows), transcript.tool_dim(spark)).collect()}
    net = got["net"]
    assert (net.n_calls, net.n_tools) == (4, 2)
    assert net.hhi_ppm == (9 + 1) * 1_000_000 // 16
    assert net.top_tool == "dns"
    assert net.top_share_ppm == 3 * 1_000_000 // 4
    assert set(got) == {"net"}


def test_tool_concentration_monopoly_and_tie(spark):
    # monopoly category pins hhi at scale; top-tool tie breaks asc
    rows = ([("c", 1, "x509", "OK", 0, 1)]
            + [("c", 2, "conn", "OK", 0, 1), ("c", 3, "dns", "OK", 0, 1)])
    got = {r.category: r for r in transcript.tool_concentration(
        _parsed(spark, rows), transcript.tool_dim(spark)).collect()}
    assert got["crypto"].hhi_ppm == 1_000_000
    assert got["net"].top_tool == "conn"   # tie 1-1 → lexicographic
    assert got["net"].hhi_ppm == 2 * 1_000_000 // 4


# --------------------------------------------------------------------------
# plan pins
# --------------------------------------------------------------------------

def test_collocations_plan_no_cartesian_topk_pushed(spark):
    df = _docs(spark, ["a b c", "a b"])
    plan = plan_of(textstats.collocations(df, min_count=1, top_n=5))
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", "", 1
    )  # the single 1-row total fold is the only nested-loop join
    assert "TakeOrderedAndProject" in plan


def test_phrase_search_plan_filters_before_shuffle(spark):
    df = _docs(spark, ["stream table hash x", "y stream table hash"])
    plan = plan_of(textstats.phrase_search(df, "stream table hash"))
    # phrase-term IN filter must sit below the first exchange and the
    # k-row phrase relation must broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_tool_concentration_plan_broadcast_enrich(spark):
    parsed = transcript.parse_turns(transcript.synth_transcript(spark, 50))
    plan = plan_of(transcript.tool_concentration(
        parsed, transcript.tool_dim(spark)))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# corpus_datacard
# --------------------------------------------------------------------------

def test_corpus_datacard_hand_report(spark):
    rows = [
        (1, "a b c", "en", "s1", 5),
        (2, "d e", "en", "s1", 3),
        (3, "f", "fr", "s1", 1),
        (4, "g h i j", "de", "s2", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from anendektos_spark.functions.textstats import corpus_datacard
    got = {r.source: r for r in corpus_datacard(df).collect()}
    s1 = got["s1"]
    assert (s1.total_docs, s1.total_chars, s1.total_tokens) == (3, 9, 6)
    assert (s1.n_langs, s1.top_lang) == (2, "en")
    assert s1.top_lang_share_ppm == 2 * 1_000_000 // 3
    # hhi = (2² + 1²)·1e6 // 3² = 555555
    assert s1.lang_hhi_ppm == 5 * 1_000_000 // 9
    assert s1.avg_doc_tokens == 2
    assert got["s2"].lang_hhi_ppm == 1_000_000


# --------------------------------------------------------------------------
# tool_stationary
# --------------------------------------------------------------------------

def test_tool_stationary_python_fold_equality(spark):
    # two-state chain: a→b always, b→a always → uniform stationary
    rows = [("c1", i, t, "OK", 0, 1)
            for i, t in enumerate(["dns", "http", "dns", "http", "dns"])]
    got = {r.tool: r.pi_fp for r in transcript.tool_stationary(
        _parsed(spark, rows), iters=6).collect()}
    # replay the integer fold in python
    scale = 1_000_000
    trans = {("dns", "http"): scale, ("http", "dns"): scale}
    pi = {"dns": scale // 2, "http": scale // 2}
    for _ in range(6):
        nxt = {}
        for (s, d), p in trans.items():
            nxt[d] = nxt.get(d, 0) + (pi[s] * p) // scale
        pi = nxt
    assert got == pi


def test_tool_stationary_absorbing_state_takes_mass(spark):
    # dns→dns self pattern is impossible in a chain a→b→b→b: b absorbs
    rows = [("c1", i, t, "OK", 0, 1)
            for i, t in enumerate(["dns", "http", "http", "http"])]
    got = {r.tool: r.pi_fp for r in transcript.tool_stationary(
        _parsed(spark, rows), iters=8).collect()}
    # http absorbs (self-transitions 2/3... dns only feeds it); after 8
    # rounds dns mass = 0 (dns has no incoming transitions)
    assert got.get("dns", 0) == 0
    assert got["http"] > 900_000


def test_tool_stationary_dangling_self_loop_and_validation(spark):
    # single invocation → no transitions at all → every state dangles,
    # self-loops keep the uniform vector fixed
    rows = [("c1", 0, "dns", "OK", 0, 1), ("c2", 0, "http", "OK", 0, 1)]
    got = {r.tool: r.pi_fp for r in transcript.tool_stationary(
        _parsed(spark, rows), iters=3).collect()}
    assert got == {"dns": 500_000, "http": 500_000}
    with pytest.raises(ValueError, match="iters"):
        transcript.tool_stationary(_parsed(spark, rows), iters=0)


# --------------------------------------------------------------------------
# bfs_levels
# --------------------------------------------------------------------------

def test_bfs_levels_hand_graph(spark):
    # 0→1→2→3 plus shortcut 0→2; 5→0 must NOT make 5 reachable (directed)
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 2), (5, 0)])
    got = {r.node: r.level for r in
           graph.bfs_levels(edges, [0], max_depth=4).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_levels_seed_wins_and_depth_cap(spark):
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    # node 2 is also a seed → level 0, and 3 is its neighbor at level 1
    got = {r.node: r.level for r in
           graph.bfs_levels(edges, [0, 2], max_depth=1).collect()}
    assert got == {0: 0, 2: 0, 1: 1, 3: 1}
    with pytest.raises(ValueError, match="seeds"):
        graph.bfs_levels(edges, [])
    with pytest.raises(ValueError, match="max_depth"):
        graph.bfs_levels(edges, [0], max_depth=-1)


# --------------------------------------------------------------------------
# pr_curve
# --------------------------------------------------------------------------

def test_pr_curve_hand_confusion(spark):
    rows = [(3, 1), (3, 0), (2, 1), (1, 0), (1, 1)]
    df = spark.createDataFrame(rows, "score long, label int")
    from anendektos_spark.functions.classify import pr_curve
    got = {r.threshold: r for r in pr_curve(df, "score", "label").collect()}
    assert set(got) == {1, 2, 3}
    t3 = got[3]
    assert (t3.tp, t3.fp, t3.fn, t3.tn) == (1, 1, 2, 1)
    assert (t3.precision_ppm, t3.recall_ppm, t3.f1_ppm) == (
        500_000, 333_333, 400_000)
    t2 = got[2]
    assert (t2.tp, t2.fp, t2.fn, t2.tn) == (2, 1, 1, 1)
    assert (t2.precision_ppm, t2.recall_ppm, t2.f1_ppm) == (
        666_666, 666_666, 666_666)
    t1 = got[1]
    assert (t1.tp, t1.fp, t1.fn, t1.tn) == (3, 2, 0, 0)
    assert (t1.precision_ppm, t1.recall_ppm, t1.f1_ppm) == (
        600_000, 1_000_000, 750_000)


def test_pr_curve_rejects_non_binary_label(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from anendektos_spark.functions.classify import pr_curve
    df = spark.createDataFrame([(1, 2)], "score long, label int")
    with _pytest.raises(Exception) as ei:
        pr_curve(df, "score", "label").collect()
    assert "must be 0/1" in str(ei.value)


# --------------------------------------------------------------------------
# url_domain_stats
# --------------------------------------------------------------------------

def test_url_domain_stats_hand_report(spark):
    rows = [
        (1, "see http://A.Example.COM/x then https://b.org/y and "
            "http://a.example.com/z again"),
        (2, "only https://B.ORG/path here"),
        (3, "no urls at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from anendektos_spark.functions.textstats import url_domain_stats
    got = {r.domain: r for r in url_domain_stats(df).collect()}
    assert set(got) == {"a.example.com", "b.org"}
    a = got["a.example.com"]
    assert (a.tld, a.n_docs, a.n_hits) == ("com", 1, 2)
    b = got["b.org"]
    assert (b.tld, b.n_docs, b.n_hits) == ("org", 2, 2)
