"""Conversation-level operators (functions/convops.py): hand-computed
expectations on a tiny explicit transcript, plus structural properties of
the deterministic generator relation the driver oracle uses."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from anendektos_spark.functions import convops


def _ts(s):
    return dt.datetime(2026, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def tiny(spark):
    # one 5-turn conversation + one 2-turn conversation
    rows = [
        ("a", 0, "user", "hello there", None, _ts(0)),
        ("a", 1, "assistant", "run scan now", "conn", _ts(10)),
        ("a", 2, "user", "ok", None, _ts(15)),
        ("a", 3, "assistant", "lookup done", "dns", _ts(45)),
        ("a", 4, "assistant", "fetch page", "conn", _ts(50)),
        ("b", 0, "user", "hi", None, _ts(0)),
        ("b", 1, "assistant", "resolved", "dns", _ts(7)),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_conv_reconstruct(tiny):
    got = {r.conv_id: r for r in convops.conv_reconstruct(tiny).collect()}
    assert got["a"].n_turns == 5
    assert got["a"].n_tokens == 2 + 3 + 1 + 2 + 2
    assert got["a"].transcript == "hello there run scan now ok lookup done fetch page"
    assert got["b"].transcript == "hi resolved"
    assert len(got["a"].transcript_md5) == 32


def test_conv_reconstruct_order_independent_of_input_order(tiny):
    shuffled = tiny.orderBy("text")  # destroy turn order on purpose
    a = {r.conv_id: r.transcript for r in convops.conv_reconstruct(tiny).collect()}
    b = {r.conv_id: r.transcript for r in convops.conv_reconstruct(shuffled).collect()}
    assert a == b


def test_tool_transitions(tiny):
    got = {
        (r.prev_tool, r.tool): r.n_transitions
        for r in convops.tool_transitions(tiny).collect()
    }
    # conv a: conn -> dns -> conn; conv b: dns
    assert got == {
        ("<start>", "conn"): 1,
        ("conn", "dns"): 1,
        ("dns", "conn"): 1,
        ("<start>", "dns"): 1,
    }


def test_turn_latency(tiny):
    got = {r.tool: r for r in convops.turn_latency(tiny).collect()}
    # conn waits: a1 (10-0)=10, a4 (50-45)=5; dns waits: a3 (45-15)=30, b1 7
    assert got["conn"].n_waits == 2
    assert got["conn"].total_wait_s == 15
    assert (got["conn"].min_wait_s, got["conn"].max_wait_s) == (5, 10)
    assert got["conn"].avg_total_wait_s == 7.5
    assert got["dns"].total_wait_s == 37
    assert got["dns"].avg_total_wait_s == 18.5


def test_role_balance(tiny):
    got = {r.conv_id: r for r in convops.role_balance(tiny).collect()}
    a = got["a"]
    assert (a.n_user_turns, a.n_assistant_turns) == (2, 3)
    assert (a.user_tokens, a.assistant_tokens) == (3, 7)
    assert a.assistant_token_share == 0.7
    b = got["b"]
    # 1/2 tokens assistant -> floor(5000)/10000
    assert b.assistant_token_share == 0.5


def test_synth_conv_structure(spark):
    df = convops.synth_conv(spark, 64).orderBy("conv_id", "turn_idx")
    rows = df.collect()
    assert len(rows) == 64
    convs = {r.conv_id for r in rows}
    assert convs == {"conv0", "conv1", "conv2", "conv3"}
    for c in convs:
        turns = [r for r in rows if r.conv_id == c]
        # strictly increasing ts within the conversation (stable order)
        ts = [r.ts for r in turns]
        assert ts == sorted(ts) and len(set(ts)) == len(ts)
        for r in turns:
            if r.role == "user":
                assert r.tool is None and r.turn_idx % 2 == 0
            else:
                assert r.tool in convops.TOOLS
            assert 3 <= len(r.text.split()) <= 8


def test_synth_conv_deterministic(spark):
    a = convops.synth_conv(spark, 100, partitions=2).collect()
    b = convops.synth_conv(spark, 100, partitions=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sft_pairs_tiny(spark, tiny):
    out = {
        (r.conv_id, r.turn_idx): r
        for r in convops.sft_pairs(tiny, budget_chars=60).collect()
    }
    # one pair per assistant turn
    assert set(out) == {("a", 1), ("a", 3), ("a", 4), ("b", 1)}
    assert out[("a", 1)].prompt == "user: hello there"
    assert out[("a", 1)].response == "run scan now"
    assert out[("a", 3)].prompt == (
        "user: hello there\nassistant: run scan now\nuser: ok"
    )
    # consecutive assistant turns: the earlier assistant turn is context
    assert out[("a", 4)].prompt.endswith("\nassistant: lookup done")
    assert out[("b", 1)].prompt == "user: hi"
    for r in out.values():
        assert r.pair_chars == len(r.prompt) + len(r.response)
        assert r.fits_budget == (r.pair_chars <= 60)
    assert not out[("a", 4)].fits_budget  # 4-turn context blows 60 chars


def test_sft_pairs_order_independent(spark, tiny):
    """Prompt rendering is deterministic under input shuffling and
    repartitioning (the array_sort stable-order trick)."""
    shuffled = tiny.orderBy(F.md5(F.concat_ws(":", "conv_id", "turn_idx"))).repartition(7)
    a = sorted(map(tuple, convops.sft_pairs(tiny).collect()))
    b = sorted(map(tuple, convops.sft_pairs(shuffled).collect()))
    assert a == b


# --- conversation-grain duplication / curation ------------------------------


def test_synth_conv_dup_structure(spark):
    df = convops.synth_conv_dup(spark, 320, templates=4).cache()
    # 20 conversations over 4 templates: copies of a template share all
    # turn text except the mutated turn of every third conversation
    t0 = {
        r.turn_idx: r.text
        for r in df.filter(F.col("conv_id") == "conv1").collect()  # conv1 % 3 != 0
    }
    t1 = {
        r.turn_idx: r.text
        for r in df.filter(F.col("conv_id") == "conv5").collect()  # 5 % 4 == 1 % 4
    }
    assert t0 == t1  # both unmutated copies of template 1
    mut = {
        r.turn_idx: r.text
        for r in df.filter(F.col("conv_id") == "conv9").collect()  # 9 % 3 == 0
    }
    diff = [i for i in t0 if mut[i] != t0[i]]
    assert diff == [9 % convops.TURNS_PER_CONV]  # exactly one mutated turn
    assert mut[9].split(" ")[0].startswith("m")
    df.unpersist()


def test_boilerplate_turns_tiny(spark):
    rows = []
    for c in range(4):
        rows.append((f"c{c}", 0, "user", "Hello   There", None, _ts(0)))  # 4 convs
        rows.append((f"c{c}", 1, "assistant", f"unique {c}", "conn", _ts(5)))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {r.conv_id: r for r in convops.boilerplate_turns(df, min_convs=3).collect()}
    for c in range(4):
        r = got[f"c{c}"]
        assert (r.n_turns, r.n_boiler) == (2, 1)  # greeting is boilerplate
        assert r.boiler_frac == 0.5


def test_boilerplate_normalization(spark):
    # whitespace/case variants of the same turn share a fingerprint
    rows = [
        ("a", 0, "user", "Hello   World", None, _ts(0)),
        ("b", 0, "user", "hello world", None, _ts(0)),
        ("c", 0, "user", " HELLO  WORLD ", None, _ts(0)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = convops.boilerplate_turns(df, min_convs=3).collect()
    assert all(r.n_boiler == 1 for r in out)


def test_pref_pairs_tiny(spark):
    # same prompt in three conversations; responses differ in length
    rows = [
        ("a", 0, "user", "what is spark", None, _ts(0)),
        ("a", 1, "assistant", "a distributed sql engine", "conn", _ts(5)),
        ("b", 0, "user", "what is spark", None, _ts(0)),
        ("b", 1, "assistant", "an engine", "conn", _ts(5)),
        ("c", 0, "user", "what is spark", None, _ts(0)),
        ("c", 1, "assistant", "a distributed sql engine", "conn", _ts(5)),
        # a different prompt with only one response: no pair
        ("d", 0, "user", "lone prompt", None, _ts(0)),
        ("d", 1, "assistant", "lone answer", "dns", _ts(5)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = convops.pref_pairs(df).collect()
    assert len(out) == 1
    p = out[0]
    # chosen = longest response (4 tokens), deterministic tie-break on conv a < c
    assert p.chosen_conv == "a" and p.rejected_conv == "b"
    assert p.chosen_score_fp == 4 * 10000 + 4
    assert p.rejected_score_fp == 2 * 10000 + 2
    assert p.score_gap_fp == p.chosen_score_fp - p.rejected_score_fp


def test_pref_pairs_order_independent(spark):
    df = convops.synth_conv_dup(spark, 640, templates=4)
    a = sorted(map(tuple, convops.pref_pairs(df).collect()))
    b = sorted(map(tuple, convops.pref_pairs(df.orderBy(F.desc("text"))).collect()))
    assert a == b


def test_conv_dedup_pairs_detects_copies(spark):
    from anendektos_spark.functions import dedup

    df = convops.synth_conv_dup(spark, 640, templates=4)
    conv = convops.conv_reconstruct(df)
    pairs = dedup.lsh_jaccard(
        conv, id_col="conv_id", text_col="transcript"
    ).collect()
    # exact template copies appear with jaccard 1.0
    exact = [p for p in pairs if p.jaccard == 1.0]
    assert exact, "expected exact-duplicate conversation pairs"
    # mutated copies are near-dups strictly below 1.0 but high
    near = [p for p in pairs if p.jaccard < 1.0]
    assert near and all(p.jaccard > 0.5 for p in near)
    # no cross-template pairs: ids in a pair must share the template
    for p in pairs:
        assert int(p.id_a[4:]) % 4 == int(p.id_b[4:]) % 4


def test_pref_pairs_never_degenerate(spark):
    # regression: two case-variants of ONE response (same normalized
    # fingerprint, different distinct-token scores) plus one genuinely
    # different response — the pair must be the two DISTINCT responses,
    # never the two variants of the same one
    rows = [
        ("a", 0, "user", "what is spark", None, _ts(0)),
        ("a", 1, "assistant", "A a B b", "conn", _ts(5)),  # fp X, score 40004
        ("b", 0, "user", "what is spark", None, _ts(0)),
        ("b", 1, "assistant", "a a b b", "conn", _ts(5)),  # fp X, score 40002
        ("c", 0, "user", "what is spark", None, _ts(0)),
        ("c", 1, "assistant", "c c d e", "conn", _ts(5)),  # fp Y, score 40003
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = convops.pref_pairs(df).collect()
    assert len(out) == 1
    p = out[0]
    assert p.chosen_fp != p.rejected_fp
    # chosen = fp X's best occurrence (conv a, 40004); rejected = fp Y
    assert (p.chosen_conv, p.chosen_score_fp) == ("a", 40004)
    assert (p.rejected_conv, p.rejected_score_fp) == ("c", 40003)


def test_prefix_groups_branch_points(spark):
    # three conversations: c1/c2 share the first 2 turns then diverge;
    # c3 is unrelated. depth 1 and 2 must group {c1,c2}; depth 4 must not.
    rows = []
    for conv, texts in (
        ("c1", ["hello", "run tool", "ok branch a", "done a"]),
        ("c2", ["hello", "run tool", "ok branch b", "done b"]),
        ("c3", ["different", "start", "entirely", "here"]),
    ):
        rows += [(conv, i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {(r.depth, r.n_convs, r.example_conv)
           for r in convops.prefix_groups(df).collect()}
    assert got == {(1, 2, "c1"), (2, 2, "c1")}
    # input-order independence (array_sort ordering, not arrival order)
    got2 = {(r.depth, r.n_convs, r.example_conv)
            for r in convops.prefix_groups(df.orderBy(F.desc("turn_idx"))).collect()}
    assert got2 == got


def test_prefix_groups_no_turn_boundary_aliasing(spark):
    # 'a b'+'c' must NOT collide with 'a'+'b c' at depth 2
    rows = [("x", 0, "a b"), ("x", 1, "c"), ("y", 0, "a"), ("y", 1, "b c")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    assert convops.prefix_groups(df, depths=(2,)).count() == 0


def test_degenerate_runs_golden(spark):
    import hashlib
    rows = [("c0", i, "user", t, None, dt.datetime(2026, 1, 1, 0, 0, i))
            for i, t in enumerate(["a", "a", "a", "b", "a", "a"])]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    three = convops.degenerate_runs(df, min_run=3).collect()
    assert [(r.start_turn, r.end_turn, r.run_len) for r in three] == [(0, 2, 3)]
    assert three[0].text_fp == hashlib.md5(b"a").hexdigest()
    two = sorted((r.start_turn, r.end_turn, r.run_len)
                 for r in convops.degenerate_runs(df, min_run=2).collect())
    assert two == [(0, 2, 3), (4, 5, 2)]
    with pytest.raises(ValueError):
        convops.degenerate_runs(df, min_run=1)


def test_degenerate_runs_synth_injection(spark):
    out = convops.degenerate_runs(convops.synth_conv_degen(spark, 1600))
    rows = out.collect()
    assert rows, "injection must produce runs"
    # every injected run spans exactly turns 4..9 of a degenerate conv
    assert all((r.start_turn, r.end_turn, r.run_len) == (4, 9, 6) for r in rows)
    # only conversations whose md5 starts with hex 0-3
    import hashlib
    assert all(hashlib.md5(r.conv_id.encode()).hexdigest()[0] in "0123"
               for r in rows)


def test_pack_with_masks_golden(spark):
    rows = [
        ("c0", 0, "user", "one two three", None, dt.datetime(2026, 1, 1)),
        ("c0", 1, "assistant", "four five", None, dt.datetime(2026, 1, 1)),
        ("c1", 0, "user", "a b c d", None, dt.datetime(2026, 1, 1)),
        ("c1", 1, "assistant", "e", None, dt.datetime(2026, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = {(r.conv_id, r.turn_idx): r for r in
           convops.pack_with_masks(df, budget_tokens=4, n_buckets=1).collect()}
    # conv lens: c0=5, c1=5; laid out in conv_id order in one bucket:
    # c0 starts at 0 → bin 0 offset 0; c1 starts at 5 → bin 1 offset 1
    r = out[("c0", 0)]
    assert (r.bucket, r.bin_id, r.seq_start, r.seq_end, r.loss_mask) == (0, 0, 0, 3, 0)
    r = out[("c0", 1)]
    assert (r.bin_id, r.seq_start, r.seq_end, r.loss_mask) == (0, 3, 5, 1)
    r = out[("c1", 0)]
    assert (r.bin_id, r.seq_start, r.seq_end, r.loss_mask) == (1, 1, 5, 0)
    r = out[("c1", 1)]
    assert (r.bin_id, r.seq_start, r.seq_end, r.loss_mask) == (1, 5, 6, 1)
    with pytest.raises(ValueError):
        convops.pack_with_masks(df, budget_tokens=0)
    with pytest.raises(ValueError):
        convops.pack_with_masks(df, n_buckets=0)


def test_pack_with_masks_spans_partition_bins(spark):
    # spans within a (bucket, bin) never overlap and masks follow roles
    df = convops.synth_conv(spark, 3200)
    out = convops.pack_with_masks(df, budget_tokens=128, n_buckets=4)
    rows = out.collect()
    assert all((r.loss_mask == 1) == (r.role == "assistant") for r in rows)
    by_bin = {}
    for r in rows:
        by_bin.setdefault((r.bucket, r.bin_id), []).append((r.seq_start, r.seq_end))
    # the layout is contiguous per bucket: spans within a (bucket, bin)
    # never overlap
    for spans in by_bin.values():
        spans.sort()
        for (_, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1, spans


def test_conv_integrity_golden(spark):
    rows = [
        # c0 healthy: 0,1,2 increasing ts
        ("c0", 0, 100), ("c0", 1, 130), ("c0", 2, 160),
        # c1 gap: 0,2 (missing 1)
        ("c1", 0, 100), ("c1", 2, 160),
        # c2 dup idx 1 + ts regression between turn 1 and 2
        ("c2", 0, 100), ("c2", 1, 130), ("c2", 1, 131), ("c2", 2, 90),
    ]
    df = spark.createDataFrame(
        [(c, t, None, None, None, dt.datetime.fromtimestamp(e, dt.timezone.utc))
         for c, t, e in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {r.conv_id: r for r in convops.conv_integrity(df).collect()}
    assert "c0" not in got  # healthy conversations are not emitted
    assert (got["c1"].n_missing, got["c1"].n_dup_idx,
            got["c1"].n_ts_regressions) == (1, 0, 0)
    assert (got["c2"].n_missing, got["c2"].n_dup_idx,
            got["c2"].n_ts_regressions) == (0, 1, 1)
    assert got["c2"].n_turns == 4 and got["c2"].max_turn == 2


def test_conv_integrity_corrupt_injection_matches_sql(spark):
    import duckdb
    df = convops.conv_integrity(convops.synth_conv_corrupt(spark, 8000))
    rows = sorted(tuple(r) for r in df.collect())
    orows = sorted(tuple(t) for t in duckdb.sql(
        convops.conv_integrity_sql(convops.synth_conv_corrupt_sql(8000))
    ).fetchall())
    assert rows and rows == orows
    # each injected class present
    by = {r[0]: r for r in rows}
    import hashlib
    hx = lambda c: hashlib.md5(c.encode()).hexdigest()[0]  # noqa: E731
    for conv_id, _, _, miss, dup, reg in rows:
        h = hx(conv_id)
        if h in "0123":
            assert (miss, dup, reg) == (1, 0, 0), (conv_id, miss, dup, reg)
        elif h in "4567":
            assert (miss, dup, reg) == (0, 1, 0)
        else:
            assert h in "89" and (miss, dup, reg) == (0, 0, 1)


def test_pack_with_masks_tiles_exactly(spark):
    """Mass conservation: within every (bucket), spans tile the layout
    with no holes — total span length == total whitespace tokens, and
    each conversation's turns are contiguous from its start offset."""
    df = convops.synth_conv(spark, 1600)
    rows = convops.pack_with_masks(df, budget_tokens=64, n_buckets=2).collect()
    total_span = sum(r.seq_end - r.seq_start for r in rows)
    total_tokens = sum(len(t.text.split()) for t in df.collect())
    assert total_span == total_tokens
    # per conversation: spans are contiguous in turn order
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append((r.turn_idx, r.seq_start, r.seq_end))
    for spans in by_conv.values():
        spans.sort()
        for (_, _, e1), (_, s2, _) in zip(spans, spans[1:]):
            assert s2 == e1


def test_truncate_context_suffix_budget(tiny):
    # conv a texts: "hello there"(11) "run scan now"(12) "ok"(2)
    # "lookup done"(11) "fetch page"(10); suffixes from the end:
    # t4=10, t3=21, t2=23, t1=35, t0=46
    out = {(r.conv_id, r.turn_idx): r
           for r in convops.truncate_context(tiny, budget_chars=22).collect()}
    assert len(out) == 7
    a = {t: out[("a", t)] for t in range(5)}
    assert [a[t].suffix_chars for t in range(5)] == [46, 35, 23, 21, 10]
    assert [a[t].kept for t in range(5)] == [False, False, False, True, True]
    assert a[4].turn_chars == 10
    # conv b fits entirely
    assert out[("b", 0)].kept and out[("b", 1)].kept


def test_truncate_context_final_turn_force_kept(spark):
    df = spark.createDataFrame(
        [("c", 0, "user", "x" * 50, None, _ts(0)),
         ("c", 1, "assistant", "y" * 500, "conn", _ts(5))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {r.turn_idx: r for r in
           convops.truncate_context(df, budget_chars=100).collect()}
    # the final turn alone exceeds the budget but must stay
    assert out[1].kept and out[1].suffix_chars == 500
    assert not out[0].kept


def test_collapse_degenerate_runs(spark):
    rows = [
        ("c", 0, "user", "hi", None, _ts(0)),
        ("c", 1, "assistant", "loop", "conn", _ts(5)),
        ("c", 2, "assistant", "loop", "conn", _ts(10)),
        ("c", 3, "assistant", "loop", "conn", _ts(15)),
        ("c", 4, "user", "ok", None, _ts(20)),
        ("c", 5, "assistant", "loop", "conn", _ts(25)),  # new run, len 1
        ("d", 0, "user", "xx", None, _ts(0)),
        ("d", 1, "user", "xx", None, _ts(5)),  # len 2 < min_run: kept
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    out = {(r.conv_id, r.turn_idx): r
           for r in convops.collapse_degenerate_runs(df, min_run=3).collect()}
    # c: the 1-2-3 run collapses to turn 1 (run_len 3); 0, 4, 5 survive
    assert set(out) == {("c", 0), ("c", 1), ("c", 4), ("c", 5),
                        ("d", 0), ("d", 1)}
    assert out[("c", 1)].run_len == 3
    assert out[("c", 5)].run_len == 1
    assert out[("d", 0)].run_len == 1 and out[("d", 1)].run_len == 1
    assert out[("c", 0)].text == "hi"  # original columns pass through
    with pytest.raises(ValueError, match="min_run"):
        convops.collapse_degenerate_runs(df, min_run=1)


def test_split_conversations_on_idle_gaps(spark):
    rows = [
        ("c", 0, "user", "a", None, _ts(0)),
        ("c", 1, "assistant", "b", "conn", _ts(10)),
        ("c", 2, "user", "d", None, _ts(50)),      # 40s gap > 30 -> split
        ("c", 3, "assistant", "e", "dns", _ts(55)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    out = {r.turn_idx: r for r in
           convops.split_conversations(df, gap_s=30).collect()}
    assert [out[t].episode for t in range(4)] == [0, 0, 1, 1]
    assert out[0].sub_conv_id == "c#0" and out[2].sub_conv_id == "c#1"
    assert out[0].text == "a"  # input columns pass through
    with pytest.raises(ValueError, match="gap_s"):
        convops.split_conversations(df, gap_s=0)


def test_episode_stats_rollup(spark):
    rows = [
        ("c", 0, "user", "a", None, _ts(0)),
        ("c", 1, "assistant", "b", "conn", _ts(10)),
        ("c", 2, "user", "d", None, _ts(50)),
        ("c", 3, "assistant", "e", "dns", _ts(55)),
        ("c", 4, "assistant", "f", "conn", _ts(58)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    out = {r.sub_conv_id: r for r in
           convops.episode_stats(df, gap_s=30).collect()}
    e0, e1 = out["c#0"], out["c#1"]
    assert (e0.n_turns, e0.duration_s, e0.n_tools, e0.n_assistant) == (2, 10, 1, 1)
    assert (e1.n_turns, e1.duration_s, e1.n_tools, e1.n_assistant) == (3, 8, 2, 2)


def test_repair_turn_order(spark):
    rows = [
        ("c", 0, "user", "a", None, _ts(0)),
        ("c", 3, "assistant", "b", "conn", _ts(10)),   # gap: 1, 2 missing
        ("c", 3, "user", "b2", None, _ts(12)),         # duplicate idx 3
        ("c", 5, "assistant", "c", "dns", _ts(5)),     # ts regression
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    out = convops.repair_turn_order(df).orderBy("turn_idx").collect()
    # ts order: (0s, a), (5s, c), (10s, b), (12s, b2)
    assert [(r.turn_idx, r.orig_turn_idx, r.text) for r in out] == [
        (0, 0, "a"), (1, 5, "c"), (2, 3, "b"), (3, 3, "b2")]
    # idempotent: repairing repaired output (orig_turn_idx REPLACED,
    # never duplicated) is the identity
    again = convops.repair_turn_order(
        convops.repair_turn_order(df)
    ).orderBy("turn_idx").collect()
    assert [(r.turn_idx, r.orig_turn_idx, r.text) for r in again] == \
        [(r.turn_idx, r.turn_idx, r.text) for r in out]
