"""Semantic tests for sampling.py, joins.py, and the new textstats ops —
hand-built inputs with independently computed expected outputs (the
DuckDB cross-check runs separately via the driver contract)."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest

from pyspark.sql import Row, functions as F

from anendektos_spark.functions import joins, logops, sampling, textstats


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --------------------------------------------------------------------------
# sampling
# --------------------------------------------------------------------------

def test_hash_sample_matches_python_reference(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    got = {r.k for r in sampling.hash_sample(df, 0.3, "k", salt="s").collect()}
    thresh = sampling.sample_threshold_hex(0.3)
    want = {i for i in range(1000) if _md5(f"s:{i}")[:8] < thresh}
    assert got == want
    assert 0.2 < len(got) / 1000 < 0.4  # rate roughly honored


def test_hash_sample_edges_and_salt_independence(spark):
    df = spark.range(200).withColumnRenamed("id", "k")
    assert sampling.hash_sample(df, 0.0, "k").count() == 0
    assert sampling.hash_sample(df, 1.0, "k").count() == 200
    a = {r.k for r in sampling.hash_sample(df, 0.5, "k", salt="a").collect()}
    b = {r.k for r in sampling.hash_sample(df, 0.5, "k", salt="b").collect()}
    assert a != b  # different salt -> different (independent) sample


def test_stratified_sample_exact_group_sizes(spark):
    rows = [Row(g="x", k=i) for i in range(50)] + [Row(g="y", k=i) for i in range(3)]
    df = spark.createDataFrame(rows)
    out = sampling.stratified_sample(df, "g", 10, "k").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    assert len(by_g["x"]) == 10            # capped at n
    assert len(by_g["y"]) == 3             # whole small group survives
    assert sorted(r.sample_rank for r in by_g["x"]) == list(range(1, 11))
    # deterministic: same selection on re-run
    again = {(r.g, r.k) for r in sampling.stratified_sample(df, "g", 10, "k").collect()}
    assert {(r.g, r.k) for r in out} == again


def test_quality_quota_rounds_and_tie_breaks_on_id(spark):
    # scores that differ only past 4 decimals tie; lower id wins the rank
    rows = [
        Row(g="s", id=3, score=0.50004),
        Row(g="s", id=1, score=0.50001),
        Row(g="s", id=2, score=0.9),
    ]
    out = sampling.quality_quota(spark.createDataFrame(rows), "g", "score", 2, "id")
    got = [(r.id, r.quota_rank) for r in sorted(out.collect(), key=lambda r: r.quota_rank)]
    assert got == [(2, 1), (1, 2)]  # 0.50004 and 0.50001 both round to 0.5; id 1 beats 3


# --------------------------------------------------------------------------
# as-of join
# --------------------------------------------------------------------------

def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic_tie_and_nomatch(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lid=1, ts=_ts("2024-01-10 00:00:00")),
            Row(k="a", lid=2, ts=_ts("2024-01-05 00:00:00")),  # equals right ts
            Row(k="a", lid=3, ts=_ts("2024-01-01 00:00:00")),  # before all rights
            Row(k="b", lid=4, ts=_ts("2024-01-10 00:00:00")),  # key without rights
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rid=10, rts=_ts("2024-01-05 00:00:00"), v=1.0),
            Row(k="a", rid=11, rts=_ts("2024-01-05 00:00:00"), v=2.0),  # same ts: max rid wins
            Row(k="a", rid=12, rts=_ts("2024-01-08 00:00:00"), v=3.0),
        ]
    )
    out = {
        r.lid: (r.rid, r.v)
        for r in joins.asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            right_cols=["rid", "v"], tie_col="rid",
        ).collect()
    }
    assert out[1] == (12, 3.0)          # latest right before 01-10
    assert out[2] == (11, 2.0)          # right at EXACT left ts eligible; tie -> rid 11
    assert out[3] == (None, None)       # nothing at or before
    assert out[4] == (None, None)       # key with no right rows
    # struct carriage is atomic: rid/v always from the same right row
    assert set(out) == {1, 2, 3, 4}


def test_asof_join_keeps_all_left_columns_and_rows(spark):
    left = spark.createDataFrame(
        [Row(k="a", lid=i, ts=_ts(f"2024-01-{d:02d} 00:00:00"), tag=f"t{i}")
         for i, d in [(1, 2), (2, 4), (3, 6)]]
    )
    right = spark.createDataFrame([Row(k="a", rid=7, rts=_ts("2024-01-03 00:00:00"))])
    out = joins.asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        right_cols=["rid"], tie_col="rid",
    )
    assert out.count() == 3
    assert set(out.columns) == {"k", "lid", "ts", "tag", "rid"}
    got = {r.lid: r.rid for r in out.collect()}
    assert got == {1: None, 2: 7, 3: 7}


# --------------------------------------------------------------------------
# banded range join
# --------------------------------------------------------------------------

def test_range_join_count_inclusive_band_and_bucket_edges(spark):
    base = _ts("2024-01-01 00:00:00")
    band = 100  # seconds
    # ids 1,2 exactly band apart (inclusive -> neighbors); id 3 band+1 away
    # from id 2; ids straddle bucket boundaries (bucket width == band).
    rows = [
        Row(k="u", i=1, ts=base),
        Row(k="u", i=2, ts=base + dt.timedelta(seconds=100)),
        Row(k="u", i=3, ts=base + dt.timedelta(seconds=201)),
        Row(k="u", i=4, ts=base + dt.timedelta(seconds=250)),
        Row(k="v", i=5, ts=base),  # other key: isolated
    ]
    df = spark.createDataFrame(rows)
    out = {r.i: r.n_nearby for r in joins.range_join_count(
        df, key="k", id_col="i", ts_col="ts", band_seconds=band).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 0}
    # |t3-t2|=101 > band excluded; |t4-t3|=49 included; keys never mix


def test_range_join_count_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    base = _ts("2024-01-01 00:00:00")
    rows = [
        Row(k=f"k{rng.randrange(3)}", i=i,
            ts=base + dt.timedelta(seconds=rng.randrange(0, 5000)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows)
    out = {r.i: r.n_nearby for r in joins.range_join_count(
        df, key="k", id_col="i", ts_col="ts", band_seconds=300).collect()}
    want = {
        a.i: sum(
            1 for b in rows
            if b.k == a.k and b.i != a.i and abs((b.ts - a.ts).total_seconds()) <= 300
        )
        for a in rows
    }
    assert out == want


# --------------------------------------------------------------------------
# repetition + contamination
# --------------------------------------------------------------------------

def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a"),   # bigrams: ab,ba,ab,ba -> top 2/4
            Row(doc_id=2, text="x y z w"),     # all distinct
            Row(doc_id=3, text="q q q"),       # 'q q' twice / 2 bigrams
        ]
    )
    out = {r.doc_id: r for r in textstats.repetition_stats(df).collect()}
    assert out[1].n_tokens == 5 and out[1].dup_word_frac == 0.6
    assert out[1].top_bigram_n == 2 and out[1].top_bigram_frac == 0.5
    assert out[2].dup_word_frac == 0.0 and out[2].top_bigram_frac == round(1 / 3, 4)
    assert out[3].top_bigram_n == 2 and out[3].top_bigram_frac == 1.0


def test_ngram_contamination_flags_overlap(spark):
    bench = spark.createDataFrame([Row(doc_id=100, text="the quick brown fox jumps high")])
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps high today"),  # heavy overlap
            Row(doc_id=2, text="completely different words entirely here now"),
            Row(doc_id=3, text="too short"),  # < 3 tokens -> zero grams
        ]
    )
    out = {r.doc_id: r for r in
           textstats.ngram_contamination(train, bench, n=3, threshold=3).collect()}
    assert out[1].n_overlap == 4 and out[1].contaminated          # 4 shared trigrams
    assert out[2].n_overlap == 0 and not out[2].contaminated
    assert out[3].n_grams == 0 and out[3].n_overlap == 0 and not out[3].contaminated


# --------------------------------------------------------------------------
# hierarchical time rollup
# --------------------------------------------------------------------------

def test_time_rollup_cascade_equals_direct(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = logops.time_rollup(ev)
    levels = {r.level for r in out.select("level").distinct().collect()}
    assert levels == {"minute", "hour", "day", "total"}
    # day level must equal a DIRECT day aggregation over the raw events
    # (the decimal cascade must not drift)
    direct = (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
    got = {(r.event_type, r.bucket): (r.n_events, r.sum_value)
           for r in out.filter(F.col("level") == "day").collect()}
    want = {(r.event_type, r.bucket): (r.n_events, r.sum_value) for r in direct.collect()}
    assert got == want
    # total row count per type == table count per type
    tot = {r.event_type: r.n_events for r in out.filter(F.col("level") == "total").collect()}
    base = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    assert tot == base


def test_time_rollup_incremental_merge_equals_full_recompute(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    early = ev.filter(F.dayofmonth("ts") <= 20)
    late = ev.filter(F.dayofmonth("ts") > 20)
    partials = logops.time_rollup_partials(early)
    merged = logops.time_rollup_merge(partials, late)
    incr = logops.time_rollup(None, minute_partials=merged)
    full = logops.time_rollup(ev)
    key = lambda r: (r.level, r.event_type, r.bucket)  # noqa: E731
    got = {key(r): (r.n_events, r.sum_value) for r in incr.collect()}
    want = {key(r): (r.n_events, r.sum_value) for r in full.collect()}
    assert got == want  # merge(rollup(A), B) == rollup(A ∪ B), bit-exact


def test_asof_join_drops_null_right_timestamps(spark):
    import pytest as _pt
    left = spark.createDataFrame([Row(k="a", lid=1, ts=_ts("2024-01-02 00:00:00"))])
    right = spark.createDataFrame(
        [Row(k="a", rid=10, rts=None, v=9.0),
         Row(k="a", rid=11, rts=_ts("2024-01-05 00:00:00"), v=1.0)],
        schema="k string, rid bigint, rts timestamp, v double",
    )
    out = joins.asof_join(left, right, key="k", left_ts="ts", right_ts="rts",
                          right_cols=["rid", "v"], tie_col="rid").collect()
    # the null-ts right row must NOT become a spurious match; no right row
    # is at-or-before 01-02, so the left row gets nulls
    assert [(r.lid, r.rid, r.v) for r in out] == [(1, None, None)]
    # reserved working names are rejected loudly
    with _pt.raises(ValueError, match="_t"):
        joins.asof_join(left.withColumnRenamed("lid", "_t"), right, key="k",
                        left_ts="ts", right_ts="rts", right_cols=["rid"], tie_col="rid")


def test_input_validation_guards(spark):
    import pytest as _pt
    df = spark.createDataFrame([Row(k="a", i=1, ts=_ts("2024-01-01 00:00:00"))])
    with _pt.raises(ValueError, match="band_seconds"):
        joins.range_join_count(df, key="k", id_col="i", ts_col="ts", band_seconds=0)
    with _pt.raises(ValueError, match="rate"):
        sampling.hash_sample(df, 1.5, "i")
    with _pt.raises(ValueError, match="events or minute_partials"):
        logops.time_rollup()


def test_asof_join_bucketed_equals_plain_asof(spark):
    import random

    rng = random.Random(11)
    base = _ts("2024-01-01 00:00:00")
    # hot key k0 (many rows), sparse keys; right activity clustered so many
    # left buckets have no in-bucket right rows (exercises the carry-in)
    left = spark.createDataFrame(
        [Row(k=f"k{0 if rng.random() < 0.7 else rng.randrange(4)}", lid=i,
             ts=base + dt.timedelta(seconds=rng.randrange(0, 40000)))
         for i in range(300)]
    )
    right = spark.createDataFrame(
        [Row(k=f"k{rng.randrange(4)}", rid=i,
             rts=base + dt.timedelta(seconds=rng.choice([0, 1, 2]) * 12000
                                     + rng.randrange(0, 300)),
             v=float(i))
         for i in range(60)]
    )
    kw = dict(key="k", left_ts="ts", right_ts="rts",
              right_cols=["rid", "v"], tie_col="rid")
    plain = {r.lid: (r.rid, r.v)
             for r in joins.asof_join(left, right, **kw).collect()}
    for bucket_seconds in (1000, 7919, 86400):  # incl. bucket >> data span
        bucketed = {r.lid: (r.rid, r.v)
                    for r in joins.asof_join_bucketed(
                        left, right, bucket_seconds=bucket_seconds, **kw).collect()}
        assert bucketed == plain, f"bucket_seconds={bucket_seconds}"


def test_asof_join_bucketed_boundary_cases(spark):
    # right row exactly at a bucket boundary; left row in the NEXT bucket
    # first instant; left before any right
    left = spark.createDataFrame(
        [Row(k="a", lid=1, ts=_ts("2024-01-01 01:00:00")),   # == boundary
         Row(k="a", lid=2, ts=_ts("2024-01-01 00:59:59")),
         Row(k="a", lid=3, ts=_ts("2023-12-31 00:00:00"))]
    )
    right = spark.createDataFrame(
        [Row(k="a", rid=10, rts=_ts("2024-01-01 01:00:00"), v=1.0),
         Row(k="a", rid=11, rts=_ts("2024-01-01 00:30:00"), v=2.0)]
    )
    out = {r.lid: r.rid for r in joins.asof_join_bucketed(
        left, right, key="k", left_ts="ts", right_ts="rts",
        right_cols=["rid", "v"], tie_col="rid", bucket_seconds=3600).collect()}
    assert out == {1: 10, 2: 11, 3: None}


def test_mixture_sample_respects_group_rates(spark):
    from anendektos_spark.functions import dedup
    import pytest as _pt

    rows = [Row(g=f"g{i % 4}", k=i) for i in range(4000)]
    df = spark.createDataFrame(rows)
    rates = {"g0": 1.0, "g1": 0.5, "g2": 0.0}
    picked = sampling.mixture_sample(df, rates, "g", "k", salt="t", default_rate=0.1).collect()
    got: dict[str, int] = {}
    for r in picked:
        got[r.g] = got.get(r.g, 0) + 1
    assert got.get("g0") == 1000              # rate 1.0: everything
    assert "g2" not in got                    # rate 0.0: nothing
    assert 400 < got.get("g1", 0) < 600       # ~50%
    assert 50 < got.get("g3", 0) < 160        # default ~10%
    # per-group selection must equal single-group hash_sample (same salt)
    only_g1 = {r.k for r in picked if r.g == "g1"}
    ref = {r.k for r in sampling.hash_sample(
        df.filter(F.col("g") == "g1"), 0.5, "k", salt="t").collect()}
    assert only_g1 == ref
    with _pt.raises(ValueError, match="g9"):
        sampling.mixture_sample(df, {"g9": 1.5}, "g", "k")


def test_canonical_corpus_keeps_one_per_cluster(spark):
    from anendektos_spark.functions import dedup

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),   # dup of 1
            (3, "alpha beta gamma delta epsilon eta"),    # near-dup of 1
            (4, "completely different content here now"),
        ]]
    )
    clusters = dedup.dup_clusters(
        docs.select("doc_id"), dedup.lsh_candidates(docs)
    )
    kept = {r.doc_id for r in dedup.canonical_corpus(docs, clusters).collect()}
    assert 1 in kept and 4 in kept            # cluster minima survive
    assert 2 not in kept                      # exact dup of 1 removed
    assert kept == {r.cluster_id for r in clusters.collect()}


def test_pack_sequences_layout_invariants(spark):
    import pytest as _pt

    rows = [Row(g="a", i=i, sz=s) for i, s in
            enumerate([100, 200, 300, 250, 50, 400, 120])] + [Row(g="b", i=0, sz=700)]
    df = spark.createDataFrame(rows)
    out = sorted(
        sampling.pack_sequences(df, 512, "g", "sz", "i").collect(),
        key=lambda r: (r.g, r.i),
    )
    a = [(r.i, r.bin_id, r.bin_offset) for r in out if r.g == "a"]
    # starts: 0,100,300,600,850,900,1300 -> bins 0,0,0,1,1,1,2; offsets start%512
    assert a == [(0, 0, 0), (1, 0, 100), (2, 0, 300), (3, 1, 88),
                 (4, 1, 338), (5, 1, 388), (6, 2, 276)]
    b = [(r.bin_id, r.bin_offset) for r in out if r.g == "b"]
    assert b == [(0, 0)]  # oversized row still lands deterministically
    with _pt.raises(ValueError, match="budget"):
        sampling.pack_sequences(df, 0, "g", "sz", "i")


def test_asof_join_matches_bruteforce_on_random_data(spark):
    import random

    rng = random.Random(23)
    base = _ts("2024-01-01 00:00:00")
    left = [Row(k=f"k{rng.randrange(3)}", lid=i,
                ts=base + dt.timedelta(seconds=rng.randrange(0, 10000)))
            for i in range(150)]
    right = [Row(k=f"k{rng.randrange(3)}", rid=i,
                 rts=base + dt.timedelta(seconds=rng.randrange(0, 10000)), v=float(i))
             for i in range(80)]
    out = {r.lid: (r.rid, r.v) for r in joins.asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        key="k", left_ts="ts", right_ts="rts",
        right_cols=["rid", "v"], tie_col="rid").collect()}
    want = {}
    for l in left:
        cands = [r for r in right if r.k == l.k and r.rts <= l.ts]
        best = max(cands, key=lambda r: (r.rts, r.rid)) if cands else None
        want[l.lid] = (best.rid, best.v) if best else (None, None)
    assert out == want


def test_asof_join_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [Row(k=None, lid=1, ts=_ts("2024-01-10 00:00:00")),
         Row(k="a", lid=2, ts=_ts("2024-01-10 00:00:00"))],
        schema="k string, lid bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [Row(k=None, rid=10, rts=_ts("2024-01-05 00:00:00")),
         Row(k="a", rid=11, rts=_ts("2024-01-05 00:00:00"))],
        schema="k string, rid bigint, rts timestamp",
    )
    kw = dict(key="k", left_ts="ts", right_ts="rts", right_cols=["rid"], tie_col="rid")
    for fn in (joins.asof_join,
               lambda l, r, **kws: joins.asof_join_bucketed(l, r, bucket_seconds=3600, **kws)):
        out = {r.lid: r.rid for r in fn(left, right, **kw).collect()}
        # equi-join semantics: null never equals null; null-keyed left
        # rows survive unmatched
        assert out == {1: None, 2: 11}


def test_canonical_corpus_accepts_pruned_cluster_relation(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(1, 6)])
    # only the non-singleton cluster {2,4} is present; 1,3,5 are implicit
    # singletons and must survive
    pruned = spark.createDataFrame(
        [Row(doc_id=2, cluster_id=2), Row(doc_id=4, cluster_id=2)]
    )
    from anendektos_spark.functions import dedup
    kept = {r.doc_id for r in dedup.canonical_corpus(docs, pruned).collect()}
    assert kept == {1, 2, 3, 5}


def test_sampling_output_column_guards(spark):
    import pytest as _pt
    df = spark.createDataFrame([Row(g="a", k=1, sample_rank=9)])
    with _pt.raises(ValueError, match="sample_rank"):
        sampling.stratified_sample(df, "g", 1, "k")
    df2 = spark.createDataFrame([Row(g="a", k=1, sz=5, bin_id=0)])
    with _pt.raises(ValueError, match="bin_id"):
        sampling.pack_sequences(df2, 10, "g", "sz", "k")
    with _pt.raises(ValueError, match="right_cols"):
        joins.asof_join(
            spark.createDataFrame([Row(k="a", ts=_ts("2024-01-01 00:00:00"))]),
            spark.createDataFrame([Row(k="a", rts=_ts("2024-01-01 00:00:00"), ts=1)]),
            key="k", left_ts="ts", right_ts="rts", right_cols=["ts"], tie_col="ts",
        )
    with _pt.raises(ValueError, match="<default_rate>"):
        sampling.mixture_sample(df, {}, "g", "k", default_rate=5.0)


def test_redact_pii_order_and_counts(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="mail a.b@x.com from 10.0.0.1 acct 12345678"),
         Row(doc_id=2, text="clean text only")]
    )
    out = {r.doc_id: r for r in textstats.redact_pii(df).collect()}
    r1 = out[1]
    # email digits are scrubbed before the number pass: one hit per class
    assert (r1.n_email, r1.n_ipv4, r1.n_number) == (1, 1, 1)
    import hashlib
    want = hashlib.md5(b"mail <EMAIL> from <IPV4> acct <NUMBER>").hexdigest()
    assert r1.scrubbed_md5 == want
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_number) == (0, 0, 0)


def test_profile_columns_values(spark):
    df = spark.createDataFrame(
        [Row(a="x", b=1), Row(a=None, b=3), Row(a="y", b=1)],
        schema="a string, b bigint",
    )
    out = {r.column: r for r in logops.profile_columns(df, ["a", "b"]).collect()}
    assert out["a"].n_rows == 3 and out["a"].n_nulls == 1
    assert out["a"].n_distinct == 2 and out["a"].min_str == "x" and out["a"].max_str == "y"
    assert out["b"].n_nulls == 0 and out["b"].n_distinct == 2
    assert (out["b"].min_str, out["b"].max_str) == ("1", "3")


def test_latest_by_key_and_sessionize_events(spark):
    base = _ts("2024-01-01 00:00:00")
    ev = spark.createDataFrame(
        [Row(user_id=1, event_id=i, ts=base + dt.timedelta(seconds=s), event_type="e")
         for i, s in [(1, 0), (2, 100), (3, 100), (4, 5000)]]  # 2,3 tie on ts
        + [Row(user_id=2, event_id=9, ts=base, event_type="e")]
    )
    latest = {r.user_id: r.event_id for r in logops.latest_by_key(
        ev, ["user_id"], "ts", "event_id").collect()}
    assert latest == {1: 4, 2: 9}  # newest ts; within ties, greatest id

    sess = {r.event_id: r.session_id for r in
            logops.sessionize_events(ev, gap_seconds=1800).collect()}
    # 5000s > 1800s gap: event 4 starts session 2; ties stay in session 1
    assert sess == {1: 1, 2: 1, 3: 1, 4: 2, 9: 1}
    # session counts agree with the aggregate sessionize
    agg = {r.user_id: r.n_sessions for r in logops.sessionize(ev, 1800).collect()}
    assert agg == {1: 2, 2: 1}


def test_split_dataset_disjoint_exhaustive_and_python_exact(spark):
    import hashlib

    from anendektos_spark.functions import sampling

    df = spark.range(400).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r.doc_id: r.split for r in sampling.split_dataset(df, w, "doc_id").collect()}
    assert len(out) == 400  # exhaustive, one label per row

    def py_split(k: int) -> str:
        h = hashlib.md5(f":{k}".encode()).hexdigest()[:8]
        if h < format(int(0.8 * 16**8), "08x"):
            return "train"
        if h < format(int(0.9 * 16**8), "08x"):
            return "val"
        return "test"

    assert out == {i: py_split(i) for i in range(400)}
    # all three splits materialize at this n
    assert {"train", "val", "test"} == set(out.values())


def test_split_dataset_boundary_growth_is_monotone(spark):
    from anendektos_spark.functions import sampling

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.split
         for r in sampling.split_dataset(df, {"train": 0.5, "rest": 0.5}, "doc_id").collect()}
    b = {r.doc_id: r.split
         for r in sampling.split_dataset(df, {"train": 0.7, "rest": 0.3}, "doc_id").collect()}
    # growing train only ADDS rows to it; no row leaves
    assert all(b[i] == "train" for i in a if a[i] == "train")


def test_split_dataset_validation(spark):
    import pytest

    from anendektos_spark.functions import sampling

    df = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1.0"):
        sampling.split_dataset(df, {"a": 0.5, "b": 0.4}, "doc_id")
    with pytest.raises(ValueError, match="at least two"):
        sampling.split_dataset(df, {"a": 1.0}, "doc_id")
    with pytest.raises(ValueError, match="already exists"):
        sampling.split_dataset(
            df.withColumn("split", F.lit("x")), {"a": 0.5, "b": 0.5}, "doc_id"
        )


def test_skew_stats_hand_computed(spark):
    from anendektos_spark.functions import logops

    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    r = logops.skew_stats(df, "k").collect()[0]
    assert r.n_keys == 3 and r.n_rows == 10 and r.max_key_n == 6
    assert r.top_key == "a"
    assert r.p50_key_n == 2.0
    # floored mean = 10 DIV 3 = 3; (6 * 10000) DIV 3 = 20000
    assert r.skew_x10k == (6 * 10000) // (10 // 3)


def test_weighted_sample_determinism_and_bounds(spark):
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("src"),
        # weight varies WITHIN each stratum (id div 4 alternates inside
        # a fixed id % 4), 100x apart: the race should pick mostly heavy
        F.when((F.col("id") / 4).cast("long") % 2 == 0, F.lit(50.0))
        .otherwise(F.lit(0.5))
        .alias("w"),
    )
    out = sampling.weighted_sample(df, 20, "w", "doc_id", group_col="src", salt="t")
    rows = out.collect()
    # exactly n per stratum, ranks 1..n, deterministic under repartition
    per = {}
    for r in rows:
        per.setdefault(r.src, []).append(r.wsample_rank)
    assert set(per) == {"0", "1", "2", "3"}
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, 21))
    again = sampling.weighted_sample(
        df.repartition(13), 20, "w", "doc_id", group_col="src", salt="t"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # monotone in weight: heavy rows (100x the weight) dominate the pick
    n_heavy = sum(1 for r in rows if (r.doc_id // 4) % 2 == 0)
    assert n_heavy >= 0.8 * len(rows)


def test_weighted_sample_excludes_nonpositive_and_validates(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -2.0), (4, 0.00001), (5, 1.0)],
        "doc_id int, w double",
    )
    # w=0, w<0, and w quantizing to 0 at w_scale=1e4 are never sampled
    got = {r.doc_id for r in sampling.weighted_sample(df, 5, "w", "doc_id").collect()}
    assert got == {1, 5}
    with pytest.raises(ValueError, match="n must be"):
        sampling.weighted_sample(df, 0, "w", "doc_id")
    with pytest.raises(ValueError, match="reserved|exists|output columns"):
        sampling.weighted_sample(
            df.withColumn("wsample_rank", F.lit(1)), 2, "w", "doc_id"
        )


def test_temperature_rates_mixture(spark):
    from anendektos_spark.functions import sampling

    # sources with 10:100:1000 natural counts
    rows = [(f"d{i}", "s_small" if i < 10 else ("s_mid" if i < 110 else "s_big"))
            for i in range(1110)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    rates = sampling.temperature_rates(df, "source", alpha=0.5)
    # smallest source keeps everything; rate ratio = sqrt(n_small/n_g)
    assert rates["s_small"] == 1.0
    assert abs(rates["s_mid"] - (10 / 100) ** 0.5) < 1e-12
    assert abs(rates["s_big"] - (10 / 1000) ** 0.5) < 1e-12
    # alpha=1 → natural proportions (all rates 1.0, nothing dropped)
    assert set(sampling.temperature_rates(df, "source", 1.0).values()) == {1.0}
    # feeds mixture_sample deterministically: sampled mass ∝ n^alpha
    kept = sampling.mixture_sample(df, rates, "source", "doc_id")
    again = sampling.mixture_sample(df.repartition(7), rates, "source", "doc_id")
    assert sorted(map(tuple, kept.collect())) == sorted(map(tuple, again.collect()))
    got = {r.source: r.n for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got["s_small"] == 10  # rate 1.0 keeps all
    # expected masses: 10, sqrt(10*100)≈31.6, sqrt(10*1000)=100 (±md5 noise)
    assert 15 <= got.get("s_mid", 0) <= 50 and 70 <= got.get("s_big", 0) <= 135


def test_curriculum_order_hand_computed(spark):
    from anendektos_spark.functions import sampling

    # 8 docs, scores with a tie straddling the quartile boundary
    rows = [(1, 0.1), (2, 0.2), (3, 0.2), (4, 0.4), (5, 0.5), (6, 0.6),
            (7, 0.7), (8, 0.8)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    out = {r.doc_id: r.phase for r in
           sampling.curriculum_order(df, "s", n_phases=4).collect()}
    # cum_lt: 0.1->0, 0.2->1 (both ties), 0.4->3, 0.5->4, 0.6->5, 0.7->6, 0.8->7
    # phase = min(3, 4*cum_lt div 8)
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3}


def test_curriculum_order_determinism_and_salt(spark):
    from anendektos_spark.functions import sampling

    df = spark.createDataFrame(
        [(i, float(i % 10) / 10) for i in range(100)], "doc_id long, s double"
    )
    a = sampling.curriculum_order(df, "s", salt="x").collect()
    b = sampling.curriculum_order(df.repartition(7), "s", salt="x").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partition-independent
    c = sampling.curriculum_order(df, "s", salt="y").collect()
    keys_x = {r.doc_id: r.order_key for r in a}
    keys_y = {r.doc_id: r.order_key for r in c}
    assert keys_x != keys_y  # salt reshuffles
    ph_x = {r.doc_id: r.phase for r in a}
    ph_y = {r.doc_id: r.phase for r in c}
    assert ph_x == ph_y  # ...without touching the curriculum


def test_curriculum_order_validation(spark):
    from anendektos_spark.functions import sampling

    df = spark.createDataFrame([(1, 0.5)], "doc_id long, s double")
    with pytest.raises(ValueError):
        sampling.curriculum_order(df, "s", n_phases=1)
    with pytest.raises(ValueError):
        sampling.curriculum_order(df.withColumn("phase", F.lit(1)), "s")


def test_leakage_safe_split_keeps_clusters_together(spark):
    # 40 clusters of varying size; every member of a cluster must land on
    # the same side of the split, and the split must match the document-
    # independent cluster-key hash exactly
    rows = []
    for c in range(40):
        for m in range(1 + c % 4):
            rows.append((c * 10 + m, c))
    clusters = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    out = sampling.leakage_safe_split(
        clusters, {"train": 0.7, "test": 0.3}, salt="leak"
    ).collect()
    assert len(out) == len(rows)
    by_cluster: dict[int, set[str]] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    assert set().union(*by_cluster.values()) == {"train", "test"}
    # determinism: same salt ⇒ same assignment, per-document
    again = sampling.leakage_safe_split(
        clusters, {"train": 0.7, "test": 0.3}, salt="leak"
    ).collect()
    assert {(r.doc_id, r.split) for r in again} == {(r.doc_id, r.split) for r in out}
    # invalid weights propagate split_dataset's validation
    with pytest.raises(ValueError):
        sampling.leakage_safe_split(clusters, {"train": 1.0}, salt="x")


def test_calibrate_scores_within_source_percentiles(spark):
    from anendektos_spark.functions import sampling

    df = spark.createDataFrame(
        [(0, "web", 0.1), (1, "web", 0.5), (2, "web", 0.9), (3, "web", 0.5),
         (4, "books", 0.2), (5, "books", 0.95)],
        "doc_id long, source string, quality double",
    )
    out = {r.doc_id: r.pctl_ppm
           for r in sampling.calibrate_scores(df, "quality").collect()}
    # web: 0.1 -> 1/4, ties at 0.5 -> 3/4 each, 0.9 -> 4/4
    assert out[0] == 250_000
    assert out[1] == out[3] == 750_000
    assert out[2] == 1_000_000
    # books: calibrated independently — 0.2 is its group's bottom half
    assert out[4] == 500_000 and out[5] == 1_000_000


def test_calibrate_scores_reserved_columns(spark):
    from anendektos_spark.functions import sampling

    df = spark.createDataFrame(
        [(0, "s", 0.5, 7)], "doc_id long, source string, quality double, pctl_ppm int"
    )
    with pytest.raises(ValueError, match="pctl_ppm"):
        sampling.calibrate_scores(df, "quality")


def test_length_buckets_pow2_and_waste(spark):
    from anendektos_spark.functions import sampling

    df = spark.createDataFrame(
        [(1,), (16,), (17,), (30,), (33,), (64,), (0,)], "n long"
    )
    out = {r.bucket_len: r for r in
           sampling.length_buckets(df, "n", min_bucket=16).collect()}
    # 1 and 16 -> 16; 17 and 30 -> 32; 33 and 64 -> 64; 0 dropped
    assert set(out) == {16, 32, 64}
    assert out[16].n_seqs == 2 and out[16].total_pad == (16 - 1) + 0
    assert out[32].n_seqs == 2 and out[32].total_pad == (32 - 17) + (32 - 30)
    assert out[64].n_seqs == 2 and out[64].total_pad == (64 - 33) + 0
    assert out[32].waste_ppm == (17 * 10**6) // (2 * 32)
    with pytest.raises(ValueError, match="power of two"):
        sampling.length_buckets(df, "n", min_bucket=24)


def test_recency_weights_step_decay(spark):
    import datetime as dt
    from anendektos_spark.functions import sampling

    base = 1_800_000_000  # fixed "now"
    def ts(days_ago):
        return dt.datetime.utcfromtimestamp(base - days_ago * 86400)

    df = spark.createDataFrame(
        [(0, ts(0)), (1, ts(6)), (2, ts(7)), (3, ts(20)), (4, ts(500)),
         (5, ts(-3))],  # future timestamp clamps to age 0
        "event_id long, ts timestamp",
    )
    out = {r.event_id: r for r in
           sampling.recency_weights(df, "ts", base, half_life_days=7).collect()}
    assert out[0].weight_ppm == 1_000_000 and out[0].age_days == 0
    assert out[1].weight_ppm == 1_000_000      # age 6 < one half-life
    assert out[2].weight_ppm == 500_000        # exactly one half-life
    assert out[3].weight_ppm == 250_000        # 20 div 7 = 2 halvings
    # capped at max_halvings AND floored at 1 (1e6 >> 20 is 0 — the
    # greatest() guard is what keeps old rows sampleable)
    assert out[4].weight_ppm == 1
    assert out[5].age_days == 0 and out[5].weight_ppm == 1_000_000
    with pytest.raises(ValueError, match="half_life_days"):
        sampling.recency_weights(df, "ts", base, 0)


# --------------------------------------------------------------------------
# shard_by_bytes
# --------------------------------------------------------------------------

def test_shard_by_bytes_hand_computed(spark):
    # sizes 10,20,30,40 → total 100, 2 shards, boundary at g=50:
    # doc0 g=10 → shard 0; doc1 g=30 → 0; doc2 g=60 → shard (59*2)//100=1;
    # doc3 g=100 → (99*2)//100 = 1.
    df = spark.createDataFrame(
        [(0, 10), (1, 20), (2, 30), (3, 40)], "doc_id long, sz int"
    )
    got = sorted(
        tuple(r) for r in sampling.shard_by_bytes(df, 2, "doc_id", "sz").collect()
    )
    assert got == [(0, 2, 30, 0, 1), (1, 2, 70, 2, 3)]


def test_shard_by_bytes_partitioning_invariant_and_oracle(spark):
    import duckdb

    rel = "SELECT id AS doc_id, (id * 7) % 13 + 1 AS sz FROM range(500) t(id)"
    want = sorted(
        tuple(t)
        for t in duckdb.sql(
            sampling.shard_by_bytes_sql(rel, 7, "doc_id", "sz")
        ).fetchall()
    )
    base = spark.range(500).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 7) % 13 + 1).alias("sz")
    )
    # the assignment must be a pure function of (order, size) — identical
    # under any input partitioning, incl. a shuffled row order
    for df in (base, base.repartition(17), base.orderBy(F.desc("doc_id")).coalesce(1)):
        got = sorted(
            tuple(r)
            for r in sampling.shard_by_bytes(df, 7, "doc_id", "sz").collect()
        )
        assert got == want
    # every shard's span is contiguous: first_key of shard k+1 follows
    # last_key of shard k
    keys = sorted((r[0], r[3], r[4]) for r in want)
    for (s0, _, last0), (s1, first1, _) in zip(keys, keys[1:]):
        assert s1 == s0 + 1 and first1 == last0 + 1


def test_shard_by_bytes_single_shard_and_validation(spark):
    df = spark.createDataFrame([(0, 5), (1, 5)], "doc_id long, sz int")
    got = sampling.shard_by_bytes(df, 1, "doc_id", "sz").collect()
    assert [tuple(r) for r in got] == [(0, 2, 10, 0, 1)]
    with pytest.raises(ValueError, match="n_shards"):
        sampling.shard_by_bytes(df, 0, "doc_id", "sz")
    with pytest.raises(ValueError, match="collide"):
        sampling.shard_by_bytes(
            df.withColumn("shard_id", F.lit(1)), 2, "doc_id", "sz"
        )
