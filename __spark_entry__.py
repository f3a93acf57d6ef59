"""Driver contract for the spark-graft builder (PySpark target).

Maps the engine's operator surface (SURVEY.md §2 + the training-data ops)
onto the driver's parquet tables so every operator gets a DuckDB oracle
cross-check. Heavy lifting lives in ``anendektos_spark``; these are thin
bindings.

Oracle-parity rules used throughout (see anendektos_spark/functions/*):
- float aggregations sum in DECIMAL then round → engine-independent;
- per-row float math is a sequential left fold (F.aggregate ↔
  list_reduce) → bit-identical across engines;
- time buckets emitted as formatted strings (timezone-safe);
- every hash is md5 (same algorithm both engines);
- ranks use rounded values + id tie-breaks → deterministic top-k.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from anendektos_spark.functions import (
    bpe,
    classify,
    convops,
    dedup,
    graph,
    joins,
    layout,
    logops,
    sampling,
    similarity,
    sketches,
    textstats,
    transcript,
    zeek_oracle,
)

SF001 = "/root/testdata/sf0.001"

# committed JSONL transcript fixture (scripts/gen_jsonl_fixture.py) —
# same synth relation both engines agree on, JSONL-delivered, with
# malformed-line injections exercising the source's reject channel
import os as _os

_JSONL_FIXTURE = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)),
    "anendektos_spark", "data", "transcripts_fixture.jsonl",
)

# size of the deterministic transcript relation behind the conv_* queries
_CONV_N = 20_000
_CONV_DUP_N = 8_000
_BM25_TERMS = ["join", "vector", "customer"]

_KNOWN = ", ".join(f"'{t}'" for t in logops.KNOWN_EVENT_TYPES)

# Shared DuckDB SQL fragments (the oracle mirrors of the Column builders).
_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_SHINGLES = (
    "list_transform(range(len(toks) - 2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])"
)
_STOPLIST = ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS)
_V64 = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_FOLD_SUM = "list_reduce({l}, (acc, x) -> acc + x)"


def _dot_sql(a: str, b: str) -> str:
    prods = f"list_transform(range(64), i -> {a}[i+1] * {b}[i+1])"
    return _FOLD_SUM.format(l=prods)


def _norm_sql(v: str) -> str:
    sq = f"list_transform({v}, x -> x * x)"
    return f"sqrt({_FOLD_SUM.format(l=sq)})"


def _cos_sql(a: str, b: str) -> str:
    return f"{_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)})"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full parse → enrich → route → aggregate event
    pipeline at sf0.001 (each stage oracle-checked separately below)."""
    events = _t(spark, SF001, "events")
    customer = _t(spark, SF001, "customer")
    return logops.enrich_events(events, customer)


# --------------------------------------------------------------------------
# queries(): one entry per operator; oracle_sql(): the DuckDB mirrors.
# --------------------------------------------------------------------------

# The driver's CORRECTNESS gate verifies only the FIRST ``DRIVER_WINDOW``
# entries of queries() (dict-insertion order). PRIORITY_QUERIES pins the
# window's contents explicitly so an insertion elsewhere can never silently
# push a core query out of the verified set (guarded by
# tests/test_entry_contract.py::test_driver_window_priority).
#
# Round-4 rotation (VERDICT r3 ask #2): the window holds exactly the
# queries that have NEVER had an official CORRECTNESS row — rounds 1-3
# officially verified 100 distinct queries (union of CORRECTNESS_r01-r03
# keys, incl. all zeek_sink_* goldens, the conv/asof/sampling/similarity
# sets, and the grok parse+enrich legs; those keep their recorded rows) —
# led by the ten remaining transcript_* north_star analytics legs and the
# round-3 operator additions. 53 queries had no official row; the window
# caps at 50, so three TPC-H mirrors (tpch_q11/q12/q15) stay sweep-only
# and head the round-5 rotation (they are placed FIRST among the
# non-window remainder below). Every query, in and out of the window, is
# additionally swept each round by scripts/check_oracle.py →
# ORACLE_FULL_r<k>.json.
DRIVER_WINDOW = 50
PRIORITY_QUERIES = [
    # round-5 window (VERDICT r4 ask #1): the first 40 of round 4's staged
    # NEXT_ROTATION — queries that have NEVER had an official driver
    # CORRECTNESS row (rounds 1-4 official rows cover everything before
    # them) — followed by the ten round-5 additions. The 50 round-4
    # official rows (transcript_* legs, round-3 dedup/ANN/conv/text set,
    # deferred TPC-H mirrors) keep their recorded CORRECTNESS_r04 rows
    # and stay sweep-covered via ORACLE_FULL.
    "tpch_q11",
    "tpch_q12",
    "tpch_q15",
    "dedup_prefix_jaccard",
    "sample_importance",
    "text_bpe_merges",
    "text_bpe_tokens",
    "retrieval_rrf",
    "dedup_lsh_recall",
    "sample_curriculum",
    "dedup_cluster_weights",
    "sample_split_leakage_safe",
    "embed_random_projection",
    "profile_drift",
    "embed_knn_classify",
    "embed_centroid_outliers",
    "embed_decontaminate",
    "transcript_latency_mad",
    "conv_degenerate_runs",
    "conv_pack_masks",
    "conv_integrity",
    "dedup_pairs_editdist",
    "conv_truncate_context",
    "sample_calibrated",
    "sample_length_buckets",
    "text_ngram_diversity",
    "dedup_rate_by_source",
    "sketch_hdr_latency",
    "sketch_hdr_accuracy",
    "sample_recency_weights",
    "embed_centroid_shift",
    "profile_shuffle_plan",
    "text_vocab_drift",
    "conv_collapse_runs",
    "transcript_tool_paths",
    "transcript_wasted_latency",
    "conv_split_episodes",
    "ann_recall_ivf",
    "ann_l2_topk",
    "ann_recall_pq",
    # round-5 additions: reliability analytics (flaps / SLO burn /
    # latency-by-outcome / retry recovery), user-perceived response gap,
    # batch session stats (stream_conv_stats twin), hourly concurrency,
    # hapax corpus-health, and the JSONL-delivered source legs
    "transcript_status_flaps",
    "transcript_slo_burn",
    "transcript_latency_by_status",
    "transcript_retry_recovery",
    "transcript_response_gap",
    "conv_session_stats",
    "conv_concurrency",
    "text_hapax_rate",
    "jsonl_route_counts",
    "jsonl_rejects",
]

# Never-officially-verified queries that did not fit round 5's window —
# the remaining 28 of round 4's 68-query backlog plus the operators
# registered after the round-5 window froze; they are emitted
# immediately after PRIORITY_QUERIES so a future window (or any reader
# replaying the driver protocol) picks them up first. Every name here
# is sweep-green in the committed ORACLE_FULL_r05.json (257/257), which
# is the standing evidence for whatever sits outside the 50-query
# official window.
NEXT_ROTATION = [
    "conv_episode_stats",
    "text_langid_confusion",
    "conv_repair_order",
    "transcript_latency_drift",
    "sample_shard_manifest",
    "embed_hard_negatives",
    "dedup_substring_spans",
    "sample_token_budget",
    "text_vocab_growth",
    "transcript_returns",
    "dedup_substring_rate",
    "sample_epoch_shuffle",
    "transcript_grpo_adv",
    "embed_matryoshka_recall",
    "dedup_containment",
    "dedup_cluster_sizes",
    "text_retrieval_eval",
    "dedup_substring_clean",
    "text_collocations",
    "text_phrase_search",
    "graph_communities",
    "graph_degree_stats",
    "transcript_tool_hhi",
    "corpus_datacard",
    "transcript_tool_stationary",
    "graph_bfs_levels",
    "text_url_domains",
    "quality_pr_curve",
    # late round-5 additions (registered after the round-5 window froze)
    "events_cohort_retention",
    "embed_label_balance",
    "transcript_error_cascade",
    "conv_outcome_by_depth",
    "text_length_outliers",
    "embed_pca_top",
    "embed_whiten",
    "funnel_latency",
    "events_session_paths",
    "embed_dup_clusters",
    "orders_basket_pairs",
    "events_stickiness",
    "orders_reorder_gap",
    "transcript_handoff_outcomes",
    "orders_cohort_ltv",
    "text_boilerplate_lines",
    "text_boilerplate_clean",
    "text_source_divergence",
    "orders_rfm_segments",
    "orders_pareto_share",
    "events_debounce",
    "events_burstiness",
    "graph_kcore",
    "transcript_abandon_hazard",
    "graph_clustering_coeff",
    "hist_equidepth_values",
    "orders_ship_sla",
    "events_seasonal_spikes",
    "orders_benford",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registered queries, PRIORITY_QUERIES first (driver window),
    then NEXT_ROTATION (round 5's window head), then the rest."""
    q = _register_all()
    missing = [n for n in PRIORITY_QUERIES + NEXT_ROTATION if n not in q]
    if missing:
        raise RuntimeError(f"PRIORITY_QUERIES references unregistered: {missing}")
    out = {n: q[n] for n in PRIORITY_QUERIES}
    out.update({n: q[n] for n in NEXT_ROTATION})
    out.update({n: f for n, f in q.items() if n not in out})
    return out


def _jsonl_rows(s: SparkSession) -> DataFrame:
    from anendektos_spark.sources.jsonl import read_jsonl

    return read_jsonl(s, _JSONL_FIXTURE).rows


def _jsonl_rejects(s: SparkSession) -> DataFrame:
    from anendektos_spark.sources.jsonl import read_jsonl

    return read_jsonl(s, _JSONL_FIXTURE).rejects


def _register_all() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- log pipeline over events (O4/O5-O7/O17/O18/O19 + north_star) ---
    q["route_counts"] = lambda s, d: logops.route_counts(_t(s, d, "events"))
    q["route_rejects"] = lambda s, d: logops.route_rejects(_t(s, d, "events"))
    q["parse_props"] = lambda s, d: logops.parse_props(_t(s, d, "events"))
    q["enrich_events"] = lambda s, d: logops.enrich_events(
        _t(s, d, "events"), _t(s, d, "customer")
    )
    q["distinct_users"] = lambda s, d: logops.distinct_users(_t(s, d, "events"))
    q["topk_users"] = lambda s, d: logops.topk_users(_t(s, d, "events"), 5)
    q["time_buckets"] = lambda s, d: logops.time_buckets(_t(s, d, "events"), "hour")
    q["stable_ordinal"] = lambda s, d: logops.stable_ordinal(_t(s, d, "events"), 10)
    q["sessionize"] = lambda s, d: logops.sessionize(_t(s, d, "events"), 1800)
    q["value_percentiles"] = lambda s, d: logops.value_percentiles(_t(s, d, "events"))
    # portable sketch profile: md5-HLL + deterministic-sample median —
    # every column engine-reproducible, so it hash-checks like any exact
    # query. The engine-native sketch variant (logops.approx_profile,
    # Datasketches HLL + KLL) stays library-only with accuracy pinned in
    # tests/test_functions.py (its internals are engine-specific).
    q["approx_profile"] = lambda s, d: logops.approx_profile_portable(_t(s, d, "events"))
    q["funnel_steps"] = lambda s, d: logops.funnel(_t(s, d, "events"))
    q["events_session_paths"] = lambda s, d: logops.session_paths(
        _t(s, d, "events")
    )
    q["orders_cohort_ltv"] = lambda s, d: logops.cohort_ltv(
        _t(s, d, "orders")
    )
    q["events_stickiness"] = lambda s, d: logops.stickiness(
        _t(s, d, "events")
    )
    q["orders_reorder_gap"] = lambda s, d: logops.reorder_gap(
        _t(s, d, "orders")
    )
    q["orders_basket_pairs"] = lambda s, d: logops.basket_pairs(
        _t(s, d, "lineitem")
    )
    q["funnel_latency"] = lambda s, d: logops.funnel_latency(
        _t(s, d, "events")
    )
    q["rate_spikes"] = lambda s, d: logops.rate_spikes(_t(s, d, "events"))

    # --- general relational engine (filter/agg/join/sort/limit,
    #     anti/semi joins, rollup, pivot, moving windows) ---
    q["tpch_q1"] = _tpch_q1
    q["tpch_q3"] = _tpch_q3
    q["tpch_q5"] = _tpch_q5
    q["tpch_q6"] = _tpch_q6
    q["tpch_q7"] = _tpch_q7
    q["tpch_q10"] = _tpch_q10
    q["tpch_q14"] = _tpch_q14
    q["tpch_q4"] = _tpch_q4
    q["tpch_q13"] = _tpch_q13
    q["tpch_q18"] = _tpch_q18
    q["tpch_q19"] = _tpch_q19
    q["tpch_q22"] = _tpch_q22
    q["orders_without_items"] = _orders_without_items
    q["big_spender_segments"] = _big_spender_segments
    q["rollup_lineitem"] = _rollup_lineitem
    q["pivot_events"] = _pivot_events
    q["moving_daily_orders"] = _moving_daily_orders

    # --- text analysis over documents ---
    q["text_token_stats"] = lambda s, d: textstats.token_stats(_t(s, d, "documents"))
    q["text_quality"] = lambda s, d: textstats.quality_score(_t(s, d, "documents"))
    q["text_lang_id"] = lambda s, d: textstats.lang_id(_t(s, d, "documents"))
    q["text_fingerprint"] = lambda s, d: textstats.fingerprint(_t(s, d, "documents"))
    q["text_subword_tokens"] = lambda s, d: textstats.subword_token_stats(
        _t(s, d, "documents")
    )
    # context-window chunking: overlapping 32-token windows, stride 24
    q["text_chunks"] = lambda s, d: textstats.chunk_documents(
        _t(s, d, "documents"), chunk_tokens=32, overlap=8
    )
    q["text_filter_chain"] = lambda s, d: textstats.filter_chain(_t(s, d, "documents"))
    q["text_dup_gram_frac"] = lambda s, d: textstats.dup_gram_fraction(
        _t(s, d, "documents"), n=3, min_count=2
    )
    q["text_tfidf_topk"] = lambda s, d: textstats.tfidf_topk(_t(s, d, "documents"), k=5)

    # --- deduplication over documents ---
    q["dedup_exact"] = lambda s, d: dedup.exact_dups(_t(s, d, "documents"))
    q["dedup_minhash"] = lambda s, d: dedup.minhash_signature(_t(s, d, "documents"))
    q["dedup_lsh_candidates"] = lambda s, d: dedup.lsh_candidates(_t(s, d, "documents"))
    q["dedup_lsh_jaccard"] = lambda s, d: dedup.lsh_jaccard(_t(s, d, "documents"))
    q["dedup_ngram_jaccard"] = _dedup_ngram_jaccard_subset
    q["dedup_clusters"] = lambda s, d: dedup.dup_clusters(
        _t(s, d, "documents").select("doc_id"),
        dedup.lsh_candidates(_t(s, d, "documents")),
    )
    q["dedup_simhash"] = lambda s, d: dedup.simhash(_t(s, d, "documents"))
    # O(log n)-round large-star/small-star CC — same contract (and same
    # recursive-CTE oracle) as the min-label dedup_clusters
    q["dedup_clusters_bigstar"] = lambda s, d: dedup.dup_clusters_bigstar(
        _t(s, d, "documents").select("doc_id"),
        dedup.lsh_candidates(_t(s, d, "documents")),
    )
    q["dedup_incremental"] = _dedup_incremental

    # --- similarity search over embeddings ---
    q["embed_norm"] = _embed_norm
    q["ann_cosine_topk"] = lambda s, d: similarity.brute_topk(
        _t(s, d, "embeddings"), _t(s, d, "embeddings").filter(F.col("vec_id") < 8), 5
    )
    q["ann_ivf_topk"] = lambda s, d: similarity.ivf_topk(
        _t(s, d, "embeddings"),
        _t(s, d, "embeddings").filter(F.col("vec_id") < 8),
        _t(s, d, "embeddings")
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("centroid_id"), "embedding"),
        3,
    )
    # recall audit of the IVF path against brute-force ground truth at
    # the same k and query block (the embedding twin of dedup_lsh_recall)
    def _ann_recall_ivf(s, d):
        emb = _t(s, d, "embeddings")
        qs = emb.filter(F.col("vec_id") < 8)
        cents = qs.select(F.col("vec_id").alias("centroid_id"), "embedding")
        return similarity.ann_recall_report(
            similarity.brute_topk(emb, qs, 3),
            similarity.ivf_topk(emb, qs, cents, 3),
            3,
        )

    q["ann_recall_ivf"] = _ann_recall_ivf
    # exact squared-L2 top-k: the ground truth PQ's asymmetric distance
    # approximates (cosine only agrees on normalized vectors)
    q["ann_l2_topk"] = lambda s, d: similarity.brute_l2_topk(
        _t(s, d, "embeddings"), _t(s, d, "embeddings").filter(F.col("vec_id") < 8), 5
    )

    def _ann_recall_pq(s, d):
        emb = _t(s, d, "embeddings")
        qs = emb.filter(F.col("vec_id") < 8)
        return similarity.ann_recall_report(
            similarity.brute_l2_topk(emb, qs, 5),
            similarity.pq_topk(emb, qs, similarity.pq_codebook(emb), 5),
            5,
        )

    q["ann_recall_pq"] = _ann_recall_pq
    q["ann_ivf_assign"] = lambda s, d: similarity.ivf_assign(
        _t(s, d, "embeddings"),
        _t(s, d, "embeddings")
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("centroid_id"), "embedding"),
    )
    # exhaustive baseline, STRUCTURALLY capped to a fixed-size id block so
    # the O(n²) self-join stays constant work at any SF (the scale path is
    # embed_lsh_dup_pairs below)
    q["embed_dup_pairs"] = lambda s, d: similarity.cosine_dup_pairs(
        _t(s, d, "embeddings").filter(F.col("vec_id") < 200),
        threshold=0.25,
        exhaustive=True,
    )
    q["embed_lsh_buckets"] = lambda s, d: _t(s, d, "embeddings").select(
        "vec_id",
        similarity.hyperplane_bucket(
            similarity.as_double(F.col("embedding")), 12, 64
        ).alias("bucket"),
    )
    q["embed_lsh_dup_pairs"] = lambda s, d: similarity.lsh_dup_pairs(
        _t(s, d, "embeddings"), threshold=0.25, n_planes=12, dims=64
    )
    q["embed_dup_clusters"] = lambda s, d: dedup.dup_clusters_bigstar(
        _t(s, d, "embeddings").select("vec_id"),
        similarity.lsh_dup_pairs(
            _t(s, d, "embeddings"), threshold=0.25, n_planes=12, dims=64
        ),
        id_col="vec_id",
    )
    q["embed_quantize_int8"] = _embed_quantize
    q["ann_quantized_topk"] = lambda s, d: similarity.quantized_topk(
        _t(s, d, "embeddings"), _t(s, d, "embeddings").filter(F.col("vec_id") < 8), 5
    )

    # --- deterministic sampling / curation + temporal joins ---
    q["sample_hash"] = lambda s, d: sampling.hash_sample(
        _t(s, d, "events"), 0.1, "event_id", salt="s1"
    ).select("event_id", "user_id", "event_type")
    q["sample_stratified"] = lambda s, d: sampling.stratified_sample(
        _t(s, d, "events"), "event_type", 20, "event_id", salt="s2"
    ).select("event_type", "event_id", "sample_rank")
    q["sample_quality_quota"] = _quality_quota
    q["sample_mixture"] = lambda s, d: sampling.mixture_sample(
        _t(s, d, "documents"),
        {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0},
        "source",
        "doc_id",
        salt="mix",
        default_rate=0.1,
    ).select("doc_id", "source")
    q["dedup_canonical_corpus"] = lambda s, d: dedup.canonical_corpus(
        _t(s, d, "documents"),
        dedup.dup_clusters(
            _t(s, d, "documents").select("doc_id"),
            dedup.lsh_candidates(_t(s, d, "documents")),
        ),
    ).select("doc_id", "source")
    q["sample_pack_sequences"] = lambda s, d: sampling.pack_sequences(
        _t(s, d, "documents").select(
            "doc_id", "source", F.size(textstats.tokens(F.col("text"))).alias("n_tokens")
        ),
        512,
        "source",
        "n_tokens",
        "doc_id",
    )
    q["time_rollup"] = lambda s, d: logops.time_rollup(_t(s, d, "events"))
    # Z-order layout: per-file pruning metadata (64 Morton-range files
    # over the (user_id, value) plane) — the data-skipping layout op
    q["zorder_events"] = lambda s, d: layout.zorder_file_stats(
        _t(s, d, "events"), "user_id", "value", n_files=64
    )
    # compaction planner over a per-(type,user) synthetic file listing —
    # deterministic cumulative-size binning within each table partition
    q["compaction_plan"] = _compaction_plan
    q["text_repetition"] = lambda s, d: textstats.repetition_stats(_t(s, d, "documents"))
    q["text_redact_pii"] = lambda s, d: textstats.redact_pii(
        _t(s, d, "events"), id_col="event_id", text_col="props"
    )
    q["profile_columns"] = lambda s, d: logops.profile_columns(
        _t(s, d, "events"), ["event_type", "user_id", "event_id"]
    )
    q["latest_event_per_user"] = lambda s, d: logops.latest_by_key(
        _t(s, d, "events").select("user_id", "event_id", "ts", "event_type"),
        ["user_id"],
        "ts",
        "event_id",
    ).select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"), "event_type",
    )
    q["sessionize_events"] = lambda s, d: logops.sessionize_events(
        _t(s, d, "events").filter(F.col("user_id") < 20)
    )
    # SCD-2 history build: per-user event_type changelog → validity
    # intervals (write-side companion of latest_event_per_user)
    q["scd2_user_type"] = lambda s, d: logops.scd2_intervals(
        _t(s, d, "events").select("user_id", "event_id", "event_type", "ts"),
        ["user_id"],
        "event_type",
        "ts",
        tie_col="event_id",
    )
    # SemDeDup: cluster-blocked embedding near-dup (centroids = the same
    # fixed vec_id<8 model the ann_ivf_* queries use)
    q["semantic_dup_pairs"] = lambda s, d: similarity.semantic_dup_pairs(
        _t(s, d, "embeddings"),
        _t(s, d, "embeddings")
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("centroid_id"), "embedding"),
        threshold=0.25,
    )
    # inverted index with the head-term posting cap exercised (cap 50 at
    # sf0.01 truncates every common term deterministically)
    q["text_inverted_index"] = lambda s, d: textstats.inverted_index(
        _t(s, d, "documents"), max_postings=50
    ).select(
        "term",
        "doc_freq",
        F.array_join(F.transform("postings", lambda x: x.cast("string")), ",").alias(
            "postings_str"
        ),
        "truncated",
    )
    q["text_search_and"] = lambda s, d: textstats.search_conjunctive(
        _t(s, d, "documents"), ("vector", "stream", "spark"), keep_cols=("source",)
    )
    # bigram-LM quality proxy (integer fixed point, engine-exact)
    q["text_lm_score"] = lambda s, d: textstats.lm_score(_t(s, d, "documents"))
    # iterative integer PageRank over the deterministic link relation
    q["graph_pagerank"] = lambda s, d: graph.pagerank(
        graph.synth_links(s, 20_000, 1_000), iters=5
    )
    q["graph_triangles"] = lambda s, d: graph.triangle_counts(
        graph.synth_links(s, 20_000, 1_000)
    )
    # deterministic train/val/test assignment (cumulative md5 ranges)
    q["sample_split"] = lambda s, d: sampling.split_dataset(
        _t(s, d, "documents").select("doc_id"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        "doc_id",
    )
    # shuffle-skew diagnostic for a prospective key
    q["profile_skew"] = lambda s, d: logops.skew_stats(_t(s, d, "events"), "user_id")
    # Count-Min sketch: build on user_id, estimate every distinct user,
    # exact companion column makes the one-sided error driver-visible
    q["freq_cms_users"] = _freq_cms_users
    q["decontaminate_ngrams"] = _decontaminate
    q["asof_last_order"] = _asof_last_order
    q["asof_last_order_bucketed"] = _asof_last_order_bucketed
    q["range_order_pairs"] = _range_order_pairs

    # --- the Zeek-semantics transcript parse engine itself, over the
    #     committed golden parquet (functions/zeek_oracle.py): every
    #     parsed field of every sink + the rejects channel, DuckDB-mirrored ---
    for t in zeek_oracle.KNOWN_TOOLS:
        q[f"zeek_sink_{t}"] = (lambda tool: lambda s, d: zeek_oracle.sink_query(s, tool))(t)
    q["zeek_rejects"] = lambda s, d: zeek_oracle.rejects_query(s)
    q["zeek_conn_latency"] = lambda s, d: zeek_oracle.conn_latency_query(s)
    q["zeek_sink_conn_pipe"] = lambda s, d: zeek_oracle.sink_query_pipe(s, "conn")
    q["zeek_topk_fields"] = lambda s, d: zeek_oracle.topk_fields_query(s, 3)
    q["zeek_golden_aggregates"] = lambda s, d: zeek_oracle.aggregates_query(s)

    # --- conversation-level transcript ops (functions/convops.py) over
    #     the deterministic generator relation — reassembly, tool-Markov
    #     transitions, latency profile, role balance, all DuckDB-mirrored ---
    q["conv_reconstruct"] = lambda s, d: convops.conv_reconstruct(
        convops.synth_conv(s, _CONV_N)
    )
    q["conv_tool_transitions"] = lambda s, d: convops.tool_transitions(
        convops.synth_conv(s, _CONV_N)
    )
    q["conv_turn_latency"] = lambda s, d: convops.turn_latency(
        convops.synth_conv(s, _CONV_N)
    )
    q["conv_role_balance"] = lambda s, d: convops.role_balance(
        convops.synth_conv(s, _CONV_N)
    )

    # --- round-3 additions (registered AFTER the driver window by design:
    #     verified by scripts/check_oracle.py → ORACLE_FULL_r03.json this
    #     round, rotated into PRIORITY_QUERIES next round) ---
    q["conv_context_growth"] = lambda s, d: convops.context_growth(
        convops.synth_conv(s, _CONV_N)
    )
    q["hll_registers_events"] = lambda s, d: sketches.hll_registers(
        _t(s, d, "events"), "event_id"
    )
    q["hll_distinct_events"] = _hll_distinct_events
    q["bloom_probe_users"] = _bloom_probe_users
    q["tpch_q8"] = _tpch_q8
    q["tpch_q9"] = _tpch_q9
    q["tpch_q12"] = _tpch_q12
    q["tpch_q15"] = _tpch_q15
    q["tpch_q17"] = _tpch_q17
    # q2/q11/q16/q20/q21 complete the 22-query TPC-H sweep (each adapted
    # to the driver schema — no partsupp/shipmode/receiptdate columns)
    q["tpch_q2"] = _tpch_q2
    q["tpch_q11"] = _tpch_q11
    q["tpch_q16"] = _tpch_q16
    q["tpch_q20"] = _tpch_q20
    q["tpch_q21"] = _tpch_q21
    q["cdc_apply_customers"] = _cdc_apply_customers
    # exact distinct-per-key at skew: Spark's count(DISTINCT) expansion
    # already plans the salted two-stage shape (PLANS.md "Count-distinct
    # skew"), so the operator is the built-in — registered to pin the
    # per-key result, not to add a manual salting stage
    q["distinct_users_per_type"] = lambda s, d: (
        _t(s, d, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_distinct"))
    )
    q["snapshot_diff_customers"] = lambda s, d: logops.snapshot_diff(
        _t(s, d, "customer").select(
            "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
        ),
        _cdc_apply_customers(s, d),
        key_cols=["c_custkey"],
    )
    q["bloom_pruned_enrich"] = lambda s, d: sketches.bloom_pruned_join(
        _t(s, d, "events").select("event_id", "user_id"),
        _t(s, d, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_mktsegment"),
        "user_id",
        "c_custkey",
    ).select("event_id", "user_id", "c_mktsegment")
    # all-pairs tf·idf cosine via inverted-index self-join (bigram terms —
    # the sparse-term setting; the synthetic 31-word unigram vocabulary is
    # degenerate-dense) and corpus-wide duplicated-span removal
    q["text_cosine_pairs"] = lambda s, d: textstats.tfidf_cosine_pairs(
        _t(s, d, "documents"), threshold=0.3, ngram=2
    )
    q["dedup_spans"] = lambda s, d: dedup.dedup_spans(
        _t(s, d, "documents"), block_tokens=5, min_count=2
    )
    # winnowing (MOSS) local fingerprints + fingerprint-overlap pairs
    q["dedup_winnow_fp"] = lambda s, d: dedup.winnow_fingerprints(
        _t(s, d, "documents"), k=4, w=4
    )
    q["dedup_winnow_pairs"] = lambda s, d: dedup.winnow_overlap_pairs(
        _t(s, d, "documents"), k=4, w=4, min_shared=2, max_df=50
    )
    q["dedup_winnow_spans"] = lambda s, d: dedup.winnow_match_spans(
        _t(s, d, "documents"), k=4, w=4, max_df=50
    )
    # quality-aware keep-one-copy over the resolved dup clusters
    q["dedup_canonical_quality"] = lambda s, d: dedup.canonical_by_quality(
        dedup.dup_clusters(
            _t(s, d, "documents").select("doc_id"),
            dedup.lsh_candidates(_t(s, d, "documents")),
        ),
        textstats.quality_score(_t(s, d, "documents")),
    )
    # fixed-point batch-GD linear probe: trains on a deterministic
    # derived target (sign of the first 8 quantized dims — the synthetic
    # label column is noise w.r.t. the embeddings) and returns per-row
    # scored predictions; the oracle replays the FULL 8-iteration fit
    q["classify_linear_probe"] = lambda s, d: classify.fit_and_score(
        _t(s, d, "embeddings"), iters=8, lr_num=2, lr_den=1
    )
    # Deequ-style single-scan constraint validation + key uniqueness +
    # fixed-width mergeable histogram (profiling primitives)
    q["validate_events"] = lambda s, d: logops.validate_constraints(
        _t(s, d, "events"),
        {
            "value_non_negative": F.col("value") >= 0,
            "event_type_known": F.col("event_type").isin(
                *logops.KNOWN_EVENT_TYPES
            ),
            "ts_not_null": F.col("ts").isNotNull(),
            "props_has_k": F.col("props").rlike(logops.PROPS_K_PATTERN),
            "user_id_in_range": (F.col("user_id") >= 0)
            & (F.col("user_id") < 10**6),
        },
    )
    q["unique_violations_users"] = lambda s, d: logops.unique_violations(
        _t(s, d, "events").select("user_id"), ["user_id"]
    )
    q["hist_event_values"] = lambda s, d: logops.value_histogram(
        _t(s, d, "events"), "value", 0.0, 20.0, 10
    )
    # cohort-retention matrix: users cohorted by first-seen day, counted
    # when active again age_days later (integer day grain, ppm shares)
    q["events_cohort_retention"] = lambda s, d: logops.cohort_retention(
        _t(s, d, "events")
    )

    # --- the north_star transcript pipeline itself (functions/transcript.py):
    #     grok-parse of tool/status/latency markers out of turn text,
    #     reject channel, fan-out counts, broadcast enrich, per-sink
    #     summaries, hourly buckets, top-K — every stage DuckDB-mirrored ---
    q["transcript_parse"] = lambda s, d: transcript.parse_turns(
        transcript.synth_transcript(s, _CONV_N)
    )
    q["transcript_rejects"] = lambda s, d: transcript.reject_turns(
        transcript.synth_transcript(s, _CONV_N)
    )
    q["transcript_route_counts"] = lambda s, d: transcript.route_counts(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    q["transcript_enrich_agg"] = lambda s, d: transcript.enrich_agg(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N)),
        transcript.tool_dim(s),
    )
    q["transcript_tool_summary"] = lambda s, d: transcript.tool_summary(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    q["transcript_hourly"] = lambda s, d: transcript.hourly_counts(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    q["transcript_topk_tools"] = lambda s, d: transcript.topk_tools(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N)), 3
    )
    # agent-behavior analytics over the parsed call stream (round 3);
    # retry loops run at category grain — the corpus's rotating tool
    # schedule never repeats a TOOL back-to-back (tool grain is
    # pytest-covered on a handcrafted stream in tests/test_transcript.py)
    q["transcript_retry_loops"] = lambda s, d: transcript.category_retry_loops(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N)),
        transcript.tool_dim(s),
        2,
    )
    q["transcript_latency_pctl"] = lambda s, d: transcript.latency_percentiles(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    q["transcript_conv_outcomes"] = lambda s, d: transcript.conv_outcomes(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    # frequent length-3 tool-call chains (k-gram mining of the call
    # stream — "what multi-step procedures do agents actually run")
    q["transcript_tool_paths"] = lambda s, d: transcript.tool_paths(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    # compute-waste attribution: latency burned by non-OK calls per tool
    q["transcript_wasted_latency"] = lambda s, d: transcript.wasted_latency(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    # idle-gap re-sessionization: split long conv_ids into episodes at
    # >gap_s silences (synth turn deltas are 30s ± md5 jitter, i.e.
    # 8-52s, so the 40s cut genuinely splits inside conversations)
    q["conv_split_episodes"] = lambda s, d: convops.split_conversations(
        convops.synth_conv(s, _CONV_N), gap_s=40
    ).withColumn("ts_epoch", F.unix_timestamp("ts")).drop("ts")
    # per-episode rollup: the natural SFT-example boundary for
    # long-running agents (composes on the splitter's one exchange)
    q["conv_episode_stats"] = lambda s, d: convops.episode_stats(
        convops.synth_conv(s, _CONV_N), gap_s=40
    )
    q["transcript_tool_cooccur"] = lambda s, d: transcript.tool_cooccurrence(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    q["transcript_templates"] = lambda s, d: transcript.turn_templates(
        transcript.synth_transcript(s, _CONV_N), 3
    )
    # round-5 reliability analytics over the parsed call stream: outcome
    # flap rate (flaky-vs-down triage), SLO error-budget burn per hour,
    # latency percentiles split by outcome, and did-the-retry-help
    # failure-cascade lift + failure-rate-by-depth curve (round-5 late)
    q["transcript_handoff_outcomes"] = lambda s, d: transcript.handoff_outcomes(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    q["transcript_error_cascade"] = lambda s, d: transcript.error_cascade(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    q["conv_outcome_by_depth"] = lambda s, d: transcript.outcome_by_depth(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    q["transcript_status_flaps"] = lambda s, d: transcript.status_flaps(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    q["transcript_slo_burn"] = lambda s, d: transcript.slo_burn(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N)), 800
    )
    q["transcript_latency_by_status"] = lambda s, d: transcript.latency_by_status(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    q["transcript_retry_recovery"] = lambda s, d: transcript.retry_recovery(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    # user-perceived responsiveness (user→assistant turn gap percentiles,
    # value-histogram exact nearest-rank) and the batch twin of the
    # streaming per-conversation session stats
    q["transcript_response_gap"] = lambda s, d: transcript.response_gap(
        convops.synth_conv(s, _CONV_N)
    )
    q["conv_session_stats"] = lambda s, d: transcript.session_stats(
        convops.synth_conv(s, _CONV_N), gap_seconds=40
    )
    # hourly concurrent-conversation occupancy (interval-overlap count)
    q["conv_concurrency"] = lambda s, d: transcript.conv_concurrency(
        convops.synth_conv(s, _CONV_N)
    )
    # JSONL-delivered transcripts (sources/jsonl.py): the grok pipeline's
    # route fan-out over the committed fixture, plus the source-grain
    # reject channel (bad_json / missing_identity)
    q["jsonl_route_counts"] = lambda s, d: transcript.route_counts(
        transcript.parse_turns(_jsonl_rows(s))
    )
    q["jsonl_rejects"] = lambda s, d: _jsonl_rejects(s)

    # tokenizer-vocab primitives (functions/textstats.py)
    q["text_vocab"] = lambda s, d: textstats.vocab_build(_t(s, d, "documents"), 5)
    q["text_vocab_coverage"] = lambda s, d: textstats.vocab_coverage(
        _t(s, d, "documents"), 5
    )
    q["conv_sft_pairs"] = lambda s, d: convops.sft_pairs(
        convops.synth_conv(s, _CONV_N)
    )
    q["sample_weighted"] = lambda s, d: sampling.weighted_sample(
        _t(s, d, "documents").withColumn(
            "w", F.length("text").cast("double")
        ),
        10,
        "w",
        "doc_id",
        group_col="source",
        salt="ws",
    ).select("doc_id", "source", "wsample_rank")

    # conversation-grain duplication / curation (synth_conv_dup injects
    # template-copied conversations: exact + one-word-mutated near-dups)
    q["conv_dedup_pairs"] = lambda s, d: dedup.lsh_jaccard(
        convops.conv_reconstruct(convops.synth_conv_dup(s, _CONV_DUP_N)),
        id_col="conv_id",
        text_col="transcript",
    )
    q["conv_boilerplate"] = lambda s, d: convops.boilerplate_turns(
        convops.synth_conv_dup(s, _CONV_DUP_N)
    )
    # branch-point detection over the dup-injecting corpus (template
    # copies share full prefixes; mutants diverge at their mutated turn)
    q["conv_prefix_groups"] = lambda s, d: convops.prefix_groups(
        convops.synth_conv_dup(s, _CONV_DUP_N)
    )
    q["conv_pref_pairs"] = lambda s, d: convops.pref_pairs(
        convops.synth_conv_dup(s, _CONV_DUP_N)
    )

    # BM25 ranked retrieval (fixed-point Okapi scoring, log-free RSJ idf)
    q["text_bm25_topk"] = lambda s, d: textstats.bm25_topk(
        _t(s, d, "documents"), _BM25_TERMS, 20
    )

    # cross-source contamination matrix (shingle-set Jaccard per pair)
    q["source_overlap"] = lambda s, d: dedup.source_overlap_matrix(
        _t(s, d, "documents")
    )

    # conversation-grain decontamination: hold out every 19th
    # conversation as the "benchmark" set; template copies of held-out
    # conversations in the training split get flagged (dup generator)
    def _conv_decontaminate(s: SparkSession, d: str) -> DataFrame:
        conv = convops.conv_reconstruct(convops.synth_conv_dup(s, _CONV_DUP_N)).select(
            "conv_id", "transcript"
        )
        num = F.substring("conv_id", 5, 12).cast("long")
        return textstats.ngram_contamination(
            conv.filter(num % 19 != 0),
            conv.filter(num % 19 == 0),
            id_col="conv_id",
            text_col="transcript",
        )

    q["conv_decontaminate"] = _conv_decontaminate

    # product quantization: encode + asymmetric-distance top-k (the
    # pseudo-codebook from the first 16 vectors, as ann_ivf's centroids)
    q["ann_pq_codes"] = lambda s, d: similarity.pq_encode(
        _t(s, d, "embeddings"), similarity.pq_codebook(_t(s, d, "embeddings"))
    )
    q["ann_pq_topk"] = lambda s, d: similarity.pq_topk(
        _t(s, d, "embeddings"),
        _t(s, d, "embeddings").filter(F.col("vec_id") < 8),
        similarity.pq_codebook(_t(s, d, "embeddings")),
        5,
    )

    # --- round-4 additions ---
    # exact-threshold similarity self-join (AllPairs/PPJoin prefix
    # filter): the no-false-negatives counterpart of the LSH path
    q["dedup_prefix_jaccard"] = lambda s, d: dedup.prefix_jaccard_pairs(
        _t(s, d, "documents"), threshold=0.5
    )
    # DSIR-style targeted data selection (hashed-feature importance
    # ratios; src0/src1 play the "looks like Wikipedia" target set)
    q["sample_importance"] = lambda s, d: sampling.importance_sample(
        _t(s, d, "documents").withColumn(
            "is_tgt", F.col("source").isin("src0", "src1")
        ),
        "is_tgt",
        15,
    )
    # BPE tokenizer training over the distinct-word vocabulary: the
    # learned merge table and the resulting subword token frequencies
    q["text_bpe_merges"] = lambda s, d: bpe.bpe_merges(_t(s, d, "documents"), 6)
    q["text_bpe_tokens"] = lambda s, d: bpe.bpe_token_counts(
        _t(s, d, "documents"), 6
    )

    # hybrid retrieval: reciprocal-rank fusion of the BM25 (sparse) and
    # embedding-cosine (dense, query vector 0) rankings — doc_id and
    # vec_id share the id space by testdata construction
    def _retrieval_rrf(s: SparkSession, d: str) -> DataFrame:
        sparse = textstats.bm25_topk(_t(s, d, "documents"), _BM25_TERMS, 20).select(
            "doc_id", "rank"
        )
        dense = similarity.brute_topk(
            _t(s, d, "embeddings"),
            _t(s, d, "embeddings").filter(F.col("vec_id") == 0),
            20,
        ).select(F.col("neighbor_id").alias("doc_id"), "rank")
        return similarity.rrf_fuse([sparse, dense], k0=60, k=10)

    q["retrieval_rrf"] = _retrieval_rrf

    # recall audit of the LSH path against prefix-join exact ground
    # truth at the same threshold (the sampled-block drift monitor)
    q["dedup_lsh_recall"] = lambda s, d: dedup.lsh_recall_report(
        _t(s, d, "documents"), threshold=0.5
    )

    # curriculum scheduling: quality-quantile phases (integer histogram
    # quantiles, no interpolation) + reproducible within-phase order
    q["sample_curriculum"] = lambda s, d: sampling.curriculum_order(
        textstats.quality_score(_t(s, d, "documents")).select("doc_id", "quality"),
        "quality",
        n_phases=4,
        salt="cur",
    )

    # dedup-aware loss reweighting: inverse-cluster-size ppm weights over
    # the resolved near-dup clusters (soft dedup — all copies kept, a
    # cluster's total training weight ≈ one document)
    q["dedup_cluster_weights"] = lambda s, d: dedup.cluster_weights(
        dedup.dup_clusters(
            _t(s, d, "documents").select("doc_id"),
            dedup.lsh_candidates(_t(s, d, "documents")),
        )
    )
    # character-grain verification of the LSH candidates: exact
    # Levenshtein (banded DP via the threshold arg) + fixed-point
    # normalized similarity — the precision stage after recall-oriented
    # banding
    q["dedup_pairs_editdist"] = lambda s, d: dedup.editdist_refine(
        _t(s, d, "documents"),
        dedup.lsh_candidates(_t(s, d, "documents")),
        max_dist=100,
    )
    # leakage-safe train/test split: hash key = dup-CLUSTER id, so near
    # duplicates can never straddle the eval boundary
    q["sample_split_leakage_safe"] = lambda s, d: sampling.leakage_safe_split(
        dedup.dup_clusters(
            _t(s, d, "documents").select("doc_id"),
            dedup.lsh_candidates(_t(s, d, "documents")),
        ),
        {"train": 0.9, "test": 0.1},
        salt="leak",
    )
    # deterministic JL sign-projection over the shared int8 quantization
    # (64 → 16 dims, pure integer, the shuffle-bandwidth lever for
    # candidate generation); vectors serialized like embed_quantize_int8
    q["embed_random_projection"] = lambda s, d: similarity.random_projection(
        _t(s, d, "embeddings"), out_dim=16, in_dim=64
    ).select(
        "vec_id",
        F.round("scale", 6).alias("rp_scale"),
        F.concat_ws(",", F.col("rp").cast("array<string>")).alias("rp_vec"),
    )
    # integer-exact PSI-style distribution drift between the two halves
    # of the events time range (corpus-snapshot drift check)
    q["profile_drift"] = lambda s, d: logops.histogram_drift(
        _t(s, d, "events"),
        "value",
        F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp"),
        0.0,
        100.0,
        10,
    )
    # k-NN label propagation: every 10th vector re-classified by the
    # majority label of its 5 nearest corpus neighbors (broadcast query
    # side, WindowGroupLimit top-k below the query_id exchange)
    q["embed_knn_classify"] = lambda s, d: similarity.knn_classify(
        _t(s, d, "embeddings"),
        _t(s, d, "embeddings").filter(F.col("vec_id") % 10 == 0),
        k=5,
    )
    # contrastive pair mining: nearest same-label positives + nearest
    # other-label hard negatives per anchor (triplet/InfoNCE batches)
    q["embed_hard_negatives"] = lambda s, d: similarity.hard_negative_pairs(
        _t(s, d, "embeddings"),
        _t(s, d, "embeddings").filter(F.col("vec_id") < 8),
        k=3,
    )
    # per-label OOD sweep: top-5 vectors farthest (exact fixed-point
    # squared L2) from their own label's centroid
    q["embed_centroid_outliers"] = lambda s, d: similarity.centroid_outliers(
        _t(s, d, "embeddings"), top_n=5, dims=64
    )
    # top principal component via fixed-point power iteration (ABTT axis)
    q["embed_pca_top"] = lambda s, d: similarity.pca_power(
        _t(s, d, "embeddings"), iters=6, dims=64
    )
    # ABTT whitening: fit the top component, remove it from every vector
    q["embed_whiten"] = lambda s, d: similarity.whiten_top_component(
        _t(s, d, "embeddings"),
        similarity.pca_power(_t(s, d, "embeddings"), iters=6, dims=64),
    )
    # class-balance datacard: per-label share + deviation from uniform
    q["embed_label_balance"] = lambda s, d: similarity.label_balance(
        _t(s, d, "embeddings")
    )
    # robust per-tool latency anomalies over a deterministically spiked
    # parse (every 97th epoch ×40 — the stuck-call tail a mean misses)
    q["transcript_latency_mad"] = lambda s, d: transcript.latency_mad_outliers(
        transcript.spike_latency(
            transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
        )
    )
    # per-tool percentile drift between the early and late half of the
    # observed time range — the post-deploy tool-regression report
    q["transcript_latency_drift"] = lambda s, d: transcript.latency_drift(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    # generation-loop sweep over conversations with injected echo loops
    q["conv_degenerate_runs"] = lambda s, d: convops.degenerate_runs(
        convops.synth_conv_degen(s, _CONV_N)
    )
    # repair companion of conv_integrity: dense 0-based turn_idx in
    # (ts, turn_idx, text) order over the corrupted generator
    q["conv_repair_order"] = lambda s, d: convops.repair_turn_order(
        convops.synth_conv_corrupt(s, _CONV_N)
    ).withColumn("ts_epoch", F.unix_timestamp("ts")).drop("ts")
    # the removal counterpart: rewrite the corpus keeping each collapsed
    # run's first turn, run_len recorded for downstream reweighting
    q["conv_collapse_runs"] = lambda s, d: convops.collapse_degenerate_runs(
        convops.synth_conv_degen(s, _CONV_N)
    ).withColumn("ts_epoch", F.unix_timestamp("ts")).drop("ts")
    # conversation packing into token-budget bins with SFT loss masks
    q["conv_pack_masks"] = lambda s, d: convops.pack_with_masks(
        convops.synth_conv(s, _CONV_N), budget_tokens=256, n_buckets=16
    )
    # sequence-integrity audit over deterministically corrupted
    # conversations (dropped turn 3 / duplicated turn 7 / 2h ts
    # regression at turn 11, keyed on conv_id md5)
    q["conv_integrity"] = lambda s, d: convops.conv_integrity(
        convops.synth_conv_corrupt(s, _CONV_N)
    )
    # context-budget truncation: maximal turn suffix fitting the budget,
    # final turn force-kept (the actionable twin of conv_context_growth)
    q["conv_truncate_context"] = lambda s, d: convops.truncate_context(
        convops.synth_conv(s, _CONV_N), budget_chars=200
    )
    # per-source quality calibration: integer within-source percentile,
    # the normalization run before any cross-source quota/mixture cut
    q["sample_calibrated"] = lambda s, d: sampling.calibrate_scores(
        textstats.quality_score(_t(s, d, "documents"), keep_cols=("source",)),
        "quality",
    )
    # power-of-two length-bucket batching report over reassembled
    # conversation token counts (padding-waste diagnostic)
    q["sample_length_buckets"] = lambda s, d: sampling.length_buckets(
        convops.conv_reconstruct(convops.synth_conv(s, _CONV_N)), "n_tokens"
    )
    # lang-ID heuristic audited against the labeled lang column (the
    # confusion relation + per-label recall shares)
    q["text_langid_confusion"] = lambda s, d: textstats.lang_id_confusion(
        _t(s, d, "documents")
    )
    # per-source bigram diversity + dominant-gram share (the synthetic
    # data mode-collapse audit)
    q["text_ngram_diversity"] = lambda s, d: textstats.ngram_diversity(
        _t(s, d, "documents")
    )
    # per-source hapax-legomena share: template-collapse vs OCR-noise
    # corpus health signal beside the Heaps-law vocab_growth curve
    # boilerplate-line report + removal over a deterministically
    # chrome-injected documents view (the raw corpus is single-line with
    # no repeated lines, so the detector would be vacuously 0-row)
    def _docs_chrome(s, d):
        return _t(s, d, "documents").select(
            "doc_id",
            F.expr(
                "concat(text,"
                " case when doc_id % 2 = 0 then concat(chr(10),"
                " 'Copyright Example Corp. All rights reserved.')"
                " else '' end,"
                " case when doc_id % 3 = 0 then concat(chr(10),"
                " 'Subscribe to our newsletter today') else '' end)"
            ).alias("text"),
        )

    q["text_boilerplate_lines"] = lambda s, d: textstats.boilerplate_lines(
        _docs_chrome(s, d)
    )
    q["text_boilerplate_clean"] = lambda s, d: textstats.boilerplate_clean(
        _docs_chrome(s, d)
    )
    # pairwise corpus-mixture drift between document sources (exact-
    # rational total-variation distance over unigram distributions)
    q["text_source_divergence"] = lambda s, d: textstats.source_divergence(
        _t(s, d, "documents")
    )
    # round-5 final batch: RFM grid + revenue-concentration curve over
    # orders, debounce / burstiness telemetry screens over events,
    # k-core peel on the skewed synthetic link graph, and the
    # conversation termination-hazard curve
    q["orders_rfm_segments"] = lambda s, d: logops.rfm_segments(
        _t(s, d, "orders")
    )
    q["orders_pareto_share"] = lambda s, d: logops.pareto_share(
        _t(s, d, "orders")
    )
    q["events_debounce"] = lambda s, d: logops.debounce_events(
        _t(s, d, "events")
    )
    q["events_burstiness"] = lambda s, d: logops.burstiness(
        _t(s, d, "events")
    )
    q["graph_kcore"] = lambda s, d: graph.kcore(
        graph.synth_links_skewed(s, 20_000, 1_000), k=12, rounds=6
    )
    q["transcript_abandon_hazard"] = lambda s, d: transcript.abandon_hazard(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    # local clustering coefficient over the skewed link graph (composes
    # the degree-ordered triangle counter)
    q["graph_clustering_coeff"] = lambda s, d: graph.clustering_coeff(
        graph.synth_links_skewed(s, 20_000, 1_000)
    )
    # equi-depth histogram boundaries of the event value column
    q["hist_equidepth_values"] = lambda s, d: logops.hist_equidepth(
        _t(s, d, "events")
    )
    # fulfilment-SLA attainment by order priority (orders ⋈ lineitem)
    q["orders_ship_sla"] = lambda s, d: logops.ship_sla(
        _t(s, d, "orders"), _t(s, d, "lineitem")
    )
    # diurnal-aware rate anomaly screen (same-hour-of-day baseline)
    q["events_seasonal_spikes"] = lambda s, d: logops.seasonal_spikes(
        _t(s, d, "events")
    )
    # Benford first-digit audit of order amounts
    q["orders_benford"] = lambda s, d: logops.benford_screen(
        _t(s, d, "orders")
    )
    # per-source robust doc-length screen (round-5 late)
    q["text_length_outliers"] = lambda s, d: textstats.length_outliers(
        _t(s, d, "documents")
    )
    q["text_hapax_rate"] = lambda s, d: textstats.hapax_rate(
        _t(s, d, "documents")
    )
    # per-source duplication rate over the LSH candidate pairs
    q["dedup_rate_by_source"] = lambda s, d: dedup.dup_rate_by_source(
        _t(s, d, "documents"),
        dedup.lsh_candidates(_t(s, d, "documents")),
    )
    # vocabulary drift: coverage of the odd-doc_id "new crawl" under the
    # vocab built on the even-doc_id "old crawl" + frequent-OOV count
    q["text_vocab_drift"] = lambda s, d: textstats.vocab_drift(
        _t(s, d, "documents").filter(F.col("doc_id") % 2 == 0),
        _t(s, d, "documents").filter(F.col("doc_id") % 2 == 1),
        min_count=3,
    )
    # shuffle-plan advisor: per-hot-key salt factors for a prospective
    # user_id shuffle (wide 50 KB rows against a 1 MiB partition target
    # so the sf0.01 fixture produces hot keys)
    q["profile_shuffle_plan"] = lambda s, d: logops.shuffle_plan(
        _t(s, d, "events"), "user_id", row_bytes=50_000, target_mb=1
    )
    # embedding-space drift: per-label L1 centroid shift between the
    # even/odd vec_id halves played as periods a/b
    q["embed_centroid_shift"] = lambda s, d: similarity.centroid_shift(
        _t(s, d, "embeddings").withColumn(
            "period", F.when(F.col("vec_id") % 2 == 0, "a").otherwise("b")
        ),
        "period",
    )
    # freshness step-decay sampling weights over event timestamps
    # (fixed now_epoch literal — determinism forbids wall-clock reads)
    q["sample_recency_weights"] = lambda s, d: sampling.recency_weights(
        _t(s, d, "events").select("event_id", "ts"),
        "ts",
        now_epoch=1_800_000_000,
        half_life_days=30,
    ).select("event_id", "age_days", "weight_ppm")
    # byte-balanced contiguous export shards via the two-pass distributed
    # prefix sum (never a single-task global-order window)
    q["sample_shard_manifest"] = lambda s, d: sampling.shard_by_bytes(
        _t(s, d, "documents"), 8, "doc_id", "n_chars"
    )
    # mergeable log-bucket quantile sketch over per-tool latencies —
    # the O(sketch) companion of the exact transcript_latency_pctl
    q["sketch_hdr_latency"] = lambda s, d: sketches.hdr_percentiles(
        sketches.hdr_histogram(
            transcript.parse_turns(transcript.synth_transcript(s, _CONV_N)),
            "latency_ms",
            "tool_called",
        ),
        (50, 90, 99),
        "tool_called",
    )

    # sketch-vs-exact accuracy audit: the HDR estimate joined against the
    # exact nearest-rank percentile; err_ppm must respect the documented
    # <2^-s relative-error contract (bucketing is monotone, so the
    # sketch's rank-selected bucket IS the exact percentile's bucket)
    def _sketch_hdr_accuracy(s, d):
        parsed = transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
        est = sketches.hdr_percentiles(
            sketches.hdr_histogram(parsed, "latency_ms", "tool_called"),
            (50, 90, 99),
            "tool_called",
        ).withColumnRenamed("tool_called", "tool")
        exact = transcript.latency_percentiles(parsed)
        return est.join(exact, ["tool", "p"]).select(
            "tool",
            "p",
            "value_lb",
            "latency_p_ms",
            F.expr(
                "((latency_p_ms - value_lb) * 1000000L) div latency_p_ms"
            ).alias("err_ppm"),
        )

    q["sketch_hdr_accuracy"] = _sketch_hdr_accuracy
    # semantic eval decontamination: every 17th vector plays the eval
    # benchmark; corpus rows whose LSH-bucket cosine reaches 0.15 are
    # flagged with their strongest eval match (6 planes: the synthetic
    # embeddings are near-orthogonal, so a 12-plane bucketing yields no
    # collisions at this SF — recall/precision here is a contract knob)
    q["embed_decontaminate"] = lambda s, d: similarity.decontaminate_embeddings(
        _t(s, d, "embeddings").filter(F.col("vec_id") % 17 != 0),
        _t(s, d, "embeddings").filter(F.col("vec_id") % 17 == 0),
        threshold=0.15,
        n_planes=6,
    )
    # exact duplicated-substring spans (Lee et al. char-grain dedup):
    # every 24-char window occurring ≥2× in the corpus, merged into
    # maximal per-doc removal intervals — no document pairing anywhere
    q["dedup_substring_spans"] = lambda s, d: dedup.exact_substring_spans(
        _t(s, d, "documents"), k=24, stride=1, min_count=2
    )
    # per-source token-budget selection: highest-quality prefix whose
    # running token total stays ≤ 800 (composes quality_score upstream)
    q["sample_token_budget"] = lambda s, d: sampling.token_budget_select(
        textstats.quality_score(_t(s, d, "documents"), keep_cols=("source",)),
        budget=800,
    )
    # heaps-law vocabulary-growth curve at doc-id checkpoints
    q["text_vocab_growth"] = lambda s, d: textstats.vocab_growth(
        _t(s, d, "documents")
    )
    # fixed-point discounted trajectory returns (γ=1/2, horizon 8) over
    # the parsed tool-call stream — RL credit assignment at scale
    q["transcript_returns"] = lambda s, d: transcript.trajectory_returns(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N)), horizon=8
    )
    # per-source duplicated-character rate from the exact-substring spans
    q["dedup_substring_rate"] = lambda s, d: dedup.substring_dup_rate(
        _t(s, d, "documents"), k=24, stride=1, min_count=2
    )
    # deterministic per-epoch reshuffle + shard assignment (no global sort)
    q["sample_epoch_shuffle"] = lambda s, d: sampling.epoch_shuffle(
        _t(s, d, "documents"), epochs=2, n_shards=4
    )
    # GRPO-style group-relative advantages: integer adv_num = r·n − Σr
    # over conversations grouped by their first tool call
    q["transcript_grpo_adv"] = lambda s, d: transcript.group_advantages(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N))
    )
    # Matryoshka-truncation audit: recall@5 of 16-dim-prefix cosine
    # search vs full 64-dim ground truth on the same query block
    def _embed_matryoshka_recall(s, d):
        emb = _t(s, d, "embeddings")
        return similarity.matryoshka_recall(
            emb, emb.filter(F.col("vec_id") < 8), k=5, dims=16
        )

    q["embed_matryoshka_recall"] = _embed_matryoshka_recall
    # asymmetric shingle containment over the LSH candidates — the
    # excerpt/quote detector Jaccard dilutes
    q["dedup_containment"] = lambda s, d: dedup.lsh_containment(
        _t(s, d, "documents"), min_containment_ppm=400_000
    )
    # dup-cluster size distribution (corpus-health view of the resolution)
    q["dedup_cluster_sizes"] = lambda s, d: dedup.cluster_size_histogram(
        dedup.dup_clusters(
            _t(s, d, "documents").select("doc_id"),
            dedup.lsh_candidates(_t(s, d, "documents")),
        )
    )
    # BM25 ranked retrieval judged against the exact conjunctive match
    # set: recall/precision@k + fixed-point reciprocal rank
    q["text_retrieval_eval"] = lambda s, d: textstats.retrieval_effectiveness(
        _t(s, d, "documents"), _BM25_TERMS, 20
    )
    # the removal step: rewrite docs with every flagged char range cut
    q["dedup_substring_clean"] = lambda s, d: dedup.apply_substring_removal(
        _t(s, d, "documents"),
        dedup.exact_substring_spans(
            _t(s, d, "documents"), k=24, stride=1, min_count=2
        ),
    )
    # collocation / phrase-candidate mining: word2phrase score +
    # Dice over word bigrams (integer fixed point, top-50)
    q["text_collocations"] = lambda s, d: textstats.collocations(
        _t(s, d, "documents"), min_count=3, top_n=50
    )
    # exact-phrase search over the positional explode (adjacency
    # upgrade of text_search_and; IN-filtered before any shuffle)
    q["text_phrase_search"] = lambda s, d: textstats.phrase_search(
        _t(s, d, "documents"), "stream table hash"
    )
    # synchronous label-propagation communities (deterministic
    # tie-break, 4 fixed rounds) over the pagerank link relation
    q["graph_communities"] = lambda s, d: graph.label_propagation(
        graph.synth_links(s, 20_000, 1_000), iters=4
    )
    # power-of-two degree-distribution report over the SKEWED link
    # relation (the graph-health audit before join/skew strategy)
    q["graph_degree_stats"] = lambda s, d: graph.degree_histogram(
        graph.synth_links_skewed(s, 20_000, 1_000)
    )
    # per-category tool-concentration HHI (log-free diversity audit)
    q["transcript_tool_hhi"] = lambda s, d: transcript.tool_concentration(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N)),
        transcript.tool_dim(s),
    )
    # per-source corpus data card (volume + language spread + HHI —
    # the one-relation health summary before mixture weighting)
    q["corpus_datacard"] = lambda s, d: textstats.corpus_datacard(
        _t(s, d, "documents")
    )
    # stationary distribution of the tool-invocation Markov chain
    # (integer power iteration on the dimension-sized transition relation)
    q["transcript_tool_stationary"] = lambda s, d: transcript.tool_stationary(
        transcript.parse_turns(transcript.synth_transcript(s, _CONV_N)),
        iters=8,
    )
    # directed BFS distance labeling from a trusted seed set (sparser
    # graph so levels actually spread before the frontier saturates)
    q["graph_bfs_levels"] = lambda s, d: graph.bfs_levels(
        graph.synth_links(s, 5_000, 2_000), [0, 1], max_depth=4
    )
    # per-domain URL provenance audit (which domains dominate the
    # corpus) — URLs synthesized deterministically onto the documents
    # so the extraction path is genuinely exercised on both engines
    q["text_url_domains"] = lambda s, d: textstats.url_domain_stats(
        _t(s, d, "documents").select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" http://site"),
                (F.col("doc_id") % 97).cast("string"),
                F.lit(".example"),
                F.when(F.col("doc_id") % 3 == 0, F.lit(".com")).otherwise(
                    F.lit(".org")
                ),
                F.lit("/p"),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.concat(
                        F.lit(" https://Mirror"),
                        (F.col("doc_id") % 97).cast("string"),
                        F.lit(".example.org/q"),
                    ),
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
    )
    # threshold-sweep precision/recall curve for a keep/drop filter
    # (score = n_chars, label = is-English — the audit run before
    # committing a quality cutoff; distinct-score-grain relation)
    q["quality_pr_curve"] = lambda s, d: classify.pr_curve(
        _t(s, d, "documents").select(
            F.col("n_chars").alias("score"),
            (F.col("lang") == "en").cast("int").alias("label"),
        ),
        "score",
        "label",
    )
    return q


def _tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    dec = lambda c: F.col(c).cast("decimal(20,6)")  # noqa: E731
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def _tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("l_orderkey").asc())
        .limit(10)
    )


def _tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional revenue: 5-way join with broadcast dims; the join graph
    Catalyst reorders freely because it is declared, not scheduled."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


def _tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(25,10)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.02, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations: 6-way join with the two
    nation aliases resolved independently (supplier's vs customer's),
    grouped by flow direction and ship year. supplier/nation are
    broadcast; the disjunctive nation-pair filter sits above the joins
    where Catalyst can still push each side's half down."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


def _tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting: revenue lost to returns per customer over
    one quarter, top 20. The order-date filter prunes orders before the
    join; TakeOrderedAndProject caps the result without a global sort."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("c_custkey").asc())
        .limit(20)
    )


def _tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share over one month: conditional aggregate over a
    broadcast part join. The share is integer fixed-point over exact
    cent sums ((promo_cents·10⁶) DIV total_cents → ×10⁴ per cent) —
    engine-identical floor semantics, no double division drift."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0).cast("decimal(25,10)"))
    cents = lambda col: (F.round(F.sum(col), 2) * 100).cast("long")  # noqa: E731
    agg = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).agg(
        cents(promo).alias("_pc"), cents(revenue).alias("_tc")
    )
    return agg.select(
        (F.col("_pc").cast("double") / 100).alias("promo_revenue"),
        (F.col("_tc").cast("double") / 100).alias("total_revenue"),
        (
            F.expr("(_pc * 1000000) DIV _tc").cast("long") / F.lit(10000.0)
        ).alias("promo_share_pct"),
    )


def _tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), adapted to the driver schema:
    orders in a quarter with at least one line shipped AFTER the order
    date (the testdata has no commit/receipt dates), counted per
    priority. The EXISTS is a LEFT SEMI join — the probe side never
    widens, no duplicate-orderkey blow-up, distinct-free."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def _tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join so
    zero-order customers survive, two-level aggregate (per-customer
    count, then histogram). The priority filter stands in for the
    original comment-pattern exclusion (no o_comment column)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def _tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: customers with an
    above-average positive balance and no LARGE order (>300k — plain
    "no orders" is empty on this data), grouped by nation (no phone
    column → c_nationkey is the country code). Plan pattern: the scalar
    AVG subquery enters as a broadcast 1-row cross join (no driver
    collect), the no-large-orders test is a LEFT ANTI join with the
    selective filter pushed below it; the threshold compare runs in
    integer cents (DIV avg) so both engines agree exactly."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )
    cents = (F.col("c_acctbal").cast("decimal(20,6)") * 100).cast("long")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents).alias("_sc"), F.count(F.lit(1)).alias("_n")
    ).select(F.expr("_sc DIV _n").alias("avg_cents"))
    return (
        c.withColumn("_cents", cents)
        .crossJoin(F.broadcast(pos))
        .filter(F.col("_cents") > F.col("avg_cents"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("_cents").cast("double") / 100).alias("totacctbal"),
        )
    )


def _tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: HAVING-filtered per-order quantity rollup
    joined back to orders/customer. The heavy aggregate runs FIRST and
    its survivors (few) drive the joins — orders/customer probe a small
    build side instead of the reverse."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(20,6)")), 2).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.col("o_totalprice").cast("decimal(20,6)"), 2).cast("double").alias("totalprice"),
            "sum_qty",
        )
    )


def _tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-predicate revenue (q19 shape, adapted to the trimmed
    part schema): OR-of-ANDs across brand/size/quantity bands. The
    disjunction references both join sides, so it evaluates as the
    broadcast-hash-join's post-condition — one scan each side, no
    fallback to NLJ (the equi-key l_partkey = p_partkey still drives
    the join)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 5) & q.between(20, 30))
    )
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _orders_without_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left ANTI join: orders with no lineitems, counted per priority."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def _big_spender_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left SEMI join: customers having ≥1 order over 400k, per segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def _rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus); subtotal rows keyed 'ALL'."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


def _pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, one column per known event type."""
    ev = _t(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", list(logops.KNOWN_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in logops.KNOWN_EVENT_TYPES],
    )


def _moving_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving window over daily order counts per priority; sum and
    count kept integral (exact), avg derived by one double division."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("o_orderpriority").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "o_orderpriority",
        "day",
        "n",
        F.sum("n").over(w).alias("mv_sum"),
        F.round(
            F.sum("n").over(w).cast("double") / F.count("n").over(w).cast("double"), 4
        ).alias("mv_avg"),
    )


def _dedup_ngram_jaccard_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs n-gram Jaccard — the correctness baseline, capped
    to a fixed-size doc_id block (constant work at any SF; the scale path
    is dedup_lsh_jaccard)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    pairs = (
        docs.select(F.col("doc_id").alias("id_a"))
        .join(docs.select(F.col("doc_id").alias("id_b")), F.col("id_a") < F.col("id_b"))
    )
    return dedup.jaccard_pairs(docs, pairs, threshold=0.0)


def _dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest dedup: the corpus minus every 5th doc is the
    already-indexed history, docs with doc_id % 5 == 0 are the arriving
    batch. Matches are LSH band collisions scored by the signature-
    estimated Jaccard. In production the history side is the persisted
    index table (its text is never re-read); here both sides derive from
    one MinHash pass over the driver table, split by id — signatures are
    per-row deterministic so the split equals two separate builds while
    scanning + shingling the text once instead of twice."""
    docs = _t(spark, sf_dir, "documents")
    sig = dedup.signature_index(docs).persist()
    old_sig = sig.filter(F.col("doc_id") % 5 != 0)
    new_sig = sig.filter(F.col("doc_id") % 5 == 0)
    return dedup.incremental_dedup(
        None, old_sig, threshold=0.25, new_sig=new_sig
    )


def _compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rewrite-bin assignment for a synthetic file listing derived from
    events (one 'file' per (event_type, user_id), 128 B per row) —
    exercises the per-partition cumulative-size binning of
    layout.plan_compaction on driver tables."""
    files = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg((F.count("*") * 128).alias("bytes"))
        .select(
            "event_type",
            F.concat_ws("/", "event_type", "user_id").alias("file"),
            "bytes",
        )
    )
    return layout.plan_compaction(
        files, partition_cols=["event_type"], target_bytes=4096
    )


def _embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    qdf = similarity.quantize_int8(_t(spark, sf_dir, "embeddings"))
    return qdf.select(
        "vec_id",
        F.round("scale", 6).alias("q_scale"),
        F.concat_ws(",", F.col("q").cast("array<string>")).alias("q_vec"),
        "qnorm2",
    )


def _embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    v = similarity.as_double(F.col("embedding"))
    return e.select("vec_id", F.round(similarity.l2_norm(v), 4).alias("l2_norm"))


def _quality_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing quota: keep the 5 highest-quality docs per source."""
    docs = _t(spark, sf_dir, "documents")
    scored = textstats.quality_score(docs, keep_cols=("source",))
    return sampling.quality_quota(scored, "source", "quality", 5, "doc_id").select(
        "source", "doc_id", "quality", "quota_rank"
    )


def _freq_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates for every distinct user_id, alongside
    the exact count (est >= exact always; equality except on md5-bucket
    collisions — both engines reproduce the same collisions)."""
    ev = _t(spark, sf_dir, "events")
    cms = sketches.cms_build(ev, "user_id")
    est = sketches.cms_estimate(cms, ev.select("user_id").distinct(), "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    return est.join(exact, "user_id").select("user_id", "cms_count", "exact_count")


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 19 == 0 act as the
    held-out eval suite; every other doc reports its 3-gram overlap."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    train = docs.filter(F.col("doc_id") % 19 != 0)
    return textstats.ngram_contamination(train, bench, n=3, threshold=5)


def _asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the latest order at-or-before its
    timestamp for the same user (null when none). Single-shuffle
    union-merge plan — see functions/joins.py."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = joins.asof_join(
        ev,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        tie_col="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.col("o_totalprice").alias("totalprice"),
    )


def _asof_last_order_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics via the hot-key-safe bucketed plan (90-day
    buckets): per-key work splits across time buckets, so the result must
    be identical to asof_last_order — same DuckDB oracle."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = joins.asof_join_bucketed(
        ev,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        tie_col="o_orderkey",
        bucket_seconds=90 * 86400,
    )
    return out.select(
        "event_id",
        "user_id",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.col("o_totalprice").alias("totalprice"),
    )


def _hll_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-HLL distinct estimate for event_id next to the exact
    count — the one-sided sketch error is driver-visible, like
    freq_cms_users. Integer fixed-point estimate (sketches.hll_estimate);
    the oracle mirrors the whole construction in HUGEINT."""
    ev = _t(spark, sf_dir, "events")
    est = sketches.hll_estimate(sketches.hll_registers(ev, "event_id"))
    exact = ev.agg(F.countDistinct("event_id").alias("exact_distinct"))
    return est.crossJoin(exact)


def _bloom_probe_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast Bloom-filter join pruning: build over every third
    customer key, probe all distinct event user_ids → (user_id,
    maybe_member). No false negatives; md5-determined false positives
    reproduce identically in the oracle."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    bloom = sketches.bloom_build(cust, "c_custkey")
    keys = _t(spark, sf_dir, "events").select("user_id").distinct()
    return sketches.bloom_probe(bloom, keys, "user_id")


def _cdc_apply_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE: apply a two-epoch synthetic changelog to the customer
    snapshot — epoch-1 updates every third key, epoch-2 deletes every
    sixth (so a later D beats an earlier U on the same key); untouched
    keys pass through. logops.apply_changelog = one window shuffle."""
    base = _t(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    c1 = (
        base.filter(F.col("c_custkey") % 3 == 0)
        .select(
            "c_custkey",
            F.concat(F.col("c_name"), F.lit("_v1")).alias("c_name"),
            "c_nationkey", "c_acctbal", "c_mktsegment",
        )
        .withColumn("op", F.lit("U"))
        .withColumn("ver", F.lit(1))
    )
    c2 = (
        base.filter(F.col("c_custkey") % 6 == 0)
        .select(*cols)
        .withColumn("op", F.lit("D"))
        .withColumn("ver", F.lit(2))
    )
    return logops.apply_changelog(
        base.select(*cols),
        c1.unionByName(c2),
        key_cols=["c_custkey"],
        version_col="ver",
        tie_col="c_custkey",
    )


def _tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 adapted to the driver schema (PROMO parts, EUROPE
    customers, supplier-nation market share by order year). Share uses
    the repo's exact-cents integer fixed point (same recipe as q14)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    vol = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    base = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("vol"), "supp_nation")
    )
    nat = F.when(F.col("supp_nation") == "NATION_7", F.col("vol")).otherwise(
        F.lit(0).cast("decimal(25,10)")
    )
    cents = lambda col: (F.round(F.sum(col), 2) * 100).cast("long")  # noqa: E731
    return (
        base.groupBy("o_year")
        .agg(cents(nat).alias("_nc"), cents(F.col("vol")).alias("_tc"))
        .select(
            "o_year",
            (F.expr("(_nc * 1000000) DIV _tc").cast("long") / F.lit(10000.0)).alias(
                "mkt_share_pct"
            ),
            (F.col("_tc").cast("double") / 100).alias("total_volume"),
        )
    )


def _tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 adapted (no partsupp table → profit = discounted
    revenue): profit by supplier nation and order year for parts whose
    name contains 'widget'."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


def _tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 adapted (no l_shipmode → group by l_returnflag):
    priority mix of 1997 shipments per return flag."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def _tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 (top supplier): revenue view over one quarter, suppliers
    at the exact maximum. Revenue in exact cents (bigint) so the max
    equality is engine-exact; reported as double for display."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    revenue = l.groupBy("l_suppkey").agg(
        (F.round(F.sum(rev), 2) * 100).cast("long").alias("_rc")
    )
    mx = revenue.agg(F.max("_rc").alias("_mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("_rc") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            (F.col("_rc").cast("double") / 100).alias("total_revenue"),
        )
    )


def _tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 (small-quantity-order revenue), integer-exact: the
    `l_quantity < 0.2 * avg(l_quantity)` predicate becomes
    `5 * qty * cnt < sum_qty` over integral quantities — no float
    boundary drift between engines."""
    l = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    per_part = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(per_part), F.col("l_partkey") == F.col("a_partkey"))
        .filter(
            F.lit(5) * F.col("l_quantity").cast("long") * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(25,10)")), 2)
            .cast("double")
            .alias("total_extended_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _line_cents() -> F.Column:
    """Exact per-line extendedprice in integer cents (engine-identical)."""
    return F.round(
        F.col("l_extendedprice").cast("decimal(25,10)") * 100, 0
    ).cast("long")


_LINE_CENTS_SQL = (
    "CAST(round(CAST(l_extendedprice AS DECIMAL(25,10)) * 100, 0) AS BIGINT)"
)


def _tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 adapted (no partsupp table → lineitem is the
    part-supplier offer relation; supply cost = min line price in exact
    cents): for LARGE parts of size ≤ 15, the EUROPE supplier(s) at the
    exact per-part minimum cost, with supplier/nation detail. The
    min-equality join is on integer cents so the tie set is
    engine-exact (same trick as q15)."""
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_brand")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    eur = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    offers = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "n_name")
        .agg(F.min(_line_cents()).alias("cost_cents"))
    )
    best = offers.groupBy(F.col("p_partkey").alias("_bp")).agg(
        F.min("cost_cents").alias("_best")
    )
    return (
        offers.join(
            F.broadcast(best),
            (F.col("p_partkey") == F.col("_bp"))
            & (F.col("cost_cents") == F.col("_best")),
        )
        .select(
            "p_partkey", "p_brand", "s_suppkey", "s_name", "n_name",
            (F.col("cost_cents").cast("double") / 100).alias("supply_cost"),
        )
    )


def _tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 adapted (no partsupp → per-part inventory value = exact
    cents of NATION_7 suppliers' line revenue); keep parts whose value
    exceeds 2× the per-part average via BIGINT cross-multiply
    (``value * n_parts > 2 * total`` — no float fraction, and unlike the
    original's fixed fraction it stays non-vacuous at every scale
    factor). Totals stay < 2^63/n_parts at real scale; beyond that the
    cross-multiply moves to decimal(38,0) like pagerank's guard."""
    n7 = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s7 = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n7), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    v = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(s7), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_line_cents()).alias("value_cents"))
    )
    tot = v.agg(
        F.sum("value_cents").alias("_total"), F.count(F.lit(1)).alias("_np")
    )
    return (
        v.join(
            F.broadcast(tot),
            F.col("value_cents") * F.col("_np") > F.lit(2) * F.col("_total"),
        )
        .select(
            "p_partkey",
            (F.col("value_cents").cast("double") / 100).alias("part_value"),
        )
    )


def _tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 adapted: distinct-supplier counts per (brand, type,
    size) over the lineitem part-supplier relation, excluding Brand#23,
    PROMO types, and 'complaint' suppliers (s_acctbal < 0 stands in for
    the name-pattern complaint filter). Anti-join for the exclusion,
    broadcast both dims."""
    sizes = (1, 9, 14, 19, 23, 36, 45, 49)
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#23")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(*sizes)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def _tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 adapted (no partsupp/availqty → threshold on shipped
    quantity): EUROPE suppliers who shipped more than 300 total quantity
    of widget parts during 1996. Quantities are integral in this corpus,
    summed as BIGINT — the > threshold is exact."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey")
    )
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    eur = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    return shipped.join(
        F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "n_name", "total_qty")


def _tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 adapted (no commit/receipt dates → l_returnflag='R' is
    the kept-waiting signal): over finished ('F') multi-supplier orders
    where EXACTLY ONE supplier has a returned line, charge that supplier
    one wait. The original's exists / not-exists correlated subqueries
    collapse into one per-order aggregate (distinct suppliers, distinct
    returned suppliers, and — valid only when that count is 1 — the
    returned supplier itself), so the whole query is two shuffles."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    is_r = F.col("l_returnflag") == "R"
    per_order = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(is_r, F.col("l_suppkey"))).alias("n_r_supp"),
            F.max(F.when(is_r, F.col("l_suppkey"))).alias("wait_suppkey"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.groupBy("wait_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(s), F.col("wait_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


def _range_order_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: per order, how many other orders the same
    customer placed within ±30 days."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    out = joins.range_join_count(
        orders, key="o_custkey", id_col="o_orderkey", ts_col="o_orderdate",
        band_seconds=30 * 86400,
    )
    return out.select("o_orderkey", "n_nearby")


# --------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["route_counts"] = f"""
        SELECT event_type, count(*) AS n_records FROM events
        WHERE event_type IN ({_KNOWN}) GROUP BY event_type
    """
    o["route_rejects"] = f"""
        SELECT event_type, count(*) AS n_records FROM events
        WHERE event_type NOT IN ({_KNOWN}) GROUP BY event_type
    """
    o["parse_props"] = """
        WITH p AS (
          SELECT event_type,
                 CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k
          FROM events
          WHERE regexp_extract(props, '"k": (\\d+)', 1) <> ''
        )
        SELECT event_type, count(*) AS n_parsed,
               CAST(sum(k) AS BIGINT) AS sum_k,
               min(k) AS min_k, max(k) AS max_k
        FROM p GROUP BY event_type
    """
    o["enrich_events"] = """
        SELECT c.c_mktsegment AS mktsegment, e.event_type,
               count(*) AS n_events,
               CAST(round(sum(CAST(e.value AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_value
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
    """
    o["distinct_users"] = """
        SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        FROM events GROUP BY event_type
    """
    o["topk_users"] = """
        WITH c AS (SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2),
        r AS (SELECT event_type, user_id, n,
                     row_number() OVER (PARTITION BY event_type ORDER BY n DESC, user_id ASC) AS rk
              FROM c)
        SELECT event_type, user_id, n, CAST(rk AS INT) AS rank FROM r WHERE rk <= 5
    """
    o["time_buckets"] = """
        SELECT event_type,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """
    o["funnel_steps"] = """
        WITH s0 AS (SELECT user_id, min(epoch_us(ts)) AS t0
                    FROM events WHERE event_type = 'view' GROUP BY 1),
        s1 AS (SELECT s0.user_id, s0.t0,
                      min(CASE WHEN e.event_type = 'click'
                                AND epoch_us(e.ts) > s0.t0
                               THEN epoch_us(e.ts) END) AS t1
               FROM s0 LEFT JOIN events e ON e.user_id = s0.user_id
               GROUP BY 1, 2),
        s2 AS (SELECT s1.user_id, s1.t0, s1.t1,
                      min(CASE WHEN e.event_type = 'purchase'
                                AND s1.t1 IS NOT NULL
                                AND epoch_us(e.ts) > s1.t1
                               THEN epoch_us(e.ts) END) AS t2
               FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id
               GROUP BY 1, 2, 3)
        SELECT user_id, t0 AS t_view, t1 AS t_click, t2 AS t_purchase,
               CAST(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS INT)
                 AS furthest_stage
        FROM s2
    """
    o["events_session_paths"] = logops.session_paths_sql()
    o["orders_cohort_ltv"] = logops.cohort_ltv_sql()
    o["events_stickiness"] = logops.stickiness_sql()
    o["orders_reorder_gap"] = logops.reorder_gap_sql()
    o["orders_basket_pairs"] = logops.basket_pairs_sql()
    o["funnel_latency"] = logops.funnel_latency_sql()
    o["rate_spikes"] = """
        WITH c AS (SELECT event_type,
                          strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                            AS bucket,
                          count(*) AS n_events
                   FROM events GROUP BY 1, 2),
        h AS (SELECT event_type, bucket, n_events,
                     CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT) AS sum_prev,
                     CAST(count(n_events) OVER w AS BIGINT) AS n_prev
              FROM c
              WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                           ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
        SELECT event_type, bucket, n_events, sum_prev, n_prev,
               (n_prev >= 4 AND n_events * n_prev > 3 * sum_prev) AS is_spike,
               CASE WHEN sum_prev > 0
                    THEN CAST((n_events * n_prev * 10000) // sum_prev AS BIGINT)
               END AS ratio_x10k
        FROM h
    """
    o["stable_ordinal"] = """
        SELECT user_id, event_id,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS ord
        FROM events WHERE user_id < 10
    """
    o["sessionize"] = """
        WITH x AS (
          SELECT user_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
        FROM x GROUP BY user_id
    """
    amm = logops.HLL_ALPHA * logops.HLL_M * logops.HLL_M
    o["approx_profile"] = f"""
        WITH h AS (
          SELECT event_type, value, user_id,
                 md5(CAST(user_id AS VARCHAR)) AS h,
                 md5(CAST(event_id AS VARCHAR)) AS hrow
          FROM events
        ),
        y AS (
          SELECT event_type,
                 (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS b,
                 length(regexp_extract(substr(h, 3, 30), '^(0*)', 1)) AS zeros,
                 substr(substr(h, 3, 30),
                        length(regexp_extract(substr(h, 3, 30), '^(0*)', 1)) + 1, 1) AS d
          FROM h
        ),
        rk AS (
          SELECT event_type, b,
                 LEAST(CASE WHEN zeros = 30 THEN 121
                       ELSE zeros * 4
                            + (CASE WHEN d = '1' THEN 3
                                    WHEN d IN ('2','3') THEN 2
                                    WHEN d IN ('4','5','6','7') THEN 1
                                    ELSE 0 END) + 1 END,
                       {logops.HLL_RMAX}) AS r
          FROM y
        ),
        regs AS (SELECT event_type, b, max(r) AS m FROM rk GROUP BY 1, 2),
        agg AS (
          SELECT event_type,
                 CAST(sum(CAST(power(2.0, {logops.HLL_RMAX} - m) AS BIGINT)) AS DOUBLE)
                   AS present_sum,
                 count(*) AS nonzero
          FROM regs GROUP BY 1
        ),
        hll AS (
          SELECT event_type,
                 {amm!r} * power(2.0, {logops.HLL_RMAX})
                   / (present_sum
                      + ({logops.HLL_M} - nonzero) * power(2.0, {logops.HLL_RMAX})) AS raw,
                 CAST({logops.HLL_M} - nonzero AS DOUBLE) AS zero_ct
          FROM agg
        ),
        est AS (
          SELECT event_type,
                 round(CASE WHEN raw <= {2.5 * logops.HLL_M!r} AND zero_ct > 0
                            THEN {float(logops.HLL_M)!r} * ln({float(logops.HLL_M)!r} / zero_ct)
                            ELSE raw END, 4) AS hll_users
          FROM hll
        ),
        base AS (
          SELECT event_type, count(*) AS n_events,
                 count(DISTINCT user_id) AS n_users_exact,
                 round(quantile_cont(CASE WHEN hrow < '4' THEN value END, 0.5), 4)
                   AS p50_sample
          FROM h GROUP BY 1
        )
        SELECT b.event_type, b.n_events, b.n_users_exact, e.hll_users, b.p50_sample
        FROM base b JOIN est e USING (event_type)
    """
    o["value_percentiles"] = """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events GROUP BY event_type
    """
    o["tpch_q1"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,10))), 2) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """
    o["tpch_q3"] = """
        SELECT l.l_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(round(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,10))), 2) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY 1, 2
        ORDER BY revenue DESC, l.l_orderkey ASC
        LIMIT 10
    """
    o["tpch_q5"] = """
        SELECT n.n_name AS nation,
               CAST(round(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,10))), 2) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """
    o["tpch_q6"] = """
        SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(25,10))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.09
          AND l_quantity < 24
    """
    o["tpch_q7"] = """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               CAST(round(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,10))), 2) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """
    o["tpch_q10"] = """
        SELECT c.c_custkey, c.c_name, n.n_name AS nation,
               CAST(round(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,10))), 2) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c.c_custkey ASC
        LIMIT 20
    """
    o["tpch_q14"] = """
        WITH a AS (
          SELECT CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
                       THEN CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,10))
                       ELSE CAST(0 AS DECIMAL(25,10)) END), 2) * 100 AS BIGINT) AS pc,
                 CAST(round(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,10))), 2) * 100 AS BIGINT) AS tc
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
            AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        )
        SELECT CAST(pc AS DOUBLE) / 100 AS promo_revenue,
               CAST(tc AS DOUBLE) / 100 AS total_revenue,
               CAST((pc * 1000000) // tc AS BIGINT) / 10000.0 AS promo_share_pct
        FROM a
    """
    o["tpch_q18"] = """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(round(sum(CAST(l_quantity AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY 1
          HAVING CAST(round(sum(CAST(l_quantity AS DECIMAL(20,6))), 2) AS DOUBLE) > 300
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(round(CAST(o.o_totalprice AS DECIMAL(20,6)), 2) AS DOUBLE) AS totalprice,
               big.sum_qty
        FROM big
        JOIN orders o ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """
    o["tpch_q19"] = """
        SELECT CAST(round(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,10))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 20 AND 30)
    """
    o["tpch_q4"] = """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY 1
    """
    o["tpch_q13"] = """
        WITH per AS (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
                     WHERE o_orderpriority <> '1-URGENT') o
            ON c.c_custkey = o.o_custkey
          GROUP BY 1
        )
        SELECT c_count, count(*) AS custdist FROM per GROUP BY 1
    """
    o["tpch_q22"] = """
        WITH cents AS (
          SELECT c_custkey, c_nationkey, c_acctbal,
                 CAST(trunc(CAST(c_acctbal AS DECIMAL(20,6)) * 100) AS BIGINT)
                   AS _cents
          FROM customer
        ),
        avgpos AS (
          SELECT sum(_cents) // count(*) AS avg_cents
          FROM cents WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(_cents) AS DOUBLE) / 100 AS totacctbal
        FROM cents CROSS JOIN avgpos
        WHERE _cents > avg_cents
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = cents.c_custkey
                            AND o.o_totalprice > 300000)
        GROUP BY 1
    """
    o["orders_without_items"] = """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        GROUP BY o_orderpriority
    """
    o["big_spender_segments"] = """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        GROUP BY c_mktsegment
    """
    o["rollup_lineitem"] = """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """
    o["pivot_events"] = f"""
        SELECT user_id,
               {", ".join(f"count(*) FILTER (event_type = '{t}') AS n_{t}"
                          for t in logops.KNOWN_EVENT_TYPES)}
        FROM events GROUP BY user_id
    """
    o["moving_daily_orders"] = """
        WITH daily AS (
          SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS day,
                 count(*) AS n
          FROM orders GROUP BY 1, 2
        )
        SELECT o_orderpriority, day, n,
               CAST(sum(n) OVER w AS BIGINT) AS mv_sum,
               round(CAST(sum(n) OVER w AS DOUBLE)
                     / CAST(count(n) OVER w AS DOUBLE), 4) AS mv_avg
        FROM daily
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """
    o["text_token_stats"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks, text FROM documents)
        SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
               CAST(length(text) AS INT) AS n_chars,
               round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE), 4) AS avg_token_len
        FROM t
    """
    o["text_quality"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        m AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
                     CAST(len(list_filter(toks, x -> x IN ({_STOPLIST}))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) AS stop_ratio,
                     CAST(len(list_distinct(toks)) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) AS ttr
              FROM t)
        SELECT doc_id, n_tokens, round(stop_ratio, 4) AS stopword_ratio,
               round(ttr, 4) AS ttr,
               round(0.5 * ttr + 0.5 * (1.0 - stop_ratio), 4) AS quality
        FROM m
    """
    o["text_lang_id"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        m AS (SELECT doc_id,
                     CAST(len(list_filter(toks, x -> x IN ({_STOPLIST}))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) AS ratio
              FROM t)
        SELECT doc_id, round(ratio, 4) AS en_ratio,
               CASE WHEN ratio >= 0.05 THEN 'en' ELSE 'und' END AS pred_lang
        FROM m
    """
    o["text_fingerprint"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks, text FROM documents)
        SELECT doc_id, md5({_NORM}) AS fp_md5,
               list_min(list_transform({_SHINGLES}, s -> md5(s))) AS fp_min_shingle
        FROM t
    """
    o["text_subword_tokens"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks,
                          regexp_extract_all(text,
                            '[A-Za-z]+|[0-9]+|''(?:s|t|re|ve|m|ll|d)|[^A-Za-z0-9\\s]') AS sub
                   FROM documents)
        SELECT doc_id, CAST(len(toks) AS INT) AS n_words,
               CAST(len(sub) AS INT) AS n_subword_tokens,
               round(CAST(len(sub) AS DOUBLE) / CAST(len(toks) AS DOUBLE), 4)
                 AS tokens_per_word
        FROM t
    """
    _Q8 = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
        qq AS (SELECT vec_id, maxabs / 127.0 AS scale,
                      CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0)
                           ELSE list_transform(v, x ->
                                  CAST(floor(x * 127.0 / maxabs + 0.5) AS INT)) END AS q
               FROM m),
        nn AS (SELECT vec_id, scale, q,
                      CAST(list_reduce(list_transform(q, x -> CAST(x * x AS BIGINT)),
                                       (a, b) -> a + b) AS BIGINT) AS qnorm2
               FROM qq)
    """
    o["embed_quantize_int8"] = f"""
        {_Q8}
        SELECT vec_id, round(scale, 6) AS q_scale,
               array_to_string(q, ',') AS q_vec, qnorm2
        FROM nn
    """
    o["ann_quantized_topk"] = f"""
        {_Q8},
        qry AS (SELECT vec_id AS query_id, q AS q_q, qnorm2 AS n_q
                FROM nn WHERE vec_id < 8 AND qnorm2 > 0),
        s AS (SELECT qry.query_id, nn.vec_id AS neighbor_id,
                     round(CAST(list_reduce(list_transform(range(64),
                               i -> CAST(q_q[i+1] * q[i+1] AS BIGINT)), (a, b) -> a + b)
                           AS DOUBLE)
                           / (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(nn.qnorm2 AS DOUBLE))),
                           6) AS cos6
              FROM nn, qry WHERE nn.vec_id <> qry.query_id AND nn.qnorm2 > 0),
        r AS (SELECT query_id, neighbor_id, cos6,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos6 DESC, neighbor_id ASC) AS rk
              FROM s)
        SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank, round(cos6, 4) AS cos_sim
        FROM r WHERE rk <= 5
    """
    o["text_chunks"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t),
        c AS (SELECT doc_id, toks, n,
                greatest(1, CAST(ceil((n - 8) / 24.0) AS BIGINT)) AS n_chunks
              FROM n),
        s AS (SELECT doc_id, toks, n, unnest(range(n_chunks)) AS k FROM c)
        SELECT doc_id,
               CAST(k AS INT) AS chunk_idx,
               CAST(least(32, n - k * 24) AS INT) AS n_chunk_tokens,
               array_to_string(toks[k * 24 + 1 : k * 24 + 32], ' ') AS chunk_text
        FROM s
    """
    o["text_filter_chain"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        m AS (SELECT doc_id,
                CAST(len(toks) AS INT) AS n_tokens,
                CAST(len(array_to_string(toks, '')) AS DOUBLE)
                  / CAST(len(toks) AS DOUBLE) AS mean_len,
                CAST(len(list_filter(toks, x -> x IN ({_STOPLIST}))) AS DOUBLE)
                  / CAST(len(toks) AS DOUBLE) AS stop_ratio,
                CAST(len(list_distinct(toks)) AS DOUBLE)
                  / CAST(len(toks) AS DOUBLE) AS ttr
              FROM t),
        r AS (SELECT doc_id, n_tokens,
                n_tokens >= 5 AS pass_min_tokens,
                n_tokens <= 2000 AS pass_max_tokens,
                mean_len >= 2.0 AND mean_len <= 12.0 AS pass_mean_tok_len,
                stop_ratio >= 0.01 AS pass_stop_ratio,
                ttr >= 0.3 AS pass_ttr
              FROM m)
        SELECT doc_id, n_tokens, pass_min_tokens, pass_max_tokens,
               pass_mean_tok_len, pass_stop_ratio, pass_ttr,
               CASE WHEN NOT pass_min_tokens THEN 'min_tokens'
                    WHEN NOT pass_max_tokens THEN 'max_tokens'
                    WHEN NOT pass_mean_tok_len THEN 'mean_tok_len'
                    WHEN NOT pass_stop_ratio THEN 'stop_ratio'
                    WHEN NOT pass_ttr THEN 'ttr' END AS first_fail,
               pass_min_tokens AND pass_max_tokens AND pass_mean_tok_len
                 AND pass_stop_ratio AND pass_ttr AS keep
        FROM r
    """
    o["text_dup_gram_frac"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id, {_SHINGLES} AS grams FROM t),
        i AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        pdg AS (SELECT doc_id, gram, count(*) AS n_inst FROM i GROUP BY 1, 2),
        freq AS (SELECT gram FROM pdg GROUP BY gram HAVING sum(n_inst) >= 2),
        c AS (SELECT p.doc_id, sum(p.n_inst) AS n_grams,
                     sum(CASE WHEN f.gram IS NOT NULL THEN p.n_inst ELSE 0 END)
                       AS n_dup
              FROM pdg p LEFT JOIN freq f USING (gram) GROUP BY 1)
        SELECT g.doc_id,
               CAST(coalesce(c.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(c.n_dup, 0) AS BIGINT) AS n_dup_grams,
               round(coalesce(CAST(c.n_dup AS DOUBLE)
                              / CAST(c.n_grams AS DOUBLE), 0.0), 4)
                 AS dup_gram_frac
        FROM g LEFT JOIN c USING (doc_id)
    """
    o["text_tfidf_topk"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        inst AS (SELECT doc_id, unnest(toks) AS term FROM t),
        tfc AS (SELECT doc_id, term, count(*) AS tf FROM inst GROUP BY 1, 2),
        dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM t),
        s AS (SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
                     CAST(tfc.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
                       / CAST(dfc.df AS DOUBLE) AS score
              FROM tfc JOIN dfc USING (term) CROSS JOIN n),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY round(score, 6) DESC, term ASC) AS rk FROM s)
        SELECT doc_id, CAST(rk AS INT) AS rank, term,
               CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
               round(score, 4) AS tfidf
        FROM r WHERE rk <= 5
    """
    # bigram-LM fixed-point score: integer counts + truncating division
    # mirror textstats.lm_score exactly (fp_scale = 10^6)
    o["text_lm_score"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id, toks,
                     list_transform(range(len(toks) - 1),
                                    i -> toks[i+1] || ' ' || toks[i+2]) AS grams
              FROM t),
        uc AS (SELECT w, count(*) AS c_uni
               FROM (SELECT unnest(toks) AS w FROM g) GROUP BY 1),
        v AS (SELECT count(*) AS _v FROM uc),
        inst AS (SELECT doc_id, unnest(grams) AS bigram FROM g),
        bc AS (SELECT bigram, count(*) AS c_big FROM inst GROUP BY 1),
        prob AS (SELECT bigram,
                        (c_big + 1) * 1000000 // (c_uni + _v) AS prob_fp
                 FROM bc JOIN uc ON split_part(bc.bigram, ' ', 1) = uc.w
                 CROSS JOIN v),
        sc AS (SELECT doc_id, count(*) AS n_bigrams,
                      sum(prob_fp) // count(*) AS lm_score_fp
               FROM inst JOIN prob USING (bigram) GROUP BY 1)
        SELECT g.doc_id,
               CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(sc.lm_score_fp AS BIGINT) AS lm_score_fp,
               round(CAST(sc.lm_score_fp AS DOUBLE) / 1000000.0, 6) AS lm_score
        FROM g LEFT JOIN sc USING (doc_id)
    """
    # Count-Min sketch: same md5 bucket construction as sketches.py
    _hx = lambda e, p: (  # noqa: E731 — hex digit at position p of e → int
        f"(strpos('0123456789abcdef', substr({e}, {p}, 1)) - 1)"
    )
    _cms_b = (
        lambda salt: f"({_hx(f'md5({salt})', 1)} * 16 + {_hx(f'md5({salt})', 2)})"
    )  # noqa: E731
    o["freq_cms_users"] = f"""
        WITH rows(i) AS (VALUES (0), (1), (2), (3)),
        hb AS (
          SELECT i AS row,
                 {_cms_b("CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")}
                   AS bucket
          FROM events CROSS JOIN rows
        ),
        cms AS (SELECT row, bucket, count(*) AS cnt FROM hb GROUP BY 1, 2),
        keys AS (SELECT DISTINCT user_id FROM events),
        kb AS (
          SELECT k.user_id, r.i AS row,
                 {_cms_b("CAST(r.i AS VARCHAR) || ':' || CAST(k.user_id AS VARCHAR)")}
                   AS bucket
          FROM keys k CROSS JOIN rows r
        ),
        est AS (SELECT user_id, min(coalesce(cnt, 0)) AS cms_count
                FROM kb LEFT JOIN cms USING (row, bucket) GROUP BY 1)
        SELECT e.user_id, CAST(e.cms_count AS BIGINT) AS cms_count,
               x.exact_count
        FROM est e
        JOIN (SELECT user_id, count(*) AS exact_count FROM events GROUP BY 1) x
          USING (user_id)
    """
    o["dedup_exact"] = f"""
        SELECT md5({_NORM}) AS fp, min(doc_id) AS canonical_id, count(*) AS n_docs
        FROM documents GROUP BY 1
    """
    # single source of truth for the MinHash family (shared with the
    # conversation-grain mirror, convops.conv_dedup_pairs_sql)
    _sig = dedup.sig_sql_expr(16)
    _band2 = dedup.band_sql_expr(2)
    _sig_cte = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (SELECT doc_id, list_distinct({_SHINGLES}) AS shd FROM t WHERE len(toks) >= 3),
        sig AS (SELECT doc_id, {_sig} AS sigs FROM sh)
    """
    o["dedup_minhash"] = f"""
        {_sig_cte}
        SELECT doc_id, array_to_string(sigs, '|') AS minhash_sig FROM sig
    """
    _bands_cte = f"""
        {_sig_cte},
        bands AS (
          SELECT doc_id, j,
                 {_band2} AS band_hash
          FROM sig, range(8) AS r(j)
        )
    """
    o["dedup_lsh_candidates"] = f"""
        {_bands_cte}
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.j = b.j AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """
    o["dedup_lsh_jaccard"] = f"""
        {_bands_cte},
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.j = b.j AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        )
        SELECT c.id_a, c.id_b,
               round(CAST(len(list_intersect(sa.shd, sb.shd)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(sa.shd, sb.shd))) AS DOUBLE), 4) AS jaccard
        FROM cand c JOIN sh sa ON c.id_a = sa.doc_id JOIN sh sb ON c.id_b = sb.doc_id
    """
    o["dedup_incremental"] = f"""
        {_sig_cte},
        new_sig AS (SELECT * FROM sig WHERE doc_id % 5 = 0),
        old_sig AS (SELECT * FROM sig WHERE doc_id % 5 <> 0),
        nb AS (
          SELECT doc_id, j,
                 {_band2} AS band_hash
          FROM new_sig, range(8) AS r(j)
        ),
        ob AS (
          SELECT doc_id, j,
                 {_band2} AS band_hash
          FROM old_sig, range(8) AS r(j)
        ),
        cand AS (
          SELECT DISTINCT n.doc_id AS dup_id, o.doc_id AS match_id
          FROM nb n JOIN ob o ON n.j = o.j AND n.band_hash = o.band_hash
          UNION
          SELECT DISTINCT a.doc_id AS dup_id, b.doc_id AS match_id
          FROM nb a JOIN nb b
            ON a.j = b.j AND a.band_hash = b.band_hash
           AND b.doc_id < a.doc_id
        ),
        est AS (
          SELECT c.dup_id, c.match_id,
                 round(CAST(len(list_filter(range(16),
                                i -> sa.sigs[i+1] = sb.sigs[i+1])) AS DOUBLE)
                       / 16.0, 4) AS est_jaccard
          FROM cand c
          JOIN sig sa ON c.dup_id = sa.doc_id
          JOIN sig sb ON c.match_id = sb.doc_id
        )
        SELECT dup_id, match_id, est_jaccard FROM est WHERE est_jaccard >= 0.25
    """
    o["dedup_ngram_jaccard"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < 30),
        sh AS (SELECT doc_id, list_distinct({_SHINGLES}) AS shd FROM t),
        j AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
                       / CAST(len(list_distinct(list_concat(a.shd, b.shd))) AS DOUBLE), 4) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.0
    """
    o["dedup_clusters"] = f"""
        {_bands_cte},
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.j = b.j AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM cand
          UNION SELECT id_b, id_a FROM cand
        ),
        reach AS (
          SELECT doc_id AS node, doc_id AS label FROM documents
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
    """
    # the reach CTE recurses → the whole WITH chain needs RECURSIVE
    o["dedup_clusters"] = o["dedup_clusters"].replace("WITH t AS", "WITH RECURSIVE t AS", 1)
    # the big-star variant has the identical output contract, so it shares
    # the exact connected-components oracle verbatim
    o["dedup_clusters_bigstar"] = o["dedup_clusters"]
    # quality-aware canonicalization: exact-CC clusters × the text_quality
    # score, best score per cluster with a min-id tiebreak
    o["dedup_canonical_quality"] = f"""
        WITH base AS ({o["dedup_clusters"]}),
        qual AS (SELECT doc_id, quality FROM ({o["text_quality"]})),
        m AS (SELECT base.cluster_id, base.doc_id, qual.quality
              FROM base JOIN qual USING (doc_id)),
        b AS (SELECT cluster_id, max(quality) AS best_score,
                     count(*) AS n_docs
              FROM m GROUP BY cluster_id)
        SELECT m.cluster_id, min(m.doc_id) AS keep_id, b.n_docs, b.best_score
        FROM m JOIN b ON m.cluster_id = b.cluster_id
                     AND m.quality = b.best_score
        GROUP BY m.cluster_id, b.n_docs, b.best_score
    """
    o["ann_ivf_topk"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        s AS (SELECT e.vec_id, c.cid, round({_cos_sql('e.v', 'c.cv')}, 6) AS sim
              FROM e, c),
        assign AS (
          SELECT vec_id, cid AS centroid_id FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, cid ASC) AS rk
            FROM s) WHERE rk = 1
        ),
        qs AS (SELECT a.centroid_id, e.vec_id AS query_id, e.v AS qv
               FROM e JOIN assign a ON e.vec_id = a.vec_id WHERE e.vec_id < 8),
        base AS (SELECT a.centroid_id, e.vec_id AS neighbor_id, e.v AS nv
                 FROM e JOIN assign a ON e.vec_id = a.vec_id),
        sims AS (SELECT q.query_id, b.neighbor_id,
                        round({_cos_sql('q.qv', 'b.nv')}, 6) AS cos6
                 FROM base b JOIN qs q ON b.centroid_id = q.centroid_id
                 WHERE q.query_id <> b.neighbor_id),
        r AS (SELECT query_id, neighbor_id, cos6,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos6 DESC, neighbor_id ASC) AS rk
              FROM sims)
        SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank,
               round(cos6, 4) AS cos_sim
        FROM r WHERE rk <= 3
    """
    o["dedup_simhash"] = f"""
        WITH t AS (SELECT doc_id, list_transform({_TOKS}, x -> md5(x)) AS hs FROM documents)
        SELECT doc_id,
               array_to_string(list_transform(range(32), j ->
                 CASE WHEN list_sum(list_transform(hs, h ->
                        CASE WHEN substr(h, CAST(j + 1 AS INT), 1) >= '8' THEN 1 ELSE -1 END))
                      >= 0 THEN '1' ELSE '0' END), '') AS simhash
        FROM t
    """
    o["embed_norm"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings)
        SELECT vec_id, round({_norm_sql('v')}, 4) AS l2_norm FROM e
    """
    o["ann_cosine_topk"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     round({_cos_sql('q.qv', 'e.v')}, 6) AS cos6
              FROM e, q WHERE e.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id, cos6,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos6 DESC, neighbor_id ASC) AS rk
              FROM s)
        SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank,
               round(cos6, 4) AS cos_sim
        FROM r WHERE rk <= 5
    """
    _d2 = (
        "list_reduce(list_transform(range(64), i ->"
        " (q.qv[i+1] - e.v[i+1]) * (q.qv[i+1] - e.v[i+1])),"
        " (acc, x) -> acc + x)"
    )
    o["ann_l2_topk"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                     round({_d2}, 6) AS d6
              FROM e, q WHERE e.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id, d6,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY d6 ASC, neighbor_id ASC) AS rk
              FROM s)
        SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank,
               round(d6, 4) AS d2
        FROM r WHERE rk <= 5
    """
    o["ann_recall_ivf"] = f"""
        WITH ex AS (SELECT query_id, neighbor_id
                    FROM ({o["ann_cosine_topk"]}) WHERE rank <= 3),
        ap AS (SELECT query_id, neighbor_id FROM ({o["ann_ivf_topk"]})),
        hits AS (SELECT ex.query_id FROM ex
                 JOIN ap ON ex.query_id = ap.query_id
                        AND ex.neighbor_id = ap.neighbor_id)
        SELECT (SELECT CAST(count(DISTINCT query_id) AS BIGINT) FROM ex)
                 AS n_queries,
               (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_true_pairs,
               (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits,
               CAST(((SELECT count(*) FROM hits) * 1000000)
                    // (SELECT count(*) FROM ex) AS BIGINT) AS recall_ppm
    """
    o["ann_ivf_assign"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        s AS (SELECT e.vec_id, c.cid, round({_cos_sql('e.v', 'c.cv')}, 6) AS sim
              FROM e, c),
        r AS (SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, cid ASC) AS rk
              FROM s)
        SELECT vec_id, cid AS centroid_id FROM r WHERE rk = 1
    """
    o["embed_dup_pairs"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings WHERE vec_id < 200),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round({_cos_sql('a.v', 'b.v')}, 4) AS cos_sim
              FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.25
    """
    # Cosine-LSH oracle: the hyperplane weights are deterministic Python
    # constants (hashlib at plan-build time), inlined as list literals in
    # both engines — same fold order → identical sign bits.
    planes = similarity.hyperplane_weights(12, 64)
    def _plane_bit(w: list[float]) -> str:
        lit = "[" + ", ".join(f"{x:.1f}" for x in w) + "]"
        s = f"list_reduce(list_transform(range(64), i -> v[i+1] * ({lit})[i+1]), (acc, x) -> acc + x)"
        return f"CASE WHEN {s} >= 0 THEN '1' ELSE '0' END"
    _bucket = " || ".join(_plane_bit(w) for w in planes)
    o["embed_lsh_buckets"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings)
        SELECT vec_id, {_bucket} AS bucket FROM e
    """
    o["embed_lsh_dup_pairs"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        b AS (SELECT vec_id, v, {_bucket} AS bucket FROM e),
        p AS (SELECT a.vec_id AS id_a, x.vec_id AS id_b,
                     round({_cos_sql('a.v', 'x.v')}, 4) AS cos_sim
              FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id)
        SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.25
    """
    # semantic near-dup clusters: big-star CC over the embedding LSH
    # pair graph (same recursive-reachability oracle as dedup_clusters,
    # with the hyperplane-bucket pair CTE as the edge source)
    o["embed_dup_clusters"] = f"""
        WITH RECURSIVE e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        b AS (SELECT vec_id, v, {_bucket} AS bucket FROM e),
        cand AS (
          SELECT a.vec_id AS id_a, x.vec_id AS id_b
          FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id
          WHERE round({_cos_sql('a.v', 'x.v')}, 4) >= 0.25
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM cand
          UNION SELECT id_b, id_a FROM cand
        ),
        reach AS (
          SELECT vec_id AS node, vec_id AS label FROM embeddings
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node AS vec_id, min(label) AS cluster_id
        FROM reach GROUP BY node
    """
    _thresh = sampling.sample_threshold_hex(0.1)
    o["sample_hash"] = f"""
        SELECT event_id, user_id, event_type FROM events
        WHERE substr(md5('s1:' || CAST(event_id AS VARCHAR)), 1, 8) < '{_thresh}'
    """
    o["sample_stratified"] = """
        WITH r AS (
          SELECT event_type, event_id,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY md5('s2:' || CAST(event_id AS VARCHAR)),
                                             event_id) AS rk
          FROM events)
        SELECT event_type, event_id, CAST(rk AS INT) AS sample_rank
        FROM r WHERE rk <= 20
    """
    o["sample_quality_quota"] = f"""
        WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
        m AS (SELECT doc_id, source,
                     CAST(len(list_filter(toks, x -> x IN ({_STOPLIST}))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) AS stop_ratio,
                     CAST(len(list_distinct(toks)) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) AS ttr
              FROM t),
        sc AS (SELECT doc_id, source,
                      round(0.5 * ttr + 0.5 * (1.0 - stop_ratio), 4) AS quality
               FROM m),
        r AS (SELECT source, doc_id, quality,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY quality DESC, doc_id ASC) AS rk
              FROM sc)
        SELECT source, doc_id, quality, CAST(rk AS INT) AS quota_rank
        FROM r WHERE rk <= 5
    """
    _mix = {
        "src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0,
    }

    def _mix_pred(rate: float) -> str:
        if rate >= 1.0:
            return "true"
        if rate <= 0.0:
            return "false"
        t = sampling.sample_threshold_hex(rate)
        return f"substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) < '{t}'"

    _mix_case = " ".join(
        f"WHEN source = '{g}' THEN {_mix_pred(r)}" for g, r in sorted(_mix.items())
    )
    o["sample_mixture"] = f"""
        SELECT doc_id, source FROM documents
        WHERE CASE {_mix_case} ELSE {_mix_pred(0.1)} END
    """
    o["dedup_canonical_corpus"] = f"""
        WITH base AS ({o["dedup_clusters"]})
        SELECT d.doc_id, d.source
        FROM documents d JOIN base b ON d.doc_id = b.doc_id
        WHERE b.cluster_id = d.doc_id
    """
    o["sample_pack_sequences"] = f"""
        WITH t AS (SELECT doc_id, source, CAST(len({_TOKS}) AS INT) AS n_tokens
                   FROM documents),
        x AS (SELECT doc_id, source, n_tokens,
                     CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS start
              FROM t
              WINDOW w AS (PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT doc_id, source, n_tokens,
               CAST(floor(start / 512) AS INT) AS bin_id,
               CAST(start % 512 AS INT) AS bin_offset
        FROM x
    """
    _QZ = (
        "CAST(least(greatest(CASE WHEN CAST({hi} - {lo} AS DOUBLE) = 0 THEN 0 "
        "ELSE floor((CAST({c} - {lo} AS DOUBLE) / CAST({hi} - {lo} AS DOUBLE)) "
        "* 65535.0) END, 0), 65535) AS BIGINT)"
    )
    o["zorder_events"] = f"""
        WITH b AS (SELECT min(user_id) AS xlo, max(user_id) AS xhi,
                          min(value) AS ylo, max(value) AS yhi FROM events),
        q AS (SELECT e.user_id, e.value,
                {_QZ.format(c="e.user_id", lo="xlo", hi="xhi")} AS qx,
                {_QZ.format(c="e.value", lo="ylo", hi="yhi")} AS qy
              FROM events e, b),
        s1 AS (SELECT user_id, value,
                 ((qx & 65535) | ((qx & 65535) << 8)) & 16711935 AS x1,
                 ((qy & 65535) | ((qy & 65535) << 8)) & 16711935 AS y1
               FROM q),
        s2 AS (SELECT user_id, value,
                 ((x1 | (x1 << 4)) & 252645135) AS x2,
                 ((y1 | (y1 << 4)) & 252645135) AS y2 FROM s1),
        s3 AS (SELECT user_id, value,
                 ((x2 | (x2 << 2)) & 858993459) AS x3,
                 ((y2 | (y2 << 2)) & 858993459) AS y3 FROM s2),
        s4 AS (SELECT user_id, value,
                 ((x3 | (x3 << 1)) & 1431655765) AS x4,
                 ((y3 | (y3 << 1)) & 1431655765) AS y4 FROM s3),
        z AS (SELECT user_id, value, (x4 | (y4 << 1)) AS z FROM s4)
        SELECT z >> 26 AS file_id, count(*) AS n_rows,
               min(user_id) AS min_user_id, max(user_id) AS max_user_id,
               min(value) AS min_value, max(value) AS max_value
        FROM z GROUP BY 1
    """
    o["compaction_plan"] = """
        WITH f AS (
          SELECT event_type,
                 event_type || '/' || CAST(user_id AS VARCHAR) AS file,
                 CAST(count(*) * 128 AS BIGINT) AS bytes
          FROM events GROUP BY event_type, user_id
        ),
        c AS (
          SELECT event_type, file, bytes,
                 sum(bytes) OVER (PARTITION BY event_type ORDER BY file)
                   - bytes AS cb
          FROM f
        )
        SELECT event_type, file, bytes,
               CAST(floor(cb / 4096.0) AS BIGINT) AS group_id FROM c
    """
    o["time_rollup"] = """
        WITH m AS (
          SELECT event_type,
                 strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
                 count(*) AS n, CAST(sum(CAST(value AS DECIMAL(20,6))) AS DECIMAL(20,6)) AS s
          FROM events GROUP BY 1, 2),
        h AS (SELECT event_type, substr(bucket, 1, 13) || ':00:00' AS bucket,
                     CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS DECIMAL(20,6)) AS s
              FROM m GROUP BY 1, 2),
        d AS (SELECT event_type, substr(bucket, 1, 10) || ' 00:00:00' AS bucket,
                     CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS DECIMAL(20,6)) AS s
              FROM h GROUP BY 1, 2),
        t AS (SELECT event_type, 'ALL' AS bucket,
                     CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS DECIMAL(20,6)) AS s
              FROM d GROUP BY 1)
        SELECT 'minute' AS level, event_type, bucket, n AS n_events,
               CAST(round(s, 2) AS DOUBLE) AS sum_value FROM m
        UNION ALL SELECT 'hour', event_type, bucket, n,
               CAST(round(s, 2) AS DOUBLE) FROM h
        UNION ALL SELECT 'day', event_type, bucket, n,
               CAST(round(s, 2) AS DOUBLE) FROM d
        UNION ALL SELECT 'total', event_type, bucket, n,
               CAST(round(s, 2) AS DOUBLE) FROM t
    """
    o["latest_event_per_user"] = """
        WITH r AS (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rk
          FROM events)
        SELECT user_id, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, event_type
        FROM r WHERE rk = 1
    """
    o["sessionize_events"] = """
        WITH x AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events WHERE user_id < 20
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS INT) AS session_id
        FROM x
    """
    o["scd2_user_type"] = """
        WITH b AS (
          SELECT user_id, event_id, event_type,
                 CAST(epoch_us(ts) // 1000000 AS BIGINT) AS es,
                 row_number() OVER w AS rn,
                 lag(event_type) OVER w AS prev
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        chg AS (
          SELECT user_id, event_type, es AS valid_from, event_id
          FROM b WHERE rn = 1 OR prev IS DISTINCT FROM event_type
        )
        SELECT user_id, event_type, valid_from,
               lead(valid_from) OVER w2 AS valid_to,
               lead(valid_from) OVER w2 IS NULL AS is_current
        FROM chg
        WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    """
    o["semantic_dup_pairs"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        s AS (SELECT e.vec_id, c.cid, round({_cos_sql('e.v', 'c.cv')}, 6) AS sim
              FROM e, c),
        r AS (SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, cid ASC) AS rk
              FROM s),
        a AS (SELECT e.vec_id, r.cid, e.v
              FROM e JOIN r ON e.vec_id = r.vec_id AND r.rk = 1),
        p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.cid AS centroid_id,
                     round({_cos_sql('x.v', 'y.v')}, 6) AS cs
              FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id)
        SELECT id_a, id_b, centroid_id, round(cs, 4) AS cos_sim
        FROM p WHERE cs >= 0.25
    """
    o["text_inverted_index"] = f"""
        WITH p AS (
          SELECT DISTINCT doc_id, t.term
          FROM documents, unnest({_TOKS}) AS t(term)
          WHERE t.term <> ''
        ),
        r AS (SELECT term, doc_id,
                     row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk,
                     count(*) OVER (PARTITION BY term) AS df
              FROM p)
        SELECT term, CAST(max(df) AS BIGINT) AS doc_freq,
               array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings_str,
               max(df) > count(*) AS truncated
        FROM r WHERE rk <= 50 GROUP BY term
    """
    o["text_search_and"] = f"""
        SELECT doc_id, source FROM documents
        WHERE list_contains({_TOKS}, 'vector')
          AND list_contains({_TOKS}, 'stream')
          AND list_contains({_TOKS}, 'spark')
    """
    _pii = dict(textstats.PII_PATTERNS)
    o["text_redact_pii"] = f"""
        WITH s0 AS (SELECT event_id, props AS t FROM events),
        s1 AS (SELECT event_id,
                      CAST(len(regexp_extract_all(t, '{_pii["email"]}')) AS INT) AS n_email,
                      regexp_replace(t, '{_pii["email"]}', '<EMAIL>', 'g') AS t
               FROM s0),
        s2 AS (SELECT event_id, n_email,
                      CAST(len(regexp_extract_all(t, '{_pii["ipv4"]}')) AS INT) AS n_ipv4,
                      regexp_replace(t, '{_pii["ipv4"]}', '<IPV4>', 'g') AS t
               FROM s1),
        s3 AS (SELECT event_id, n_email, n_ipv4,
                      CAST(len(regexp_extract_all(t, '{_pii["number"]}')) AS INT) AS n_number,
                      regexp_replace(t, '{_pii["number"]}', '<NUMBER>', 'g') AS t
               FROM s2)
        SELECT event_id, n_email, n_ipv4, n_number, md5(t) AS scrubbed_md5 FROM s3
    """
    o["profile_columns"] = """
        SELECT 'event_type' AS "column", count(*) AS n_rows,
               CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               count(DISTINCT event_type) AS n_distinct,
               CAST(min(event_type) AS VARCHAR) AS min_str,
               CAST(max(event_type) AS VARCHAR) AS max_str
        FROM events
        UNION ALL
        SELECT 'user_id', count(*),
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT user_id),
               CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'event_id', count(*),
               CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT event_id),
               CAST(min(event_id) AS VARCHAR), CAST(max(event_id) AS VARCHAR)
        FROM events
    """
    _BIGRAMS = "list_transform(range(len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2])"
    o["text_repetition"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id, unnest({_BIGRAMS}) AS gram FROM t),
        pg AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY 1, 2),
        bs AS (SELECT doc_id, max(n) AS top_n, sum(n) AS total FROM pg GROUP BY 1)
        SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
               round(1.0 - CAST(len(list_distinct(t.toks)) AS DOUBLE)
                     / CAST(len(t.toks) AS DOUBLE), 4) AS dup_word_frac,
               CAST(coalesce(bs.top_n, 0) AS INT) AS top_bigram_n,
               round(CAST(bs.top_n AS DOUBLE) / CAST(bs.total AS DOUBLE), 4)
                 AS top_bigram_frac
        FROM t LEFT JOIN bs ON t.doc_id = bs.doc_id
    """
    o["decontaminate_ngrams"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id, list_distinct({_SHINGLES}) AS grams FROM t),
        bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 19 = 0),
        train AS (SELECT doc_id, grams FROM g WHERE doc_id % 19 <> 0),
        tg AS (SELECT doc_id, unnest(grams) AS gram FROM train),
        ov AS (SELECT doc_id, count(*) AS n_overlap FROM tg
               WHERE gram IN (SELECT gram FROM bench) GROUP BY 1)
        SELECT t2.doc_id, CAST(len(t2.grams) AS INT) AS n_grams,
               CAST(coalesce(ov.n_overlap, 0) AS INT) AS n_overlap,
               coalesce(ov.n_overlap, 0) >= 5 AS contaminated
        FROM train t2 LEFT JOIN ov ON t2.doc_id = ov.doc_id
    """
    o["asof_last_order"] = """
        WITH j AS (
          SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
          FROM events e LEFT JOIN orders o
            ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        )
        SELECT event_id, user_id, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice AS totalprice
        FROM j WHERE rk = 1
    """
    o["asof_last_order_bucketed"] = o["asof_last_order"]
    o["range_order_pairs"] = """
        WITH p AS (
          SELECT a.o_orderkey AS k, count(*) AS n
          FROM orders a JOIN orders b
            ON a.o_custkey = b.o_custkey AND a.o_orderkey <> b.o_orderkey
           AND abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate)) <= 2592000000000
          GROUP BY 1)
        SELECT o.o_orderkey, CAST(coalesce(p.n, 0) AS BIGINT) AS n_nearby
        FROM orders o LEFT JOIN p ON o.o_orderkey = p.k
    """
    # the Zeek parse engine itself: generated full-field SQL mirrors over
    # the committed golden parquet (functions/zeek_oracle.py)
    for t in zeek_oracle.KNOWN_TOOLS:
        o[f"zeek_sink_{t}"] = zeek_oracle.sink_sql(t)
    o["zeek_rejects"] = zeek_oracle.rejects_sql()
    o["zeek_conn_latency"] = zeek_oracle.conn_latency_sql()
    o["zeek_sink_conn_pipe"] = zeek_oracle.sink_sql_pipe("conn")
    o["zeek_topk_fields"] = zeek_oracle.topk_fields_sql(3)
    o["zeek_golden_aggregates"] = zeek_oracle.aggregates_sql()

    _conv_rel = convops.synth_conv_sql(_CONV_N)
    o["conv_reconstruct"] = convops.conv_reconstruct_sql(_conv_rel)
    o["conv_tool_transitions"] = convops.tool_transitions_sql(_conv_rel)
    o["conv_turn_latency"] = convops.turn_latency_sql(_conv_rel)
    o["conv_role_balance"] = convops.role_balance_sql(_conv_rel)

    o["graph_pagerank"] = graph.pagerank_sql(
        graph.synth_links_sql(20_000, 1_000), iters=5
    )
    o["graph_triangles"] = graph.triangle_counts_sql(
        graph.synth_links_sql(20_000, 1_000)
    )
    _split_case = sampling.split_dataset_sql(
        {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id"
    )
    o["sample_split"] = f"SELECT doc_id, {_split_case} AS split FROM documents"
    o["profile_skew"] = """
        WITH counts AS (SELECT user_id AS k, count(*) AS n
                        FROM events GROUP BY 1)
        SELECT count(*) AS n_keys,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(max(n) AS BIGINT) AS max_key_n,
               round(quantile_cont(n, 0.5), 4) AS p50_key_n,
               round(quantile_cont(n, 0.99), 4) AS p99_key_n,
               (SELECT CAST(k AS VARCHAR) FROM counts
                ORDER BY n DESC, k DESC LIMIT 1) AS top_key,
               CAST((max(n) * 10000) // (sum(n) // count(*)) AS BIGINT)
                 AS skew_x10k
        FROM counts
    """

    # --- round-3 additions ---
    o["conv_context_growth"] = convops.context_growth_sql(
        convops.synth_conv_sql(_CONV_N)
    )
    # portable HLL: identical md5/bin construction (sketches.py)
    _hll_regs = """
        WITH h AS (SELECT md5(CAST(event_id AS VARCHAR)) AS hx FROM events),
        br AS (SELECT CAST(('0x' || substr(hx, 1, 2))::BIGINT AS INT) AS bucket,
                      ('0x' || substr(hx, 3, 12))::BIGINT AS v
               FROM h),
        r AS (SELECT bucket,
                     CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END AS rank
              FROM br),
        regs AS (SELECT bucket, max(rank) AS max_rank FROM r GROUP BY 1)
    """
    o["hll_registers_events"] = f"{_hll_regs} SELECT bucket, max_rank FROM regs"
    o["hll_distinct_events"] = f"""
        {_hll_regs},
        mx AS (SELECT max(max_rank) AS r_max, count(*) AS n_present FROM regs),
        d AS (SELECT r_max,
                     sum(1::BIGINT << (r_max - max_rank))
                       + (256 - n_present) * (1::BIGINT << r_max) AS denom
              FROM regs, mx GROUP BY r_max, n_present)
        SELECT CAST((718272::HUGEINT * 65536 * (1::BIGINT << r_max))
                    // (1000000::HUGEINT * denom) AS BIGINT) AS est_distinct,
               (SELECT count(DISTINCT event_id) FROM events) AS exact_distinct
        FROM d
    """
    # Bloom probe: same md5 positions (sketches.py BLOOM_K=4, BLOOM_BITS=2048)
    o["bloom_probe_users"] = """
        WITH ks(i) AS (VALUES (0), (1), (2), (3)),
        bpos AS (
          SELECT DISTINCT
                 (('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                                      CAST(c_custkey AS VARCHAR)), 1, 3))::BIGINT
                  % 2048) AS pos
          FROM customer CROSS JOIN ks WHERE c_custkey % 3 = 0
        ),
        keys AS (SELECT DISTINCT user_id FROM events),
        kp AS (
          SELECT user_id,
                 (('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                                      CAST(user_id AS VARCHAR)), 1, 3))::BIGINT
                  % 2048) AS pos
          FROM keys CROSS JOIN ks
        )
        SELECT user_id, count(b.pos) = 4 AS maybe_member
        FROM kp LEFT JOIN bpos b USING (pos) GROUP BY user_id
    """
    _vol = "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,10))"
    o["tpch_q8"] = f"""
        WITH base AS (
          SELECT year(o.o_orderdate) AS o_year, {_vol} AS vol, n2.n_name AS supp_nation
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
          JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
          WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        ),
        agg AS (
          SELECT o_year,
                 CAST(round(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol
                                     ELSE CAST(0 AS DECIMAL(25,10)) END), 2) * 100
                      AS BIGINT) AS nc,
                 CAST(round(sum(vol), 2) * 100 AS BIGINT) AS tc
          FROM base GROUP BY o_year
        )
        SELECT o_year, CAST((nc * 1000000) // tc AS BIGINT) / 10000.0 AS mkt_share_pct,
               CAST(tc AS DOUBLE) / 100 AS total_volume
        FROM agg
    """
    o["tpch_q9"] = f"""
        SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
               CAST(round(sum({_vol}), 2) AS DOUBLE) AS sum_profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    """
    o["tpch_q12"] = """
        SELECT l.l_returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    """
    o["tpch_q15"] = f"""
        WITH revenue AS (
          SELECT l_suppkey, CAST(round(sum({_vol}), 2) * 100 AS BIGINT) AS rc
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, CAST(rc AS DOUBLE) / 100 AS total_revenue
        FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE rc = (SELECT max(rc) FROM revenue)
    """
    o["cdc_apply_customers"] = """
        WITH cols AS (
          SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
          FROM customer
        ),
        u AS (
          SELECT *, 'I' AS op, NULL::INT AS ver FROM cols
          UNION ALL
          SELECT c_custkey, c_name || '_v1', c_nationkey, c_acctbal,
                 c_mktsegment, 'U', 1
          FROM cols WHERE c_custkey % 3 = 0
          UNION ALL
          SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'D', 2
          FROM cols WHERE c_custkey % 6 = 0
        ),
        r AS (
          SELECT *, row_number() OVER (
                      PARTITION BY c_custkey
                      ORDER BY ver DESC NULLS LAST, c_custkey DESC) AS rk
          FROM u
        )
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM r WHERE rk = 1 AND op <> 'D'
    """
    o["distinct_users_per_type"] = """
        SELECT event_type, count(DISTINCT user_id) AS n_distinct
        FROM events GROUP BY 1
    """
    # independent derivation: the diff of (customer, cdc-applied customer)
    # follows directly from the changelog construction — %6 keys deleted,
    # remaining %3 keys renamed
    o["snapshot_diff_customers"] = """
        SELECT c_custkey,
               CASE WHEN c_custkey % 6 = 0 THEN 'removed' ELSE 'changed' END AS status
        FROM customer WHERE c_custkey % 3 = 0
    """
    # the bloom runtime filter is exact-transparent: oracle = plain join
    o["bloom_pruned_enrich"] = """
        SELECT e.event_id, e.user_id, c.c_mktsegment
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey AND c.c_custkey % 3 = 0
    """
    o["tpch_q17"] = """
        WITH a AS (
          SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                 count(*) AS cnt
          FROM lineitem GROUP BY 1
        )
        SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(25,10))), 2) AS DOUBLE)
                 AS total_extended_price,
               count(*) AS n_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#23'
        JOIN a ON l.l_partkey = a.l_partkey
        WHERE 5 * CAST(l.l_quantity AS BIGINT) * a.cnt < a.sum_qty
    """
    o["tpch_q2"] = f"""
        WITH eur AS (
          SELECT s_suppkey, s_name, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        ),
        p AS (SELECT p_partkey, p_brand FROM part
              WHERE p_type = 'LARGE' AND p_size <= 15),
        offers AS (
          SELECT p_partkey, p_brand, s_suppkey, s_name, n_name,
                 min({_LINE_CENTS_SQL}) AS cost_cents
          FROM lineitem
          JOIN p ON l_partkey = p_partkey
          JOIN eur ON l_suppkey = s_suppkey
          GROUP BY 1, 2, 3, 4, 5
        ),
        best AS (SELECT p_partkey AS bp, min(cost_cents) AS best_cents
                 FROM offers GROUP BY 1)
        SELECT p_partkey, p_brand, s_suppkey, s_name, n_name,
               cost_cents / 100.0 AS supply_cost
        FROM offers JOIN best ON p_partkey = bp AND cost_cents = best_cents
    """
    o["tpch_q11"] = f"""
        WITH s7 AS (
          SELECT s_suppkey FROM supplier
          JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
        ),
        v AS (
          SELECT l_partkey AS p_partkey,
                 CAST(sum({_LINE_CENTS_SQL}) AS BIGINT) AS value_cents
          FROM lineitem JOIN s7 ON l_suppkey = s_suppkey
          GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total,
                       count(*) AS np FROM v)
        SELECT p_partkey, value_cents / 100.0 AS part_value
        FROM v, tot WHERE value_cents * np > 2 * total
    """
    o["tpch_q16"] = """
        WITH p AS (
          SELECT p_partkey, p_brand, p_type, p_size FROM part
          WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
            AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        )
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN p ON l_partkey = p_partkey
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """
    o["tpch_q20"] = """
        WITH shipped AS (
          SELECT l_suppkey,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
          FROM lineitem
          JOIN part ON l_partkey = p_partkey AND contains(p_name, 'widget')
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          GROUP BY 1
          HAVING total_qty > 300
        )
        SELECT s_suppkey, s_name, n_name, total_qty
        FROM shipped
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
    """
    o["tpch_q21"] = """
        WITH per_order AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT CASE WHEN l_returnflag = 'R'
                                     THEN l_suppkey END) AS n_r_supp,
                 max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
                   AS wait_suppkey
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
          GROUP BY 1
        )
        SELECT s_suppkey, s_name, count(*) AS numwait
        FROM per_order
        JOIN supplier ON wait_suppkey = s_suppkey
        WHERE n_supp >= 2 AND n_r_supp = 1
        GROUP BY 1, 2
    """
    # all-pairs tf·idf cosine: fixed-point integer weights (tf·n·1000 // df),
    # HUGEINT dot/norm sums == Spark DECIMAL(38,0); final double div/sqrt
    # chain is correctly rounded identically in both engines
    o["text_cosine_pairs"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN
                list_transform(range(len(toks) - 1),
                               i -> toks[i+1] || ' ' || toks[i+2])
                ELSE [] END AS terms FROM t),
        inst AS (SELECT doc_id, unnest(terms) AS term FROM g),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM inst WHERE term <> '' GROUP BY 1, 2),
        dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM t),
        w AS (SELECT doc_id, term, (tf * n_docs * 1000) // df AS w
              FROM tf JOIN dfc USING (term) CROSS JOIN n),
        norms AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS norm2
                  FROM w GROUP BY 1),
        pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         CAST(count(*) AS INT) AS n_shared_terms,
                         sum(CAST(a.w AS HUGEINT) * b.w) AS dot
                  FROM w a JOIN w b
                    ON a.term = b.term AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT doc_a, doc_b, n_shared_terms,
               round(CAST(dot AS DOUBLE) /
                     (sqrt(CAST(na.norm2 AS DOUBLE)) *
                      sqrt(CAST(nb.norm2 AS DOUBLE))), 6) AS cosine
        FROM pairs JOIN norms na ON pairs.doc_a = na.doc_id
                   JOIN norms nb ON pairs.doc_b = nb.doc_id
        WHERE round(CAST(dot AS DOUBLE) /
                    (sqrt(CAST(na.norm2 AS DOUBLE)) *
                     sqrt(CAST(nb.norm2 AS DOUBLE))), 6) >= 0.3
    """
    # duplicated-span removal: block counts + ordered string_agg rebuild
    _doc_rel = "SELECT doc_id, text FROM documents"
    o["dedup_winnow_fp"] = dedup.winnow_fingerprints_sql(_doc_rel, "doc_id", 4, 4)
    o["dedup_winnow_pairs"] = dedup.winnow_overlap_pairs_sql(
        _doc_rel, "doc_id", 4, 4, 2, 50
    )
    o["dedup_winnow_spans"] = dedup.winnow_match_spans_sql(
        _doc_rel, "doc_id", 4, 4, 50
    )
    o["dedup_spans"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        b0 AS (SELECT doc_id, toks, len(toks) AS n, len(toks) // 5 AS nb
               FROM t),
        bl AS (SELECT doc_id, unnest(range(nb)) AS bpos, toks FROM b0),
        blocks AS (SELECT doc_id, bpos,
                          array_to_string(toks[bpos*5+1 : bpos*5+5], ' ')
                            AS btext
                   FROM bl),
        counts AS (SELECT btext, count(*) AS c FROM blocks GROUP BY 1),
        flagged AS (SELECT doc_id, bpos, btext, (c >= 2) AS dup
                    FROM blocks JOIN counts USING (btext)),
        per_doc AS (SELECT doc_id,
                           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS INT)
                             AS n_dup_blocks,
                           coalesce(string_agg(
                               CASE WHEN NOT dup THEN btext END, ' '
                               ORDER BY bpos), '') AS kept
                    FROM flagged GROUP BY 1),
        fin AS (SELECT b0.doc_id, CAST(b0.nb AS INT) AS n_blocks,
                       coalesce(p.n_dup_blocks, 0) AS n_dup_blocks,
                       concat_ws(' ', nullif(coalesce(p.kept, ''), ''),
                                 nullif(array_to_string(
                                     b0.toks[b0.nb*5+1 : b0.n], ' '), ''))
                         AS cleaned_text
                FROM b0 LEFT JOIN per_doc p USING (doc_id))
        SELECT doc_id, n_blocks, CAST(n_dup_blocks AS INT) AS n_dup_blocks,
               cleaned_text, md5(cleaned_text) AS cleaned_md5,
               CAST(CASE WHEN cleaned_text = '' THEN 0
                    ELSE len(regexp_split_to_array(cleaned_text, '\\s+'))
                    END AS INT) AS n_tokens_kept
        FROM fin
    """
    # full unrolled 8-iteration GD replay (classify.fit_sql docstring)
    o["classify_linear_probe"] = classify.fit_sql(iters=8, lr_num=2, lr_den=1)
    # constraint validation: one conditional sum per rule; NULL rule
    # result counts as a violation (mirrors validate_constraints)
    _vrules = {
        "value_non_negative": "value >= 0",
        "event_type_known": (
            "event_type IN ('click','view','purchase','signup','error')"
        ),
        "ts_not_null": "ts IS NOT NULL",
        "props_has_k": "regexp_matches(props, '\"k\": (\\d+)')",
        "user_id_in_range": "user_id >= 0 AND user_id < 1000000",
    }
    o["validate_events"] = " UNION ALL ".join(
        f"SELECT '{n}' AS rule, (SELECT count(*) FROM events) AS n_rows, "
        f"CAST(sum(CASE WHEN ({c}) IS NULL OR NOT ({c}) THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_violations, "
        f"sum(CASE WHEN ({c}) IS NULL OR NOT ({c}) THEN 1 ELSE 0 END) = 0 "
        f"AS passed FROM events"
        for n, c in _vrules.items()
    )
    o["unique_violations_users"] = """
        SELECT user_id, count(*) AS n_occurrences
        FROM events GROUP BY 1 HAVING count(*) > 1
    """
    # histogram: same decimal-scaled integer floor-division binning as
    # logops.value_histogram (lo=0, hi=20, 10 bins -> width 2_000_000 at
    # the 1e6 scale)
    o["hist_event_values"] = """
        WITH b AS (SELECT CAST(round(CAST(value AS DECIMAL(26,6)) * 1000000, 0)
                        AS BIGINT) AS vi
                   FROM events WHERE value IS NOT NULL),
        bb AS (SELECT greatest(-1, least(10, CAST(
                 CASE WHEN vi >= 0 THEN vi // 2000000
                      ELSE -((-vi) // 2000000)
                           - CASE WHEN (-vi) % 2000000 = 0 THEN 0 ELSE 1 END
                 END AS INT))) AS bin
               FROM b)
        SELECT bin, 0.0 + bin * 2.0 AS lo_edge, 0.0 + (bin + 1) * 2.0 AS hi_edge,
               count(*) AS n
        FROM bb GROUP BY 1
    """
    o["events_cohort_retention"] = logops.cohort_retention_sql(
        "SELECT user_id, ts FROM events"
    )

    _tx_rel = transcript.synth_transcript_sql(_CONV_N)
    o["transcript_parse"] = transcript.parse_turns_sql(_tx_rel)
    o["transcript_rejects"] = transcript.reject_turns_sql(_tx_rel)
    o["transcript_route_counts"] = transcript.route_counts_sql(_tx_rel)
    o["transcript_enrich_agg"] = transcript.enrich_agg_sql(_tx_rel)
    o["transcript_tool_summary"] = transcript.tool_summary_sql(_tx_rel)
    o["transcript_hourly"] = transcript.hourly_counts_sql(_tx_rel)
    o["transcript_topk_tools"] = transcript.topk_tools_sql(_tx_rel, 3)
    o["transcript_retry_loops"] = transcript.category_retry_loops_sql(_tx_rel, 2)
    o["transcript_latency_pctl"] = transcript.latency_percentiles_sql(_tx_rel)
    o["transcript_handoff_outcomes"] = transcript.handoff_outcomes_sql(_tx_rel)
    o["transcript_error_cascade"] = transcript.error_cascade_sql(_tx_rel)
    o["conv_outcome_by_depth"] = transcript.outcome_by_depth_sql(_tx_rel)
    o["transcript_status_flaps"] = transcript.status_flaps_sql(_tx_rel)
    o["transcript_slo_burn"] = transcript.slo_burn_sql(_tx_rel, 800)
    o["transcript_latency_by_status"] = transcript.latency_by_status_sql(_tx_rel)
    o["transcript_retry_recovery"] = transcript.retry_recovery_sql(_tx_rel)
    o["transcript_response_gap"] = transcript.response_gap_sql(
        convops.synth_conv_sql(_CONV_N)
    )
    o["conv_session_stats"] = transcript.session_stats_sql(
        convops.synth_conv_sql(_CONV_N), gap_seconds=40
    )
    o["conv_concurrency"] = transcript.conv_concurrency_sql(
        convops.synth_conv_sql(_CONV_N)
    )
    # JSONL-delivered fixture: DuckDB reads the same committed file
    # natively (read_json for rows, read_text line-split for rejects)
    _jsonl_rel = f"""
        SELECT conv_id, turn_idx, role, text, tool, ts_epoch
        FROM read_json('{_JSONL_FIXTURE}', format='newline_delimited',
          ignore_errors=true,
          columns={{'conv_id':'VARCHAR','turn_idx':'INT','role':'VARCHAR',
                   'text':'VARCHAR','tool':'VARCHAR','ts_epoch':'BIGINT'}})
        WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
    """
    o["jsonl_route_counts"] = transcript.route_counts_sql(_jsonl_rel)
    o["jsonl_rejects"] = f"""
        WITH raw AS (
          SELECT unnest(string_split(content, chr(10))) AS line
          FROM read_text('{_JSONL_FIXTURE}')
        ),
        nz AS (SELECT line FROM raw WHERE trim(line) <> ''),
        cls AS (
          SELECT line,
                 CASE WHEN NOT json_valid(line)
                           OR json_type(line) <> 'OBJECT' THEN 'bad_json'
                      WHEN json_extract_string(line, '$.conv_id') IS NULL
                        OR json_extract_string(line, '$.turn_idx') IS NULL
                      THEN 'missing_identity' END AS reject_reason
          FROM nz)
        SELECT line, reject_reason FROM cls WHERE reject_reason IS NOT NULL
    """
    o["transcript_tool_paths"] = transcript.tool_paths_sql(_tx_rel)
    o["transcript_wasted_latency"] = transcript.wasted_latency_sql(_tx_rel)
    o["sketch_hdr_latency"] = sketches.hdr_percentiles_sql(
        transcript.parse_turns_sql(_tx_rel), "latency_ms", "tool_called"
    )
    o["sketch_hdr_accuracy"] = f"""
        SELECT e.tool, e.p, s.value_lb, e.latency_p_ms,
               ((e.latency_p_ms - s.value_lb) * 1000000)
                 // e.latency_p_ms AS err_ppm
        FROM ({transcript.latency_percentiles_sql(_tx_rel)}) e
        JOIN ({o["sketch_hdr_latency"]}) s
          ON e.tool = s.tool_called AND e.p = s.p
    """
    o["text_vocab_drift"] = textstats.vocab_drift_sql(
        "SELECT text FROM documents WHERE doc_id % 2 = 0",
        "SELECT text FROM documents WHERE doc_id % 2 = 1",
        min_count=3,
    )
    o["profile_shuffle_plan"] = logops.shuffle_plan_sql(
        "SELECT user_id FROM events", "user_id", row_bytes=50_000, target_mb=1
    )
    o["embed_centroid_shift"] = similarity.centroid_shift_sql(
        "SELECT label, CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END"
        " AS period, embedding FROM embeddings",
        "period",
    )
    _recency = sampling.recency_weight_sql(
        "SELECT event_id, ts FROM events",
        "ts",
        now_epoch=1_800_000_000,
        half_life_days=30,
    )
    o["sample_recency_weights"] = (
        f"SELECT event_id, age_days, weight_ppm FROM ({_recency})"
    )
    o["transcript_conv_outcomes"] = transcript.conv_outcomes_sql(_tx_rel)
    o["transcript_tool_cooccur"] = transcript.tool_cooccurrence_sql(_tx_rel)
    o["transcript_templates"] = transcript.turn_templates_sql(_tx_rel, 3)

    _vocab_counts = f"""
        i AS (SELECT unnest(regexp_split_to_array({_NORM}, '\\s+')) AS token
              FROM documents),
        c AS (SELECT token, count(*) AS n FROM i
              WHERE token <> '' GROUP BY 1)
    """
    o["text_vocab"] = f"WITH {_vocab_counts} SELECT token, n FROM c WHERE n >= 5"
    o["text_vocab_coverage"] = f"""
        WITH {_vocab_counts},
        g AS (
          SELECT CAST(sum(n) AS BIGINT) AS n_instances,
                 count(*) AS n_types,
                 CAST(sum(CASE WHEN n >= 5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS kept_types,
                 CAST(sum(CASE WHEN n >= 5 THEN n ELSE 0 END) AS BIGINT)
                   AS kept_instances
          FROM c
        )
        SELECT *, (kept_instances * 10000) // n_instances / 10000.0 AS coverage
        FROM g
    """
    o["conv_sft_pairs"] = convops.sft_pairs_sql(convops.synth_conv_sql(_CONV_N))
    _conv_dup_rel = convops.synth_conv_dup_sql(_CONV_DUP_N)
    o["conv_dedup_pairs"] = convops.conv_dedup_pairs_sql(_conv_dup_rel)
    o["conv_boilerplate"] = convops.boilerplate_turns_sql(_conv_dup_rel)
    o["conv_prefix_groups"] = convops.prefix_groups_sql(_conv_dup_rel)
    o["conv_pref_pairs"] = convops.pref_pairs_sql(_conv_dup_rel)
    _bm25_terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    o["text_bm25_topk"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        docs AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(dl) AS BIGINT) AS s_toks FROM docs),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
               FROM (SELECT doc_id, unnest(toks) AS term FROM t)
               WHERE term IN ({_bm25_terms}) GROUP BY 1, 2),
        dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
        scored AS (
          SELECT tf.doc_id,
                 CAST(((2*(n_docs - df_t) + 1) * 1000000) // (2*df_t + 1)
                      AS BIGINT) AS idf_fp,
                 CAST((CAST(22 AS HUGEINT) * tf * s_toks * 1000000) //
                      (CAST(10 AS HUGEINT) * s_toks * tf + 3 * s_toks
                       + CAST(9 AS HUGEINT) * dl * n_docs) AS BIGINT) AS tf_sat_fp
          FROM tf JOIN dft USING (term) JOIN docs USING (doc_id)
          CROSS JOIN stats),
        agg AS (
          SELECT doc_id, CAST(count(*) AS INT) AS n_terms_matched,
                 CAST(sum(CAST(idf_fp AS HUGEINT) * tf_sat_fp // 1000000)
                      AS BIGINT) AS score_fp
          FROM scored GROUP BY 1)
        SELECT doc_id, n_terms_matched, score_fp,
               round(CAST(score_fp AS DOUBLE) / 1000000.0, 6) AS score,
               CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id ASC)
                    AS INT) AS rank
        FROM agg ORDER BY score_fp DESC, doc_id LIMIT 20
    """
    o["source_overlap"] = f"""
        WITH t AS (SELECT source AS src, {_TOKS} AS toks FROM documents),
        sh AS (SELECT DISTINCT src, s
               FROM (SELECT src, unnest(list_distinct({_SHINGLES})) AS s
                     FROM t)),
        counts AS (SELECT src, CAST(count(*) AS BIGINT) AS n_sh
                   FROM sh GROUP BY 1),
        sizes AS (SELECT t.src, CAST(COALESCE(c.n_sh, 0) AS BIGINT) AS n_sh
                  FROM (SELECT DISTINCT source AS src FROM documents) t
                  LEFT JOIN counts c USING (src)),
        common AS (SELECT a.src AS src_a, b.src AS src_b,
                          CAST(count(*) AS BIGINT) AS n_common
                   FROM sh a JOIN sh b ON a.s = b.s AND a.src < b.src
                   GROUP BY 1, 2),
        pairs AS (SELECT a.src AS src_a, a.n_sh AS n_a,
                         b.src AS src_b, b.n_sh AS n_b
                  FROM sizes a, sizes b WHERE a.src < b.src)
        SELECT src_a, src_b, n_a, n_b,
               COALESCE(n_common, 0) AS n_common,
               CASE WHEN n_a + n_b = 0 THEN 0.0
                    ELSE round(CAST(COALESCE(n_common, 0) AS DOUBLE)
                               / CAST(n_a + n_b - COALESCE(n_common, 0)
                                      AS DOUBLE), 4)
               END AS jaccard
        FROM pairs LEFT JOIN common USING (src_a, src_b)
    """
    o["conv_decontaminate"] = f"""
        WITH tx AS ({_conv_dup_rel}),
        conv AS (SELECT conv_id,
                        string_agg(text, ' ' ORDER BY turn_idx) AS text
                 FROM tx GROUP BY conv_id),
        t AS (SELECT conv_id, CAST(substr(conv_id, 5) AS BIGINT) AS num,
                     {_TOKS} AS toks
              FROM conv),
        g AS (SELECT conv_id, num, list_distinct({_SHINGLES}) AS grams FROM t),
        bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
                  WHERE num % 19 = 0),
        train AS (SELECT conv_id, grams FROM g WHERE num % 19 <> 0),
        tg AS (SELECT conv_id, unnest(grams) AS gram FROM train),
        ov AS (SELECT conv_id, count(*) AS n_overlap FROM tg
               WHERE gram IN (SELECT gram FROM bench) GROUP BY 1)
        SELECT t2.conv_id, CAST(len(t2.grams) AS INT) AS n_grams,
               CAST(coalesce(ov.n_overlap, 0) AS INT) AS n_overlap,
               coalesce(ov.n_overlap, 0) >= 5 AS contaminated
        FROM train t2 LEFT JOIN ov ON t2.conv_id = ov.conv_id
    """
    _pq_d2 = (
        "CAST(round(list_reduce(list_transform(range(8), "
        "i -> ({a}[i+1] - {b}[i+1]) * ({a}[i+1] - {b}[i+1])), "
        "(acc, x) -> acc + x) * 1000000) AS BIGINT)"
    )
    _pq_base = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        sub AS (SELECT vec_id, CAST(m AS INT) AS m,
                       v[m*8+1 : m*8+8] AS vsub
                FROM e, range(8) AS r(m)),
        cb AS (SELECT m, CAST(vec_id AS INT) AS code_id, vsub AS csub
               FROM sub WHERE vec_id < 16),
        scored AS (SELECT s.vec_id, s.m, c.code_id,
                          {_pq_d2.format(a='s.vsub', b='c.csub')} AS d2_fp
                   FROM sub s JOIN cb c USING (m)),
        best AS (SELECT vec_id, m, code_id, d2_fp,
                        row_number() OVER (PARTITION BY vec_id, m
                                           ORDER BY d2_fp, code_id) AS rk
                 FROM scored)
    """
    o["ann_pq_codes"] = f"""
        {_pq_base}
        SELECT vec_id, m, code_id, d2_fp FROM best WHERE rk = 1
    """
    o["ann_pq_topk"] = f"""
        {_pq_base},
        codes AS (SELECT vec_id AS neighbor_id, m, code_id
                  FROM best WHERE rk = 1),
        qsub AS (SELECT vec_id AS query_id, m, vsub FROM sub WHERE vec_id < 8),
        tbl AS (SELECT query_id, q.m, code_id,
                       {_pq_d2.format(a='q.vsub', b='c.csub')} AS d2_fp
                FROM qsub q JOIN cb c USING (m)),
        ad2 AS (SELECT t.query_id, c.neighbor_id,
                       CAST(sum(t.d2_fp) AS BIGINT) AS ad2_fp
                FROM codes c JOIN tbl t ON c.m = t.m AND c.code_id = t.code_id
                WHERE t.query_id <> c.neighbor_id
                GROUP BY 1, 2),
        r AS (SELECT query_id, neighbor_id, ad2_fp,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY ad2_fp ASC, neighbor_id ASC)
                       AS rk
              FROM ad2)
        SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank,
               round(CAST(ad2_fp AS DOUBLE) / 1000000.0, 6) AS approx_d2
        FROM r WHERE rk <= 5
    """
    # uniform-race weighted sample (sampling.weighted_sample): identical
    # md5 uniform, integer weight quantization, HUGEINT priority divide
    o["ann_recall_pq"] = f"""
        WITH ex AS (SELECT query_id, neighbor_id FROM ({o["ann_l2_topk"]})),
        ap AS (SELECT query_id, neighbor_id FROM ({o["ann_pq_topk"]})),
        hits AS (SELECT ex.query_id FROM ex
                 JOIN ap ON ex.query_id = ap.query_id
                        AND ex.neighbor_id = ap.neighbor_id)
        SELECT (SELECT CAST(count(DISTINCT query_id) AS BIGINT) FROM ex)
                 AS n_queries,
               (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_true_pairs,
               (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits,
               CAST(((SELECT count(*) FROM hits) * 1000000)
                    // (SELECT count(*) FROM ex) AS BIGINT) AS recall_ppm
    """
    o["sample_weighted"] = """
        WITH s AS (
          SELECT doc_id, source,
                 CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
                                      1, 12))::BIGINT AS HUGEINT) AS u,
                 CAST(round(length(text) * 10000) AS HUGEINT) AS wq
          FROM documents
        ),
        r AS (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY (u * 1000000) // wq, doc_id) AS rk
          FROM s WHERE wq > 0
        )
        SELECT doc_id, source, CAST(rk AS INT) AS wsample_rank
        FROM r WHERE rk <= 10
    """
    # round-4 additions: each mirror is generated by the operator's own
    # *_sql builder so the arithmetic cannot drift from the Spark side
    o["dedup_prefix_jaccard"] = dedup.prefix_jaccard_pairs_sql(
        "SELECT * FROM documents", _TOKS, _SHINGLES, threshold=0.5
    )
    o["sample_importance"] = sampling.importance_sample_sql(
        "SELECT * FROM documents", "source IN ('src0','src1')", 15
    )
    o["text_bpe_merges"] = bpe.bpe_merges_sql("SELECT * FROM documents", 6)
    o["text_bpe_tokens"] = bpe.bpe_token_counts_sql("SELECT * FROM documents", 6)
    # reciprocal-rank fusion of the BM25 oracle (embedded verbatim) and a
    # dense cosine ranking for query vector 0; integer 10^6 div (60+rank)
    o["retrieval_rrf"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
        ds AS (SELECT e.vec_id AS doc_id, round({_cos_sql('qv.q', 'e.v')}, 6) AS cos6
               FROM e, qv WHERE e.vec_id <> 0),
        dr AS (SELECT doc_id,
                      row_number() OVER (ORDER BY cos6 DESC, doc_id ASC) AS rank
               FROM ds),
        dense AS (SELECT doc_id, rank FROM dr WHERE rank <= 20),
        sparse AS (SELECT doc_id, rank FROM ({o["text_bm25_topk"]})),
        u AS (SELECT doc_id, CAST(rank AS BIGINT) AS rk FROM sparse
              UNION ALL
              SELECT doc_id, CAST(rank AS BIGINT) AS rk FROM dense),
        f AS (SELECT doc_id, CAST(count(*) AS INT) AS n_lists,
                     CAST(sum(1000000 // (60 + rk)) AS BIGINT) AS rrf_score_fp
              FROM u GROUP BY doc_id),
        r AS (SELECT *, row_number() OVER (ORDER BY rrf_score_fp DESC,
                                           doc_id ASC) AS fr
              FROM f)
        SELECT doc_id, n_lists, rrf_score_fp, CAST(fr AS INT) AS fused_rank
        FROM r WHERE fr <= 10
    """
    # LSH-vs-exact recall audit: both legs embedded verbatim from their
    # own oracles at the same threshold
    o["dedup_lsh_recall"] = f"""
        WITH lshp AS (SELECT id_a, id_b
                      FROM ({o["dedup_lsh_jaccard"]}) WHERE jaccard >= 0.5),
        exact AS (SELECT id_a, id_b FROM ({o["dedup_prefix_jaccard"]})),
        miss AS (SELECT e.id_a, e.id_b FROM exact e
                 LEFT JOIN lshp l ON e.id_a = l.id_a AND e.id_b = l.id_b
                 WHERE l.id_a IS NULL)
        SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_true_pairs,
               CAST((SELECT count(*) FROM lshp) AS BIGINT) AS n_lsh_pairs,
               CAST((SELECT count(*) FROM miss) AS BIGINT) AS n_missed,
               CASE WHEN (SELECT count(*) FROM exact) = 0 THEN NULL
                    ELSE CAST(((SELECT count(*) FROM exact)
                               - (SELECT count(*) FROM miss)) * 1000000
                              // (SELECT count(*) FROM exact) AS BIGINT)
               END AS recall_fp
    """
    # edit-distance refine of the LSH candidates: DuckDB's levenshtein
    # is the same unit-cost character edit distance as Spark's, and the
    # ppm similarity is pure integer division — bit-exact survivors
    o["dedup_pairs_editdist"] = f"""
        {_bands_cte},
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.j = b.j AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        ),
        scored AS (
          SELECT c.id_a, c.id_b,
                 CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist,
                 greatest(length(da.text), length(db.text)) AS maxlen
          FROM cand c
          JOIN documents da ON c.id_a = da.doc_id
          JOIN documents db ON c.id_b = db.doc_id
        )
        SELECT id_a, id_b, dist,
               CASE WHEN maxlen = 0 THEN CAST(1000000 AS BIGINT)
                    ELSE CAST((1000000 * (maxlen - dist)) // maxlen AS BIGINT)
               END AS sim_ppm
        FROM scored WHERE dist <= 100
    """
    o["text_langid_confusion"] = textstats.lang_id_confusion_sql(
        "SELECT doc_id, lang, text FROM documents"
    )
    o["text_ngram_diversity"] = textstats.ngram_diversity_sql(
        "SELECT source, text FROM documents"
    )
    _chrome_rel = (
        "SELECT doc_id, text"
        " || CASE WHEN doc_id % 2 = 0 THEN chr(10) ||"
        " 'Copyright Example Corp. All rights reserved.' ELSE '' END"
        " || CASE WHEN doc_id % 3 = 0 THEN chr(10) ||"
        " 'Subscribe to our newsletter today' ELSE '' END AS text"
        " FROM documents"
    )
    o["text_boilerplate_lines"] = textstats.boilerplate_lines_sql(_chrome_rel)
    o["text_boilerplate_clean"] = textstats.boilerplate_clean_sql(_chrome_rel)
    o["text_source_divergence"] = textstats.source_divergence_sql(
        "SELECT source, text FROM documents"
    )
    o["orders_rfm_segments"] = logops.rfm_segments_sql()
    o["orders_pareto_share"] = logops.pareto_share_sql()
    o["events_debounce"] = logops.debounce_events_sql()
    o["events_burstiness"] = logops.burstiness_sql()
    o["graph_kcore"] = graph.kcore_sql(
        graph.synth_links_skewed_sql(20_000, 1_000), k=12, rounds=6
    )
    o["transcript_abandon_hazard"] = transcript.abandon_hazard_sql(_tx_rel)
    o["graph_clustering_coeff"] = graph.clustering_coeff_sql(
        graph.synth_links_skewed_sql(20_000, 1_000)
    )
    o["hist_equidepth_values"] = logops.hist_equidepth_sql()
    o["orders_ship_sla"] = logops.ship_sla_sql()
    o["events_seasonal_spikes"] = logops.seasonal_spikes_sql()
    o["orders_benford"] = logops.benford_screen_sql()
    o["text_length_outliers"] = textstats.length_outliers_sql(
        "SELECT doc_id, source, n_chars FROM documents"
    )
    o["text_hapax_rate"] = textstats.hapax_rate_sql(
        "SELECT source, text FROM documents"
    )
    o["dedup_rate_by_source"] = f"""
        {_bands_cte},
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.j = b.j AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        ),
        ids AS (SELECT DISTINCT id FROM (
                  SELECT id_a AS id FROM cand
                  UNION ALL SELECT id_b AS id FROM cand))
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(i.id) AS BIGINT) AS n_dup_docs,
               (CAST(count(i.id) AS BIGINT) * 1000000)
                 // CAST(count(*) AS BIGINT) AS dup_ppm
        FROM documents d LEFT JOIN ids i ON d.doc_id = i.id
        GROUP BY 1
    """
    # curriculum phases: integer histogram-quantile assignment over the
    # rounded quality value relation (no interpolated percentiles), with
    # the deterministic md5 within-phase order key
    o["sample_curriculum"] = f"""
        WITH q AS (SELECT doc_id, quality FROM ({o["text_quality"]})),
        hist AS (SELECT quality AS v, count(*) AS n FROM q GROUP BY 1),
        cum AS (SELECT v,
                       coalesce(sum(n) OVER (ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS cum_lt,
                       sum(n) OVER () AS total
                FROM hist)
        SELECT q.doc_id, q.quality,
               CAST(least(3, 4 * cum.cum_lt // cum.total) AS INT) AS phase,
               md5('cur:' || CAST(q.doc_id AS VARCHAR)) AS order_key
        FROM q JOIN cum ON q.quality = cum.v
    """
    # inverse-cluster-size ppm weights over the exact-CC cluster oracle
    o["dedup_cluster_weights"] = f"""
        WITH base AS ({o["dedup_clusters"]}),
        sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
               FROM base GROUP BY cluster_id)
        SELECT b.doc_id, b.cluster_id, s.cluster_size,
               CAST(1000000 // s.cluster_size AS BIGINT) AS weight_ppm
        FROM base b JOIN sz s USING (cluster_id)
    """
    # split CASE generated by the operator's own SQL builder, keyed on
    # the cluster id from the exact-CC oracle
    _leak_case = sampling.split_dataset_sql(
        {"train": 0.9, "test": 0.1}, "cluster_id", salt="leak"
    )
    o["sample_split_leakage_safe"] = f"""
        WITH base AS ({o["dedup_clusters"]})
        SELECT doc_id, cluster_id, {_leak_case} AS split FROM base
    """
    # JL sign projection over the shared _Q8 quantization: the SAME
    # driver-side md5 sign matrix (rp_sign_matrix) folded into both
    # engines' plans; Σ s·q expressed as list_select(+1) - list_select(-1)
    _rp_signs = similarity.rp_sign_matrix(16, 64, "rp")
    _rp_exprs = []
    for _sj in _rp_signs:
        _plus = [i + 1 for i, s in enumerate(_sj) if s == 1]
        _minus = [i + 1 for i, s in enumerate(_sj) if s == -1]
        _rp_exprs.append(
            f"CAST(coalesce(list_sum(list_select(q, {_plus})), 0)"
            f" - coalesce(list_sum(list_select(q, {_minus})), 0) AS BIGINT)"
        )
    o["embed_random_projection"] = f"""
        {_Q8}
        SELECT vec_id, round(scale, 6) AS rp_scale,
               array_to_string([{", ".join(_rp_exprs)}], ',') AS rp_vec
        FROM nn
    """
    # PSI-style drift between the two halves of the events range; same
    # DECIMAL-scaled binning as hist_event_values (lo=0 hi=100 bins=10 →
    # width_i = 10^7 in the 10^6-scaled integer domain)
    o["profile_drift"] = """
        WITH b AS (SELECT CAST(round(CAST(value AS DECIMAL(26,6)) * 1000000, 0)
                        AS BIGINT) AS vi,
                        (ts >= TIMESTAMP '2024-01-16 00:00:00') AS isb
                   FROM events WHERE value IS NOT NULL),
        bb AS (SELECT greatest(-1, least(10, CAST(
                 CASE WHEN vi >= 0 THEN vi // 10000000
                      ELSE -((-vi) // 10000000)
                           - CASE WHEN (-vi) % 10000000 = 0 THEN 0 ELSE 1 END
                 END AS INT))) AS bin, isb
               FROM b),
        c AS (SELECT bin,
                     CAST(sum(CASE WHEN isb THEN 0 ELSE 1 END) AS BIGINT) AS n_a,
                     CAST(sum(CASE WHEN isb THEN 1 ELSE 0 END) AS BIGINT) AS n_b
              FROM bb GROUP BY bin),
        t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM c),
        p AS (SELECT bin, n_a, n_b,
                     CAST(CASE WHEN ta > 0 THEN (n_a * 1000000) // ta
                               ELSE 0 END AS BIGINT) AS ppm_a,
                     CAST(CASE WHEN tb > 0 THEN (n_b * 1000000) // tb
                               ELSE 0 END AS BIGINT) AS ppm_b
              FROM c, t)
        SELECT bin, 0.0 + bin * 10.0 AS lo_edge, 0.0 + (bin + 1) * 10.0 AS hi_edge,
               n_a, n_b, ppm_a, ppm_b,
               CAST(abs(ppm_a - ppm_b) AS BIGINT) AS drift_ppm
        FROM p
    """
    # k-NN majority-vote label propagation: identical cosine fold, ranks
    # on round(cos,6) desc / neighbor id asc; vote tie-break = votes
    # desc, best (nearest) rank asc, smaller label
    o["embed_knn_classify"] = f"""
        WITH e AS (SELECT vec_id, label, {_V64} AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 10 = 0),
        s AS (SELECT q.query_id, e.vec_id AS nid, e.label AS nlabel,
                     round({_cos_sql('q.qv', 'e.v')}, 6) AS c6
              FROM q JOIN e ON q.query_id <> e.vec_id),
        r AS (SELECT query_id, nlabel,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY c6 DESC, nid ASC) AS rk
              FROM s),
        t AS (SELECT query_id, nlabel, CAST(count(*) AS INT) AS votes,
                     min(rk) AS best_rank
              FROM r WHERE rk <= 5 GROUP BY query_id, nlabel),
        b AS (SELECT query_id, nlabel, votes,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY votes DESC, best_rank ASC,
                                                 nlabel ASC) AS brk
              FROM t)
        SELECT query_id, nlabel AS predicted_label, votes FROM b WHERE brk = 1
    """
    # Per-label centroid outliers: centroid from EXACT integer component
    # sums (scale 10^4), distance re-derived as the same double fold
    _co_diff = (
        "CAST(fq[i+1] AS DOUBLE) / 10000.0"
        " - CAST(s[i+1] AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)"
    )
    _co_sums = ", ".join(f"sum(fq[{i + 1}])" for i in range(64))
    o["embed_centroid_outliers"] = f"""
        WITH e AS (SELECT vec_id, label, {_V64} AS v FROM embeddings),
        q AS (SELECT label, vec_id,
                     list_transform(v, x -> CAST(floor(x * 10000 + 0.5)
                                                 AS BIGINT)) AS fq
              FROM e),
        m AS (SELECT label, CAST(count(*) AS BIGINT) AS n, [{_co_sums}] AS s
              FROM q GROUP BY label),
        d AS (SELECT q.label, q.vec_id,
                     round(list_reduce(list_transform(range(64),
                           i -> ({_co_diff}) * ({_co_diff})),
                           (acc, x) -> acc + x), 6) AS d2,
                     m.n
              FROM q JOIN m ON q.label = m.label),
        r AS (SELECT label, vec_id, d2, n,
                     row_number() OVER (PARTITION BY label
                                        ORDER BY d2 DESC, vec_id ASC) AS rk
              FROM d)
        SELECT label, vec_id, d2, CAST(rk AS INT) AS outlier_rank, n
        FROM r WHERE rk <= 5
    """
    o["embed_pca_top"] = similarity.pca_power_sql(
        "SELECT embedding FROM embeddings", iters=6, dims=64
    )
    o["embed_whiten"] = similarity.whiten_top_component_sql(
        "SELECT vec_id, embedding FROM embeddings", iters=6, dims=64
    )
    o["embed_label_balance"] = similarity.label_balance_sql(
        "SELECT * FROM embeddings"
    )
    o["transcript_latency_mad"] = transcript.latency_mad_outliers_sql(
        _tx_rel, spike=(97, 40)
    )
    o["transcript_latency_drift"] = transcript.latency_drift_sql(_tx_rel)
    o["sample_shard_manifest"] = sampling.shard_by_bytes_sql(
        "SELECT doc_id, n_chars FROM documents", 8, "doc_id", "n_chars"
    )
    o["embed_hard_negatives"] = f"""
        WITH e AS (SELECT vec_id, label, {_V64} AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
              FROM e WHERE vec_id < 8),
        s AS (SELECT q.query_id,
                     CASE WHEN e.label = q.qlabel THEN 'pos'
                          ELSE 'neg' END AS kind,
                     e.vec_id AS neighbor_id,
                     round({_cos_sql('q.qv', 'e.v')}, 6) AS cos6
              FROM e, q WHERE e.vec_id <> q.query_id),
        r AS (SELECT query_id, kind, neighbor_id, cos6,
                     row_number() OVER (PARTITION BY query_id, kind
                                        ORDER BY cos6 DESC, neighbor_id ASC)
                       AS rk
              FROM s)
        SELECT query_id, kind, CAST(rk AS INT) AS rank, neighbor_id,
               round(cos6, 4) AS cos_sim
        FROM r WHERE rk <= 3
    """
    o["conv_degenerate_runs"] = convops.degenerate_runs_sql(
        convops.synth_conv_degen_sql(_CONV_N)
    )
    o["conv_repair_order"] = convops.repair_turn_order_sql(
        convops.synth_conv_corrupt_sql(_CONV_N)
    )
    o["conv_collapse_runs"] = convops.collapse_degenerate_runs_sql(
        convops.synth_conv_degen_sql(_CONV_N)
    )
    o["conv_split_episodes"] = convops.split_conversations_sql(
        convops.synth_conv_sql(_CONV_N), gap_s=40
    )
    o["conv_episode_stats"] = convops.episode_stats_sql(
        convops.synth_conv_sql(_CONV_N), gap_s=40
    )
    o["conv_pack_masks"] = convops.pack_with_masks_sql(
        _conv_rel, budget_tokens=256, n_buckets=16
    )
    o["conv_truncate_context"] = convops.truncate_context_sql(
        convops.synth_conv_sql(_CONV_N), budget_chars=200
    )
    o["sample_calibrated"] = sampling.calibrate_scores_sql(
        f"""SELECT q.doc_id, d.source, q.quality
            FROM ({o["text_quality"]}) q JOIN documents d USING (doc_id)""",
        "quality",
    )
    o["sample_length_buckets"] = sampling.length_buckets_sql(
        convops.conv_reconstruct_sql(convops.synth_conv_sql(_CONV_N)), "n_tokens"
    )
    o["conv_integrity"] = convops.conv_integrity_sql(
        convops.synth_conv_corrupt_sql(_CONV_N)
    )
    # Embedding-level decontamination: same hyperplane bucket literal
    # construction as embed_lsh_buckets but 6 planes (see queries());
    # keep each corpus row's strongest eval match
    _bucket6 = " || ".join(
        _plane_bit(w) for w in similarity.hyperplane_weights(6, 64)
    )
    o["embed_decontaminate"] = f"""
        WITH e AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        c AS (SELECT vec_id, v, {_bucket6} AS bucket FROM e
              WHERE vec_id % 17 <> 0),
        ev AS (SELECT vec_id AS eval_id, v, {_bucket6} AS bucket FROM e
               WHERE vec_id % 17 = 0),
        h AS (SELECT c.vec_id, ev.eval_id,
                     round({_cos_sql('c.v', 'ev.v')}, 4) AS cos_sim
              FROM c JOIN ev ON c.bucket = ev.bucket),
        f AS (SELECT vec_id, eval_id, cos_sim,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos_sim DESC,
                                                 eval_id ASC) AS rk
              FROM h WHERE cos_sim >= 0.15)
        SELECT vec_id, eval_id, cos_sim FROM f WHERE rk = 1
    """
    o["dedup_substring_spans"] = dedup.exact_substring_spans_sql(
        "documents", k=24, stride=1, min_count=2
    )
    # scored relation mirrors quality_score(keep_cols=("source",))
    _scored_src = f"""
        SELECT d.doc_id, d.source, q.n_tokens, q.quality
        FROM documents d JOIN ({o["text_quality"]}) q ON d.doc_id = q.doc_id
    """
    o["sample_token_budget"] = sampling.token_budget_select_sql(_scored_src, 800)
    o["text_vocab_growth"] = textstats.vocab_growth_sql("documents")
    o["transcript_returns"] = transcript.trajectory_returns_sql(_tx_rel, 8)
    o["dedup_substring_rate"] = dedup.substring_dup_rate_sql(
        "documents", k=24, stride=1, min_count=2
    )
    o["sample_epoch_shuffle"] = sampling.epoch_shuffle_sql(
        "documents", epochs=2, n_shards=4
    )
    o["transcript_grpo_adv"] = transcript.group_advantages_sql(_tx_rel)
    # Matryoshka audit: full-dim vs 16-dim-prefix brute top-5, recall
    # fold identical to ann_recall_ivf's (dot/norm folds in range order)
    _dot16 = (
        "list_reduce(list_transform(range(16), i -> q.qv[i+1] * e.v[i+1]), "
        "(acc, x) -> acc + x)"
    )
    _cos16 = f"{_dot16} / ({_norm_sql('q.qv')} * {_norm_sql('e.v')})"
    o["embed_matryoshka_recall"] = f"""
        WITH ebase AS (SELECT vec_id, {_V64} AS v FROM embeddings),
        exs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                       round({_cos_sql('q.qv', 'e.v')}, 6) AS c
                FROM ebase e,
                     (SELECT vec_id AS query_id, v AS qv FROM ebase
                      WHERE vec_id < 8) q
                WHERE e.vec_id <> q.query_id),
        ex AS (SELECT query_id, neighbor_id FROM (
                 SELECT query_id, neighbor_id,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY c DESC, neighbor_id ASC)
                          AS rk
                 FROM exs) WHERE rk <= 5),
        e16 AS (SELECT vec_id, v[1:16] AS v FROM ebase),
        aps AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                       round({_cos16}, 6) AS c
                FROM e16 e,
                     (SELECT vec_id AS query_id, v AS qv FROM e16
                      WHERE vec_id < 8) q
                WHERE e.vec_id <> q.query_id),
        ap AS (SELECT query_id, neighbor_id FROM (
                 SELECT query_id, neighbor_id,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY c DESC, neighbor_id ASC)
                          AS rk
                 FROM aps) WHERE rk <= 5),
        hits AS (SELECT ex.query_id FROM ex
                 JOIN ap ON ex.query_id = ap.query_id
                        AND ex.neighbor_id = ap.neighbor_id)
        SELECT (SELECT CAST(count(DISTINCT query_id) AS BIGINT) FROM ex)
                 AS n_queries,
               (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_true_pairs,
               (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits,
               CAST(((SELECT count(*) FROM hits) * 1000000)
                    // (SELECT count(*) FROM ex) AS BIGINT) AS recall_ppm
    """
    # asymmetric containment refine over the same band-candidate chain
    o["dedup_containment"] = f"""
        {_bands_cte},
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.j = b.j AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        ),
        m AS (SELECT c.id_a, c.id_b,
                     CAST(len(list_intersect(sa.shd, sb.shd)) AS BIGINT)
                       AS n_shared,
                     CAST(len(sa.shd) AS BIGINT) AS n_a,
                     CAST(len(sb.shd) AS BIGINT) AS n_b
              FROM cand c JOIN sh sa ON c.id_a = sa.doc_id
                          JOIN sh sb ON c.id_b = sb.doc_id),
        p AS (SELECT id_a, id_b, n_shared, n_a, n_b,
                     CAST((n_shared * 1000000) // n_a AS BIGINT)
                       AS contain_a_ppm,
                     CAST((n_shared * 1000000) // n_b AS BIGINT)
                       AS contain_b_ppm
              FROM m)
        SELECT * FROM p
        WHERE greatest(contain_a_ppm, contain_b_ppm) >= 400000
    """
    o["dedup_cluster_sizes"] = f"""
        WITH cl AS ({o["dedup_clusters"]}),
        sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                  FROM cl GROUP BY cluster_id)
        SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        FROM sizes GROUP BY cluster_size
    """
    _conj_bm25 = f"""
        SELECT doc_id FROM documents
        WHERE {" AND ".join(f"list_contains({_TOKS}, '{t}')" for t in _BM25_TERMS)}
    """
    o["text_retrieval_eval"] = textstats.retrieval_effectiveness_sql(
        o["text_bm25_topk"], _conj_bm25
    )
    o["dedup_substring_clean"] = dedup.apply_substring_removal_sql(
        "documents",
        dedup.exact_substring_spans_sql(
            "documents", k=24, stride=1, min_count=2
        ),
    )
    o["text_collocations"] = textstats.collocations_sql(
        "SELECT text FROM documents", min_count=3, top_n=50
    )
    o["text_phrase_search"] = textstats.phrase_search_sql(
        "SELECT doc_id, text FROM documents", "stream table hash"
    )
    o["graph_communities"] = graph.label_propagation_sql(
        graph.synth_links_sql(20_000, 1_000), iters=4
    )
    o["graph_degree_stats"] = graph.degree_histogram_sql(
        graph.synth_links_skewed_sql(20_000, 1_000)
    )
    o["transcript_tool_hhi"] = transcript.tool_concentration_sql(_tx_rel)
    o["corpus_datacard"] = textstats.corpus_datacard_sql(
        "SELECT * FROM documents"
    )
    o["transcript_tool_stationary"] = transcript.tool_stationary_sql(
        _tx_rel, iters=8
    )
    o["graph_bfs_levels"] = graph.bfs_levels_sql(
        graph.synth_links_sql(5_000, 2_000), [0, 1], max_depth=4
    )
    o["text_url_domains"] = textstats.url_domain_stats_sql(
        "(SELECT doc_id, text || ' http://site' || CAST(doc_id % 97 AS VARCHAR)"
        " || '.example' || CASE WHEN doc_id % 3 = 0 THEN '.com' ELSE '.org' END"
        " || '/p' || CASE WHEN doc_id % 5 = 0 THEN ' https://Mirror'"
        " || CAST(doc_id % 97 AS VARCHAR) || '.example.org/q' ELSE '' END"
        " AS text FROM documents)"
    )
    o["quality_pr_curve"] = classify.pr_curve_sql(
        "documents", "n_chars", "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"
    )
    return o
