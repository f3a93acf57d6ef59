"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB: never materialize O(n²) pairs. The scale path is
  shingle → MinHash signature (narrow map)
  → LSH banding (explode bands: n_bands× fan-out, still narrow)
  → shuffle ONLY on (band, band_hash) — candidate buckets
  → exact Jaccard refine on candidates only.
All hashing is md5-based so the arithmetic is reproducible in any engine
(the DuckDB oracle recomputes identical signatures); a production tune-up
would swap md5 for xxhash64 — the operator shape is unchanged.

Everything is pure Column expressions over higher-order functions; the
only shuffles are the LSH bucket join and final distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from . import iterutils
from .textstats import (
    _barrier,
    gram_arr,
    normalize_text,
    shingles,
    spread as _spread,
    tokens,
)


def shingle_set(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (set semantics for Jaccard)."""
    return F.array_distinct(shingles(col, n))


def exact_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via hash-groupBy on the normalized-text md5.

    Returns one row per distinct fingerprint: the canonical (minimum) id
    and the duplicate count. Map-side partial agg keeps the shuffle to
    one row per distinct document."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return (
        df.select(fp.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_docs"))
    )


def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, sh) relation of distinct shingle arrays — the shared input of
    signature generation AND candidate refinement (compute once)."""
    return df.select(F.col(id_col), shingle_set(F.col(text_col), n).alias("sh"))


def _cached_sets(
    df: DataFrame, id_col: str, text_col: str, n: int, cache: bool = True
) -> DataFrame:
    """The materialized shingle relation every MinHash/Jaccard stage reads.

    Materializing is load-bearing twice over: (1) the relation feeds the
    16-hash signature AND both refine sides — one compute instead of
    four; (2) explode() fused directly over the interpreted higher-order-
    function shingle projection is a measured ~20× pathology (the HOF
    chain is CodegenFallback; under GenerateExec the fused plan spends
    ~6s on work that costs 0.3s materialized, sf0.1×32 cores) — the
    barrier keeps the generator reading a materialized array column.
    persist() registers by canonical plan, so every operator touching the
    same corpus shares ONE cache entry (MEMORY_AND_DISK: spills, never
    recomputes). Lifecycle: the entry lives until the session ends;
    long-lived sessions iterating over many distinct corpora should pass
    ``cache=False`` (every public operator forwards it) or release with
    ``spark.catalog.clearCache()``."""
    sets = shingle_sets(_spread(df), id_col, text_col, n)
    return sets.persist(StorageLevel.MEMORY_AND_DISK) if cache else sets


def _refine(sets: DataFrame, pairs: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """Exact Jaccard refine of candidate pairs against a shingle relation
    — the single implementation both jaccard_pairs and lsh_jaccard use
    (identical arithmetic ⇒ identical DuckDB oracle)."""
    a = sets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_from_sets(sets: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    """MinHash signature columns h0..h{H-1}: h_i = min over shingles of
    md5(i ':' shingle). min over hex strings is a valid min-wise hash
    family (lexicographic order on a uniform hash).

    Why H independent md5s and not one-md5 double hashing (g_i = h1 +
    i·h2): measured — the correlated family makes neighboring bands
    nearly identical, inflating LSH candidates ~12× at sf0.1 (1,298 →
    16,366 pairs) and tripling refine cost; the md5-per-i family keeps
    bands independent. The remaining prod tune-up is swapping md5 for
    H seeded xxhash64 calls (same independence, ~5× cheaper per hash,
    not DuckDB-reproducible so not used here).

    Shape chosen for whole-stage codegen: explode the shingle set into
    rows, hash with plain column md5 (JVM codegen — higher-order-function
    lambdas are interpreted and ~20× slower here), then one hash
    aggregate with H min()s and map-side partial combine. Documents with
    fewer than ``n`` tokens have no shingles and drop out (no signature
    ⇒ exempt from near-dup detection — route them to exact dedup)."""
    sh = sets.select(F.col(id_col), F.explode("sh").alias("s"))
    mins = [
        F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("s")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*mins)


def minhash_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    n: int = 3,
    cache: bool = True,
) -> DataFrame:
    return _minhash_from_sets(
        _cached_sets(df, id_col, text_col, n, cache), id_col, num_hashes
    )


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    n: int = 3,
    cache: bool = True,
) -> DataFrame:
    """Per-document MinHash signature as a single pipe-delimited string
    (stable, hashable representation)."""
    sig = minhash_table(df, id_col, text_col, num_hashes, n, cache)
    return sig.select(
        F.col(id_col),
        F.concat_ws("|", *[F.col(f"h{i}") for i in range(num_hashes)]).alias("minhash_sig"),
    )


def lsh_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    rows_per_band: int = 2,
    n: int = 3,
    cache: bool = True,
) -> DataFrame:
    """Explode each doc into (band, band_hash) rows — the LSH bucketing
    fan-out. num_hashes/rows_per_band bands; docs colliding in any band
    are near-dup candidates."""
    sig = minhash_table(df, id_col, text_col, num_hashes, n, cache)
    return _bands_from_sig(sig, id_col, num_hashes, rows_per_band)


def _bands_from_sig(
    sig: DataFrame, id_col: str, num_hashes: int, rows_per_band: int
) -> DataFrame:
    n_bands = num_hashes // rows_per_band
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
            ).alias("band_hash"),
        )
        for b in range(n_bands)
    ])
    return sig.select(F.col(id_col), F.explode(bands).alias("bh")).select(
        id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash")
    )


def lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    rows_per_band: int = 2,
    n: int = 3,
    cache: bool = True,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any LSH band.

    The self-join's two sides share an identical aggregate subtree, so
    Spark reuses the shuffle (ReusedExchange) instead of recomputing
    signatures. The join key (band, band_hash) is high-cardinality, so
    the shuffle partitions evenly; a pathological all-identical corpus
    would hot-spot one bucket — AQE skew-join splitting handles that."""
    b = lsh_bands(df, id_col, text_col, num_hashes, rows_per_band, n, cache)
    return _pairs_from_bands(b, id_col)


def _pairs_from_bands(b: DataFrame, id_col: str) -> DataFrame:
    left = b.select(F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_a"))
    right = b.select(F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_b"))
    return (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.0,
    cache: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard for the given candidate pairs.

    jaccard = |A ∩ B| / |A ∪ B| on distinct shingle sets — integer set
    sizes, so the double division is bit-deterministic."""
    sets = _cached_sets(df, id_col, text_col, n, cache)
    return _refine(sets, pairs, id_col, threshold)


def lsh_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    rows_per_band: int = 2,
    n: int = 3,
    threshold: float = 0.0,
    use_cache: bool = True,
) -> DataFrame:
    """One-pass LSH near-dup pipeline: shingle sets → MinHash → band
    candidates → exact Jaccard refine, with the shingle-set relation
    computed ONCE and shared by all three consumers.

    The composed form (jaccard_pairs(df, lsh_candidates(df))) scans the
    source and re-materializes shingles four times — once for the
    signature and once per refine side; here ``sets`` is persisted
    (MEMORY_AND_DISK — spills, never recomputes) so the plan does one
    scan + one shingle pass total. The cache lives until the session ends
    or the caller unpersists; it is one array column per document —
    O(corpus shingles), the same size the refine shuffle moves anyway.
    Results are identical to the composed form (same candidates, same
    Jaccard arithmetic, same DuckDB oracle)."""
    sets = _cached_sets(df, id_col, text_col, n, cache=use_cache)
    sig = _minhash_from_sets(sets, id_col, num_hashes)
    cand = _pairs_from_bands(
        _bands_from_sig(sig, id_col, num_hashes, rows_per_band), id_col
    )
    return _refine(sets, cand, id_col, threshold)


def canonical_corpus(
    df: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The keep-one-copy step: restrict the corpus to each cluster's
    canonical member (minimum id, per ``dup_clusters``). LEFT join on the
    id with ``coalesce(cluster_id, id)``: a row missing from the clusters
    relation is its own (singleton) cluster — so the relation may safely
    be pruned to non-singleton clusters first, which makes it small
    enough to broadcast at corpus scale (the full relation is
    |corpus|-sized and forces a sort-merge join)."""
    return (
        df.join(clusters, id_col, "left")
        .filter(F.coalesce(F.col("cluster_id"), F.col(id_col)) == F.col(id_col))
        .drop("cluster_id")
    )


def dup_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    check_every: int = 2,
    checkpoint: str = "auto",
) -> DataFrame:
    """Resolve near-dup pairs into clusters: connected components with
    the minimum member id as the canonical label (the keep-one-copy step
    of a dedup pipeline).

    Iterative min-label propagation over the undirected candidate-pair
    edges: each round every node takes the min of its own label and its
    neighbors' labels; converges in O(component diameter) rounds (dup
    clusters are near-cliques from LSH, so 2-3 in practice). Each round is
    one join + one hash aggregate; checkpointing truncates the growing
    lineage so plan size stays constant. Driver-side logic is control flow
    only (the convergence check is an aggregate, not a collect of data
    rows), and it runs only every ``check_every`` rounds to halve the
    action count on long chains.

    Termination is exact: the loop runs until NO label changes; if that
    has not happened within ``max_iter`` rounds it RAISES rather than
    silently returning unconverged (wrong) labels — an unconverged result
    would disagree with the exact connected-components oracle.

    ``checkpoint``: "auto" (default — reliable iff the session has a
    checkpoint dir configured, i.e. on cluster deployments; local
    otherwise), "local" (executor-local, fast — fine single-JVM and for
    short jobs) or "reliable" (``DataFrame.checkpoint`` to the
    SparkContext checkpoint dir — survives executor loss)."""
    checkpoint = iterutils.resolve_checkpoint_mode(ids, checkpoint)
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        # persist: each round is its own job, so without this every round
        # re-derives the edge set from scratch — with LSH candidates as
        # input that re-runs the whole MinHash pipeline per round.
        # Unpersisted before return (labels are checkpointed, lineage-free).
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = ids.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    converged = False
    for it in range(1, max_iter + 1):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
            )
        )
        new_labels = iterutils.truncate_lineage(new_labels, checkpoint)
        if it % check_every == 0 or it == max_iter:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            if changed == 0:
                labels = new_labels
                converged = True
                break
        labels = new_labels
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge within max_iter={max_iter} rounds; "
            "raise max_iter (component diameter exceeds it)"
        )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Term-frequency SimHash over md5 hex digits, emitted as a bitstring.

    Bit j is set iff sum over tokens of (+1 if hex digit j of md5(token)
    >= '8' else -1) >= 0 — each hex digit's high bit is an independent
    hash bit. Bitstring output avoids any cross-engine integer-conversion
    ambiguity; hamming distance = count of differing positions.

    Shape: explode tokens → ONE md5 per token (projection) → hash
    aggregate with ``bits`` conditional sums → bit concat. The obvious
    per-row ``F.aggregate`` fold is a CodegenFallback (interpreted) and
    re-hashes every token once per bit — this form is whole-stage
    codegen'd, hashes once, and parallelizes across cores (~10× at
    sf0.1). Every document yields ≥1 token row (tokens of "" is [""]),
    so no doc drops out of the aggregate."""
    # explode_outer, not explode: a NULL text yields a NULL token row, so
    # the doc still gets its all-zero-bits signature (md5(NULL) sums to
    # -1 per bit) instead of silently vanishing from the output
    toks = _spread(df).select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("tok")
    )
    hashed = toks.select(F.col(id_col), F.md5("tok").alias("h"))
    sums = [
        F.sum(F.when(F.substring(F.col("h"), j + 1, 1) >= "8", 1).otherwise(-1)).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*sums)
    sim = F.concat(
        *[F.when(F.col(f"b{j}") >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(bits)]
    )
    return agg.select(F.col(id_col), sim.alias("simhash"))


# --- incremental dedup against a persisted signature index ------------------
#
# The continuous-ingest scale path: a corpus that grows by batches must not
# re-shingle its history on every arrival. The index is the MinHash signature
# table — ONE fixed-width row per document (H 32-hex-char strings ≈ H*32
# bytes), ~0.5 KB/doc at H=16 regardless of document length — persisted via
# StageStore (Iceberg table in production). Each new batch:
#   1. computes signatures for the NEW docs only (one scan of new text),
#   2. derives LSH bands from both new signatures and the stored index
#      (a narrow projection — md5 over fixed-width columns, no text touched),
#   3. joins new-bands to index-bands plus new-bands to itself on the
#      high-cardinality (band, band_hash) key,
#   4. scores candidates with the signature-estimated Jaccard
#      (matching-position fraction — the standard MinHash estimator),
#   5. appends the non-duplicate new signatures to the index (index_merge).
# The old corpus' TEXT is never re-read and its signatures are never
# recomputed; per-batch cost is O(|new|) + one join against the index. At
# 100 TB, store the index bucketed by a band_hash prefix so the index side
# of the candidate join is storage-partitioned (zero shuffle on the big
# side); AQE handles the residual skew of hot buckets.


def signature_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    n: int = 3,
    cache: bool = True,
) -> DataFrame:
    """Build the dedup index relation (id, h0..h{H-1}) for a corpus.

    This is the table to persist (StageStore.commit / an Iceberg table);
    ``incremental_dedup`` consumes it for every subsequent batch.
    Documents with fewer than ``n`` tokens have no shingles, hence no
    signature — they are exempt from near-dup detection (route them to
    ``exact_dups``), matching the batch LSH operators."""
    return minhash_table(df, id_col, text_col, num_hashes, n, cache)


def _sig_est_jaccard(num_hashes: int) -> Column:
    """Estimated Jaccard from two aligned signatures ha*/hb*: the fraction
    of matching MinHash positions (unbiased estimator of true Jaccard,
    std-err ~ sqrt(j(1-j)/H)). Integer count / constant ⇒ deterministic."""
    eq = None
    for i in range(num_hashes):
        term = F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0)
        eq = term if eq is None else eq + term
    return F.round(eq.cast("double") / F.lit(float(num_hashes)), 4)


def incremental_dedup(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    rows_per_band: int = 2,
    n: int = 3,
    threshold: float = 0.25,
    cache: bool = True,
    new_sig: DataFrame | None = None,
) -> DataFrame:
    """Near-dup matches of a new batch against an existing signature index.

    ``new_sig`` lets a caller that already computed the batch signatures
    (e.g. one MinHash pass over old∪new, split by id — signatures are
    per-row deterministic so the split equals two separate builds) skip
    the second text scan; when provided, ``new_df``/``text_col`` are not
    read at all.

    Returns (dup_id, match_id, est_jaccard): ``dup_id`` is a new document,
    ``match_id`` is either an indexed document or an earlier (smaller-id)
    document of the same batch, and ``est_jaccard`` is the signature-
    estimated Jaccard, kept when >= ``threshold``. Candidates are LSH band
    collisions, exactly as in the batch path, so running batches
    incrementally finds the same new-vs-old and new-vs-new pairs the
    full-corpus ``lsh_candidates`` would (old-vs-old pairs were found when
    those batches arrived). The refine uses signatures only — the index
    carries no text — so the estimator (not exact set Jaccard) is the
    score; callers needing exact Jaccard re-read only the matched docs'
    text (O(matches), not O(corpus))."""
    if new_sig is None:
        new_sig = minhash_table(new_df, id_col, text_col, num_hashes, n, cache)
        if cache:
            # feeds band generation AND the two est-join sides: one
            # compute. Fixed-width rows — ~H*32 bytes per new doc.
            new_sig = new_sig.persist(StorageLevel.MEMORY_AND_DISK)
    nb = _bands_from_sig(new_sig, id_col, num_hashes, rows_per_band)
    ob = _bands_from_sig(index, id_col, num_hashes, rows_per_band)
    new_side = nb.select("band", "band_hash", F.col(id_col).alias("dup_id"))
    cand_old = new_side.join(
        ob.select("band", "band_hash", F.col(id_col).alias("match_id")),
        ["band", "band_hash"],
    )
    cand_new = new_side.join(
        nb.select("band", "band_hash", F.col(id_col).alias("match_id")),
        ["band", "band_hash"],
    ).filter(F.col("match_id") < F.col("dup_id"))
    cand = (
        cand_old.select("dup_id", "match_id")
        .union(cand_new.select("dup_id", "match_id"))
        .distinct()
    )
    a = new_sig.select(
        F.col(id_col).alias("dup_id"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(num_hashes)],
    )
    b = index.unionByName(new_sig).select(
        F.col(id_col).alias("match_id"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(num_hashes)],
    )
    est = _sig_est_jaccard(num_hashes)
    return (
        cand.join(a, "dup_id")
        .join(b, "match_id")
        .select("dup_id", "match_id", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def index_merge(
    index: DataFrame,
    new_sig: DataFrame,
    matches: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Index maintenance: append the new batch's NON-duplicate signatures.

    ``matches`` is ``incremental_dedup``'s output; any new doc appearing
    as a dup_id is represented by its match and is not indexed (the
    canonical-copy policy of ``canonical_corpus``). In production this is
    an Iceberg append snapshot — no rewrite of existing index files."""
    dups = matches.select(F.col("dup_id").alias(id_col)).distinct()
    keep = new_sig.join(dups, id_col, "left_anti")
    return index.unionByName(keep)


def dedup_spans(
    df: DataFrame,
    block_tokens: int = 10,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache: bool = True,
) -> DataFrame:
    """Corpus-wide duplicated-span removal (the C4 / RefinedWeb cleanup
    step): cut each document into fixed-size non-overlapping token blocks,
    count every block's occurrences across the WHOLE corpus, and rebuild
    each document keeping only blocks seen fewer than ``min_count`` times
    (the trailing ``len mod block_tokens`` tokens are always kept — they
    are not a full block).

    Unlike per-document repetition signals (:func:`~anendektos_spark.
    functions.textstats.repetition_stats`) this removes boilerplate shared
    ACROSS documents — nav bars, license headers, quoted chain mail — the
    spans that survive whole-document dedup because the surrounding text
    differs.

    Plan: one narrow tokenize pass; block construction is a per-doc
    ``transform`` over a persisted token relation (the explode barrier —
    see dedup module docstring); ONE shuffle on the block text for the
    corpus count (map-side combine: key cardinality is distinct blocks,
    not rows); count join-back rides the same key; per-doc reassembly is
    one shuffle on the doc id with an in-group ``array_sort`` for
    deterministic block order. No O(n²) anywhere — cost is linear in
    corpus tokens.

    Cross-engine exactness: block membership and counts are pure
    string/int ops; the rebuilt text is a deterministic ordered join, so
    the DuckDB oracle (string_agg ORDER BY position) matches bit-for-bit.
    """
    if block_tokens < 1:
        raise ValueError(f"block_tokens must be >= 1, got {block_tokens}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    b = int(block_tokens)
    base = _barrier(
        _spread(df).select(
            F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
        ),
        cache,
    ).select(
        "_id",
        "_toks",
        F.size("_toks").alias("_n"),
        F.expr(f"size(_toks) div {b}").alias("_nb"),
    )
    # Full blocks: bpos in [0, _nb); tail tokens beyond _nb*b always kept.
    blocks_arr = F.when(
        F.col("_nb") >= 1,
        F.transform(
            F.sequence(F.lit(0), F.col("_nb") - 1),
            lambda i: F.array_join(F.slice("_toks", i * b + 1, b), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    blocks = _barrier(
        base.select("_id", F.posexplode(blocks_arr).alias("bpos", "btext")),
        cache,
    )
    counts = blocks.groupBy("btext").agg(F.count("*").alias("_c"))
    flagged = blocks.join(counts, "btext").select(
        "_id", "bpos", "btext", (F.col("_c") >= min_count).alias("_dup")
    )
    per_doc = flagged.groupBy("_id").agg(
        F.sum(F.col("_dup").cast("int")).cast("int").alias("n_dup_blocks"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("_dup"), F.struct("bpos", "btext"))
                    )
                ),
                lambda s: s.getField("btext"),
            ),
            " ",
        ).alias("_kept"),
    )
    tail = F.array_join(
        F.slice(F.col("_toks"), F.col("_nb") * b + 1, F.lit(2**31 - 1)), " "
    )
    out = (
        base.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_nb").cast("int").alias("n_blocks"),
            F.coalesce("n_dup_blocks", F.lit(0)).cast("int").alias("n_dup_blocks"),
            F.concat_ws(
                " ",
                F.nullif(F.coalesce(F.col("_kept"), F.lit("")), F.lit("")),
                F.nullif(tail, F.lit("")),
            ).alias("cleaned_text"),
        )
        .withColumn("cleaned_md5", F.md5("cleaned_text"))
        .withColumn(
            "n_tokens_kept",
            F.when(
                F.col("cleaned_text") == "", F.lit(0)
            ).otherwise(F.size(F.split(F.col("cleaned_text"), r"\s+"))).cast("int"),
        )
    )
    return out


def source_overlap_matrix(
    df: DataFrame,
    n: int = 3,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source contamination matrix: for every unordered source pair,
    the count and Jaccard of shared distinct word n-gram shingles — the
    corpus-level leakage diagnostic run before mixing training sources
    (is src_a a mirror / partial crawl of src_b?).

    Plan (100 TB shape): one (source, shingle)-distinct relation (single
    shuffle, map-side partial distinct); per-source set sizes are an
    n_sources-row relation; the intersection self-join meets sources only
    through shared shingles, cost Σ_shingle df² with df ≤ n_sources — the
    inverted-index-join trick of tfidf_cosine_pairs, never an all-pairs
    document comparison. Zero-overlap pairs are kept via the (tiny)
    size-relation cross join, so the matrix is total. Integer set sizes ⇒
    the rounded double Jaccard is engine-exact."""
    sh = (
        df.select(F.col(source_col).alias("src"), shingle_set(F.col(text_col), n).alias("sh"))
        .select("src", F.explode("sh").alias("s"))
        .distinct()
    )
    # sizes come from the SOURCE taxonomy, not the shingle relation: a
    # source whose documents are all shorter than n tokens has zero
    # shingles but must still appear in every pair (n_sh = 0)
    sizes = (
        df.select(F.col(source_col).alias("src"))
        .distinct()
        .join(sh.groupBy("src").agg(F.count("*").cast("long").alias("n_sh")), "src", "left")
        .select("src", F.coalesce("n_sh", F.lit(0)).cast("long").alias("n_sh"))
    )
    common = (
        sh.select(F.col("src").alias("src_a"), "s")
        .join(sh.select(F.col("src").alias("src_b"), "s"), "s")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    pairs = (
        sizes.select(F.col("src").alias("src_a"), F.col("n_sh").alias("n_a"))
        .crossJoin(sizes.select(F.col("src").alias("src_b"), F.col("n_sh").alias("n_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    return (
        pairs.join(common, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            # two shingle-less sources have an empty union: define J = 0
            F.when(
                (F.col("n_a") + F.col("n_b")) == 0, F.lit(0.0)
            )
            .otherwise(
                F.round(
                    F.coalesce("n_common", F.lit(0)).cast("double")
                    / (
                        F.col("n_a") + F.col("n_b") - F.coalesce("n_common", F.lit(0))
                    ).cast("double"),
                    4,
                )
            )
            .alias("jaccard"),
        )
    )


def sig_sql_expr(num_hashes: int = 16) -> str:
    """DuckDB expression: MinHash signature list over a ``shd`` distinct-
    shingle list column — the single source of truth for the md5
    min-wise hash family. Both oracle mirrors (documents in
    __spark_entry__, conversations in convops.conv_dedup_pairs_sql) must
    build signatures from THIS expression so a family change (e.g. the
    documented xxhash64 swap) cannot update one mirror and silently
    diverge the other."""
    return (
        f"list_transform(range({num_hashes}), i -> list_min(list_transform(shd, "
        "s -> md5(CAST(i AS VARCHAR) || ':' || s))))"
    )


def band_sql_expr(rows_per_band: int = 2) -> str:
    """DuckDB expression: LSH band hash for band ``j`` over a ``sigs``
    signature list — shared by the same two mirrors as sig_sql_expr
    (mirrors dedup._bands_from_sig's slicing exactly)."""
    return (
        f"md5(array_to_string(sigs[j*{rows_per_band}+1 : "
        f"j*{rows_per_band}+{rows_per_band}], ','))"
    )


# --------------------------------------------------------------------------
# winnowing fingerprints (Schleimer/Wilkerson/Aiken local fingerprinting)
# --------------------------------------------------------------------------

# position packing width: winnowing supports docs up to 10^6 k-grams; the
# inverted zero-padded decimal keeps lexicographic == numeric order
_WINNOW_POS_MAX = 999_999


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprint selection (the MOSS algorithm): hash every
    word k-gram, slide a window of ``w`` consecutive gram hashes, select
    each window's minimum (rightmost position on ties), and keep the
    distinct (position, hash) selections. Guarantees every shared run of
    ``w + k - 1`` tokens between two documents yields at least one shared
    fingerprint, at expected density 2/(w+1) — a LOCAL overlap detector
    (which k-gram region matches), unlike MinHash's global Jaccard.

    Engine-portable argmin: the frame key is ``hex8(md5(gram)) || '-' ||
    lpad(999999 - pos)`` so a plain ``min()`` over a ROWS frame returns
    the minimal hash at its rightmost position — no structs, no
    float/int conversion, bit-identical in the DuckDB mirror.

    100 TB shape: tokenize/gram/hash are narrow codegen maps; ONE hash
    exchange on the doc id serves both windows (the unordered count and
    the ordered frame-min share the partitioning — Spark adds only a
    sort), and the final distinct is the second, fingerprint-sized
    shuffle. Docs cap at 10^6 grams (the position packing width) and the
    cap is ENFORCED: a gram position past _WINNOW_POS_MAX raises at
    execution time (raise_error inside the key expression — the packed
    decimal would otherwise go negative and silently corrupt the
    lexicographic argmin); chunk longer docs upstream
    (textstats.chunk_documents). The DuckDB mirror carries the same
    guard via error(), so both engines fail fast identically."""
    from pyspark.sql import Window

    toks = tokens(normalize_text(F.col(text_col)))
    grams = gram_arr(toks, k)
    e = df.select(F.col(id_col), F.posexplode(grams).alias("pos", "gram"))
    pos_ck = F.when(F.col("pos") <= _WINNOW_POS_MAX, F.col("pos")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("winnow_fingerprints: doc "),
                F.col(id_col).cast("string"),
                F.lit(
                    f" exceeds {_WINNOW_POS_MAX + 1} k-grams "
                    "(position packing width); chunk longer docs upstream "
                    "(textstats.chunk_documents)"
                ),
            )
        )
    )
    key = F.concat(
        F.substring(F.md5("gram"), 1, 8),
        F.lit("-"),
        F.lpad((F.lit(_WINNOW_POS_MAX) - pos_ck).cast("string"), 6, "0"),
    )
    cw = Window.partitionBy(id_col)
    fw = cw.orderBy("pos").rowsBetween(0, w - 1)
    sel = (
        e.select(
            id_col,
            "pos",
            key.alias("key"),
            F.count("*").over(cw).alias("n"),
        )
        .withColumn("wmin", F.min("key").over(fw))
        .filter(F.col("pos") <= F.greatest(F.col("n") - w, F.lit(0)))
    )
    return sel.select(
        id_col,
        (F.lit(_WINNOW_POS_MAX) - F.substring("wmin", 10, 6).cast("int")).alias(
            "pos"
        ),
        F.substring("wmin", 1, 8).alias("fingerprint"),
    ).distinct()


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct winnowing
    fingerprints — localized plagiarism/copy detection on top of
    :func:`winnow_fingerprints`. Fingerprints occurring in more than
    ``max_df`` documents are dropped BEFORE the self-join (the postings-
    cap idiom: a boilerplate gram shared by millions of docs would
    otherwise explode the join quadratically); the join then buckets on
    the fingerprint value and the pair aggregate counts distinct shared
    prints. Same ReusedExchange self-join shape as the LSH candidate
    stage."""
    fpd = (
        winnow_fingerprints(df, id_col, text_col, k, w)
        .select(id_col, "fingerprint")
        .distinct()
    )
    from pyspark.sql import Window

    keep = fpd.withColumn(
        "df", F.count("*").over(Window.partitionBy("fingerprint"))
    ).filter(F.col("df") <= max_df)
    # one-pass idiom (same as lsh_jaccard's shingle relation): persist the
    # capped fingerprint relation so BOTH self-join sides read one
    # materialization instead of re-winnowing the corpus (executed-plan
    # audit: 9 shuffles → the cache halves the winnow work; entry lives
    # until session end, release with clearCache on corpus change)
    keep = keep.persist(StorageLevel.MEMORY_AND_DISK)
    a = keep.select(F.col(id_col).alias("id_a"), "fingerprint")
    b = keep.select(F.col(id_col).alias("id_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _winnow_fp_cte(rel: str, id_col: str, k: int, w: int) -> str:
    """Shared DuckDB CTE chain ending in ``fp(id, pos, fingerprint)`` —
    single source of truth for both winnowing oracle mirrors."""
    gram = " || ' ' || ".join(f"toks[i+{j}]" for j in range(1, k + 1))
    return f"""
        WITH d AS ({rel}),
        t AS (SELECT {id_col},
                     regexp_split_to_array(trim(regexp_replace(lower(text),
                       '\\s+', ' ', 'g')), ' ') AS toks
              FROM d),
        g AS (SELECT {id_col},
                list_transform(
                  range(CASE WHEN len(toks) >= {k} THEN len(toks) - {k - 1}
                             ELSE 0 END),
                  i -> struct_pack(pos := i, g := {gram})) AS grams
              FROM t),
        e AS (SELECT {id_col}, u.pos AS pos, u.g AS gram
              FROM (SELECT {id_col}, unnest(grams) AS u FROM g)),
        h AS (SELECT {id_col}, pos,
                     substr(md5(gram),1,8) || '-' ||
                       lpad(CAST({_WINNOW_POS_MAX} -
                         CASE WHEN pos > {_WINNOW_POS_MAX}
                              THEN CAST(error('winnow_fingerprints: doc exceeds '
                                   || '{_WINNOW_POS_MAX + 1}'
                                   || ' k-grams; chunk upstream') AS INT)
                              ELSE pos END AS VARCHAR), 6, '0')
                       AS key,
                     count(*) OVER (PARTITION BY {id_col}) AS n
              FROM e),
        wnd AS (SELECT {id_col}, pos, n,
                     min(key) OVER (PARTITION BY {id_col} ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND {w - 1}
                                    FOLLOWING) AS wmin
              FROM h),
        fp AS (SELECT DISTINCT {id_col},
                      CAST({_WINNOW_POS_MAX} -
                           CAST(substr(wmin, 10, 6) AS INT) AS INT) AS pos,
                      substr(wmin, 1, 8) AS fingerprint
               FROM wnd WHERE pos <= greatest(n - {w}, 0))
    """


def winnow_fingerprints_sql(
    rel: str, id_col: str = "doc_id", k: int = 4, w: int = 4
) -> str:
    return (
        _winnow_fp_cte(rel, id_col, k, w)
        + f"SELECT {id_col}, pos, fingerprint FROM fp"
    )


def winnow_overlap_pairs_sql(
    rel: str,
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> str:
    return (
        _winnow_fp_cte(rel, id_col, k, w)
        + f"""
        , fpd AS (SELECT DISTINCT {id_col} AS id, fingerprint FROM fp),
        keep AS (
          SELECT id, fingerprint FROM (
            SELECT id, fingerprint,
                   count(*) OVER (PARTITION BY fingerprint) AS df
            FROM fpd)
          WHERE df <= {max_df})
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
        FROM keep a JOIN keep b
          ON a.fingerprint = b.fingerprint AND a.id < b.id
        GROUP BY a.id, b.id HAVING count(*) >= {min_shared}
        """
    )


def dup_clusters_bigstar(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 30,
    checkpoint: str = "auto",
) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round scale path beside :func:`dup_clusters`'s
    O(component-diameter) min-label loop. Identical output contract
    (``(id_col, cluster_id)`` with the component-minimum id as label,
    isolated nodes labeling themselves), so the two are interchangeable
    and share one DuckDB recursive-CTE oracle; tests pin them equal and
    pin a 64-node path converging here within rounds that min-label
    provably cannot.

    Each round is two grouped-min + join passes over the edge relation:
    large-star points every neighbor LARGER than u at u's minimum
    neighborhood label; small-star contracts the ≤-side the same way.
    Edges always point larger→smaller afterwards, components contract to
    rooted stars in O(log n) rounds regardless of diameter (LSH dup
    chains at crawl scale can be long — diameter is the wrong thing to
    bet on at 100 TB). Per-round state is persisted and
    lineage-truncated; the convergence probe is two limit(1) anti-join
    counts, never a data-sized collect."""
    checkpoint = iterutils.resolve_checkpoint_mode(ids, checkpoint)
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def _sym(e: DataFrame) -> DataFrame:
        return e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        a = _sym(e)
        if large:
            grp, out = a, a.filter(F.col("dst") > F.col("src"))
        else:
            grp = a.filter(F.col("dst") <= F.col("src"))
            out = grp
        m = grp.groupBy("src").agg(F.min("dst").alias("mn"))
        m = m.select("src", F.least("src", "mn").alias("m"))
        emitted = (
            out.join(m, "src")
            .select(F.col("dst").alias("node"), F.col("m"))
        )
        if not large:
            emitted = emitted.unionByName(
                m.select(F.col("src").alias("node"), F.col("m"))
            )
        return (
            emitted.filter(F.col("node") != F.col("m"))
            .select(F.col("node").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    converged = False
    for it in range(1, max_iter + 1):
        new_edges = iterutils.truncate_lineage(
            _star(_star(edges, large=True), large=False), checkpoint
        ).persist(StorageLevel.MEMORY_AND_DISK)
        grew = new_edges.exceptAll(edges).limit(1).count()
        shrank = edges.exceptAll(new_edges).limit(1).count()
        edges.unpersist()
        edges = new_edges
        if grew == 0 and shrank == 0:
            converged = True
            break
    if not converged:
        edges.unpersist()
        raise RuntimeError(
            f"dup_clusters_bigstar did not converge within max_iter={max_iter} "
            "rounds (expected O(log n); check for pathological input)"
        )
    labels = ids.select(F.col(id_col).alias("node")).join(
        edges.select(F.col("src").alias("node"), F.col("dst").alias("root")),
        "node",
        "left",
    )
    out = labels.select(
        F.col("node").alias(id_col),
        F.coalesce("root", "node").alias("cluster_id"),
    )
    return out


def canonical_by_quality(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Quality-aware keep-one-copy: for every dup cluster choose the
    HIGHEST-quality member (ties → minimum id) instead of
    :func:`canonical_corpus`'s min-id rule — the curation policy real
    pipelines want (keep the best copy, not the lexicographically first).

    ``clusters`` is any (id, cluster_id) relation (dup_clusters or
    dup_clusters_bigstar); ``scores`` any (id, score) relation (e.g.
    textstats.quality_score). Two hash aggregates on cluster_id sharing
    one exchange: best-score+size, then min-id among the arg-max rows.
    Output: (cluster_id, keep_id, n_docs, best_score)."""
    m = clusters.select(
        F.col(id_col).alias("_id"), "cluster_id"
    ).join(
        scores.select(F.col(id_col).alias("_id"), F.col(score_col).alias("_s")),
        "_id",
    )
    best = m.groupBy("cluster_id").agg(
        F.max("_s").alias("best_score"), F.count("*").alias("n_docs")
    )
    return (
        m.join(best, "cluster_id")
        .filter(F.col("_s") == F.col("best_score"))
        .groupBy("cluster_id", "n_docs", "best_score")
        .agg(F.min("_id").alias("keep_id"))
        .select("cluster_id", "keep_id", "n_docs", "best_score")
    )


def winnow_match_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    max_df: int = 50,
) -> DataFrame:
    """Localized overlap evidence: every matched fingerprint OCCURRENCE
    between two documents, with both positions — the alignment detail
    :func:`winnow_overlap_pairs` aggregates away (which k-gram region of
    A matches which region of B). Same df-cap before the self-join;
    output grain is (id_a, id_b, pos_a, pos_b, fingerprint)."""
    # persisted like winnow_overlap_pairs: the positional fingerprint
    # relation feeds the df-count AND both self-join sides — one winnow
    # pass instead of three
    fps = winnow_fingerprints(df, id_col, text_col, k, w).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dcount = (
        fps.select(id_col, "fingerprint")
        .distinct()
        .groupBy("fingerprint")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fingerprint")
    )
    keep = fps.join(dcount, "fingerprint")
    a = keep.select(
        "fingerprint", F.col(id_col).alias("id_a"), F.col("pos").alias("pos_a")
    )
    b = keep.select(
        "fingerprint", F.col(id_col).alias("id_b"), F.col("pos").alias("pos_b")
    )
    return (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pos_a", "pos_b", "fingerprint")
    )


def winnow_match_spans_sql(
    rel: str,
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    max_df: int = 50,
) -> str:
    return (
        _winnow_fp_cte(rel, id_col, k, w)
        + f"""
        , dc AS (
          SELECT fingerprint FROM (
            SELECT fingerprint, count(DISTINCT {id_col}) AS ndocs
            FROM fp GROUP BY 1)
          WHERE ndocs <= {max_df}),
        keep AS (SELECT fp.* FROM fp JOIN dc USING (fingerprint))
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
               a.pos AS pos_a, b.pos AS pos_b, a.fingerprint
        FROM keep a JOIN keep b
          ON a.fingerprint = b.fingerprint AND a.{id_col} < b.{id_col}
        """
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    cache: bool = True,
) -> DataFrame:
    """EXACT threshold Jaccard self-join via prefix filtering (AllPairs /
    PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08) — every
    pair with shingle Jaccard >= threshold, with NO false negatives
    (unlike the probabilistic MinHash/LSH path).

    Prefix-filter lemma: order each doc's shingles by ascending global
    document frequency (rarest first, lexicographic tiebreak). If
    J(A,B) >= t then |A∩B| >= ceil(t·|A|), so A's first
    |A| - ceil(t·|A|) + 1 shingles under that order must contain a
    common shingle — and symmetrically for B; the EARLIEST common
    shingle therefore sits inside BOTH prefixes, so an equi-join of the
    prefix relations yields a complete candidate set, refined exactly by
    the shared ``_refine`` arithmetic.

    100 TB shape: candidates are Σ over prefix shingles of df² — and
    prefix shingles are by construction the RAREST in each doc, so df is
    small where it matters (the frequent shingles that would explode a
    naive inverted-index join never enter a prefix). One df aggregation,
    one doc-keyed exchange shared by the two windows (rank + set size),
    one equi-join on the prefix shingle. The threshold is quantized to
    1e-4 so the ceil() is integer arithmetic, bit-equal across engines.
    """
    from pyspark.sql import Window

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    tq = int(round(threshold * 10000))
    sets = _cached_sets(df, id_col, text_col, n, cache)
    e = sets.select(F.col(id_col), F.explode("sh").alias("s"))
    sdf = e.groupBy("s").agg(F.count("*").alias("sdf"))
    w = Window.partitionBy(id_col)
    ranked = (
        e.join(sdf, "s")
        .select(
            F.col(id_col),
            F.col("s"),
            F.row_number().over(w.orderBy(F.asc("sdf"), F.asc("s"))).alias("rk"),
            F.count("*").over(w).alias("sz"),
        )
    )
    plen = (
        F.col("sz")
        - F.floor((F.lit(tq) * F.col("sz") + F.lit(9999)) / F.lit(10000))
        + 1
    )
    pref = ranked.filter(F.col("rk") <= plen).select(id_col, "s")
    cand = (
        pref.select(F.col(id_col).alias("id_a"), "s")
        .join(pref.select(F.col(id_col).alias("id_b"), "s"), "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _refine(sets, cand, id_col, threshold)


def prefix_jaccard_pairs_sql(
    rel: str, toks_sql: str, shingles_sql: str, threshold: float = 0.8
) -> str:
    """DuckDB mirror of prefix_jaccard_pairs: identical prefix-length
    integer arithmetic, identical refine; ``toks_sql``/``shingles_sql``
    are the caller's shared token/shingle fragments."""
    tq = int(round(threshold * 10000))
    return f"""
        WITH t AS (SELECT doc_id, {toks_sql} AS toks FROM ({rel})),
        sets AS (SELECT doc_id, list_distinct({shingles_sql}) AS shd FROM t),
        e AS (SELECT doc_id, unnest(shd) AS s FROM sets),
        sdf AS (SELECT s, count(*) AS sdf FROM e GROUP BY s),
        ranked AS (
          SELECT e.doc_id, e.s,
                 row_number() OVER (PARTITION BY e.doc_id
                                    ORDER BY sdf.sdf ASC, e.s ASC) AS rk,
                 count(*) OVER (PARTITION BY e.doc_id) AS sz
          FROM e JOIN sdf USING (s)),
        pref AS (
          SELECT doc_id, s FROM ranked
          WHERE rk <= sz - (({tq} * sz + 9999) // 10000) + 1),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id),
        j AS (
          SELECT c.id_a, c.id_b,
                 round(CAST(len(list_intersect(sa.shd, sb.shd)) AS DOUBLE)
                       / CAST(len(list_distinct(list_concat(sa.shd, sb.shd)))
                              AS DOUBLE), 4) AS jaccard
          FROM cand c
          JOIN sets sa ON c.id_a = sa.doc_id
          JOIN sets sb ON c.id_b = sb.doc_id)
        SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= {threshold}
    """


def lsh_recall_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 16,
    rows_per_band: int = 2,
    n: int = 3,
    cache: bool = True,
) -> DataFrame:
    """Recall audit of the probabilistic dedup path against exact ground
    truth — the production drift monitor a 100 TB pipeline runs on a
    sampled block before trusting MinHash/LSH parameters corpus-wide.

    Ground truth comes from ``prefix_jaccard_pairs`` (complete by the
    AllPairs lemma); the audited path is ``lsh_jaccard`` at the SAME
    threshold. Post-refine LSH pairs are a SUBSET of the exact set
    (refine removes every false positive, banding can only lose pairs),
    so precision is 1 by construction and the quantity under audit is
    recall — returned one-row as

        (n_true_pairs, n_lsh_pairs, n_missed, recall_fp)

    with ``recall_fp = (n_true - n_missed)·10^6 div n_true`` (NULL when
    no true pairs exist) and ``n_lsh_pairs = n_true - n_missed`` as the
    subset invariant's cross-check. Both paths read the ONE persisted
    shingle relation (`_cached_sets`), so the corpus is shingled once;
    the anti-join runs at pair grain (duplicate-density-sized, not
    corpus-sized); only three 1-row aggregates cross-join at the end."""
    exact = prefix_jaccard_pairs(df, id_col, text_col, n, threshold, cache).select(
        "id_a", "id_b"
    )
    approx = lsh_jaccard(
        df, id_col, text_col, num_hashes, rows_per_band, n, threshold,
        use_cache=cache,
    ).select("id_a", "id_b")
    missed = exact.join(approx, ["id_a", "id_b"], "left_anti")
    ex_n = exact.agg(F.count("*").cast("long").alias("n_true_pairs"))
    ap_n = approx.agg(F.count("*").cast("long").alias("n_lsh_pairs"))
    ms_n = missed.agg(F.count("*").cast("long").alias("n_missed"))
    return (
        ex_n.crossJoin(ap_n)
        .crossJoin(ms_n)
        .withColumn(
            "recall_fp",
            F.when(
                F.col("n_true_pairs") > 0,
                F.expr("(n_true_pairs - n_missed) * 1000000L div n_true_pairs"),
            ).cast("long"),
        )
    )


def cluster_weights(
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Dedup-aware loss reweighting: weight every document by the inverse
    of its near-dup cluster size (weight_ppm = floor(scale / |cluster|)),
    the soft alternative to keep-one-drop-rest dedup — all copies stay in
    the corpus but a cluster's total training weight is ~one document
    regardless of how often it was crawled.

    Input is a (id, cluster) assignment (``dup_clusters`` /
    ``dup_clusters_bigstar`` output). The size is a count window over
    ``cluster_col`` — ONE hash exchange, no join, no second scan; the
    weight is integer fixed-point (ppm) so results are bit-identical in
    any engine. At 100 TB the exchange carries two id-sized columns and
    cluster skew is bounded by the largest dup cluster, which the LSH
    band structure already caps in practice."""
    w = Window.partitionBy(cluster_col)
    return clusters.select(
        F.col(id_col),
        F.col(cluster_col),
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
    ).withColumn(
        "weight_ppm",
        F.expr(f"{scale}L div cluster_size").cast("long"),
    )


def editdist_refine(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int | None = None,
    min_sim_ppm: int | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Character-level verification of candidate duplicate pairs: exact
    Levenshtein distance plus a normalized fixed-point similarity
    sim_ppm = floor(scale * (maxlen - dist) / maxlen), maxlen =
    max(len_a, len_b) — 1.0 for identical text, 0 for totally disjoint.

    This is the refine stage fuzzy dedup runs AFTER banding: LSH/winnow
    candidates are recall-oriented and shingle-grain; edit distance is
    the precision check at character grain (catches the one-word-edit
    and whitespace-jitter near-dups n-gram Jaccard scores low). Never
    run it corpus²: ``pairs`` must come from a banded generator
    (lsh_candidates / winnow_overlap_pairs), so the only joins here are
    two id-keyed hash joins attaching the text sides to the bounded
    candidate relation — no self-join, no cartesian.

    When ``max_dist`` is given the JVM uses the banded DP
    (levenshtein(l, r, threshold): O(max_dist·min(m,n)) per pair,
    early-exit -1 when exceeded) — at corpus scale this is the
    difference between O(len²) on every candidate and O(k·len) on
    most. Distances and sim_ppm are pure integers, so every surviving
    row is bit-identical to the DuckDB oracle's unbanded levenshtein().
    """
    cols = set(pairs.columns)
    if not {"id_a", "id_b"} <= cols:
        raise ValueError(f"pairs needs id_a/id_b, got {sorted(cols)}")
    a = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    if max_dist is not None:
        dist = F.levenshtein(F.col("_ta"), F.col("_tb"), max_dist)
    else:
        dist = F.levenshtein(F.col("_ta"), F.col("_tb"))
    out = (
        j.withColumn("dist", dist.cast("long"))
        .withColumn(
            "_ml", F.greatest(F.length("_ta"), F.length("_tb")).cast("long")
        )
        .withColumn(
            "sim_ppm",
            F.when(F.col("_ml") == 0, F.lit(scale).cast("long")).otherwise(
                F.expr(f"({scale}L * (_ml - dist)) div _ml")
            ),
        )
        .select("id_a", "id_b", "dist", "sim_ppm")
    )
    if max_dist is not None:
        out = out.filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    if min_sim_ppm is not None:
        out = out.filter(F.col("sim_ppm") >= min_sim_ppm)
    return out


def dup_rate_by_source(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-source duplication-rate report — the operational view run
    after candidate detection: for each source, how many documents and
    what fraction of them participate in at least one duplicate pair
    (dup_ppm = n_dup_docs·scale div n_docs). Tells you WHICH crawl to
    re-fetch or down-weight, where the pair list alone only says which
    documents collide.

    ``pairs`` is any (id_a, id_b) relation (lsh_candidates /
    winnow_overlap_pairs / a refined survivor set). Shape: the pair list
    folds to a distinct id set (pairs-sized, ≪ corpus), left-joins the
    corpus on id — AQE broadcasts the dup-id side at scale — and one
    map-side-combined aggregate per source closes it. The corpus text is
    never touched; only (id, source) flows."""
    cols = set(pairs.columns)
    if not {"id_a", "id_b"} <= cols:
        raise ValueError(f"pairs needs id_a/id_b, got {sorted(cols)}")
    dup_ids = (
        pairs.select(F.col("id_a").alias("_id"))
        .unionByName(pairs.select(F.col("id_b").alias("_id")))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.col(group_col))
        .join(dup_ids, "_id", "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).cast("long").alias(
                "n_dup_docs"
            ),
        )
        .select(
            group_col,
            "n_docs",
            "n_dup_docs",
            F.expr(f"(n_dup_docs * {scale}L) div n_docs").alias("dup_ppm"),
        )
    )


# --------------------------------------------------------------------------
# exact duplicated-substring spans (character grain, interval union)
# --------------------------------------------------------------------------

def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 24,
    stride: int = 1,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-substring detection at CHARACTER grain (the
    "exact substring dedup" of Lee et al., Deduplicating Training Data
    Makes Language Models Better): every length-``k`` character window
    (anchor) that occurs at least ``min_count`` times in the corpus —
    within one document or across documents — marks its [pos, pos+k)
    char range; overlapping/touching marked ranges in a document are
    merged into maximal removal spans. Returns one row per span:
    (id, span_start, span_end, span_len, n_anchors) with 0-based
    [start, end) character offsets.

    This complements the token-block `dedup_spans` (C4-style fixed
    blocks — misses shifted duplicates) and `winnow_match_spans`
    (pair-grain, sampled fingerprints): with ``stride=1`` every
    duplicated substring of length ≥ k is found exactly, with no
    document pairing at all.

    100 TB shape: NO pairs anywhere — cost is linear in corpus chars.
    Anchor extraction is a narrow codegen map (sequence + transform +
    substring); duplicate anchors come from ONE map-side-combined count
    shuffle keyed by the anchor; the join back is anchor-keyed (Spark
    reuses the exchange); the interval merge is ONE per-document window
    over the flagged anchors only (duplicate-density-sized, not
    corpus-sized). The ``stride`` knob trades completeness for anchor
    volume at scale (stride s still catches every duplicated run of
    length ≥ k + s - 1); the oracle/query setting stride=1 is exhaustive.
    """
    if k < 1 or stride < 1 or min_count < 2:
        raise ValueError("need k >= 1, stride >= 1, min_count >= 2")
    d = df.filter(F.length(text_col) >= k).select(
        F.col(id_col), F.col(text_col).alias("_txt")
    )
    e = d.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, length(_txt) - {k}, {stride}), "
                f"p -> struct(p AS pos, substring(_txt, p + 1, {k}) AS gram))"
            )
        ).alias("pg"),
    ).select(id_col, F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    dup = (
        e.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("gram")
    )
    flagged = e.join(dup, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = (
        F.max("pos").over(w.rowsBetween(Window.unboundedPreceding, -1)) + F.lit(k)
    )
    islands = flagged.withColumn(
        "_new", F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    ).withColumn(
        "island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + F.lit(k)).cast("int").alias("span_end"),
            F.count(F.lit(1)).cast("int").alias("n_anchors"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
            "n_anchors",
        )
    )


def exact_substring_spans_sql(
    rel: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 24,
    stride: int = 1,
    min_count: int = 2,
) -> str:
    """DuckDB mirror of :func:`exact_substring_spans` (same anchor set,
    same interval-union semantics)."""
    return f"""
        WITH d AS (SELECT {id_col}, {text_col} AS _txt FROM {rel}
                   WHERE length({text_col}) >= {k}),
        e0 AS (SELECT {id_col}, _txt,
                      unnest(range(0, length(_txt) - {k} + 1, {stride})) AS pos
               FROM d),
        e AS (SELECT {id_col}, CAST(pos AS INT) AS pos,
                     substr(_txt, CAST(pos AS INT) + 1, {k}) AS gram
              FROM e0),
        dup AS (SELECT gram FROM e GROUP BY gram HAVING count(*) >= {min_count}),
        f AS (SELECT {id_col}, pos FROM e JOIN dup USING (gram)),
        w AS (SELECT {id_col}, pos,
                     max(pos) OVER (PARTITION BY {id_col} ORDER BY pos
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) + {k} AS prev_end
              FROM f),
        i AS (SELECT {id_col}, pos,
                     sum(CASE WHEN prev_end IS NULL OR pos > prev_end
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY {id_col} ORDER BY pos) AS island
              FROM w)
        SELECT {id_col},
               CAST(min(pos) AS INT) AS span_start,
               CAST(max(pos) + {k} AS INT) AS span_end,
               CAST(max(pos) + {k} - min(pos) AS INT) AS span_len,
               CAST(count(*) AS INT) AS n_anchors
        FROM i GROUP BY {id_col}, island
    """


def substring_dup_rate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    k: int = 24,
    stride: int = 1,
    min_count: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-``group_col`` duplicated-character rate: the fraction of each
    source's characters inside an :func:`exact_substring_spans` removal
    span — the "how contaminated is this source, in bytes" report that
    decides whether a source is worth keeping at all. Fixed-point ppm
    (BIGINT ``div``) so both engines agree exactly.

    Shape: the span relation is duplicate-density-sized; folding it to
    per-doc flagged-char counts and left-joining the (id, group, length)
    projection adds one id-keyed exchange (AQE broadcasts the span side
    when duplication is sparse) before the group-keyed fold. Text never
    flows past the span detector."""
    spans = exact_substring_spans(df, id_col, text_col, k, stride, min_count)
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("span_len").cast("long")).alias("_flag")
    )
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        F.length(text_col).cast("long").alias("_len"),
    )
    return (
        base.join(per_doc, id_col, "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_len").alias("n_chars"),
            F.sum(F.coalesce(F.col("_flag"), F.lit(0))).cast("long").alias(
                "dup_chars"
            ),
        )
        .select(
            group_col,
            "n_docs",
            "n_chars",
            "dup_chars",
            F.expr(f"(dup_chars * {scale}L) div n_chars").alias("dup_ppm"),
        )
    )


def substring_dup_rate_sql(
    rel: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    k: int = 24,
    stride: int = 1,
    min_count: int = 2,
    scale: int = 1_000_000,
) -> str:
    """DuckDB mirror of :func:`substring_dup_rate`."""
    spans = exact_substring_spans_sql(rel, id_col, text_col, k, stride, min_count)
    return f"""
        WITH spans AS ({spans}),
        per_doc AS (SELECT {id_col}, sum(CAST(span_len AS BIGINT)) AS _flag
                    FROM spans GROUP BY {id_col}),
        base AS (SELECT {id_col}, {group_col},
                        CAST(length({text_col}) AS BIGINT) AS _len
                 FROM {rel})
        SELECT {group_col},
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(_len) AS BIGINT) AS n_chars,
               CAST(sum(coalesce(_flag, 0)) AS BIGINT) AS dup_chars,
               CAST(sum(coalesce(_flag, 0)) * {scale}
                    // sum(_len) AS BIGINT) AS dup_ppm
        FROM base LEFT JOIN per_doc USING ({id_col})
        GROUP BY {group_col}
    """


def lsh_containment(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    rows_per_band: int = 2,
    n: int = 3,
    min_containment_ppm: int = 500_000,
    use_cache: bool = True,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric shingle-containment near-dup pairs: containment(A→B)
    = |A∩B| / |A|. Symmetric Jaccard dilutes subset duplication — a
    short document quoted whole inside a long one scores |A|/|B| ≈ 0 —
    while containment(A→B) is 1.0; this is the excerpt/quote/wrapped-
    copy detector a curation pipeline runs next to Jaccard dedup.

    Integer fixed point: contain_*_ppm = (|∩| · 10⁶) div |side| — exact
    in both engines. A pair is kept when EITHER direction reaches
    ``min_containment_ppm``.

    Same one-pass LSH chain (and 100 TB shape) as :func:`lsh_jaccard` —
    one shingle materialization feeds signature and both refine sides,
    pairs form only in band buckets. Banding recall caveat, documented:
    a tiny doc inside a huge one shares few MinHashes (MinHash estimates
    Jaccard, not containment), so band recall for extreme size ratios is
    low — at corpus scale feed the refine from a containment-friendly
    ``candidates`` relation (id_a, id_b — e.g. winnow fingerprint
    overlaps) when hunting extreme excerpts; the refine arithmetic is
    shared either way."""
    sets = _cached_sets(df, id_col, text_col, n, cache=use_cache)
    cand = candidates
    if cand is None:
        cand = _pairs_from_bands(
            _bands_from_sig(
                _minhash_from_sets(sets, id_col, num_hashes),
                id_col,
                num_hashes,
                rows_per_band,
            ),
            id_col,
        )
    else:
        cand = cand.select("id_a", "id_b")
    a = sets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("n_shared"),
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
        )
        .withColumn("contain_a_ppm", F.expr("(n_shared * 1000000L) div n_a"))
        .withColumn("contain_b_ppm", F.expr("(n_shared * 1000000L) div n_b"))
        .filter(
            F.greatest("contain_a_ppm", "contain_b_ppm")
            >= F.lit(min_containment_ppm)
        )
    )


def cluster_size_histogram(clusters: DataFrame) -> DataFrame:
    """Corpus-health view of a dedup resolution: how many clusters exist
    at each size (size 2, 3, …) plus the per-size document total — the
    distribution that distinguishes "a few giant boilerplate families"
    from "a long tail of pairs", which decide very different cleanups.

    Input is a ``dup_clusters``-style (id, cluster_id) relation (non-
    singleton members). Two tiny shuffles: the per-cluster count
    (map-side combined), then a count over the cluster-grain relation —
    both orders of magnitude below the corpus."""
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )


def apply_substring_removal(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply an :func:`exact_substring_spans` relation: rewrite each
    document with every flagged [start, end) character range removed —
    the cleaning step that closes the detect→remove loop (dedup_spans
    does the same at token-block grain). Docs with no spans pass
    through byte-identical; output carries n_spans, chars_removed and a
    cleaned-text md5 for cheap downstream equality checks.

    Correctness leans on the span contract: islands are maximal,
    non-overlapping and sorted per doc, so each kept piece is the
    original text between the previous span's end and this span's
    start, plus one tail after the last span.

    100 TB shape: one (doc-grain) window + one aggregate over the
    duplicate-density-sized span relation, then ONE id-keyed left join
    against the corpus (AQE broadcasts the span side when duplication
    is sparse). The rebuild is pure Column arithmetic — no explode of
    the corpus text, no Python."""
    base = df.select(F.col(id_col), F.col(text_col).alias("_txt"))
    w = Window.partitionBy(id_col).orderBy("span_start")
    pieces = (
        spans.withColumn(
            "prev_end", F.coalesce(F.lag("span_end").over(w), F.lit(0))
        )
        .join(base, id_col)
        .select(
            id_col,
            "span_start",
            "span_end",
            F.expr("substring(_txt, prev_end + 1, span_start - prev_end)").alias(
                "piece"
            ),
        )
    )
    agg = pieces.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_start", "piece"))),
                lambda x: x["piece"],
            ),
            "",
        ).alias("_head"),
        F.max("span_end").alias("_last_end"),
        F.count(F.lit(1)).cast("int").alias("n_spans"),
    )
    cleaned = F.when(
        F.col("_last_end").isNull(), F.col("_txt")
    ).otherwise(F.concat(F.col("_head"), F.expr("substring(_txt, _last_end + 1)")))
    return (
        base.join(agg, id_col, "left")
        .select(
            id_col,
            cleaned.alias("cleaned_text"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            (F.length("_txt") - F.length(cleaned)).cast("int").alias(
                "chars_removed"
            ),
            F.md5(cleaned).alias("cleaned_md5"),
        )
    )


def apply_substring_removal_sql(
    rel: str,
    spans_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`apply_substring_removal`; ``spans_sql``
    is the :func:`exact_substring_spans_sql` of the same corpus."""
    cleaned = (
        f"CASE WHEN a.{id_col} IS NULL THEN b._txt "
        f"ELSE a.head || substr(b._txt, a.last_end + 1) END"
    )
    return f"""
        WITH spans AS ({spans_sql}),
        base AS (SELECT {id_col}, {text_col} AS _txt FROM {rel}),
        p AS (SELECT {id_col}, span_start, span_end,
                     coalesce(lag(span_end) OVER (PARTITION BY {id_col}
                                                  ORDER BY span_start), 0)
                       AS prev_end
              FROM spans),
        seg AS (SELECT p.{id_col}, span_start, span_end,
                       substr(_txt, prev_end + 1, span_start - prev_end)
                         AS piece
                FROM p JOIN base USING ({id_col})),
        a0 AS (SELECT {id_col},
                      string_agg(piece, '' ORDER BY span_start) AS head,
                      max(span_end) AS last_end,
                      CAST(count(*) AS INT) AS n_spans
               FROM seg GROUP BY {id_col})
        SELECT b.{id_col},
               {cleaned} AS cleaned_text,
               coalesce(a.n_spans, 0) AS n_spans,
               CAST(length(b._txt) - length({cleaned}) AS INT)
                 AS chars_removed,
               md5({cleaned}) AS cleaned_md5
        FROM base b LEFT JOIN a0 a ON b.{id_col} = a.{id_col}
    """
