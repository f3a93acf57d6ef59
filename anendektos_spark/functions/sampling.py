"""Deterministic sampling / data-selection operators for training-data
curation.

A 100 TB corpus pipeline needs reproducible subset selection: ablation
samples, per-source quotas for data mixing, and quality-ranked selection.
Random sampling (``df.sample``) is seed- and partitioning-dependent — a
re-run after a repartition picks different rows. Every operator here is a
pure function of row content (md5 of a key column), so the selected set is
identical across engines, partitionings, cluster sizes, and re-runs — the
property that makes the sample auditable and the DuckDB oracle possible.

- hash_sample: Bernoulli sampling at an exact rate via an md5-prefix
  threshold. Narrow map, no shuffle; the filter is pushed into the scan.
- stratified_sample: exactly-n-per-group via a hash-ordered window.
  One shuffle on the group key; per-group sort is local.
- quality_quota: top-n-per-group by a score column (data-mixing quota
  selection, e.g. "best 100k docs per source by quality").

Scale notes: hash_sample pipelines with the read (rate applied before
any shuffle — downstream stages see only the sample). The window
operators pre-aggregate nothing but partition on the group key, so skewed
groups are bounded by the per-group ``n``: the rank filter is applied
within the sort, and AQE handles residual partition skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .joins import _check_reserved


def sample_threshold_hex(rate: float) -> str:
    """The 8-hex-digit threshold for ``hash_sample``: keep a row iff the
    first 8 hex digits of its key hash sort strictly below this string.
    Same-length lowercase-hex string comparison == numeric comparison, so
    the predicate is engine-portable verbatim."""
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"rate must be in [0, 1), got {rate}")
    return format(int(rate * 16**8), "08x")


def sample_hash_col(key: Column, salt: str = "") -> Column:
    """The sampling hash: md5 over salt-prefixed key text. A different
    salt yields an INDEPENDENT sample (two salts overlap ~rate_a*rate_b
    of the corpus). Disjoint train/holdout splits use the SAME salt with
    complementary threshold ranges: train = hash < t, holdout = hash >= t.
    NULL keys hash like the empty string (coalesce) so their fate is
    deterministic and engine-consistent rather than riding each engine's
    null-ordering default."""
    return F.md5(
        F.concat(F.lit(salt), F.lit(":"), F.coalesce(key.cast("string"), F.lit("")))
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep each row iff
    ``md5(salt:key)[:8] < threshold(rate)``.

    Exactly reproducible anywhere md5 exists; expected fraction ``rate``
    with binomial variance. No shuffle — a narrow filter the optimizer
    pushes below downstream projections."""
    if not 0.0 <= rate <= 1.0:
        # reject out-of-domain rates loudly: a percent/fraction mixup
        # (rate=10 meaning 10%) must not silently return the full corpus
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate == 1.0:
        # a 1.0 threshold needs 9 hex digits, which breaks the same-length
        # string comparison — and filtering at rate 1 is a no-op anyway
        return df
    thresh = sample_threshold_hex(rate)
    h = F.substring(sample_hash_col(F.col(key_col), salt), 1, 8)
    return df.filter(h < thresh)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str,
    key_col: str,
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Data-mixing sampler: keep each row with its group's configured
    rate (e.g. ``{"wiki": 1.0, "web": 0.25}``), ``default_rate`` for
    unlisted groups — the per-source reweighting step of a training-data
    mixture recipe, deterministic like ``hash_sample`` (same md5-prefix
    predicate, so re-runs, engines, and partitionings agree exactly).

    Still a narrow filter (the CASE folds into the scan stage); on a
    source-partitioned table Catalyst prunes rate-0 groups entirely."""
    for g, r in [*rates.items(), ("<default_rate>", default_rate)]:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    h = F.substring(sample_hash_col(F.col(key_col), salt), 1, 8)

    def keep(rate: float) -> Column:
        if rate >= 1.0:
            return F.lit(True)
        if rate <= 0.0:
            return F.lit(False)
        return h < sample_threshold_hex(rate)

    cond: Column | None = None
    for g, rate in sorted(rates.items()):
        c = F.col(group_col) == g
        cond = F.when(c, keep(rate)) if cond is None else cond.when(c, keep(rate))
    cond = keep(default_rate) if cond is None else cond.otherwise(keep(default_rate))
    return df.filter(cond)


def split_dataset(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint-and-exhaustive dataset split (train/val/
    test): each row's split is decided by where its md5-prefix falls in
    the cumulative weight ranges — ``train = h < t₁``, ``val = t₁ ≤ h <
    t₂``, …, last split takes the remainder. One hash, contiguous
    ranges: the splits are guaranteed disjoint and cover every row, and
    growing one split's weight only MOVES the shared boundary — rows
    never flip between non-adjacent splits when weights are retuned.

    Same determinism contract as ``hash_sample`` (same salt ⇒ same
    assignment in any engine/partitioning); a narrow map — the CASE
    folds into the scan stage, no shuffle."""
    if len(weights) < 2:
        raise ValueError("split_dataset needs at least two splits")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    for name, w in weights.items():
        # 1e-6 floor: a sub-ppm split is a configuration error, and a
        # last weight inside the 1e-9 sum tolerance would otherwise push
        # a cumulative boundary to 1.0 and fail obscurely downstream
        if w < 1e-6:
            raise ValueError(f"weight for {name!r} must be >= 1e-6, got {w}")
    if split_col in df.columns:
        raise ValueError(f"column {split_col!r} already exists")
    h = F.substring(sample_hash_col(F.col(key_col), salt), 1, 8)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        cond = h < sample_threshold_hex(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def split_dataset_sql(weights: dict[str, float], key_col: str, salt: str = "") -> str:
    """DuckDB mirror of :func:`split_dataset`'s CASE (for oracles)."""
    h = f"substr(md5('{salt}' || ':' || coalesce(CAST({key_col} AS VARCHAR), '')), 1, 8)"
    names = list(weights)
    cum, arms = 0.0, []
    for name in names[:-1]:
        cum += weights[name]
        arms.append(f"WHEN {h} < '{sample_threshold_hex(cum)}' THEN '{name}'")
    return f"CASE {' '.join(arms)} ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame, group_col: str, n: int, key_col: str, salt: str = ""
) -> DataFrame:
    """Exactly min(n, |group|) rows per group, chosen by hash order.

    Selection is a row_number over (group) ordered by (md5(salt:key),
    key) — the key tie-break makes the order total, so the chosen set is
    unique even under hash collisions. Equivalent to a per-group uniform
    sample without replacement, reproducible across engines.

    One hash shuffle on ``group_col``; rank filtering happens inside the
    per-group sort, so output per group is capped at ``n`` regardless of
    group skew. Keys should be distinct and non-null within a group —
    NULL keys hash deterministically (see sample_hash_col) but rows tying
    on both hash and key have no defined relative rank."""
    _check_reserved(df.columns, ("sample_rank",), "output columns")
    w = Window.partitionBy(group_col).orderBy(
        sample_hash_col(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    group_col: str,
    size_col: str,
    order_col: str,
) -> DataFrame:
    """Deterministic sequence packing: assign each row to a token-budget
    bin — the batch/context-window construction step of a pretraining
    data pipeline. Within each group, rows are laid out in ``order_col``
    order and a row belongs to ``bin = floor(start_offset / budget)``
    where start_offset is the running sum of preceding sizes (fixed
    cumulative boundaries, not greedy first-fit: deterministic, O(1)
    state, and every bin except a group's last is ≥ budget − max_size
    full). Emits the bin id and the row's offset within its bin.

    One shuffle on ``group_col``; the cumulative sum is a per-group
    running window, so parallelism = groups (pick group_col so groups
    are bounded — e.g. source × date — exactly like any windowed layout
    job). ``order_col`` must be non-null (null ordering differs between
    engines) and unique per group for a deterministic layout."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    _check_reserved(df.columns, ("bin_id", "bin_offset"), "output columns")
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(size_col).over(w) - F.col(size_col)).cast("long")
    return df.select(
        "*",
        F.floor(start / budget).cast("int").alias("bin_id"),
        (start % budget).cast("int").alias("bin_offset"),
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str,
    group_col: str | None = None,
    salt: str = "",
    w_scale: int = 10**4,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: min(n, |pool|)
    rows (per ``group_col`` stratum when given), where a row's chance of
    selection increases monotonically with ``weight_col`` — the
    importance-weighted selection step of a data-mixing recipe ("sample
    documents proportional to quality/source weight").

    Mechanism (uniform-race priorities): each row draws a deterministic
    48-bit uniform U = md5(salt:key)[:12] and competes with priority
    ``U · 10^6 div w`` (smaller wins), with w = round(weight · w_scale)
    quantized to an integer. This is the engine-exact integer surrogate
    of Efraimidis–Spirakis A-ES exponential-race sampling (priority
    −ln(U)/w): A-ES gives exactly weight-proportional inclusion but
    needs float ln/pow whose ulps differ across engines; the uniform
    race keeps determinism and monotonicity (for two rows with
    w_a ≥ w_b, P(a beats b) = 1 − w_b/(2·w_a) under exact uniforms)
    at the cost of exact proportionality — a documented trade, not a
    silent one. Priorities are DECIMAL(38,0) (DuckDB HUGEINT): 48-bit
    U × 10^6 overflows BIGINT.

    Rows with quantized weight ≤ 0 are excluded (never sampled). Ties
    break on ``key_col``, so the selected set is unique. One hash
    shuffle on the stratum key (or a single global sort when
    ``group_col`` is None — use strata at scale); output is the input
    plus ``wsample_rank``."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if w_scale < 1:
        raise ValueError(f"w_scale must be >= 1, got {w_scale}")
    _check_reserved(df.columns, ("wsample_rank", "_u", "_wq"), "output columns")
    u = F.conv(
        F.substring(sample_hash_col(F.col(key_col), salt), 1, 12), 16, 10
    ).cast("decimal(38,0)")
    wq = F.round(F.col(weight_col).cast("double") * w_scale, 0).cast("decimal(38,0)")
    staged = (
        df.withColumn("_u", u)
        .withColumn("_wq", wq)
        .filter(F.col("_wq") > 0)
        .withColumn("_priority", F.expr("_u * 1000000 DIV _wq"))
    )
    parts = [group_col] if group_col else [F.lit(1)]
    w = Window.partitionBy(*parts).orderBy(
        F.col("_priority").asc(), F.col(key_col).asc()
    )
    return (
        staged.withColumn("wsample_rank", F.row_number().over(w))
        .filter(F.col("wsample_rank") <= n)
        .drop("_u", "_wq", "_priority")
    )


def quality_quota(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    n: int,
    id_col: str,
) -> DataFrame:
    """Top-``n`` rows per group by a (rounded) score — the quota-based
    selection step of a data-mixing recipe ("keep the best n documents
    per source"). The score is rounded to 4 places before ranking and
    ties break on ``id_col``, so the selected set is deterministic even
    when float scores differ in the last ulp across engines."""
    _check_reserved(scored.columns, ("quota_rank",), "output columns")
    r = F.round(F.col(score_col), 4)
    w = Window.partitionBy(group_col).orderBy(r.desc(), F.col(id_col).asc())
    return (
        scored.withColumn("quota_rank", F.row_number().over(w))
        .filter(F.col("quota_rank") <= n)
    )


def temperature_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
) -> dict[str, float]:
    """Per-source keep-rates for temperature-based data mixing: sampled
    source mass ∝ n_g^alpha (alpha=1 → natural proportions, alpha→0 →
    uniform across sources), realized as rate_g ∝ n_g^(alpha-1) and
    normalized so the most-upweighted (smallest) source keeps 100% —
    rates are then valid [0,1] inputs for :func:`mixture_sample`, which
    applies them as the usual deterministic md5-threshold filter.

    The only driver-side data is the per-source count vector (model-
    sized, like a k-means centroid set) — the sample itself stays
    distributed and deterministic. Library helper (no oracle query): the
    rate computation involves float pow(), which is not guaranteed
    bit-identical across engines, so the cross-engine contract lives in
    mixture_sample's fixed rates instead."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if not counts:
        return {}
    weights = {g: n ** (alpha - 1.0) for g, n in counts.items()}
    top = max(weights.values())
    return {g: w / top for g, w in weights.items()}


def importance_sample(
    df: DataFrame,
    target_col: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    fp_scale: int = 10**6,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score each candidate
    document by how target-like its hashed word-feature distribution is,
    then keep the top ``k`` — the targeted-subset step of a pretraining
    data recipe ("select the 1% of the web crawl that looks like
    Wikipedia").

    ``target_col`` is a boolean column: true rows define the target
    distribution, false rows are the candidate pool being scored.
    Features are words hashed into ``n_buckets`` buckets (md5 prefix mod
    B — the paper's hashed n-gram features at n=1). Each bucket gets a
    Laplace-smoothed probability under both distributions and a
    fixed-point importance ratio

        ratio_fp(f) = (c_t(f)+1)·(R+B)·fp_scale DIV ((c_r(f)+1)·(T+B))

    (T, R = total target/raw feature instances); a document scores the
    MEAN ratio over its feature instances (integer DIV). House exactness
    rule (cf. textstats.lm_score): the faithful DSIR weight is the SUM
    OF LOG ratios (a geometric mean), but log is libm and
    engine-divergent in the last ulp — the arithmetic-mean-ratio variant
    keeps every sum an order-independent integer, so scores and the
    selected set are bit-identical across engines and re-runs.
    Selection is deterministic top-k (score desc, id asc) — the paper's
    Gumbel-noise resampling adds diversity at the cost of replayability;
    swapping the rank expression restores it.

    100 TB shape: the bucket tables are B rows — broadcast; the corpus
    is read once into a (doc, bucket) instance relation (one map-side-
    combined aggregation per distribution), and the per-doc score is one
    doc-keyed shuffle. Arithmetic runs in DECIMAL(38,0) ≡ DuckDB
    HUGEINT (counts × fp_scale overflows BIGINT at web scale).
    Documents with no word features never enter the instance relation
    and are exempt from selection (route them by length policy
    upstream)."""
    from .textstats import normalize_text, tokens

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    bucket = (
        F.conv(F.substring(F.md5(F.col("word")), 1, 6), 16, 10).cast("long")
        % n_buckets
    )
    inst = (
        df.select(
            F.col(id_col),
            F.col(target_col).alias("_is_t"),
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"),
        )
        .filter(F.col("word") != "")
        .select(F.col(id_col), F.col("_is_t"), bucket.alias("f"))
    )
    grp = inst.groupBy("f", id_col, "_is_t").agg(F.count("*").alias("n_f"))
    buckets = (
        grp.groupBy("f")
        .agg(
            F.sum(F.when(F.col("_is_t"), F.col("n_f")).otherwise(0)).alias("c_t"),
            F.sum(F.when(~F.col("_is_t"), F.col("n_f")).otherwise(0)).alias("c_r"),
        )
    )
    totals = buckets.agg(
        F.sum("c_t").cast("decimal(38,0)").alias("_T"),
        F.sum("c_r").cast("decimal(38,0)").alias("_R"),
    )
    ratios = buckets.crossJoin(F.broadcast(totals)).select(
        "f",
        F.expr(
            f"CAST((c_t + 1) AS DECIMAL(38,0)) * (_R + {n_buckets})"
            f" * {fp_scale} DIV (CAST((c_r + 1) AS DECIMAL(38,0))"
            f" * (_T + {n_buckets}))"
        ).alias("ratio_fp"),
    )
    scored = (
        grp.filter(~F.col("_is_t"))
        .join(F.broadcast(ratios), "f")
        .groupBy(id_col)
        .agg(
            F.sum("n_f").cast("long").alias("n_feat"),
            F.expr("sum(n_f * ratio_fp) DIV sum(n_f)")
            .cast("long")
            .alias("dsir_score_fp"),
        )
    )
    # orderBy+limit compiles to TakeOrderedAndProject (distributed partial
    # top-k, no global sort); the rank window then runs over k rows only
    # — a global row_number over the full pool would funnel the whole
    # corpus through one partition.
    top = scored.orderBy(F.desc("dsir_score_fp"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("dsir_score_fp"), F.asc(id_col))
    return top.withColumn("dsir_rank", F.row_number().over(w).cast("int"))


def importance_sample_sql(
    rel: str,
    target_sql: str,
    k: int,
    id_col: str = "doc_id",
    n_buckets: int = 256,
    fp_scale: int = 10**6,
) -> str:
    """DuckDB mirror of importance_sample. ``target_sql`` is the boolean
    target-membership expression over the relation's columns."""
    return f"""
        WITH inst AS (
          SELECT {id_col}, ({target_sql}) AS is_t,
                 CAST(('0x' || substr(md5(word), 1, 6))::BIGINT % {n_buckets}
                      AS BIGINT) AS f
          FROM (SELECT *, unnest(string_split_regex(
                  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'))
                  AS word
                FROM ({rel}))
          WHERE word <> ''),
        grp AS (SELECT f, {id_col}, is_t, count(*) AS n_f
                FROM inst GROUP BY 1, 2, 3),
        buckets AS (
          SELECT f,
                 sum(CASE WHEN is_t THEN n_f ELSE 0 END) AS c_t,
                 sum(CASE WHEN NOT is_t THEN n_f ELSE 0 END) AS c_r
          FROM grp GROUP BY f),
        totals AS (SELECT CAST(sum(c_t) AS HUGEINT) AS t_tot,
                          CAST(sum(c_r) AS HUGEINT) AS r_tot
                   FROM buckets),
        ratios AS (
          SELECT f,
                 CAST((c_t + 1) AS HUGEINT) * (r_tot + {n_buckets})
                   * {fp_scale}
                   // (CAST((c_r + 1) AS HUGEINT) * (t_tot + {n_buckets}))
                   AS ratio_fp
          FROM buckets, totals),
        scored AS (
          SELECT g.{id_col},
                 CAST(sum(g.n_f) AS BIGINT) AS n_feat,
                 CAST(sum(g.n_f * r.ratio_fp) // sum(g.n_f) AS BIGINT)
                   AS dsir_score_fp
          FROM grp g JOIN ratios r USING (f)
          WHERE NOT g.is_t
          GROUP BY 1)
        SELECT {id_col}, n_feat, dsir_score_fp,
               CAST(row_number() OVER (ORDER BY dsir_score_fp DESC,
                                       {id_col} ASC) AS INT) AS dsir_rank
        FROM scored
        QUALIFY dsir_rank <= {k}
    """


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_phases: int = 4,
    salt: str = "",
) -> DataFrame:
    """Curriculum phase assignment + reproducible training read order —
    the "easy-to-hard" scheduling step of a training-data pipeline
    (phase 0 = lowest-score quartile … phase n-1 = highest), with a
    deterministic within-phase shuffle so two runs (or two engines)
    materialize the identical training sequence.

    Phases come from exact score quantiles WITHOUT interpolated
    percentiles (floats diverge across engines) and WITHOUT a global
    sort/rank (which would funnel the corpus through one partition):
    the (rounded) score VALUE histogram is aggregated — its size is
    bounded by the score's value grain (≤10^4+1 distinct for a 4-digit
    [0,1] score), not the corpus — a running count-below is windowed
    over that tiny relation, and each row's phase is

        phase(v) = min(n_phases-1, n_phases·cum_lt(v) div N)

    joined back by score value (broadcast — histogram-sized). All ties
    share a phase; integer arithmetic end to end. ``order_key`` =
    md5(salt:id) gives the reproducible shuffle; training ingestion
    reads ORDER BY (phase, order_key) — at scale that is a write-time
    sort-within-partitions after repartitioning on phase, never a
    driver-side sort. A different salt reshuffles without touching the
    curriculum."""
    if n_phases < 2:
        raise ValueError(f"n_phases must be >= 2, got {n_phases}")
    _check_reserved(df.columns, ("phase", "order_key", "_v"), "output columns")
    v = F.round(F.col(score_col), 4)
    base = df.withColumn("_v", v)
    hist = base.groupBy("_v").agg(F.count("*").alias("_n"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "_v",
        F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_cum_lt"),
        F.sum("_n").over(
            Window.orderBy("_v").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_total"),
    )
    phase = F.least(
        F.lit(n_phases - 1),
        F.expr(f"{n_phases}L * _cum_lt div _total"),
    ).cast("int")
    return (
        base.join(F.broadcast(cum), "_v")
        .select(
            F.col(id_col),
            F.col("_v").alias(score_col),
            phase.alias("phase"),
            sample_hash_col(F.col(id_col), salt).alias("order_key"),
        )
    )


def leakage_safe_split(
    clusters: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across the
    boundary: the split hash key is the dup-CLUSTER id (``dup_clusters``
    output), not the document id, so every member of a near-dup cluster
    lands on the same side — the eval set never contains a paraphrase of
    a training document. A plain per-document split leaks: at 10%
    duplication a 1% test split is mostly contaminated.

    Same determinism and boundary-stability contract as
    :func:`split_dataset` (one md5, contiguous cumulative ranges);
    applied on top of the cluster assignment it is a narrow map — the
    only shuffles in the composed pipeline are the CC resolution's own.

    Returns (id, cluster, split)."""
    out = split_dataset(
        clusters, weights, key_col=cluster_col, salt=salt, split_col=split_col
    )
    return out.select(F.col(id_col), F.col(cluster_col), F.col(split_col))


def calibrate_scores(
    df: DataFrame,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-source score calibration: replace each document's raw quality
    score with its integer percentile WITHIN its source,
    pctl_ppm = cnt_le · scale div n_group (cnt_le = documents in the
    group scoring ≤ this one, ties share a percentile; top of every
    group = scale). Raw heuristic scores are not comparable across
    sources (a boilerplate-heavy crawl saturates low, curated text
    high), so a single global threshold starves or floods sources;
    calibrating to within-source rank makes one cut fair across the
    mixture — the normalization step run before quality_quota /
    mixture_sample.

    cnt_le is derived from rank() DESC (rows strictly above = rank−1),
    so no RANGE frame over floats is needed; both windows share the one
    ``group_col`` hash exchange. Count arithmetic end to end — engine
    bit-exact even though the underlying score is a float."""
    _check_reserved(df.columns, ("pctl_ppm", "_num", "_n_g"), "output columns")
    wg = Window.partitionBy(group_col)
    wr = wg.orderBy(F.col(score_col).desc())
    n_g = F.count(F.lit(1)).over(wg)
    cnt_le = n_g - F.rank().over(wr) + 1
    return df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(score_col),
        (cnt_le.cast("long") * scale).cast("long").alias("_num"),
        n_g.cast("long").alias("_n_g"),
    ).select(
        id_col,
        group_col,
        score_col,
        F.expr("_num div _n_g").alias("pctl_ppm"),
    )


def calibrate_scores_sql(
    rel: str,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> str:
    """DuckDB mirror of :func:`calibrate_scores`."""
    return f"""
        SELECT {id_col}, {group_col}, {score_col},
               ((count(*) OVER (PARTITION BY {group_col})
                 - rank() OVER (PARTITION BY {group_col}
                                ORDER BY {score_col} DESC) + 1)
                * {scale})
               // count(*) OVER (PARTITION BY {group_col}) AS pctl_ppm
        FROM ({rel})
    """


def length_buckets(
    df: DataFrame,
    size_col: str,
    min_bucket: int = 16,
    scale: int = 1_000_000,
) -> DataFrame:
    """Power-of-two length-bucket batching report — the padding-waste
    diagnostic run before choosing a batching strategy: every sequence
    is assigned to the smallest power-of-two bucket ≥ its length
    (floored at ``min_bucket``), and each bucket reports how much of a
    naive pad-to-bucket batch would be padding
    (waste_ppm = (Σ(bucket − len)) · scale div (n · bucket)).

    ceil_log2 comes from the binary-string length of (len − 1) — pure
    integer arithmetic, no float log2 whose ulp at exact powers of two
    flips buckets between engines. One narrow map + one map-side-combined
    aggregate on ≤ ~40 distinct buckets; nothing else shuffles."""
    if min_bucket < 1 or (min_bucket & (min_bucket - 1)) != 0:
        raise ValueError(f"min_bucket must be a power of two, got {min_bucket}")
    n = F.col(size_col).cast("long")
    # smallest power of two >= n: 1 << len(bin(n-1)) for n > 1, else 1
    binned = (
        df.select(n.alias("_len"))
        .filter(F.col("_len") > 0)
        .withColumn(
            "bucket_len",
            F.greatest(
                F.expr("CASE WHEN _len <= 1 THEN 1L"
                       " ELSE shiftleft(1L, length(bin(_len - 1))) END"),
                F.lit(min_bucket).cast("long"),
            ),
        )
    )
    return (
        binned.groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seqs"),
            F.sum("_len").cast("long").alias("total_tokens"),
            F.sum(F.col("bucket_len") - F.col("_len")).cast("long").alias("total_pad"),
        )
        .select(
            "bucket_len",
            "n_seqs",
            "total_tokens",
            "total_pad",
            F.expr(f"(total_pad * {scale}L) div (n_seqs * bucket_len)").alias(
                "waste_ppm"
            ),
        )
    )


def length_buckets_sql(
    rel: str, size_col: str, min_bucket: int = 16, scale: int = 1_000_000
) -> str:
    """DuckDB mirror of :func:`length_buckets` (same binary-string-length
    ceil_log2, so bucket boundaries agree bit-exactly)."""
    return f"""
        WITH b AS (
          SELECT CAST({size_col} AS BIGINT) AS len,
                 greatest(
                   CASE WHEN {size_col} <= 1 THEN 1
                        ELSE (CAST(1 AS BIGINT) << length(bin(CAST({size_col} AS BIGINT) - 1)))
                   END,
                   {min_bucket}) AS bucket_len
          FROM ({rel}) WHERE {size_col} > 0
        )
        SELECT bucket_len,
               CAST(count(*) AS BIGINT) AS n_seqs,
               CAST(sum(len) AS BIGINT) AS total_tokens,
               CAST(sum(bucket_len - len) AS BIGINT) AS total_pad,
               (CAST(sum(bucket_len - len) AS BIGINT) * {scale})
                 // (count(*) * bucket_len) AS waste_ppm
        FROM b GROUP BY bucket_len
    """


def recency_weights(
    df: DataFrame,
    ts_col: str,
    now_epoch: int,
    half_life_days: int,
    scale: int = 1_000_000,
    max_halvings: int = 20,
) -> DataFrame:
    """Freshness-weighted sampling weights: weight_ppm = scale halved
    once per elapsed ``half_life_days`` (step decay — the integer-exact
    surrogate of exponential 2^(−age/half_life): piecewise-constant
    between half-life boundaries, equal at them; a float pow would not
    reproduce across engines). Feed the result to
    :func:`weighted_sample` to bias a training subset toward recent
    transcripts without excluding history. ``now_epoch`` is an explicit
    argument — determinism forbids wall-clock reads inside the operator.

    Future timestamps clamp to age 0 (full weight); ages beyond
    ``max_halvings`` half-lives floor at max(scale >> max_halvings, 1)
    — the explicit greatest() guard matters because the shift alone can
    reach 0 (1e6 >> 20 == 0) and weighted_sample excludes nonpositive
    weights — so no row ever becomes unsampleable. Pure narrow map —
    epoch subtraction, two integer divisions, one shift; nothing
    shuffles."""
    if half_life_days <= 0:
        raise ValueError(f"half_life_days must be positive, got {half_life_days}")
    age_days = F.expr(
        f"greatest({now_epoch}L - unix_timestamp({ts_col}), 0L) div 86400"
    )
    return df.withColumn("age_days", age_days).withColumn(
        "weight_ppm",
        F.expr(
            f"greatest(shiftright({scale}L, cast(least(age_days div"
            f" {half_life_days}, {max_halvings}) as int)), 1L)"
        ),
    )


def recency_weight_sql(
    rel: str,
    ts_col: str,
    now_epoch: int,
    half_life_days: int,
    scale: int = 1_000_000,
    max_halvings: int = 20,
) -> str:
    """DuckDB mirror of :func:`recency_weights` (epoch_us//1e6 == Spark's
    unix_timestamp under the UTC session)."""
    age = (
        f"greatest(CAST({now_epoch} AS BIGINT)"
        f" - epoch_us({ts_col}) // 1000000, 0) // 86400"
    )
    return f"""
        SELECT *,
               CAST({age} AS BIGINT) AS age_days,
               greatest({scale} >> CAST(least({age} // {half_life_days},
                                              {max_halvings}) AS INT),
                        1) AS weight_ppm
        FROM ({rel})
    """


def shard_by_bytes(
    df: DataFrame,
    n_shards: int,
    order_col: str,
    size_col: str,
) -> DataFrame:
    """Byte-balanced export sharding: split the corpus into ``n_shards``
    contiguous shards of ~equal total ``size_col`` in ``order_col``
    order, and return the per-shard manifest
    ``(shard_id, n_docs, total_size, first_key, last_key)`` a
    training-data export job writes next to its files.

    A row whose inclusive running size ends at ``g`` lands in shard
    ``min(n_shards-1, (g-1)*n_shards DIV total)`` — fixed cumulative
    boundaries (cf. :func:`pack_sequences`), so every shard except
    possibly the last is within one max-row-size of ``total/n_shards``.
    Pure positive-integer math: Spark's ``DIV`` and DuckDB's ``//``
    agree, and the result is independent of partitioning.

    Scale shape — the global running sum is computed WITHOUT a
    global-order window (Spark executes those as ONE task): the
    classic two-pass distributed prefix sum. ``repartitionByRange``
    gives contiguous ``order_col`` ranges on ascending partition ids;
    a per-partition window computes the local running sum; the
    per-partition totals (one row per partition — metadata-sized) get
    their exclusive prefix on a single tiny task and are broadcast back
    onto the stream, never through the driver. ``order_col`` must be
    unique and non-null (it is the total order); ``size_col`` must be
    positive."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    _check_reserved(
        df.columns, ("_pid", "_cum", "_tot", "_off", "_total", "_g", "shard_id")
    )
    ranged = (
        df.select(order_col, size_col)
        .repartitionByRange(F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_cum", F.sum(F.col(size_col).cast("long")).over(w))
    # one row per partition; both windows run on that tiny relation
    pw = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aw = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = (
        local.groupBy("_pid")
        .agg(F.max("_cum").alias("_tot"))
        .select(
            "_pid",
            (F.sum("_tot").over(pw) - F.col("_tot")).alias("_off"),
            F.sum("_tot").over(aw).alias("_total"),
        )
    )
    shard = F.least(
        F.lit(n_shards - 1), F.expr(f"(_g - 1) * {n_shards} DIV _total")
    ).cast("int")
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn("_g", F.col("_off") + F.col("_cum"))
        .select(F.col(order_col), F.col(size_col), shard.alias("shard_id"))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(size_col).cast("long")).alias("total_size"),
            F.min(order_col).alias("first_key"),
            F.max(order_col).alias("last_key"),
        )
    )


def shard_by_bytes_sql(
    rel: str, n_shards: int, order_col: str, size_col: str
) -> str:
    """DuckDB mirror of :func:`shard_by_bytes` — a plain global
    cumulative window (fine at oracle scale)."""
    return f"""
        WITH t AS ({rel}),
        c AS (
          SELECT {order_col} AS k, {size_col} AS sz,
                 sum({size_col}) OVER (ORDER BY {order_col}) AS g,
                 sum({size_col}) OVER () AS total
          FROM t
        )
        SELECT CAST(least({n_shards - 1}, ((g - 1) * {n_shards}) // total)
                    AS INT) AS shard_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(sz) AS BIGINT) AS total_size,
               min(k) AS first_key, max(k) AS last_key
        FROM c GROUP BY 1
    """


# --------------------------------------------------------------------------
# token-budget selection (quality-ranked prefix under a per-group budget)
# --------------------------------------------------------------------------

def token_budget_select(
    scored: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    order_col: str = "quality",
) -> DataFrame:
    """Select, independently per ``group_col``, the highest-``order_col``
    prefix of documents whose running token total stays within
    ``budget`` — the "best N tokens per source" primitive of a training
    mix builder. Ranking is (order_col DESC, id_col) so ties are
    deterministic; the running sum is inclusive, so a document is kept
    iff the budget still covers it entirely (prefix semantics — the
    cumulative sum is monotone, so the kept set is a prefix of the
    ranking).

    Input is any scored relation carrying (id, group, token count,
    score) — compose with textstats.quality_score(keep_cols=(group,)).

    100 TB shape: ONE shuffle — a window partitioned by the source key
    (bounded cardinality), never a global sort; the cumulative sum is a
    single running frame over each partition. Output carries the running
    total so downstream sharding can pack without re-aggregating."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        scored.select(id_col, group_col, tokens_col, order_col)
        .withColumn(
            "cum_tokens", F.sum(F.col(tokens_col).cast("long")).over(w)
        )
        .filter(F.col("cum_tokens") <= budget)
    )


def token_budget_select_sql(
    scored_rel: str,
    budget: int,
    id_col: str = "doc_id",
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    order_col: str = "quality",
) -> str:
    """DuckDB mirror of :func:`token_budget_select`; ``scored_rel`` is a
    SELECT producing the same scored relation."""
    return f"""
        WITH s AS ({scored_rel}),
        c AS (SELECT {id_col}, {group_col}, {tokens_col}, {order_col},
                     sum(CAST({tokens_col} AS BIGINT)) OVER (
                       PARTITION BY {group_col}
                       ORDER BY {order_col} DESC, {id_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS cum_tokens
              FROM s)
        SELECT {id_col}, {group_col}, {tokens_col}, {order_col}, cum_tokens
        FROM c WHERE cum_tokens <= {budget}
    """


# --------------------------------------------------------------------------
# deterministic per-epoch reshuffle + shard assignment
# --------------------------------------------------------------------------

def epoch_shuffle(
    df: DataFrame,
    epochs: int = 2,
    n_shards: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic multi-epoch training order: each (doc, epoch) pair
    is keyed by ``md5(id:epoch)``, sharded by the key's top 24 bits, and
    positioned by a per-(epoch, shard) rank over the key — so every
    epoch sees a different but fully reproducible global order, and a
    reader streams shard files sequentially with no coordination.

    100 TB shape: the epoch fan-out is a broadcast of an ``epochs``-row
    relation (never a data-sized cross join side); ordering happens ONLY
    inside (epoch, shard) window partitions — there is no global sort or
    row_number anywhere, which is the whole point: the order is defined
    by the hash key, so shards can be written independently."""
    if epochs < 1 or n_shards < 1:
        raise ValueError("need epochs >= 1 and n_shards >= 1")
    ep = df.sparkSession.range(epochs).select(
        F.col("id").cast("int").alias("epoch")
    )
    h = F.md5(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit(":"),
            F.col("epoch").cast("string"),
        )
    )
    keyed = (
        df.select(id_col)
        .join(F.broadcast(ep))
        .withColumn("_h", h)
        .withColumn(
            "shard_id",
            (
                F.conv(F.substring("_h", 1, 6), 16, 10).cast("long")
                % n_shards
            ).cast("int"),
        )
    )
    w = Window.partitionBy("epoch", "shard_id").orderBy("_h", id_col)
    return keyed.select(
        id_col,
        "epoch",
        "shard_id",
        F.row_number().over(w).alias("pos"),
    )


def epoch_shuffle_sql(
    rel: str,
    epochs: int = 2,
    n_shards: int = 4,
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`epoch_shuffle`."""
    return f"""
        WITH ep AS (SELECT CAST(unnest(range({epochs})) AS INT) AS epoch),
        keyed AS (SELECT {id_col}, epoch,
                         md5(CAST({id_col} AS VARCHAR) || ':' ||
                             CAST(epoch AS VARCHAR)) AS _h
                  FROM {rel} CROSS JOIN ep),
        sh AS (SELECT {id_col}, epoch, _h,
                      CAST(('0x' || substr(_h, 1, 6))::BIGINT % {n_shards}
                           AS INT) AS shard_id
               FROM keyed)
        SELECT {id_col}, epoch, shard_id,
               CAST(row_number() OVER (PARTITION BY epoch, shard_id
                                       ORDER BY _h, {id_col}) AS INT) AS pos
        FROM sh
    """
