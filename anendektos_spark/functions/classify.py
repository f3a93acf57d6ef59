"""Distributed linear-classifier training by batch gradient descent in
fixed-point integer arithmetic — the quality-classifier primitive of a
training-data pipeline (fastText-style doc filters, binary keep/drop
models), built so the whole fit is cross-engine EXACT.

Why fixed-point: a float GD loop is shuffle-order-dependent in the last
ulp (partial sums merge in nondeterministic order), so two runs — let
alone two engines — drift. Here features are quantized to integers
(``quantize_features``), the model lives at a fixed integer scale, every
dot product / residual / gradient is an integer (order-independent sums
in DECIMAL(38,0) ≡ DuckDB HUGEINT), and the learning-rate step is a
truncating integer division — so the trained weights are bit-identical
everywhere, and the driver's DuckDB oracle replays the full fit as an
unrolled CTE (same pattern as functions/graph.py PageRank).

Least-squares loss on ±1 targets (linear probe / Fisher-style
classifier) rather than logistic: sigmoid/exp differ by ulps across libm
implementations, which would break exactness for zero modeling benefit
at this scale of demonstration. The GD update is
    W_j += trunc( lr_num · G_j / (n · FP² · lr_den) )
with G_j = Σ_i X_ij (y_i·FP·WS − Σ_k X_ik W_k).

Scale shape (100 TB): the per-iteration work is one narrow scoring pass
(65-term codegen dot product against literal weights) plus ONE shuffle of
(dim, partial-gradient) pairs with map-side combine — dim cardinality is
the model width, so the shuffle is O(dims × partitions), not O(rows).
Only the dims-sized gradient vector ever reaches the driver, per
iteration (the kmeans_fit / PageRank loop contract). Batch GD's
per-iteration barrier is inherent; production variants (mini-batch,
L-BFGS) change the schedule, not the shuffle shape.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

FP = 10**4  # feature fixed-point scale
WS = 10**8  # weight fixed-point scale


def quantize_features(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp: int = FP,
    add_intercept: bool = True,
) -> DataFrame:
    """Quantize a float vector column to ``array<long>`` at scale ``fp``
    (round-half-away-from-zero, identical in Spark and DuckDB), optionally
    appending a constant intercept feature = 1.0·fp."""
    x = F.transform(
        F.col(vec_col),
        lambda e: F.round(e.cast("double") * fp, 0).cast("long"),
    )
    if add_intercept:
        x = F.concat(x, F.array(F.lit(int(fp)).cast("long")))
    return df.select(F.col(id_col), x.alias("x"))


def derived_target(dims: int = 8) -> Column:
    """A deterministic learnable ±1 target: +1 iff the sum of the first
    ``dims`` quantized features is positive. Used by the driver query so
    the fit demonstrably LEARNS (the synthetic ``label`` column is random
    noise w.r.t. the embeddings — the best linear probe on it is the
    majority class); any real pipeline passes its own label column."""
    s = reduce(
        lambda a, b: a + b, [F.col("x").getItem(j) for j in range(dims)]
    )
    return F.when(s > 0, F.lit(1)).otherwise(F.lit(-1)).cast("long")


def _dot(weights: list[int]) -> Column:
    """Codegen'd integer dot product of x against literal weights."""
    return reduce(
        lambda a, b: a + b,
        [
            F.col("x").getItem(j) * F.lit(int(w)).cast("long")
            for j, w in enumerate(weights)
        ],
    )


def linear_fit(
    xy: DataFrame,
    dims: int,
    iters: int = 8,
    lr_num: int = 2,
    lr_den: int = 1,
    fp: int = FP,
    cache: bool = True,
) -> list[int]:
    """Batch-GD fit over a relation of (x: array<long>, y: long ±1).
    Returns the integer weight vector (scale ``WS``). Deterministic and
    engine-exact; see module docstring for the update rule."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr_num < 1 or lr_den < 1:
        raise ValueError("lr_num and lr_den must be >= 1")
    rel = xy.select("x", F.col("y").cast("long").alias("y"))
    if cache:
        rel = rel.persist(StorageLevel.MEMORY_AND_DISK)
    n = rel.count()
    if n == 0:
        raise ValueError("cannot fit on an empty relation")
    denom = n * fp * fp * lr_den
    w = [0] * dims
    for _ in range(iters):
        resid = (F.col("y") * F.lit(fp * WS).cast("long") - _dot(w)).alias(
            "r"
        )
        grads = (
            rel.select(resid, F.posexplode("x").alias("j", "xv"))
            .groupBy("j")
            .agg(
                F.sum(
                    F.col("xv").cast("decimal(19,0)")
                    * F.col("r").cast("decimal(19,0)")
                ).alias("g")
            )
            .collect()
        )
        g = [0] * dims
        for row in grads:
            g[row["j"]] = int(row["g"])
        w = [
            wj + _trunc_div(gj * lr_num, denom)
            for wj, gj in zip(w, g)
        ]
    return w


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero (matches Spark `div` and
    the CASE-wrapped DuckDB `//` in the oracle; shared helper)."""
    from . import iterutils

    return iterutils.trunc_div(a, b)


def linear_score(
    xy: DataFrame, weights: list[int], id_col: str = "vec_id"
) -> DataFrame:
    """Apply a trained weight vector: per-row integer margin (scale
    FP·WS), ±1 prediction (margin ≥ 0), and correctness vs y. A narrow
    map — scoring 100 TB is embarrassingly parallel."""
    m = _dot(weights)
    return xy.select(
        F.col(id_col),
        F.col("y").cast("int").alias("target"),
        m.alias("margin_fp"),
        F.when(m >= 0, F.lit(1)).otherwise(F.lit(-1)).alias("pred"),
        (
            F.when(m >= 0, F.lit(1)).otherwise(F.lit(-1))
            == F.col("y").cast("int")
        ).alias("correct"),
    )


def fit_and_score(
    emb: DataFrame,
    iters: int = 8,
    lr_num: int = 2,
    lr_den: int = 1,
    target_dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache: bool = True,
) -> DataFrame:
    """End-to-end driver-query shape: quantize, derive the learnable ±1
    target, fit by batch GD, and return per-row scored predictions."""
    xq = quantize_features(emb, id_col=id_col, vec_col=vec_col)
    dims = len(emb.select(vec_col).first()[0]) + 1
    xy = xq.select(id_col, "x", derived_target(target_dims).alias("y"))
    if cache:
        xy = xy.persist(StorageLevel.MEMORY_AND_DISK)
    w = linear_fit(
        xy, dims=dims, iters=iters, lr_num=lr_num, lr_den=lr_den, cache=False
    )
    return linear_score(xy, w, id_col=id_col)


def fit_sql(
    iters: int = 8,
    lr_num: int = 2,
    lr_den: int = 1,
    dims: int = 65,
    target_dims: int = 8,
    fp: int = FP,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`fit_and_score` as ONE unrolled-CTE query
    (the PageRank-oracle pattern): each GD iteration is a gradient CTE +
    a weight-update CTE; integer arithmetic matches the Spark fit
    bit-for-bit (HUGEINT sums ≡ DECIMAL(38,0); CASE-wrapped `//` ≡
    truncating `div`)."""
    yfpws = fp * WS
    denom_tail = f"{fp * fp * lr_den}"
    tsum = " + ".join(f"x[{j + 1}]" for j in range(target_dims))
    dot = (
        f"list_reduce(list_transform(range({dims}), "
        f"j -> x[j+1] * w[j+1]), (a, b) -> a + b)"
    )
    parts = [
        f"WITH q AS (SELECT {id_col} AS vec_id, "
        f"list_append(list_transform({vec_col}, "
        f"e -> CAST(round(CAST(e AS DOUBLE) * {fp}, 0) AS BIGINT)), "
        f"CAST({fp} AS BIGINT)) AS x FROM {table})",
        f"t AS (SELECT vec_id, x, CASE WHEN ({tsum}) > 0 THEN CAST(1 AS BIGINT) "
        f"ELSE CAST(-1 AS BIGINT) END AS y FROM q)",
        "meta AS (SELECT count(*) AS n FROM t)",
        f"dims AS (SELECT unnest(range({dims})) AS j)",
        "w0 AS (SELECT j, CAST(0 AS BIGINT) AS wv FROM dims)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"wl{p} AS (SELECT list(wv ORDER BY j) AS w FROM w{p})"
        )
        parts.append(
            f"d{k} AS (SELECT vec_id, x, y, {dot} AS m FROM t CROSS JOIN wl{p})"
        )
        parts.append(
            f"g{k} AS (SELECT j, sum(CAST(x[j+1] AS HUGEINT) * "
            f"(CAST(y AS HUGEINT) * {yfpws} - m)) AS g "
            f"FROM d{k} CROSS JOIN dims GROUP BY j)"
        )
        parts.append(
            f"w{k} AS (SELECT g{k}.j, wv + CAST(CASE WHEN g >= 0 "
            f"THEN (g * {lr_num}) // (n * {denom_tail}) "
            f"ELSE -((-(g * {lr_num})) // (n * {denom_tail})) END AS BIGINT) "
            f"AS wv FROM g{k} JOIN w{p} ON g{k}.j = w{p}.j CROSS JOIN meta)"
        )
    parts.append(
        f"wlf AS (SELECT list(wv ORDER BY j) AS w FROM w{iters})"
    )
    ctes = ",\n".join(parts)
    return f"""
        {ctes}
        SELECT vec_id, CAST(y AS INT) AS target,
               CAST({dot} AS BIGINT) AS margin_fp,
               CASE WHEN {dot} >= 0 THEN 1 ELSE -1 END AS pred,
               (CASE WHEN {dot} >= 0 THEN 1 ELSE -1 END = CAST(y AS INT))
                 AS correct
        FROM t CROSS JOIN wlf
    """


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Threshold-sweep precision/recall curve for a keep/drop filter —
    the audit run before committing a quality-score cutoff: for every
    DISTINCT observed score value t, the confusion matrix of the rule
    "keep iff score >= t" against a binary label, plus precision /
    recall / F1 in exact ppm (``p = tp·scale div (tp+fp)``,
    ``r = tp·scale div (tp+fn)``, ``f1 = 2·tp·scale div (2·tp+fp+fn)``
    — integer floor division end to end, so the DuckDB mirror is
    bit-exact; no float ever enters).

    ``label_col`` must be 0/1 (validated — any other value raises at
    execution time rather than silently corrupting the counts).

    Scale shape (100 TB): the only corpus-sized op is ONE map-side-
    combined aggregate at distinct-score grain (pos/neg counts per
    score). The cumulative windows then run on that distinct-scores
    relation — which is why the contract is distinct-VALUE grain:
    quantize continuous scores upstream (e.g. calibrate_scores
    percentiles or an integer bucket) so the curve relation stays
    thousands of rows, not corpus-sized. The single-partition window
    is over that small relation only; the corpus is never re-read.

    Split as :func:`pr_partials` (the mergeable per-score integer
    counts — shards/epochs merge by per-key addition, so
    streaming.stream_pr_partials maintains the curve continuously) +
    :func:`pr_finish` (the windows over the small relation)."""
    return pr_finish(pr_partials(df, score_col, label_col), scale)


def pr_partials(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """The mergeable per-distinct-score (pos, neg) count half of
    :func:`pr_curve` — pure integer sums, so per-epoch/per-shard
    partials merge by per-key addition with no precision loss."""
    lab = F.col("_lab")
    checked = F.when((lab == 0) | (lab == 1), lab).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"pr_curve: {label_col} must be 0/1, got "),
                lab.cast("string"),
            )
        )
    )
    return (
        df.select(
            F.col(score_col).alias("threshold"),
            F.col(label_col).cast("long").alias("_lab"),
        )
        .select("threshold", checked.alias("_lab"))
        .groupBy("threshold")
        .agg(
            F.sum("_lab").alias("_pos"),
            (F.count(F.lit(1)) - F.sum("_lab")).alias("_neg"),
        )
    )


def pr_finish(per: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Cumulative-confusion windows over the distinct-score partial
    relation (the non-mergeable half of :func:`pr_curve`)."""
    wc = (
        Window.orderBy(F.col("threshold").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wa = Window.partitionBy()
    tp = F.sum("_pos").over(wc)
    fp = F.sum("_neg").over(wc)
    fn = F.sum("_pos").over(wa) - tp
    tn = F.sum("_neg").over(wa) - fp
    return per.select(
        "threshold",
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        tn.alias("tn"),
    ).select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(f"(tp * {scale}) div (tp + fp)").alias("precision_ppm"),
        F.expr(f"(tp * {scale}) div (tp + fn)").alias("recall_ppm"),
        F.expr(f"(2 * tp * {scale}) div (2 * tp + fp + fn)").alias("f1_ppm"),
    )


def pr_curve_sql(rel: str, score_expr: str, label_expr: str,
                 scale: int = 1_000_000) -> str:
    """DuckDB mirror of :func:`pr_curve` (same integer floor division)."""
    return f"""
        WITH per AS (
          SELECT {score_expr} AS threshold,
                 SUM(CASE WHEN {label_expr} = 1 THEN 1 ELSE 0 END) AS pos,
                 SUM(CASE WHEN {label_expr} = 1 THEN 0 ELSE 1 END) AS neg
          FROM {rel} GROUP BY 1
        ), cum AS (
          SELECT threshold,
                 SUM(pos) OVER (ORDER BY threshold DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
                 SUM(neg) OVER (ORDER BY threshold DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
                 SUM(pos) OVER () AS tot_pos,
                 SUM(neg) OVER () AS tot_neg
          FROM per
        )
        SELECT CAST(threshold AS BIGINT) AS threshold,
               CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(tot_pos - tp AS BIGINT) AS fn,
               CAST(tot_neg - fp AS BIGINT) AS tn,
               CAST(tp * {scale} // (tp + fp) AS BIGINT) AS precision_ppm,
               CAST(tp * {scale} // (tp + fn) AS BIGINT) AS recall_ppm,
               CAST(2 * tp * {scale} // (2 * tp + fp + fn) AS BIGINT)
                 AS f1_ppm
        FROM cum
    """
