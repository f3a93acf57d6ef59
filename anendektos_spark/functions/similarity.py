"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; IVF (inverted-file)
bucketing is the scale path: assign every vector to its nearest centroid
once (narrow map over a broadcast centroid table), then search only
within the probe's cluster — turning an O(n·q) cross join into
O(n·q / n_clusters) with the same top-k contract at high recall.

All arithmetic is a sequential left-fold in double precision
(F.aggregate over zip_with), so the same fold in any engine reproduces
the values bit-for-bit; ranking uses rounded similarity with an id
tie-break, making top-k order fully deterministic.

At cluster scale: queries and centroids are broadcast (no shuffle of the
big side); the only shuffle is the final per-query top-k aggregation,
which is tiny (k rows per query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against every vector.

    Output (query_id, neighbor_id, rank, cos_sim); ranking on
    round(cos, 6) desc then neighbor id asc — deterministic.

    Norms are materialized per SIDE before the candidate join (see
    semantic_dup_pairs: interpreted HOF folds get no CSE), so each
    candidate costs one dot fold; dot/(nq·nn) is the identical fold
    order as cosine(q, n) — values bit-unchanged."""
    qv = as_double(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"), qv.alias("qv"), l2_norm(qv).alias("qn")
    )
    nv = as_double(F.col(vec_col))
    base = emb.select(
        F.col(id_col).alias("neighbor_id"), nv.alias("nv"), l2_norm(nv).alias("nn")
    )
    cos = dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    sims = (
        base.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (IVF build).

    Centroids are broadcast, and the argmax is a hash aggregate on a
    (sim, -cid, cid) struct — partial map-side combine collapses each
    vector's candidates before the (tiny) shuffle. Ties break to the
    lower centroid id.

    Both sides materialize their L2 norm BEFORE the candidate join
    (interpreted HOF folds get no CSE), so each (vector, centroid)
    candidate costs one dot fold; dot/(vn·cn) is the identical fold
    order as cosine(v, cv) — values bit-unchanged."""
    cv = as_double(F.col(vec_col))
    c = centroids.select(
        F.col(centroid_id).alias("cid"), cv.alias("cv"), l2_norm(cv).alias("cn")
    )
    v = as_double(F.col(vec_col))
    scored = emb.select(F.col(id_col), v.alias("v"), l2_norm(v).alias("vn")).join(
        F.broadcast(c)
    )
    sim = F.round(dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn")), 6)
    best = F.max(
        F.struct(sim.alias("sim"), (-F.col("cid")).alias("neg_cid"), F.col("cid").alias("cid"))
    ).alias("best")
    return (
        scored.groupBy(id_col)
        .agg(best)
        .select(F.col(id_col), F.col("best.cid").alias(centroid_id))
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's own IVF cluster.

    The candidate join is (cluster ⋈ cluster) instead of a cross join —
    the 100 TB path. Recall < 1.0 near cluster boundaries by design
    (probe 1 cluster; raise n_probe by unioning more clusters)."""
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    nv = as_double(F.col(vec_col))
    base = emb.join(assign, id_col).select(
        F.col("centroid_id"),
        F.col(id_col).alias("neighbor_id"),
        nv.alias("nv"),
        l2_norm(nv).alias("nn"),
    )
    qv = as_double(F.col(vec_col))
    q = queries.join(assign, id_col).select(
        F.col("centroid_id"),
        F.col(id_col).alias("query_id"),
        qv.alias("qv"),
        l2_norm(qv).alias("qn"),
    )
    cos = dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    sims = (
        base.join(F.broadcast(q), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means over cosine assignment — the REAL IVF
    centroid-build step (ivf_assign/ivf_topk consume its output).

    - init: the k vectors with the smallest md5(id) (deterministic,
      hash-spread across the corpus — no RNG, replayable);
    - assign: cosine argmax against broadcast centroids (ivf_assign);
    - update: element-wise mean per cluster via posexplode + hash
      aggregate (distributed; the only per-round driver traffic is the
      k×dims centroid model itself, which is what gets broadcast back —
      the standard fit-loop shape);
    - an emptied cluster keeps its previous centroid.

    Float means are shuffle-order-dependent in the last ulp, so this is a
    model-fitting operator (pytest-verified), not a hash-oracle query.
    Returns (centroid_id int, embedding array<double>)."""
    spark = emb.sparkSession
    v = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("embedding"))
    seed_rows = (
        v.withColumn("h", F.md5(F.col(id_col).cast("string")))
        .orderBy("h", id_col)
        .limit(k)
        .collect()
    )
    schema = "centroid_id int, embedding array<double>"
    centroids = spark.createDataFrame(
        [(i, list(r["embedding"])) for i, r in enumerate(seed_rows)], schema
    )
    for _ in range(iters):
        assign = ivf_assign(v, centroids, id_col=id_col)
        member = assign.join(v, id_col).select(
            "centroid_id", F.posexplode("embedding").alias("dim", "x")
        )
        mean_rows = (
            member.groupBy("centroid_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("centroid_id", F.col("dm.m").alias("embedding"))
            .collect()
        )
        by_id = {r["centroid_id"]: list(r["embedding"]) for r in mean_rows}
        prev = {r["centroid_id"]: list(r["embedding"]) for r in centroids.collect()}
        centroids = spark.createDataFrame(
            [(c, by_id.get(c, prev[c])) for c in range(k)], schema
        )
    return centroids


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round-half-up of
    x_i · 127 / max|x| (floor(·+0.5) — identical in every engine), plus
    the dequantization scale and the integer self-dot (for quantized
    cosine). At 100 TB this is the memory-bandwidth lever: 4× smaller
    vectors through every shuffle/broadcast, integer dot products, and
    the scales cancel out of cosine entirely."""
    v = as_double(F.col(vec_col))
    maxabs = F.array_max(F.transform(v, F.abs))
    q = F.when(
        maxabs == 0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(v, lambda x: F.floor(x * F.lit(127.0) / maxabs + F.lit(0.5)).cast("int"))
    )
    qnorm2 = F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    return emb.select(
        F.col(id_col),
        (maxabs / F.lit(127.0)).alias("scale"),
        q.alias("q"),
        qnorm2.alias("qnorm2"),
    )


def quantized_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors: integer dot
    products (bit-deterministic under any execution order), cosine =
    dot / (sqrt(qnorm2_a)·sqrt(qnorm2_b)) — the per-vector scales cancel.
    Same output contract as brute_topk; recall limited only by
    quantization error (~1/254 per component)."""
    # zero vectors have no direction: qnorm2 == 0 rows are excluded from
    # BOTH sides (otherwise 0/0 → NaN, which Spark ranks above every
    # double while SQL engines yield NULL — a silent rank-1 poison)
    qa = quantize_int8(emb, id_col, vec_col).filter(F.col("qnorm2") > 0)
    qq = quantize_int8(queries, id_col, vec_col).filter(F.col("qnorm2") > 0).select(
        F.col(id_col).alias("query_id"), F.col("q").alias("q_q"),
        F.col("qnorm2").alias("n_q"),
    )
    base = qa.select(
        F.col(id_col).alias("neighbor_id"), F.col("q").alias("q_n"),
        F.col("qnorm2").alias("n_n"),
    )
    dot_int = F.aggregate(
        F.zip_with("q_q", "q_n", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = dot_int.cast("double") / (F.sqrt(F.col("n_q").cast("double")) * F.sqrt(F.col("n_n").cast("double")))
    sims = (
        base.join(F.broadcast(qq))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )


def hyperplane_weights(n_planes: int = 12, dims: int = 64) -> list[list[float]]:
    """Deterministic Rademacher (±1) hyperplanes for cosine LSH.

    Component (p, i) is +1 iff bit i of the md5 digest of ``"plane:<p>"``
    (extended by ``"plane:<p>:<block>"`` beyond 128 bits) is set. Derived
    with hashlib at PLAN-BUILD time — the weights enter the query as
    array literals, so any engine (the DuckDB oracle included) reproduces
    the buckets exactly, with zero runtime hashing."""
    import hashlib

    planes = []
    for p in range(n_planes):
        bits: list[int] = []
        blk = 0
        while len(bits) < dims:
            d = hashlib.md5(f"plane:{p}:{blk}".encode()).digest()
            bits.extend((byte >> j) & 1 for byte in d for j in range(8))
            blk += 1
        planes.append([1.0 if b else -1.0 for b in bits[:dims]])
    return planes


def hyperplane_bucket(vec: Column, n_planes: int = 12, dims: int = 64) -> Column:
    """Cosine-LSH bucket id: sign bits of the vector's dot products with
    the deterministic hyperplanes, emitted as a bitstring (no integer
    conversion ambiguity). High-cosine pairs collide with probability
    (1 - θ/π)^n_planes."""
    def bit(weights: list[float]) -> Column:
        w = F.array(*[F.lit(x) for x in weights])
        signed = F.aggregate(
            F.zip_with(vec, w, lambda x, wi: x * wi),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(signed >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(p) for p in hyperplane_weights(n_planes, dims)])


def lsh_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.25,
    n_planes: int = 12,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for cosine near-dup pairs: bucket on the hyperplane
    signature (narrow map), join only within buckets, refine with exact
    cosine. Replaces the O(n²) cross join with an O(Σ bucket²) join —
    the shuffle keys (buckets) are high-cardinality and AQE handles any
    hot bucket. Recall < 1 by LSH nature; raise by lowering n_planes or
    multi-probing."""
    v = as_double(F.col(vec_col))
    b = emb.select(
        F.col(id_col), v.alias("v"), l2_norm(v).alias("nrm"),
        hyperplane_bucket(v, n_planes, dims).alias("bucket"),
    )
    a = b.select(
        F.col("bucket"), F.col(id_col).alias("id_a"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    c = b.select(
        F.col("bucket"), F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    # dot/(na·nb): identical fold order as cosine(va, vb) with the norms
    # pre-folded once per row per side (before the bucket shuffle), so
    # values are bit-unchanged at 1/3 the per-candidate fold cost.
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def nearest_centroid(
    vec: Column,
    centroid_list: list[tuple[int, list[float]]],
    vnorm: Column | None = None,
) -> Column:
    """Nearest-centroid id by 6-digit-rounded cosine (ties → lower cid)
    as a PURE Column expression: the centroid model enters the plan as
    array literals (the ``hyperplane_weights`` pattern), so assignment is
    a narrow map — no join, no shuffle, and any engine given the same
    literals reproduces it exactly. Semantics identical to
    :func:`ivf_assign`'s max-struct argmax.

    Cost discipline: each centroid's norm is pre-folded driver-side into
    a literal — Python's left-fold over IEEE doubles is the same fold
    the engines run, so the value is bit-identical. Pass ``vnorm`` as a
    MATERIALIZED column (project it first): HOF folds are interpreted
    (CodegenFallback), so a repeated sub-expression gets no CSE — an
    inline norm would be re-folded once per centroid. With both, per-row
    work drops from 3k folds to k+1."""
    import math

    vnorm = vnorm if vnorm is not None else l2_norm(vec)
    entries = []
    for cid, cv in centroid_list:
        acc = 0.0
        for x in cv:
            acc += x * x
        w = F.array(*[F.lit(float(x)) for x in cv])
        entries.append(
            F.struct(
                F.round(dot(vec, w) / (vnorm * F.lit(math.sqrt(acc))), 6).alias("sim"),
                F.lit(-cid).alias("neg_cid"),
                F.lit(cid).alias("cid"),
            )
        )
    return F.array_max(F.array(*entries))["cid"]


def semantic_dup_pairs(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: cluster-blocked
    exact cosine. The centroid model (small by definition: k×dims — the
    output of ``kmeans_fit``) is collected to the driver ONCE and inlined
    as literals, so assignment is a zero-shuffle narrow map
    (:func:`nearest_centroid`); pairs are then formed ONLY within a
    cluster and refined with the fold-deterministic cosine.

    This is the k-means analog of ``lsh_dup_pairs``: the quadratic blow-up
    is bounded to O(Σ cluster²) and the only corpus shuffle is the
    self-join's hash exchange on ``centroid_id`` — the two sides are the
    identical subplan, so the exchange is computed once and reused
    (ReusedExchange), and AQE's skew-join split handles an oversized
    cluster. Recall < 1 exactly when a near-dup pair straddles a
    centroid boundary (the SemDeDup trade-off; raise k-means k for finer
    blocks or union multiple assignments for multi-probe).

    Returns (id_a < id_b, centroid_id, cos_sim) with cos rounded to 4 at
    emission; the threshold is applied to the 6-digit rounding, matching
    the other near-dup operators' determinism contract."""
    model = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in centroids.select(centroid_id, vec_col).collect()
    ]
    # two-step projection: the norm fold materializes FIRST so the argmax
    # and the pair refine reference it as a column (interpreted HOFs get
    # no CSE — see nearest_centroid docstring). The pair cosine is then
    # dot/(na·nb): identical fold order and operations as cosine(a, b),
    # so the values (and the DuckDB oracle) are bit-unchanged, but each
    # pair costs ONE fold instead of three.
    v = as_double(F.col(vec_col))
    normed = emb.select(F.col(id_col), v.alias("v"), l2_norm(v).alias("nrm"))
    vecs = normed.select(
        nearest_centroid(F.col("v"), model, vnorm=F.col("nrm")).alias("centroid_id"),
        F.col(id_col),
        "v",
        "nrm",
    )
    a = vecs.select(
        "centroid_id", F.col(id_col).alias("id_a"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = vecs.select(
        "centroid_id", F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    sim6 = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("centroid_id", "id_a", "id_b", sim6.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "centroid_id", F.round("cos_sim", 4).alias("cos_sim"))
    )


def cosine_dup_pairs(
    emb: DataFrame,
    pairs: DataFrame | None = None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exhaustive: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= t).

    With ``pairs`` given (e.g. LSH candidates), refines only those — the
    scale path. Without ``pairs`` the plan is an O(n²) self-join; that is
    a correctness baseline for SMALL, pre-blocked inputs only, so it must
    be requested explicitly with ``exhaustive=True`` — a guard against
    accidentally shipping the quadratic plan to a 100 TB run (use
    ``lsh_dup_pairs`` there)."""
    va = as_double(F.col(vec_col))
    a = emb.select(F.col(id_col).alias("id_a"), va.alias("va"), l2_norm(va).alias("na"))
    vb = as_double(F.col(vec_col))
    b = emb.select(F.col(id_col).alias("id_b"), vb.alias("vb"), l2_norm(vb).alias("nb"))
    if pairs is None:
        if not exhaustive:
            raise ValueError(
                "cosine_dup_pairs without candidate pairs is O(n²); pass "
                "pairs (e.g. from lsh_dup_pairs) or opt in with exhaustive=True "
                "on a bounded input"
            )
        joined = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        joined = pairs.join(a, "id_a").join(b, "id_b")
    # per-side materialized norms: dot/(na·nb) == cosine(va, vb) bit-for-bit
    # (same fold order), one fold per candidate instead of three.
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return joined.select(
        "id_a", "id_b", F.round(cos, 4).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


# --- product quantization (PQ) ---------------------------------------------


def _subspaces(df: DataFrame, out_id: str, m_sub: int, dims: int,
               id_col: str, vec_col: str) -> DataFrame:
    """(id, m, vsub) — the vector split into m_sub contiguous subvectors."""
    sub = dims // m_sub
    v = as_double(F.col(vec_col))
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m_sub - 1)),
        lambda m: F.slice(F.col("v"), m * sub + 1, sub),
    )
    return (
        df.select(F.col(id_col).alias(out_id), v.alias("v"))
        .select(out_id, F.posexplode(subs))
        .withColumnsRenamed({"pos": "m", "col": "vsub"})
    )


def pq_codebook(
    emb: DataFrame,
    n_codes: int = 16,
    m_sub: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pseudo-codebook (m, code_id, csub) from the first ``n_codes``
    vectors' subvectors — deterministic and oracle-reproducible, the
    same stand-in pattern ann_ivf_topk uses for centroids; a learned
    codebook swaps in per-subspace kmeans_fit output with no change to
    encode/search."""
    cb = _subspaces(
        emb.filter(F.col(id_col) < n_codes), "code_id", m_sub, dims, id_col, vec_col
    )
    return cb.select(F.col("m"), F.col("code_id").cast("int").alias("code_id"),
                     F.col("vsub").alias("csub"))


def _d2_fp(a, b, scale: int = 10**6):
    """Fixed-point squared L2 between two double arrays: one sequential
    left-fold (deterministic addition order), then ONE round to integer —
    so downstream sums are integer and execution-order-free."""
    d2 = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(d2 * scale).cast("long")


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m_sub: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """PQ encoding (Jégou et al., "Product Quantization for Nearest
    Neighbor Search", public domain of IR literature): each vector is
    stored as m_sub small codes — the nearest codebook entry per
    subspace by squared L2, ties broken by code_id. 64 dims × float32
    collapse to 8 bytes/vector at m_sub=8/K≤256 — the memory shape that
    lets a 10^9-vector index fit a cluster's RAM.

    Plan: subvector explode (narrow), broadcast codebook join (m_sub ×
    n_codes rows), one (id, m) aggregate with a struct-min argmin —
    fixed-point distances so the argmin and every later sum are integer
    and partition-order-free. Returns (id, m, code_id, d2_fp)."""
    vs = _subspaces(emb, id_col, m_sub, dims, id_col, vec_col)
    scored = vs.join(F.broadcast(codebook), "m").select(
        id_col, "m",
        F.col("code_id"),
        _d2_fp(F.col("vsub"), F.col("csub"), scale).alias("d2_fp"),
    )
    best = scored.groupBy(id_col, "m").agg(
        F.min(F.struct("d2_fp", "code_id")).alias("best")
    )
    return best.select(
        id_col,
        "m",
        F.col("best.code_id").alias("code_id"),
        F.col("best.d2_fp").alias("d2_fp"),
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    m_sub: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k: queries stay full-precision;
    each query precomputes a distance table to every codebook entry, and
    a candidate's approximate distance is the SUM of table lookups at
    its stored codes — the corpus is never re-read as floats.

    Plan (100 TB shape): the table is (queries × m_sub × n_codes) rows —
    broadcast; candidates cost one hash join on (m, code_id) against the
    8-row-per-vector code relation plus an integer-sum aggregate; top-k
    per query is a rank window over the aggregated relation. All
    distances are fixed-point integers (see pq_encode), so the ADC sum
    is execution-order-free and the DuckDB oracle hash-matches."""
    # the encode-once/search-many index shape: pass the persisted code
    # relation (pq_encode output) so queries never re-read corpus floats;
    # the default re-encodes for one-shot/contract use
    if codes is None:
        codes = pq_encode(emb, codebook, m_sub, dims, id_col, vec_col, scale)
    codes = codes.select(F.col(id_col).alias("neighbor_id"), "m", "code_id")
    qs = _subspaces(queries, "query_id", m_sub, dims, id_col, vec_col)
    table = qs.join(F.broadcast(codebook), "m").select(
        "query_id", "m", "code_id",
        _d2_fp(F.col("vsub"), F.col("csub"), scale).alias("d2_fp"),
    )
    ad2 = (
        codes.join(F.broadcast(table), ["m", "code_id"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2_fp").alias("ad2_fp"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("ad2_fp"), F.asc("neighbor_id")
    )
    return (
        ad2.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("ad2_fp").cast("double") / F.lit(float(scale)), 6).alias(
                "approx_d2"
            ),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
    scale: int = 10**6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher SIGIR'09) of
    any number of ranked lists — the hybrid-retrieval merge step that
    combines a sparse (BM25) and a dense (embedding-cosine) ranking
    without score calibration:

        rrf_fp(d) = Σ over lists  scale div (k0 + rank_list(d))

    Integer division keeps the fused score engine-exact (house no-libm
    rule); k0=60 is the paper's constant. Output (id, n_lists,
    rrf_score_fp, fused_rank) with deterministic (score desc, id asc)
    top-k.

    100 TB shape: each input list is already top-k-sized (retrieval
    outputs, not corpora), so the union is small; contributions are a
    narrow map, the fuse is ONE id-keyed aggregation, and the final
    top-k compiles to TakeOrderedAndProject with the rank window running
    over k rows only."""
    from functools import reduce

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k0 < 0 or k < 1:
        raise ValueError(f"need k0 >= 0 and k >= 1, got k0={k0}, k={k}")
    tagged = [
        r.select(F.col(id_col), F.col(rank_col).cast("long").alias("_rk"))
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    contrib = u.select(
        F.col(id_col), F.expr(f"{scale}L div ({k0}L + _rk)").alias("_c")
    )
    agg = contrib.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_lists"),
        F.sum("_c").cast("long").alias("rrf_score_fp"),
    )
    top = agg.orderBy(F.desc("rrf_score_fp"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("rrf_score_fp"), F.asc(id_col))
    return top.withColumn("fused_rank", F.row_number().over(w).cast("int"))


def rp_sign_matrix(out_dim: int, in_dim: int, salt: str = "rp") -> list[list[int]]:
    """The deterministic ±1 sign matrix for :func:`random_projection`:
    sign(i, j) from the parity of md5's first hex digit of
    ``"{salt}:{i}:{j}"``. Driver-side constants (out_dim × in_dim ints —
    model-sized), shared by the Spark operator and the DuckDB oracle so
    both engines fold the SAME matrix into their plans."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    emb: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss compression with a deterministic ±1 sign
    matrix (Achlioptas 2003, signs from md5 — see :func:`rp_sign_matrix`):
    ``rp_j = Σ_i sign(i,j) · q_i`` over the shared int8 quantization of
    :func:`quantize_int8`, so the projection is pure integer arithmetic —
    bit-identical in any engine — and inherits the 4× bandwidth saving.

    This is the shuffle-volume lever for downstream candidate generation:
    a 64-dim float vector is 256 bytes through every exchange/broadcast;
    the 16-dim integer projection plus scale is ~36 (pre-delta-encoding),
    and JL preserves relative distances well enough for the LSH/IVF
    candidate stages that re-rank against full vectors anyway. The sign
    matrix is folded into the plan as literals: a narrow map — zero
    shuffle, zero Python at runtime. Vectors shorter than ``in_dim``
    yield NULL components (zip_with pads) rather than silently projecting
    a truncated basis; longer vectors are truncated to ``in_dim``.

    Returns (id, scale double, rp array<long> of out_dim)."""
    if out_dim < 1 or in_dim < 1:
        raise ValueError(f"need out_dim/in_dim >= 1, got {out_dim}/{in_dim}")
    signs = rp_sign_matrix(out_dim, in_dim, salt)
    q = quantize_int8(emb, id_col=id_col, vec_col=vec_col).select(
        id_col, "scale", F.slice("q", 1, in_dim).alias("q")
    )
    comps = [
        F.aggregate(
            F.zip_with(
                F.col("q"),
                F.array(*[F.lit(s) for s in signs[j]]),
                lambda x, s: (x * s).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"rp{j}")
        for j in range(out_dim)
    ]
    proj = q.select(F.col(id_col), F.col("scale"), *comps)
    return proj.select(
        id_col, "scale", F.array(*[F.col(f"rp{j}") for j in range(out_dim)]).alias("rp")
    )


def knn_classify(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification over an embedding corpus — the
    label-propagation step of a curation pipeline (e.g. spreading a
    small set of human quality labels to the whole corpus). Each query
    vector takes the majority label of its k nearest corpus neighbors
    by cosine; ties break to the label holding the NEAREST neighbor,
    then to the smaller label — fully deterministic.

    Output (query_id, predicted_label, votes).

    Scale shape: the query side is broadcast (label propagation fans a
    bounded labeled seed across the corpus, never corpus × corpus), the
    corpus is scanned ONCE carrying its label, the per-query top-k runs
    as a WindowGroupLimit partial below the query_id exchange, and the
    vote is a second tiny aggregation over ≤ q·k rows. Norms pre-fold
    per side before the candidate join (interpreted HOF folds get no
    CSE — see brute_topk)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qv = as_double(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"), qv.alias("qv"), l2_norm(qv).alias("qn")
    )
    nv = as_double(F.col(vec_col))
    base = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("nlabel"),
        nv.alias("nv"),
        l2_norm(nv).alias("nn"),
    )
    cos = dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    sims = (
        base.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "nlabel", F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id").asc()
    )
    topk = sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    per_label = topk.groupBy("query_id", "nlabel").agg(
        F.count("*").cast("int").alias("votes"), F.min("rank").alias("best_rank")
    )
    best = F.max(
        F.struct(
            F.col("votes").alias("votes"),
            (-F.col("best_rank")).alias("neg_rank"),
            (-F.col("nlabel")).alias("neg_label"),
            F.col("nlabel").alias("lab"),
        )
    )
    return (
        per_label.groupBy("query_id")
        .agg(best.alias("b"))
        .select(
            "query_id",
            F.col("b.lab").alias("predicted_label"),
            F.col("b.votes").alias("votes"),
        )
    )


def centroid_outliers(
    emb: DataFrame,
    top_n: int = 5,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 10**4,
) -> DataFrame:
    """Per-label embedding outlier detection: the ``top_n`` vectors
    farthest (squared L2) from their OWN label's centroid — the
    out-of-distribution / mislabeled-example sweep of an embedding-based
    curation pass.

    Determinism: aggregation must not depend on execution order, so the
    centroid is built from EXACT integer component sums (each component
    fixed-pointed to ``scale`` first); the per-vector distance is then
    one scalar double fold over (x_i − s_i/(n·scale))² — a fixed
    left-to-right fold identical in any engine given the same sums —
    rounded to 6dp before ranking (the brute_topk cos6 pattern). Ties
    break on vec_id asc.

    Output (label, vec_id, d2, outlier_rank, n) — ``d2`` is the rounded
    squared distance in original units.

    Scale shape: ONE label-keyed exchange builds the (labels × dims)
    sums relation (map-side partial combine does the heavy lifting);
    that model-sized relation is broadcast back; the re-scan computes
    distances as a narrow map and the top-n runs as a WindowGroupLimit
    partial below the label exchange. No driver collect, no cartesian.

    Input contract: vectors are expected at exactly ``dims`` components
    (the random_projection contract); a shorter vector contributes only
    its present components to the sums — identically in both engines
    (element_at/list index past the end → NULL, excluded from sum)."""
    if top_n < 1 or dims < 1:
        raise ValueError(f"need top_n/dims >= 1, got {top_n}/{dims}")
    v = as_double(F.col(vec_col))
    fp = F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("long"))
    q = emb.select(F.col(label_col).alias("label"), F.col(id_col), fp.alias("q"))
    sums = q.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        *[F.sum(F.element_at("q", i + 1)).alias(f"s{i}") for i in range(dims)],
    )
    model = sums.select(
        "label", "n", F.array(*[F.col(f"s{i}") for i in range(dims)]).alias("s")
    )
    joined = q.join(F.broadcast(model), "label")
    denom = F.col("n").cast("double") * F.lit(float(scale))
    d2 = F.aggregate(
        F.zip_with(
            F.col("q"),
            F.col("s"),
            lambda x, s: (x.cast("double") / scale - s.cast("double") / denom)
            * (x.cast("double") / scale - s.cast("double") / denom),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = joined.select(
        "label", id_col, F.round(d2, 6).alias("d2"), "n"
    )
    w = Window.partitionBy("label").orderBy(F.desc("d2"), F.col(id_col).asc())
    return (
        scored.withColumn("outlier_rank", F.row_number().over(w))
        .filter(F.col("outlier_rank") <= top_n)
        .select("label", id_col, "d2", "outlier_rank", "n")
    )


def decontaminate_embeddings(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.25,
    n_planes: int = 12,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level eval decontamination: flag every corpus vector
    whose cosine to ANY eval-set vector reaches ``threshold`` — the
    semantic complement of textstats.ngram_contamination (which catches
    verbatim leakage; this catches paraphrase leakage). Candidates come
    from the shared hyperplane-LSH buckets, so recall follows the same
    (1 − θ/π)^n_planes collision bound as lsh_dup_pairs.

    Output (vec_id, eval_id, cos_sim): one row per flagged corpus
    vector, keeping only its STRONGEST eval match (ties → lower
    eval_id). Anti-join the corpus against this to drop contaminated
    rows.

    Scale shape: the eval side is small by nature (a benchmark) — its
    bucketed form is BROADCAST, so the corpus is scanned once with a
    narrow bucket map and never shuffles; the per-vector argmax is a
    map-side-combinable aggregation on vec_id. No O(corpus²) anywhere."""
    v = as_double(F.col(vec_col))
    c = corpus.select(
        F.col(id_col), v.alias("v"), l2_norm(v).alias("nrm"),
        hyperplane_bucket(v, n_planes, dims).alias("bucket"),
    )
    ev = as_double(F.col(vec_col))
    e = eval_set.select(
        F.col(id_col).alias("eval_id"), ev.alias("ev"), l2_norm(ev).alias("en"),
        hyperplane_bucket(ev, n_planes, dims).alias("bucket"),
    )
    cos = dot(F.col("v"), F.col("ev")) / (F.col("nrm") * F.col("en"))
    hits = (
        c.join(F.broadcast(e), "bucket")
        .select(F.col(id_col), "eval_id", F.round(cos, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    best = F.max(
        F.struct(
            F.col("cos_sim").alias("cos_sim"),
            (-F.col("eval_id")).alias("neg_eid"),
            F.col("eval_id").alias("eid"),
        )
    )
    return (
        hits.groupBy(id_col)
        .agg(best.alias("b"))
        .select(id_col, F.col("b.eid").alias("eval_id"), F.col("b.cos_sim").alias("cos_sim"))
    )


def centroid_shift(
    emb: DataFrame,
    period_col: str,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 10_000,
) -> DataFrame:
    """Embedding-space drift monitor: per group, the L1 distance between
    the two periods' centroids in fixed-point space — the embedding
    analogue of histogram_drift (a new crawl/model snapshot whose
    centroids moved is a mixture shift the scalar profilers can't see).
    ``period_col`` must hold exactly the values 'a' and 'b' (periods are
    a comparison, not a time series; map epochs upstream).

    Fixed point: every dimension is floored to scale units BEFORE summing
    (float32→double widening is exact and floor is deterministic, the
    same contract as embed_quantize_int8), centroids are integer
    divisions of integer sums, so the report is bit-identical across
    engines and partitionings. Shape: posexplode dims → ONE map-side-
    combined (group, period, dim) sum — the shuffle carries
    groups × 2 × dims partial rows per mapper, never vectors — then a
    groups×dims-sized pivot+fold; output is one row per group."""
    e = emb.select(
        F.col(group_col),
        F.col(period_col).alias("_pd"),
        F.posexplode(F.col(vec_col)).alias("dim", "_x"),
    ).withColumn("_q", F.expr(f"cast(floor(cast(_x as double) * {scale}) as long)"))
    sums = e.groupBy(group_col, "_pd", "dim").agg(
        F.sum("_q").alias("_sq"), F.count(F.lit(1)).alias("_n")
    )
    cent = sums.select(
        group_col,
        "dim",
        F.when(F.col("_pd") == "a", F.expr("_sq div _n")).alias("_ca"),
        F.when(F.col("_pd") == "b", F.expr("_sq div _n")).alias("_cb"),
        F.when(F.col("_pd") == "a", F.col("_n")).alias("_na"),
        F.when(F.col("_pd") == "b", F.col("_n")).alias("_nb"),
    )
    per_dim = cent.groupBy(group_col, "dim").agg(
        F.max("_ca").alias("ca"),
        F.max("_cb").alias("cb"),
        F.max("_na").alias("na"),
        F.max("_nb").alias("nb"),
    )
    return (
        per_dim.filter(F.col("ca").isNotNull() & F.col("cb").isNotNull())
        .groupBy(group_col)
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.sum(F.abs(F.col("ca") - F.col("cb"))).cast("long").alias(
                "shift_l1_q"
            ),
        )
    )


def centroid_shift_sql(
    rel: str,
    period_col: str,
    group_col: str = "label",
    dims: int = 64,
    scale: int = 10_000,
) -> str:
    """DuckDB mirror of :func:`centroid_shift` (fixed ``dims`` because
    SQL needs a literal range; the Spark side explodes whatever length
    the array has)."""
    return f"""
        WITH e AS (
          SELECT {group_col} AS g, {period_col} AS pd, i AS dim,
                 CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * {scale})
                      AS BIGINT) AS q
          FROM ({rel}), range({dims}) r(i)
        ),
        s AS (SELECT g, pd, dim, sum(q) AS sq, count(*) AS n
              FROM e GROUP BY 1, 2, 3),
        c AS (SELECT g, dim,
                     max(CASE WHEN pd = 'a' THEN sq // n END) AS ca,
                     max(CASE WHEN pd = 'b' THEN sq // n END) AS cb,
                     max(CASE WHEN pd = 'a' THEN n END) AS na,
                     max(CASE WHEN pd = 'b' THEN n END) AS nb
              FROM s GROUP BY 1, 2)
        SELECT g AS {group_col},
               CAST(max(na) AS BIGINT) AS n_a,
               CAST(max(nb) AS BIGINT) AS n_b,
               CAST(sum(abs(ca - cb)) AS BIGINT) AS shift_l1_q
        FROM c WHERE ca IS NOT NULL AND cb IS NOT NULL
        GROUP BY 1
    """


def ann_recall_report(
    exact_topk: DataFrame,
    approx_topk: DataFrame,
    k: int,
    scale: int = 1_000_000,
) -> DataFrame:
    """Recall audit for an approximate neighbor path (IVF / PQ / LSH)
    against brute-force ground truth on the same query block — the
    embedding twin of dedup.lsh_recall_report, and the check a pipeline
    runs on a sampled block before trusting nprobe/codebook parameters
    corpus-wide. One row: query count, ground-truth pairs, hits,
    recall_ppm = hits·scale div true_pairs (true pairs, not n_queries·k:
    a query near the corpus edge may have fewer than k true neighbors).

    Both inputs are (query_id, neighbor_id, …) top-k relations — tiny by
    construction (queries × k); the audit is one inner join on the pair
    key plus a single fold. Ground truth is capped to rank ≤ k in case
    the exact leg was built with a larger k; the approx side is
    de-duplicated at pair grain so a multi-probe path that emits the
    same neighbor twice cannot inflate hits past 100% recall."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    ex = exact_topk.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    ap = approx_topk.select("query_id", "neighbor_id").distinct()
    inter = ex.join(ap, ["query_id", "neighbor_id"]).select(
        F.lit(1).alias("_hit")
    )
    return (
        ex.agg(
            F.countDistinct("query_id").cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_true_pairs"),
        )
        .crossJoin(inter.agg(F.count(F.lit(1)).cast("long").alias("n_hits")))
        .select(
            "n_queries",
            "n_true_pairs",
            "n_hits",
            F.expr(f"(n_hits * {scale}L) div n_true_pairs").alias(
                "recall_ppm"
            ),
        )
    )


def brute_l2_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-k — the ground truth PQ's asymmetric distance
    actually approximates (cosine ground truth only matches it on
    normalized vectors). Same shape and determinism contract as
    :func:`brute_topk`: broadcast queries, one sequential double fold
    per candidate, rank on round(d², 6) ASC with neighbor-id tiebreak."""
    qv = as_double(F.col(vec_col))
    q = queries.select(F.col(id_col).alias("query_id"), qv.alias("qv"))
    nv = as_double(F.col(vec_col))
    base = emb.select(F.col(id_col).alias("neighbor_id"), nv.alias("nv"))
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("nv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = (
        base.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(d2, 6).alias("d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("d2"), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("d2", 4).alias("d2"))
    )


def hard_negative_pairs(
    emb: DataFrame,
    anchors: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive pair mining: for each anchor, the k nearest SAME-label
    neighbors (kind='pos') and the k nearest OTHER-label neighbors
    (kind='neg' — the *hard* negatives) by cosine — the batch-construction
    step of embedding-model training (triplet / InfoNCE), where random
    negatives are too easy to carry gradient.

    Output (query_id, kind, rank, neighbor_id, cos_sim); ranking on
    round(cos, 6) desc then neighbor_id asc within (anchor, kind) —
    deterministic.

    Scale shape: the anchor block is broadcast (mini-batch-sized by
    construction) against ONE corpus scan carrying its label; the
    per-(anchor, kind) top-k runs as a WindowGroupLimit partial below the
    single query_id×kind exchange. For corpus×corpus mining, block both
    sides through ``ivf_assign`` and restrict the candidate join to the
    anchor's cluster, exactly as ``ivf_topk`` does. Norms pre-fold per
    side before the candidate join (interpreted HOF folds get no CSE —
    see brute_topk)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qv = as_double(F.col(vec_col))
    q = anchors.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("qlabel"),
        qv.alias("qv"),
        l2_norm(qv).alias("qn"),
    )
    nv = as_double(F.col(vec_col))
    base = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("nlabel"),
        nv.alias("nv"),
        l2_norm(nv).alias("nn"),
    )
    cos = dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    sims = (
        base.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            F.when(F.col("qlabel") == F.col("nlabel"), "pos")
            .otherwise("neg")
            .alias("kind"),
            "neighbor_id",
            F.round(cos, 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id", "kind").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "kind",
            "rank",
            "neighbor_id",
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def matryoshka_recall(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-truncation audit: recall@k of cosine search over the
    first ``dims`` embedding dimensions against full-dimension ground
    truth on the same query block — the check that decides whether a
    truncated (cheaper, cache-friendlier) index is safe to serve. Both
    legs are :func:`brute_topk` (broadcast queries, one fold per
    candidate) folded through :func:`ann_recall_report`, so the audit
    inherits their shapes; at corpus scale the truncated leg is the one
    you would swap for IVF/PQ — the report contract is unchanged."""
    if dims < 1:
        raise ValueError(f"dims must be positive, got {dims}")

    def _trunc(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), F.slice(vec_col, 1, dims).alias(vec_col)
        )

    exact = brute_topk(emb, queries, k, id_col, vec_col)
    approx = brute_topk(_trunc(emb), _trunc(queries), k, id_col, vec_col)
    return ann_recall_report(exact, approx, k)


def label_balance(
    emb: DataFrame,
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Class-balance datacard over a labeled corpus: per label the row
    count, corpus share in ppm, and absolute deviation from the uniform
    share — the sanity check that gates any classifier / kNN /
    stratified-sampling use of the labels (a 95:5 skew silently turns
    accuracy into a majority-class artifact, and a label whose share
    collapsed between snapshots is an upstream-tagging regression).

    Scale: ONE map-side-combined groupBy on the label key (labels are a
    small domain — thousands at most — so the shuffle carries one partial
    row per mapper per label); the grand total + distinct-label count is
    a single-row relation broadcast back over the per-label rows. The
    share arithmetic runs in DECIMAL(38,0) before the integral divide so
    it matches the HUGEINT DuckDB mirror bit-for-bit at any corpus size
    (a LONG ``cnt * 10^6`` would wrap past ~9.2e12 rows per label — the
    exact width asymmetry ADVICE r4 flagged in tool_concentration)."""
    by = emb.groupBy(label_col).agg(F.count(F.lit(1)).alias("cnt"))
    return _balance_from_counts(by, label_col, scale)


def _balance_from_counts(
    by: DataFrame, label_col: str, scale: int
) -> DataFrame:
    """Share/deviation tail of :func:`label_balance` over a pre-counted
    (label, cnt) relation — shared with the streaming partial fold
    (streaming.read_label_balance) so stream == batch is the same code."""
    tot = by.agg(
        F.sum("cnt").alias("_tot"), F.count(F.lit(1)).alias("_k")
    )
    share = f"(cast(cnt as decimal(38,0)) * {scale}) div _tot"
    return by.join(F.broadcast(tot)).select(
        F.col(label_col),
        F.col("cnt"),
        F.expr(share).alias("share_ppm"),
        F.abs(F.expr(share) - F.expr(f"{scale} div _k")).alias(
            "dev_uniform_ppm"
        ),
    )


def label_balance_sql(
    rel: str, label_col: str = "label", scale: int = 1_000_000
) -> str:
    """DuckDB mirror of :func:`label_balance` (HUGEINT share product,
    floor-div — identical to Spark's truncating div on the all-positive
    operands)."""
    return f"""
        WITH b AS (SELECT {label_col}, count(*) AS cnt
                   FROM ({rel}) GROUP BY 1),
        t AS (SELECT sum(cnt) AS tot, count(*) AS k FROM b)
        SELECT {label_col}, cnt,
               CAST(CAST(cnt AS HUGEINT) * {scale} // tot AS BIGINT)
                 AS share_ppm,
               CAST(abs(CAST(cnt AS HUGEINT) * {scale} // tot
                        - {scale} // k) AS BIGINT) AS dev_uniform_ppm
        FROM b, t
    """


def _trunc_div(a: int, b: int) -> int:
    """Python mirror of Spark's truncating integral `div` (shared
    helper — see iterutils.trunc_div)."""
    from . import iterutils

    return iterutils.trunc_div(a, b)


def pca_power(
    emb: DataFrame,
    iters: int = 6,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp: int = 10_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top principal component of the embedding cloud by fixed-point
    power iteration — the dominant direction that "all-but-the-top"
    post-processing removes before similarity search, and the axis whose
    drift between snapshots signals an encoder/config change that
    per-dim centroid monitors smear out. Output: one row per dimension
    with the integer mean (``mean_q``, fp units) and the component
    (``component_q``, renormalized each round to max |entry| = scale),
    i.e. the full affine whitening step.

    Integer end-to-end, so engines and partitionings agree bit-for-bit:
    coordinates floor-quantized to ``fp`` units (the centroid_shift
    contract), per-dim means by truncating division, each iteration
    w = Cᵀ(Cv) with the row dot in exact LONG (|c|·scale·dims ≤ 1.3e12)
    and the per-dim sum in DECIMAL(38,0) ≡ HUGEINT, then renormalized by
    max|w| with sign-safe truncating division. Starting vector is
    all-``scale``; a centered-to-zero (degenerate) corpus yields the
    zero vector rather than dividing by zero.

    Scale shape: the quantized+centered corpus is persisted ONCE and
    each of the ``iters`` (default 6) rounds is one scan over it — a
    narrow map computing the row dot, then ONE map-side-combined
    ``dims``-key aggregate whose shuffle carries 64 partial rows per
    mapper. Driver state is the 64-int vector per round (model-sized,
    the k-means-centroid precedent); nothing data-sized leaves the
    executors. DuckDB mirror: :func:`pca_power_sql` replays the whole
    fit as one unrolled-CTE query (the PageRank/GD-oracle pattern)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    q = emb.select(
        F.expr(
            f"transform({vec_col}, x -> "
            f"cast(floor(cast(x as double) * {fp}) as long))"
        ).alias("q")
    )
    sums = (
        q.select(F.posexplode("q").alias("j", "x"))
        .groupBy("j")
        .agg(
            F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    if not sums:
        raise ValueError("pca_power: empty corpus")
    seen = sorted(r["j"] for r in sums)
    if seen != list(range(dims)):
        raise ValueError(
            f"pca_power: embeddings are {len(seen)}-dimensional "
            f"(dims 0..{seen[-1]}), expected dims={dims}"
        )
    n = int(sums[0]["n"])
    mu = [0] * dims
    for r in sums:
        mu[r["j"]] = _trunc_div(int(r["s"]), n)
    mu_lit = "array(" + ",".join(f"{m}L" for m in mu) + ")"
    c = q.select(
        F.expr(f"zip_with(q, {mu_lit}, (a, b) -> a - b)").alias("c")
    ).persist()
    try:
        v = [scale] * dims
        for _ in range(iters):
            v_lit = "array(" + ",".join(f"{x}L" for x in v) + ")"
            w_rows = (
                c.select(
                    F.expr(
                        f"aggregate(zip_with(c, {v_lit}, (a, b) -> a * b), "
                        f"0L, (acc, x) -> acc + x)"
                    ).alias("dot"),
                    F.posexplode("c").alias("j", "cx"),
                )
                .groupBy("j")
                .agg(
                    F.sum(
                        F.col("dot").cast("decimal(38,0)") * F.col("cx")
                    ).alias("w")
                )
                .collect()
            )
            w = [0] * dims
            for r in w_rows:
                w[r["j"]] = int(r["w"])
            mx = max(abs(x) for x in w)
            if mx == 0:
                v = [0] * dims
                break
            v = [_trunc_div(x * scale, mx) for x in w]
    finally:
        c.unpersist()
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(j, mu[j], v[j]) for j in range(dims)],
        "dim int, mean_q long, component_q long",
    )


def pca_power_sql(
    rel: str,
    iters: int = 6,
    dims: int = 64,
    vec_col: str = "embedding",
    fp: int = 10_000,
    scale: int = 1_000_000,
) -> str:
    """DuckDB mirror of :func:`pca_power` as ONE unrolled-CTE query:
    means CTE, then per iteration a row-dot CTE + a per-dim HUGEINT sum
    + a sign-safe renormalization (CASE-wrapped ``//`` ≡ truncating
    ``div``); a degenerate all-zero round yields the zero vector."""

    def tdiv(x: str, d: str) -> str:
        return (
            f"CASE WHEN ({x}) >= 0 THEN ({x}) // ({d}) "
            f"ELSE -((-({x})) // ({d})) END"
        )

    parts = [
        f"WITH e AS (SELECT list_transform({vec_col}, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {fp}) AS BIGINT)) AS q "
        f"FROM ({rel}))",
        f"dims AS (SELECT unnest(range({dims})) AS j)",
        "meta AS (SELECT count(*) AS n FROM e)",
        f"m AS (SELECT j, CAST({tdiv('sum(q[j+1])', 'max(n)')} AS BIGINT)"
        f" AS mu FROM e CROSS JOIN dims CROSS JOIN meta GROUP BY j)",
        "ml AS (SELECT list(mu ORDER BY j) AS mus FROM m)",
        f"c AS (SELECT list_transform(range({dims}), "
        f"j -> q[j+1] - mus[j+1]) AS c FROM e CROSS JOIN ml)",
        f"v0 AS (SELECT j, CAST({scale} AS BIGINT) AS vv FROM dims)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f"vl{p} AS (SELECT list(vv ORDER BY j) AS v FROM v{p})")
        parts.append(
            f"d{k} AS (SELECT c, list_reduce(list_transform("
            f"range({dims}), j -> c[j+1] * v[j+1]), (a, b) -> a + b) "
            f"AS dot FROM c CROSS JOIN vl{p})"
        )
        parts.append(
            f"w{k} AS (SELECT j, sum(CAST(dot AS HUGEINT) * c[j+1]) AS w "
            f"FROM d{k} CROSS JOIN dims GROUP BY j)"
        )
        parts.append(f"mx{k} AS (SELECT max(abs(w)) AS mx FROM w{k})")
        parts.append(
            f"v{k} AS (SELECT j, CASE WHEN mx = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST({tdiv(f'w * {scale}', 'mx')} AS BIGINT) END AS vv "
            f"FROM w{k} CROSS JOIN mx{k})"
        )
    parts.append(
        f"SELECT CAST(m.j AS INT) AS dim, m.mu AS mean_q, "
        f"v{iters}.vv AS component_q "
        f"FROM m JOIN v{iters} ON m.j = v{iters}.j"
    )
    return ",\n".join(parts[:1] + parts[1:-1]) + "\n" + parts[-1]


def whiten_top_component(
    emb: DataFrame,
    component: DataFrame,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp: int = 10_000,
) -> DataFrame:
    """All-but-the-top whitening: remove the fitted dominant direction
    from every embedding — the standard post-processing that recovers
    isotropy (and measurably better cosine retrieval) after
    :func:`pca_power` showed a fat common axis. Output one row per
    vector: ``whitened`` = centered fixed-point coordinates minus the
    integer projection onto the component, i.e.
    ``w_j = c_j − (⟨c,v⟩ · v_j) div ⟨v,v⟩`` with the projection product
    in DECIMAL(38,0) and truncating division — bit-identical across
    engines and partitionings. A zero component (degenerate fit) leaves
    the centered vectors unchanged rather than dividing by zero.

    Scale shape: ``component`` is MODEL-sized (one row per dim) and is
    collected to literals — the k-means-centroid precedent — so the
    transform is a single narrow whole-stage-codegen map over the
    corpus: no join, no shuffle, no Python. Composes as
    fit-then-transform: ``whiten_top_component(emb, pca_power(emb))``."""
    rows = {r["dim"]: (int(r["mean_q"]), int(r["component_q"]))
            for r in component.collect()}
    if sorted(rows) != list(range(dims)):
        raise ValueError(
            f"component must hold dims 0..{dims - 1}, got {sorted(rows)[:5]}…"
        )
    mu = [rows[j][0] for j in range(dims)]
    v = [rows[j][1] for j in range(dims)]
    vv = sum(x * x for x in v)
    mu_lit = "array(" + ",".join(f"{m}L" for m in mu) + ")"
    v_lit = "array(" + ",".join(f"{x}L" for x in v) + ")"
    c_expr = (
        f"zip_with(transform({vec_col}, x -> "
        f"cast(floor(cast(x as double) * {fp}) as long)), {mu_lit}, "
        f"(a, b) -> a - b)"
    )
    cc = emb.select(F.col(id_col), F.expr(c_expr).alias("c"))
    if vv == 0:
        return cc.select(id_col, F.col("c").alias("whitened"))
    return cc.select(
        id_col,
        F.expr("aggregate(zip_with(c, " + v_lit +
               ", (a, b) -> a * b), 0L, (acc, x) -> acc + x)").alias("dot"),
        "c",
    ).select(
        id_col,
        F.expr(
            f"zip_with(c, {v_lit}, (cj, vj) -> cj - cast("
            f"(cast(dot as decimal(38,0)) * vj) div {vv} as long))"
        ).alias("whitened"),
    )


def whiten_top_component_sql(
    rel: str,
    iters: int = 6,
    dims: int = 64,
    vec_col: str = "embedding",
    fp: int = 10_000,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
) -> str:
    """DuckDB mirror of fit-then-whiten: nests the full
    :func:`pca_power_sql` unrolled-CTE fit as a subquery, then applies
    the identical integer projection removal (HUGEINT product,
    sign-safe ``//`` ≡ truncating ``div``)."""
    fit = pca_power_sql(rel, iters=iters, dims=dims, vec_col=vec_col,
                        fp=fp, scale=scale)
    tdiv = (
        "CASE WHEN (dot * vl.v[j+1]) >= 0 "
        "THEN (CAST(dot AS HUGEINT) * vl.v[j+1]) // vl.vv "
        "ELSE -((-(CAST(dot AS HUGEINT) * vl.v[j+1])) // vl.vv) END"
    )
    return f"""
        WITH comp AS ({fit}),
        vl AS (SELECT list(component_q ORDER BY dim) AS v,
                      list(mean_q ORDER BY dim) AS mus,
                      sum(CAST(component_q AS HUGEINT) * component_q) AS vv
               FROM comp),
        cc AS (SELECT {id_col}, list_transform(range({dims}), j ->
                 CAST(floor(CAST({vec_col}[j + 1] AS DOUBLE) * {fp})
                      AS BIGINT) - vl.mus[j + 1]) AS c
               FROM ({rel}) CROSS JOIN vl),
        d AS (SELECT {id_col}, c,
                     list_reduce(list_transform(range({dims}),
                       j -> c[j+1] * vl.v[j+1]), (a, b) -> a + b) AS dot
              FROM cc CROSS JOIN vl)
        SELECT {id_col},
               CASE WHEN vl.vv = 0 THEN c
                    ELSE list_transform(range({dims}), j ->
                         c[j+1] - CAST({tdiv} AS BIGINT)) END AS whitened
        FROM d CROSS JOIN vl
    """
