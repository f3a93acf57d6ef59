"""Iterative link analysis (PageRank) in engine-exact integer fixed
point.

The reference engine has no graph surface; this extends the log-pipeline
toolkit the same way ``dedup.dup_clusters`` does — an iterative
join+aggregate algorithm expressed as a bounded loop of DataFrame
stages, one shuffle per round, no driver-side data.

Determinism contract: ranks are integers at ``scale`` fixed point and
every update is integer arithmetic — contributions ``r DIV outdeg``,
damping ``(d_pct · Σ) DIV 100`` — so the result is independent of
partitioning/shuffle order and bit-identical in DuckDB, where the oracle
unrolls the same iterations as a CTE chain. (Float PageRank sums are
shuffle-order dependent; integer truncation loses a bounded ulp of mass
per round instead, which is fine for a ranking signal and is the price
of replayability.) Dangling nodes drop their mass (the standard
simplification); documented, not redistributed.

At 100 TB: each round is edges ⋈ ranks on src (big⋈small when ranks fit
broadcast, else shuffle hash join co-partitioned on src across rounds) +
one groupBy(dst) partial/final aggregate. Lineage is truncated every few
rounds (``localCheckpoint`` locally, reliable ``checkpoint`` on a
cluster — same knob as dup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import iterutils

PR_SCALE = 10**9


def synth_links(spark: SparkSession, n_edges: int, n_nodes: int) -> DataFrame:
    """Deterministic edge relation from ``range`` (the synth_conv
    pattern): src = i mod n, dst = (i·7 + i div n + 1) mod n, self-loops
    dropped. Pure integer arithmetic — DuckDB mirrors it exactly."""
    i = F.col("id")
    return (
        spark.range(n_edges)
        .select(
            (i % n_nodes).alias("src"),
            ((i * 7 + F.expr(f"id DIV {n_nodes}") + 1) % n_nodes).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def synth_links_sql(n_edges: int, n_nodes: int) -> str:
    """DuckDB mirror of :func:`synth_links`."""
    return f"""
        SELECT i % {n_nodes} AS src,
               (i * 7 + i // {n_nodes} + 1) % {n_nodes} AS dst
        FROM range({n_edges}) t(i)
        WHERE i % {n_nodes} <> (i * 7 + i // {n_nodes} + 1) % {n_nodes}
    """


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    checkpoint_every: int = 2,
    cache: bool = True,
    checkpoint: str = "auto",
) -> DataFrame:
    """Fixed-iteration integer PageRank → (node, rank_fp).

    rank₀ = scale for every node; each round
    ``rank(v) = (100 − d)·scale DIV 100 + (d · Σ_{u→v} rank(u) DIV
    outdeg(u)) DIV 100``. Ranks divide by ``scale`` for display; here
    they stay integer so the driver hash check is exact.

    The loop-invariant relations — edges pre-joined with their source's
    out-degree, and the node set — are computed ONCE and persisted
    (``cache=False`` to opt out), so each round is exactly one
    edges⋈ranks join plus one groupBy(dst) aggregate.
    ``checkpoint_every=0`` disables lineage truncation; ``checkpoint``
    picks the truncation kind — "auto" (reliable iff the session has a
    checkpoint dir configured, i.e. cluster deployments; executor-local
    otherwise), "local", or "reliable".

    Capacity: contribution sums stay within long while total mass
    n_nodes·scale < 2⁶³ — at the default scale that is ~9·10⁹ nodes;
    shrink ``scale`` for larger graphs."""
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    checkpoint = iterutils.resolve_checkpoint_mode(edges, checkpoint)
    from pyspark import StorageLevel

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(outdeg, "src").select("src", "dst", "deg")
    if cache:
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
        edges_deg = edges_deg.persist(StorageLevel.MEMORY_AND_DISK)
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    for it in range(1, iters + 1):
        contrib = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), F.expr("r DIV deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        # the damping multiply runs in decimal(38,0): on a power-law
        # graph a hub's Σ contributions approaches total mass
        # (n_nodes·scale), and damping_pct·s would wrap long past
        # ~1e17 while DuckDB's HUGEINT stays correct. floor(dec/100)
        # == integer DIV on non-negatives, so values are unchanged
        # where long math was safe.
        damped = (
            f"CAST(floor((CAST({damping_pct} AS DECIMAL(38,0)) "
            f"* coalesce(s, 0L)) / 100) AS BIGINT)"
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + F.expr(damped)).cast("long").alias("r"),
        )
        if checkpoint_every and it % checkpoint_every == 0 and it < iters:
            ranks = iterutils.truncate_lineage(ranks, checkpoint, eager=True)
    return ranks.select("node", F.col("r").alias("rank_fp"))


def pagerank_sql(edges_rel: str, iters: int = 5, damping_pct: int = 85,
                 scale: int = PR_SCALE) -> str:
    """DuckDB mirror: the same iterations unrolled as a CTE chain."""
    base = (100 - damping_pct) * scale // 100
    parts = [
        f"e AS ({edges_rel})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "od AS (SELECT src, count(*) AS deg FROM e GROUP BY 1)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)",
    ]
    for it in range(1, iters + 1):
        prev = f"r{it - 1}"
        parts.append(
            f"r{it} AS (SELECT n.node, CAST({base} + ({damping_pct} * "
            f"coalesce(s.c, 0)) // 100 AS BIGINT) AS r FROM nodes n "
            f"LEFT JOIN (SELECT e.dst AS node, sum({prev}.r // od.deg) AS c "
            f"FROM e JOIN {prev} ON e.src = {prev}.node "
            f"JOIN od ON e.src = od.src GROUP BY 1) s ON n.node = s.node)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, r AS rank_fp FROM r{iters}"
    )


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation — the
    MapReduce-classic trick (Suri & Vassilvitskii, "Counting Triangles
    and the Curse of the Last Reducer") that makes the wedge join safe on
    power-law graphs: orient every undirected edge from its lower-(degree,
    id) endpoint to the higher one, so every out-neighborhood is O(√m)
    even at a celebrity hub, and each triangle is generated EXACTLY once
    at its lowest-ordered vertex.

    Stages (all hash joins, no driver state): simple-graph canonicalize →
    degree count → orient → wedge self-join on the tail vertex (one
    exchange, reused across both sides) → close wedges against the
    oriented edge list → explode each triangle's three corners → count.
    Output: (node, n_triangles) for every node in at least one triangle.
    """
    a, b = F.col("a"), F.col("b")
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(a != b)
        .distinct()
    )
    deg = (
        und.select(a.alias("node"))
        .unionByName(und.select(b.alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    withdeg = (
        und.join(da, und.a == F.col("da.node"))
        .join(db, und.b == F.col("db.node"))
        .select(
            "a", "b",
            F.col("da.deg").alias("dega"), F.col("db.deg").alias("degb"),
        )
    )
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (a < b)
    )
    oriented = withdeg.select(
        F.when(a_first, a).otherwise(b).alias("u"),
        F.when(a_first, b).otherwise(a).alias("v"),
        F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias("dv"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedge_ord = (F.col("o1.dv") < F.col("o2.dv")) | (
        (F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v"))
    )
    wedges = o1.join(o2, (F.col("o1.u") == F.col("o2.u")) & wedge_ord).select(
        F.col("o1.u").alias("t0"),
        F.col("o1.v").alias("t1"),
        F.col("o2.v").alias("t2"),
    )
    closer = oriented.select(F.col("u").alias("t1"), F.col("v").alias("t2"))
    tris = wedges.join(closer, ["t1", "t2"])
    return (
        tris.select(F.explode(F.array("t0", "t1", "t2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def triangle_counts_sql(edges_rel: str) -> str:
    """DuckDB mirror of :func:`triangle_counts` (same orientation and
    wedge arithmetic; node ids integer)."""
    return f"""
        WITH raw AS ({edges_rel}),
        und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        ),
        deg AS (
          SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und)
          GROUP BY node
        ),
        oriented AS (
          SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                      THEN u.a ELSE u.b END AS u,
                 CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                      THEN u.b ELSE u.a END AS v,
                 CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                      THEN db.deg ELSE da.deg END AS dv
          FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node
        ),
        wedges AS (
          SELECT o1.u AS t0, o1.v AS t1, o2.v AS t2
          FROM oriented o1 JOIN oriented o2
            ON o1.u = o2.u
           AND (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))
        ),
        tris AS (
          SELECT w.t0, w.t1, w.t2
          FROM wedges w JOIN oriented c ON w.t1 = c.u AND w.t2 = c.v
        )
        SELECT node, count(*) AS n_triangles FROM (
          SELECT t0 AS node FROM tris
          UNION ALL SELECT t1 FROM tris
          UNION ALL SELECT t2 FROM tris)
        GROUP BY node
    """


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    cache: bool = True,
    checkpoint_every: int = 2,
    checkpoint: str = "auto",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, made deterministic) → (node, community). The
    graph-curation companion of min-label CC: where CC merges anything
    connected, LPA finds DENSE regions — the boilerplate-family /
    link-farm / template-cluster view of a near-dup or citation graph.

    Every node starts as its own label; each round every node adopts
    the most frequent label among its neighbors (undirected view), with
    the deterministic tie-break (count DESC, label ASC) replacing the
    usual random choice so both engines replay the identical fixed
    ``iters``-round schedule — no convergence test, no randomness.

    Shape: the symmetrized distinct edge relation and the node set are
    built ONCE and persisted; each round is one edges⋈labels hash join
    + one (node, label) count aggregate + a WindowGroupLimit-pushable
    top-1 — all keyed on node, so AQE reuses one exchange layout.
    Lineage truncates every ``checkpoint_every`` rounds exactly like
    pagerank (auto local/reliable). Cost per round is O(edges), rounds
    are fixed: O(iters · edges) total, no quadratic blowup at hubs."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    checkpoint = iterutils.resolve_checkpoint_mode(edges, checkpoint)
    from pyspark import StorageLevel

    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(
            edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = und.select(F.col("a").alias("node")).distinct()
    if cache:
        und = und.persist(StorageLevel.MEMORY_AND_DISK)
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    labels = nodes.select("node", F.col("node").alias("community"))
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("community").asc()
    )
    for it in range(1, iters + 1):
        neigh = und.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "community")
        cnt = neigh.groupBy("node", "community").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = (
            cnt.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "community")
        )
        if checkpoint_every and it % checkpoint_every == 0 and it < iters:
            labels = iterutils.truncate_lineage(labels, checkpoint, eager=True)
    return labels


def label_propagation_sql(edges_rel: str, iters: int = 4) -> str:
    """DuckDB mirror of :func:`label_propagation` (unrolled rounds)."""
    rounds = []
    prev = "l0"
    for it in range(1, iters + 1):
        rounds.append(f"""
        l{it} AS (
          SELECT node, community FROM (
            SELECT u.a AS node, p.community, count(*) AS cnt,
                   row_number() OVER (PARTITION BY u.a
                     ORDER BY count(*) DESC, p.community) AS rn
            FROM und u JOIN {prev} p ON u.b = p.node
            GROUP BY u.a, p.community)
          WHERE rn = 1
        )""")
        prev = f"l{it}"
    return f"""
        WITH e AS ({edges_rel}),
        und AS (
          SELECT DISTINCT a, b FROM (
            SELECT src AS a, dst AS b FROM e
            UNION ALL SELECT dst, src FROM e)
          WHERE a <> b
        ),
        l0 AS (SELECT DISTINCT a AS node, a AS community FROM und),
        {",".join(rounds)}
        SELECT node, community FROM {prev}
    """


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Power-of-two degree-distribution report → (direction, bucket_lo,
    n_nodes, sum_degree) — the graph-health audit run before choosing
    join/skew strategy on a web-scale link graph: a heavy tail at high
    buckets means hub salting; a spike at bucket 1 means most of the
    graph is noise-grade.

    bucket_lo = 2^⌊log2(deg)⌋ via length(bin(deg)) — pure bit
    arithmetic, no float log2 whose ulp flips buckets at exact powers
    of two (the HDR-sketch idiom). Shape: one count aggregate per
    direction off the same edge scan, then a second aggregate on the
    node-grain relation; output is ≤ ~64 rows per direction."""
    def leg(key: str, direction: str) -> DataFrame:
        deg = edges.groupBy(F.col(key).alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        bucket = F.expr("shiftleft(CAST(1 AS BIGINT), length(bin(deg)) - 1)")
        return deg.select(
            F.lit(direction).alias("direction"),
            bucket.alias("bucket_lo"),
            F.col("deg"),
        )
    both = leg("src", "out").unionByName(leg("dst", "in"))
    return both.groupBy("direction", "bucket_lo").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("deg").cast("long").alias("sum_degree"),
    )


def degree_histogram_sql(edges_rel: str) -> str:
    """DuckDB mirror of :func:`degree_histogram`."""
    return f"""
        WITH e AS ({edges_rel}),
        degs AS (
          SELECT 'out' AS direction, src AS node, count(*) AS deg
          FROM e GROUP BY 2
          UNION ALL
          SELECT 'in', dst, count(*) FROM e GROUP BY 2
        )
        SELECT direction,
               CAST(CAST(1 AS BIGINT) << (length(bin(deg)) - 1) AS BIGINT) AS bucket_lo,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(deg) AS BIGINT) AS sum_degree
        FROM degs GROUP BY 1, 2
    """


def synth_links_skewed(
    spark: SparkSession, n_edges: int, n_nodes: int
) -> DataFrame:
    """Deterministic SKEWED edge relation: dst = i mod 2^(i mod 11)
    (mod n) — low-id nodes accumulate power-law-ish in-degree across
    ~11 octaves, the shape a web link graph actually has, so
    :func:`degree_histogram` spans many buckets and skew-handling
    paths see a genuine hub. Pure integer bit arithmetic."""
    i = F.col("id")
    dst = F.expr(
        f"(id % shiftleft(CAST(1 AS BIGINT), CAST(id % 11 AS INT)))"
        f" % {n_nodes}"
    )
    return (
        spark.range(n_edges)
        .select((i % n_nodes).alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def synth_links_skewed_sql(n_edges: int, n_nodes: int) -> str:
    """DuckDB mirror of :func:`synth_links_skewed`."""
    dst = f"(i % (CAST(1 AS BIGINT) << CAST(i % 11 AS INT))) % {n_nodes}"
    return f"""
        SELECT i % {n_nodes} AS src, {dst} AS dst
        FROM range({n_edges}) t(i)
        WHERE i % {n_nodes} <> {dst}
    """


def bfs_levels(
    edges: DataFrame,
    seeds: list[int] | tuple[int, ...],
    max_depth: int = 4,
    cache: bool = True,
) -> DataFrame:
    """Directed BFS distance labeling from a seed set → (node, level):
    level 0 = seed, level d = first reached in round d following
    src→dst. The TrustRank-style frontier sweep a link-graph pipeline
    runs from a trusted (or spam) seed list; nodes unreachable within
    ``max_depth`` are absent — their count is the "dark" remainder.

    Shape: edges persisted once; each round is ONE frontier⋈edges hash
    join + distinct + a left-anti join against the visited set
    (node-grain, strictly growing). The frontier relation is bounded by
    the reached node set, never the edge count; rounds are fixed so the
    plan is statically unrolled — for deeper sweeps raise max_depth and
    lineage-truncate like pagerank (frontiers here stay node-grain, so
    ``max_depth`` ≤ ~8 needs no checkpoint)."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    from pyspark import StorageLevel

    spark = edges.sparkSession
    if cache:
        edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    frontier = spark.createDataFrame(
        [(int(s),) for s in sorted(set(seeds))], "node long"
    )
    visited = frontier.select("node", F.lit(0).cast("int").alias("level"))
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        frontier = nxt
        visited = visited.unionByName(
            nxt.select("node", F.lit(d).cast("int").alias("level"))
        )
    return visited


def bfs_levels_sql(
    edges_rel: str, seeds: list[int] | tuple[int, ...], max_depth: int = 4
) -> str:
    """DuckDB mirror of :func:`bfs_levels` (unrolled rounds)."""
    seed_vals = ", ".join(f"({int(s)})" for s in sorted(set(seeds)))
    rounds, acc = [], ["SELECT node, 0 AS level FROM f0"]
    prev = "f0"
    for d in range(1, max_depth + 1):
        earlier = " UNION ALL ".join(
            f"SELECT node FROM f{j}" for j in range(d)
        )
        rounds.append(f"""
        f{d} AS (
          SELECT DISTINCT e.dst AS node
          FROM {prev} f JOIN e ON f.node = e.src
          WHERE e.dst NOT IN ({earlier})
        )""")
        acc.append(f"SELECT node, {d} AS level FROM f{d}")
        prev = f"f{d}"
    return f"""
        WITH e AS ({edges_rel}),
        f0(node) AS (VALUES {seed_vals}),
        {",".join(rounds)}
        {" UNION ALL ".join(acc)}
    """


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    cache: bool = True,
    checkpoint_every: int = 1,
    checkpoint: str = "auto",
    symmetrized: bool = False,
) -> DataFrame:
    """k-core peeling → (node, core_deg): iteratively remove nodes of
    undirected degree < k (and their incident edges) for a FIXED number
    of rounds; survivors report their degree inside the peeled subgraph.
    The standard corpus/link-graph densest-region screen (a node in the
    k-core participates in a subgraph where everyone has ≥ k
    neighbours — spam farms and boilerplate hubs light up, tendrils
    peel away).

    Rounds are fixed, not run-to-convergence, so the plan is statically
    known and the DuckDB oracle replays the identical peel as an
    unrolled CTE chain — if the peel hasn't converged by ``rounds`` both
    engines report the same intermediate state. (Peeling is confluent:
    extra rounds only shrink the set toward the true k-core, never
    reorder results.)

    Scale shape — DELTA PEELING, not per-round edge refiltering: the
    adjacency is symmetrized + deduped ONCE (one exchange) and a
    NODE-grain degree relation is derived from it (one map-side-combined
    aggregate). Each round then touches only the frontier: the removed
    set (deg < k) joins the edge relation to count each survivor's lost
    neighbors, and degrees are decremented — synchronous-peel semantics
    identical to refiltering the edge relation every round (the DuckDB
    mirror replays that refiltering formulation; cross-engine equality
    is exactly the claim that the two are the same peel). Total work
    across ALL rounds is O(|E|): every edge is charged once when its
    endpoint is removed, vs O(rounds·|E|) for refiltering — measured
    5-6× faster end-to-end at 30M edges, and the removed-set join is
    broadcastable whenever the frontier is small (AQE does this
    locally; at 10^11 edges the frontier join hash-partitions on dst).
    All iterating state is node-grain — and ``cur`` is referenced THREE
    times per round (the removed filter, the anti-join, and the loss
    count through removed), so without materialization the lazy plan
    re-executes prior rounds ~3^r times (the Spark-side twin of the
    mirror's AS MATERIALIZED requirement; measured: per-round
    truncation of the tiny node relation beats every-3-rounds by >5×
    at 30M edges). Hence ``checkpoint_every`` defaults to 1 here,
    unlike pagerank whose rank relation is referenced once per round.
    Degree counts are exact longs (safe to 9e18 incident edges per
    node).

    ``symmetrized=True`` declares the input ALREADY canonical (both
    directions present, no self-loops, no duplicates) and skips the
    symmetrize+distinct — at corpus scale the adjacency is materialized
    once and reused across k/rounds sweeps, so the one-time prep should
    not be re-paid per call."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    checkpoint = iterutils.resolve_checkpoint_mode(edges, checkpoint)
    from pyspark import StorageLevel

    und = edges.select("src", "dst") if symmetrized else (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if cache:
        und = und.persist(StorageLevel.MEMORY_AND_DISK)
    cur = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    for it in range(1, rounds + 1):
        removed = cur.filter(F.col("deg") < k).select("node")
        loss = (
            und.join(
                removed.select(F.col("node").alias("dst")), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("lost"))
        )
        cur = (
            cur.join(removed, "node", "left_anti")
            .join(loss, "node", "left")
            .select(
                "node",
                (F.col("deg") - F.coalesce(F.col("lost"), F.lit(0))).alias(
                    "deg"
                ),
            )
        )
        if checkpoint_every and it % checkpoint_every == 0 and it < rounds:
            cur = iterutils.truncate_lineage(cur, checkpoint, eager=True)
    # deg-0 survivors (every neighbor removed this round) match the
    # refiltering formulation's empty-edge-set absence
    return cur.filter(F.col("deg") >= 1).select(
        "node", F.col("deg").cast("long").alias("core_deg")
    )


def kcore_sql(edges_rel: str, k: int = 3, rounds: int = 6) -> str:
    """DuckDB mirror of :func:`kcore` (unrolled peel rounds). Each round's
    relation is referenced three times by the next (the edge scan plus
    both endpoint semi-joins), so every CTE is AS MATERIALIZED — without
    it DuckDB inlines the chain and the plan blows up 3^rounds."""
    parts = []
    prev = "e0"
    for it in range(1, rounds + 1):
        parts.append(f"""
        keep{it} AS MATERIALIZED (
          SELECT src AS node FROM {prev}
          GROUP BY src HAVING count(*) >= {k}
        ),
        e{it} AS MATERIALIZED (
          SELECT e.src, e.dst FROM {prev} e
          JOIN keep{it} a ON e.src = a.node
          JOIN keep{it} b ON e.dst = b.node
        )""")
        prev = f"e{it}"
    return f"""
        WITH raw AS ({edges_rel}),
        e0 AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM raw
            UNION ALL
            SELECT dst AS src, src AS dst FROM raw
          ) WHERE src <> dst
        ),
        {",".join(parts)}
        SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
        FROM {prev} GROUP BY src
    """

def clustering_coeff(edges: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Local clustering coefficient per node, in ppm: 2·T(v)·scale DIV
    (deg(v)·(deg(v)−1)) for nodes of undirected degree ≥ 2 — how much of
    each node's neighborhood is itself wired (1e6 = clique corner, 0 =
    star center). The community-structure complement of
    :func:`triangle_counts`: spam link-farms sit near 1e6 while organic
    hubs thin out with degree.

    Composes :func:`triangle_counts` (degree-ordered wedge join — safe
    on power-law hubs) with the same simple-graph degree relation; nodes
    with no triangle report 0 via the left join. Integer throughout; the
    2·T·scale product runs in DECIMAL(38,0) (a clique corner has T ≈
    deg²/2, so long math would wrap at deg ≈ 2e6 — the decimal keeps the
    Spark arithmetic identical to the HUGEINT mirror at any degree)."""
    tri = triangle_counts(edges)
    a, b = F.col("a"), F.col("b")
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .filter(a != b)
        .distinct()
    )
    deg = (
        und.select(a.alias("node"))
        .unionByName(und.select(b.alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            F.col("deg").cast("long").alias("deg"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.expr(
                f"CAST((CAST(coalesce(n_triangles, 0) AS DECIMAL(38,0))"
                f" * 2 * {scale}) DIV (CAST(deg AS DECIMAL(38,0))"
                f" * (deg - 1)) AS BIGINT)"
            ).alias("cc_ppm"),
        )
    )


def clustering_coeff_sql(edges_rel: str, scale: int = 1_000_000) -> str:
    """DuckDB mirror of :func:`clustering_coeff` (wraps the
    triangle-count mirror as a subquery)."""
    return f"""
        WITH raw AS ({edges_rel}),
        und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        ),
        deg AS (
          SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und)
          GROUP BY node
        ),
        tri AS ({triangle_counts_sql(edges_rel)})
        SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
               CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
               CAST((CAST(coalesce(t.n_triangles, 0) AS HUGEINT)
                    * 2 * {scale})
                    // (CAST(d.deg AS HUGEINT) * (d.deg - 1)) AS BIGINT)
                 AS cc_ppm
        FROM deg d LEFT JOIN tri t ON d.node = t.node
        WHERE d.deg >= 2
    """
