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

from pyspark.sql import DataFrame, SparkSession, functions as F

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
