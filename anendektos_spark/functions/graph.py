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
