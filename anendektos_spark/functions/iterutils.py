"""Shared helpers for iterative operators (dup_clusters, pagerank).

Lineage-truncation policy: every iterative operator checkpoints its loop
state each few rounds so plan size stays constant. WHICH checkpoint is a
deployment property, not a per-call one — ``localCheckpoint`` stores the
blocks on the executors (fast, but lost with an executor, so a 1000-node
cluster would recompute from nothing), while reliable ``checkpoint``
writes to the SparkContext checkpoint directory (HDFS/object store on a
cluster) and survives executor loss. ``resolve_checkpoint_mode`` makes
the cluster-correct choice automatically: if the session has a checkpoint
directory configured (``sc.setCheckpointDir`` — every cluster deployment
sets one), iterate reliably; otherwise fall back to executor-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHECKPOINT_MODES = ("auto", "local", "reliable")


def resolve_checkpoint_mode(df: DataFrame, mode: str) -> str:
    """Resolve 'auto' → 'reliable' iff a checkpoint dir is configured."""
    if mode not in CHECKPOINT_MODES:
        raise ValueError(f"checkpoint must be one of {CHECKPOINT_MODES}, got {mode!r}")
    if mode != "auto":
        return mode
    ckpt_dir = df.sparkSession.sparkContext.getCheckpointDir()
    return "reliable" if ckpt_dir else "local"


def truncate_lineage(df: DataFrame, mode: str, eager: bool = True) -> DataFrame:
    """Checkpoint ``df`` with the resolved mode ('local' or 'reliable')."""
    if mode == "reliable":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def trunc_div(a: int, b: int) -> int:
    """Driver-side mirror of Spark's truncating integral ``div`` (and of
    the CASE-wrapped DuckDB ``//`` the oracles use): quotient truncated
    toward zero, sign-safe for BOTH operands. Shared by every fixed-point
    fit that folds integer sums on the driver (GD classifier, PCA power
    iteration) so the engine-exactness contract lives in one place."""
    if b == 0:
        raise ZeroDivisionError("trunc_div by zero")
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q
