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
