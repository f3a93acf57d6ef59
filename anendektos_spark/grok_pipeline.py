"""Checkpointed end-to-end run of the north_star grok pipeline.

The transcript analog of pipeline.py's zeek run: read → grok-parse →
reject channel → broadcast enrich → per-tool sink fan-out → summaries,
with every stage a StageStore commit (checkpoint.py) so a crash re-run
resumes from the last committed stage and converges to identical
outputs, and per-stage rows/seconds/lineage land in the manifests — the
north_rule's "resumable from checkpoint with per-partition lineage +
metrics" realized for the marker-payload workload.

Scale shape: parse is a narrow codegen map (no shuffle, no Python); the
enrich join is broadcast; each sink commit writes a tool-filtered slice
of ONE persisted parsed relation (never re-parsing); the only shuffles
are the summary groupBys. Sink tables are partitioned by tool's day
bucket when configured, which is what makes time-ranged sink reads
partition-pruned at 100 TB.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from .checkpoint import StageStore
from .functions import transcript
from .ordering import salted_repartition


@dataclass
class GrokPipelineConfig:
    input_path: str                  # parquet dir of north-star transcript rows
    output_root: str                 # stage store root
    top_k: int = 3
    sink_partition_by: str | None = None  # "day"/"hour" sink partitioning
    # hot-conversation defusal: when set, the input is repartitioned on
    # (conv_id, salt) before parse so one viral conversation spreads over
    # salt_buckets partitions instead of pinning one task (parse itself is
    # per-row, but the persisted relation feeds conv-keyed downstream work)
    repartition: int | None = None
    salt_buckets: int = 16

    def fingerprint(self) -> str:
        # repartition/salt_buckets are layout-only (identical row sets),
        # so they are deliberately NOT part of the resume fingerprint
        ident = json.dumps(
            {
                "input": self.input_path,
                "top_k": self.top_k,
                "sink_partition_by": self.sink_partition_by,
            },
            sort_keys=True,
        )
        return hashlib.sha256(ident.encode()).hexdigest()[:16]


def _record(metrics: dict, stage: str, t0: float, res) -> None:
    metrics["stages"][stage] = {
        "rows": res.rows, "resumed": res.resumed, "sec": round(time.time() - t0, 3),
    }


def _commit(store: StageStore, fp: str, metrics: dict, stage: str, build,
            partition_by: list[str] | None = None):
    """commit-or-resume one stage (the run_pipeline convention: a
    committed stage is never rebuilt, only its manifest is read)."""
    t0 = time.time()
    if not store.is_committed(stage, fp):
        res = store.commit(build(), stage, fp, partition_by=partition_by)
    else:
        res = store.commit(None, stage, fp)  # type: ignore[arg-type]
    _record(metrics, stage, t0, res)
    return res


def run_grok_pipeline(spark: SparkSession, cfg: GrokPipelineConfig) -> dict:
    """Run (or resume) the grok pipeline; returns the metrics dict."""
    store = StageStore(cfg.output_root)
    fp = cfg.fingerprint()
    metrics: dict = {"fingerprint": fp, "stages": {}}

    tx = spark.read.parquet(cfg.input_path)
    if cfg.repartition:
        tx = salted_repartition(tx, cfg.repartition, cfg.salt_buckets)
    tx = tx.persist(StorageLevel.MEMORY_AND_DISK)

    # --- parse + reject channel: two commits off one persisted scan ---
    _commit(store, fp, metrics, "grok_parsed", lambda: transcript.parse_turns(tx))
    _commit(store, fp, metrics, "grok_rejects", lambda: transcript.reject_turns(tx))
    tx.unpersist()  # downstream reads committed storage, never the input

    # --- broadcast enrich + per-tool sink fan-out off committed parse ---
    parsed = store.read(spark, "grok_parsed")
    dim = transcript.tool_dim(spark)
    enriched = parsed.join(
        F.broadcast(dim), parsed.tool_called == dim.tool, "inner"
    ).drop("tool")
    for t, _, _ in transcript.TOOL_DIM:
        partition_by = None
        sink = enriched.filter(F.col("tool_called") == t)
        if cfg.sink_partition_by:
            seconds = 86400 if cfg.sink_partition_by == "day" else 3600
            sink = sink.withColumn(
                "part_bucket", F.expr(f"epoch DIV {seconds}").cast("long")
            )
            partition_by = ["part_bucket"]
        _commit(store, fp, metrics, f"grok_sink_{t}",
                lambda s=sink: s, partition_by=partition_by)

    # --- summaries over committed parse (summarizer semantics) ---
    for stage, build in {
        "grok_route_counts": lambda: transcript.route_counts(parsed),
        "grok_summary": lambda: transcript.tool_summary(parsed),
        "grok_hourly": lambda: transcript.hourly_counts(parsed),
        "grok_topk": lambda: transcript.topk_tools(parsed, cfg.top_k),
        # agent-behavior analytics (round 3): stuck-agent runs at
        # category grain, exact latency percentiles, and per-conversation
        # outcome attribution — same committed-parse input, each its own
        # resumable stage
        "grok_retry_loops": lambda: transcript.category_retry_loops(
            parsed, dim, 2
        ),
        "grok_latency_pctl": lambda: transcript.latency_percentiles(parsed),
        "grok_outcomes": lambda: transcript.conv_outcomes(parsed),
    }.items():
        _commit(store, fp, metrics, stage, build)

    return metrics
