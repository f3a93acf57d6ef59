"""End-to-end pipeline: read → order → parse → enrich → route → aggregate.

The rebuild of the reference's whole program (app.d:15-39 → parser.d:57-91
→ summarize parser.d:170-180), reshaped for Spark per SURVEY.md §3:

  transcripts table
    → comment/blank filter (O5)
    → per-tool vectorized parse (O6-O17) + stable ordinal (O18)
    → stage commit "parsed_<tool>"   (parsed rows INCLUDING reject_reason —
      committed once so the good/reject split reads storage instead of
      re-running the Arrow UDFs twice)
    → good rows ⋈ broadcast lookup (enrich) → stage "sink_<tool>" (O21)
    → rejects union → stage "rejects" (O17 + unknown tools, parser.d:85)
    → aggregates (O19 + north_star: distinct, top-K, time buckets)
      → stages "agg_counts", "agg_distinct", "agg_topk", "agg_buckets"

Every stage is a checkpoint commit (checkpoint.py): a re-run after any
crash resumes from the last committed stage and converges to identical
outputs. Metrics (per-stage row counts + reject reasons) are returned and
persisted in the manifests.

Scale shape: parse is a narrow map (no shuffle); the only shuffles are the
optional ordinal window (by conv_id — salted upstream when skewed), the
aggregate groupBys (partial+final hash agg), and nothing else. The enrich
join is broadcast. Sink writes are partitioned by tool's natural time
bucket when configured.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from .aggregate import TOP_K_FIELD, distinct_keys, reject_counts, sink_counts, time_bucketed, top_k
from .checkpoint import StageStore
from .dialect import Dialect
from .enrich import enrich
from .fixtures import tool_role_lookup
from .ordering import salted_repartition, with_ordinal
from .parse import ParseOptions, parse_sink
from .route import REJECT_COLUMNS
from .schemas import KEY_COLUMN, KNOWN_TOOLS, SINKS


@dataclass
class PipelineConfig:
    input_path: str                      # parquet dir (or iceberg table in prod)
    output_root: str                     # stage store root
    input_format: str = "parquet"        # or "jsonl" (sources/jsonl.py)
    dialect: Dialect = field(default_factory=Dialect)
    addr_mode: str = "normalize"         # or "passthrough" (zero-Python parse)
    add_ordinal: bool = True             # O18 stable ordinal per conversation
    salt_buckets: int = 16               # hot-conversation defusal
    repartition: int | None = None       # pre-parse repartition (None = as-read)
    top_k: int = 10
    time_bucket: str = "minute"
    # partition sink tables by the source timestamp's day ("day"), hour
    # ("hour"), or not at all (None). At 100 TB this is what makes
    # time-ranged sink reads partition-pruned.
    sink_partition_by: str | None = None

    def fingerprint(self) -> str:
        ident = json.dumps(
            {
                "input": self.input_path,
                "input_format": self.input_format,
                "dialect": self.dialect.__dict__,
                "addr_mode": self.addr_mode,
                "ordinal": self.add_ordinal,
                "sink_partition_by": self.sink_partition_by,
            },
            sort_keys=True,
        )
        return hashlib.sha256(ident.encode()).hexdigest()[:16]


def read_transcripts(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Transcript rows for the configured input format. For jsonl the
    source-level reject channel is committed by run_pipeline as its own
    ``source_rejects`` stage (never silently dropped)."""
    if cfg.input_format == "jsonl":
        from .sources.jsonl import read_jsonl

        return read_jsonl(spark, cfg.input_path).rows
    if cfg.input_format != "parquet":
        raise ValueError(f"unknown input_format {cfg.input_format!r}")
    return spark.read.parquet(cfg.input_path)


def _record(metrics: dict, stage: str, t0: float, res) -> None:
    metrics["stages"][stage] = {
        "rows": res.rows, "resumed": res.resumed, "sec": round(time.time() - t0, 3),
    }


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> dict:
    """Run (or resume) the full pipeline; returns the metrics dict
    (rows + resumed + wall seconds per stage — the O24 operational
    surface alongside the manifests)."""
    store = StageStore(cfg.output_root)
    fp = cfg.fingerprint()
    opts = ParseOptions(addr_mode=cfg.addr_mode)
    metrics: dict = {"fingerprint": fp, "stages": {}}

    # --- input + source-grain rejects (jsonl: bad_json / missing_identity) ---
    if cfg.input_format == "jsonl":
        from .sources.jsonl import read_jsonl

        src = read_jsonl(spark, cfg.input_path)  # ONE source, both channels
        tx = src.rows
        t0 = time.time()
        if not store.is_committed("source_rejects", fp):
            res = store.commit(src.rejects, "source_rejects", fp)
        else:
            res = store.commit(None, "source_rejects", fp)  # type: ignore[arg-type]
        _record(metrics, "source_rejects", t0, res)
    else:
        tx = read_transcripts(spark, cfg)

    if cfg.repartition:
        tx = salted_repartition(tx, cfg.repartition, cfg.salt_buckets)
    # persist ONCE before the fan-out: the six parsed_<tool> commits and the
    # unknown-tool reject scan all read this cache instead of re-scanning the
    # input parquet 7× (route.py:13-15 contract; lazy, so a fully-resumed run
    # never materializes it). On a cluster with tool-partitioned input the
    # fan-out prunes disjoint partitions and this cache is a no-op cost.
    tx = tx.persist(StorageLevel.MEMORY_AND_DISK)

    # --- parse stage, one commit per tool (routing fan-out O4) ---
    for tool in KNOWN_TOOLS:
        stage = f"parsed_{tool}"
        t0 = time.time()
        if not store.is_committed(stage, fp):
            parsed = parse_sink(tx.filter(F.col("tool") == tool), tool, cfg.dialect, opts=opts)
            res = store.commit(parsed, stage, fp)
        else:
            res = store.commit(None, stage, fp)  # type: ignore[arg-type]  # resumed path reads manifest only
        _record(metrics, stage, t0, res)

    # --- rejects channel: parse failures + unknown tools (O17) ---
    t0 = time.time()
    if not store.is_committed("rejects", fp):
        parts = [
            store.read(spark, f"parsed_{t}")
            .filter(F.col("reject_reason").isNotNull())
            .select(*REJECT_COLUMNS)
            for t in KNOWN_TOOLS
        ]
        unknown = tx.filter(~F.col("tool").isin(list(KNOWN_TOOLS))).select(
            "conv_id", "turn_idx", "role", "tool",
            F.col("ts").alias("src_ts"), "text",
            F.lit("unimplemented_tool").alias("reject_reason"),
        )
        rejects = unknown
        for p in parts:
            rejects = rejects.unionByName(p)
        res = store.commit(rejects, "rejects", fp)
    else:
        res = store.commit(None, "rejects", fp)  # type: ignore[arg-type]
    _record(metrics, "rejects", t0, res)
    tx.unpersist()  # downstream stages read committed parsed_<tool> storage

    # --- enrich + sink tables (O21: what the reference declares but never
    #     writes, anendektos.ini:10-16) ---
    lookup = tool_role_lookup(spark)
    sinks: dict[str, DataFrame] = {}
    for tool in KNOWN_TOOLS:
        stage = f"sink_{tool}"
        good_cols = ["conv_id", "turn_idx", "role", "tool", "src_ts"] + [
            c.name for c in SINKS[tool]
        ]
        t0 = time.time()
        if not store.is_committed(stage, fp):
            good = (
                store.read(spark, f"parsed_{tool}")
                .filter(F.col("reject_reason").isNull())
                .select(*good_cols)
            )
            if cfg.add_ordinal:
                # ordinal over GOOD rows only — the reference assigns the
                # arrival key after the row-drop filter (parser.d:173-179)
                good = with_ordinal(good)
            enriched = enrich(good, lookup)
            partition_by = None
            if cfg.sink_partition_by:
                # "part_bucket", not "bucket": the aggregate stage derives
                # its own "bucket" column over these sinks
                enriched = enriched.withColumn(
                    "part_bucket",
                    F.date_format(
                        F.date_trunc(cfg.sink_partition_by, F.col("src_ts")),
                        "yyyy-MM-dd-HH",
                    ),
                )
                partition_by = ["part_bucket"]
            res = store.commit(enriched, stage, fp, partition_by=partition_by)
        else:
            res = store.commit(None, stage, fp)  # type: ignore[arg-type]
        _record(metrics, stage, t0, res)
        sinks[tool] = store.read(spark, stage)

    # --- aggregates (O19 + north_star extensions) ---
    agg_stages = {
        "agg_counts": lambda: sink_counts(sinks),
        "agg_distinct": lambda: distinct_keys(sinks, KEY_COLUMN),
        "agg_topk": lambda: _topk_all(sinks, cfg.top_k),
        "agg_buckets": lambda: _buckets_all(sinks, cfg.time_bucket),
        "agg_reject_counts": lambda: reject_counts(store.read(spark, "rejects")),
    }
    for stage, build in agg_stages.items():
        t0 = time.time()
        if not store.is_committed(stage, fp):
            res = store.commit(build(), stage, fp)
        else:
            res = store.commit(None, stage, fp)  # type: ignore[arg-type]
        _record(metrics, stage, t0, res)

    return metrics


def _topk_all(sinks: dict[str, DataFrame], k: int) -> DataFrame:
    parts = [top_k(df, TOP_K_FIELD[t], k) for t, df in sinks.items()]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _buckets_all(sinks: dict[str, DataFrame], bucket: str) -> DataFrame:
    parts = [time_bucketed(df, bucket, by_conv=True) for df in sinks.values()]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
