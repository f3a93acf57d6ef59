"""Per-stage checkpoint commits with lineage + row-count metrics.

Realizes north_rule's "checkpoints per-stage … resumes idempotently from
the last committed snapshot". The production design is Iceberg snapshot
commits (``df.writeTo(table).overwritePartitions()``; each stage boundary =
one snapshot, resume = read last committed snapshot). Iceberg jars are not
in this image, so the same protocol is implemented on parquet:

  <root>/<stage>/data/          the stage output (atomically replaced)
  <root>/<stage>/_MANIFEST.json commit record: fingerprint, row count,
                                per-partition lineage counts, schema

A stage is committed iff its manifest exists AND its fingerprint matches
the current (input, config) identity. A job killed mid-write leaves no
manifest → the stage re-runs; the data overwrite is idempotent, so a
resume always converges to the same snapshots (tested in
tests/test_checkpoint.py). This is the same commit-then-publish ordering
Iceberg uses (write files, then swap metadata pointer).

The reference has no checkpointing (single-shot CLI, parser.d:57-91);
this stage protocol is the north_star extension.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "_MANIFEST.json"


@dataclass
class StageResult:
    stage: str
    rows: int
    resumed: bool
    manifest: dict


class StageStore:
    """Commit/read/resume protocol for pipeline stage outputs.

    ``format`` selects the storage backend:
    - ``"parquet"`` (default): the commit-then-publish protocol above,
      self-contained, what this sandbox runs.
    - ``"iceberg"``: each stage is an Iceberg table
      ``<iceberg_table_prefix>.<stage>`` written with
      ``df.writeTo(...).createOrReplace()`` — one snapshot per commit,
      Iceberg's own atomic metadata swap replacing the manifest-file
      ordering (manifests are still written for fingerprint/lineage
      bookkeeping). Requires the iceberg-spark-runtime jar and a
      configured ``spark.sql.catalog.<name>``; the write fails fast with
      a clear error otherwise (the jar is not in this image — the
      abstraction point makes the production claim executable where it
      is)."""

    def __init__(
        self,
        root: str,
        format: str = "parquet",
        iceberg_table_prefix: str | None = None,
    ):
        if format not in ("parquet", "iceberg"):
            raise ValueError(f"format must be 'parquet' or 'iceberg', got {format!r}")
        if format == "iceberg" and not iceberg_table_prefix:
            raise ValueError(
                "format='iceberg' requires iceberg_table_prefix, e.g. 'mycat.db'"
            )
        self.root = root
        self.format = format
        self.iceberg_table_prefix = iceberg_table_prefix
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), MANIFEST)

    def data_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "data")

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_committed(self, stage: str, fingerprint: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("committed") and m.get("fingerprint") == fingerprint)

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        if self.format == "iceberg":
            return spark.table(f"{self.iceberg_table_prefix}.{stage}")
        return spark.read.parquet(self.data_path(stage))

    def _require_iceberg(self, spark: SparkSession) -> None:
        catalog = self.iceberg_table_prefix.split(".")[0]  # type: ignore[union-attr]
        if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured: set "
                f"spark.sql.catalog.{catalog} (and ship the "
                "iceberg-spark-runtime jar) or use format='parquet'"
            )

    def _write(self, df: DataFrame, stage: str, partition_by: list[str] | None) -> None:
        if self.format == "iceberg":
            self._require_iceberg(df.sparkSession)
            writer = df.writeTo(f"{self.iceberg_table_prefix}.{stage}")
            if partition_by:
                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.createOrReplace()
            return
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.data_path(stage))

    def commit(
        self,
        df: DataFrame,
        stage: str,
        fingerprint: str,
        partition_by: list[str] | None = None,
    ) -> StageResult:
        """Write the stage output and publish its manifest (in that order).

        If this (stage, fingerprint) is already committed, skips the write
        entirely and reports resumed=True.
        """
        if self.is_committed(stage, fingerprint):
            m = self.manifest(stage)
            return StageResult(stage=stage, rows=m["rows"], resumed=True, manifest=m)

        stage_dir = self._dir(stage)
        # a stale manifest from a different fingerprint must not survive
        if os.path.exists(self._manifest_path(stage)):
            os.remove(self._manifest_path(stage))

        self._write(df, stage, partition_by)

        spark = df.sparkSession
        out = self.read(spark, stage)
        rows = out.count()  # metadata-only count (parquet footers / Iceberg snapshot)
        if self.format == "iceberg":
            # Iceberg's own snapshot manifests ARE the per-data-file
            # lineage (and input_file_name() is undefined for DSv2
            # scans) — record the authority rather than a fake listing
            lineage: list = [{"source": "iceberg-snapshot-manifests"}]
        else:
            # per-partition lineage: rows per output file (the parquet
            # analog of Iceberg's per-data-file manifest entries)
            lineage = [
                {"file": os.path.basename(r["file"]), "rows": r["rows"]}
                for r in out.groupBy(F.input_file_name().alias("file"))
                .agg(F.count("*").alias("rows"))
                .collect()
            ]
        manifest = {
            "stage": stage,
            "fingerprint": fingerprint,
            "rows": rows,
            "schema": out.schema.simpleString(),
            "partition_by": partition_by or [],
            "lineage": sorted(lineage, key=lambda x: x.get("file", "")),
            "committed": True,
        }
        os.makedirs(stage_dir, exist_ok=True)
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(stage))
        return StageResult(stage=stage, rows=rows, resumed=False, manifest=manifest)

    def invalidate(self, stage: str) -> None:
        """Drop a stage's commit (test hook for resume scenarios)."""
        shutil.rmtree(self._dir(stage), ignore_errors=True)
