"""Per-stage checkpoint commits with lineage + row-count metrics.

Realizes north_rule's "checkpoints per-stage … resumes idempotently from
the last committed snapshot". The production design is Iceberg snapshot
commits (``df.writeTo(table).overwritePartitions()``; each stage boundary =
one snapshot, resume = read last committed snapshot). Iceberg jars are not
in this image, so the same protocol is implemented on parquet:

  <root>/<stage>/data/          the stage output (atomically replaced)
  <root>/<stage>/_MANIFEST.json commit record: fingerprint, row count,
                                per-partition lineage counts, schema

With ``retain_versions=True`` each commit becomes a NEW snapshot
directory plus an append to the stage's ``_SNAPSHOTS.jsonl`` commit log:
prior versions stay readable (``read(spark, stage, version=k)`` — time
travel) until ``expire_snapshots`` drops them, which is Iceberg's
snapshot-retention model reproduced on parquet (the iceberg backend gets
all of this natively via ``VERSION AS OF``).

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
SNAPSHOT_LOG = "_SNAPSHOTS.jsonl"


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
        retain_versions: bool = False,
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
        # Snapshot retention (parquet backend): each commit writes a NEW
        # data_v<k> directory and appends to the stage's snapshot log, so
        # prior versions stay readable (time travel) until expired —
        # Iceberg's snapshot model; the iceberg backend gets this natively
        # and ignores the flag.
        self.retain_versions = retain_versions
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), MANIFEST)

    def data_path(self, stage: str, data_dir: str | None = None) -> str:
        if data_dir is None:
            m = self.manifest(stage)
            data_dir = (m or {}).get("data_dir", "data")
        return os.path.join(self._dir(stage), data_dir)

    def _snapshot_log_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), SNAPSHOT_LOG)

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def history(self, stage: str) -> list[dict]:
        """All retained snapshot manifests for a stage, oldest first —
        the parquet analog of Iceberg's snapshot log (``table.history()``).
        Empty for non-versioned stores / the iceberg backend (whose own
        metadata is the authority there)."""
        p = self._snapshot_log_path(stage)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]

    def is_committed(self, stage: str, fingerprint: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("committed") and m.get("fingerprint") == fingerprint)

    def read(
        self, spark: SparkSession, stage: str, version: int | None = None
    ) -> DataFrame:
        """Read a stage's current snapshot, or — with ``version`` — a
        retained historical one (time travel)."""
        if version is not None and (not isinstance(version, int) or version < 1):
            raise ValueError(f"version must be a positive int, got {version!r}")
        if self.format == "iceberg":
            tbl = f"{self.iceberg_table_prefix}.{stage}"
            if version is None:
                return spark.table(tbl)
            # Iceberg's VERSION AS OF takes a snapshot id (or branch/tag),
            # NOT the sequential 1..k counter the parquet backend uses —
            # map the counter onto the k-th snapshot via the table's own
            # history so `version` means the same thing on both backends.
            snaps = (
                spark.sql(
                    f"SELECT snapshot_id FROM {tbl}.history "
                    "ORDER BY made_current_at"
                )
                .limit(version)
                .collect()
            )
            if len(snaps) < version:
                raise FileNotFoundError(
                    f"stage {stage!r} has only {len(snaps)} iceberg snapshots; "
                    f"version {version} does not exist (or was expired)"
                )
            snap_id = snaps[version - 1]["snapshot_id"]
            return spark.sql(f"SELECT * FROM {tbl} VERSION AS OF {snap_id}")
        if version is None:
            return spark.read.parquet(self.data_path(stage))
        snap = next(
            (m for m in self.history(stage) if m.get("version") == version), None
        )
        if snap is None:
            raise FileNotFoundError(
                f"stage {stage!r} has no retained snapshot version {version} "
                "(never committed with retain_versions=True, or expired)"
            )
        path = self.data_path(stage, snap["data_dir"])
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"snapshot v{version} of stage {stage!r} was expired"
            )
        return spark.read.parquet(path)

    def _require_iceberg(self, spark: SparkSession) -> None:
        catalog = self.iceberg_table_prefix.split(".")[0]  # type: ignore[union-attr]
        if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured: set "
                f"spark.sql.catalog.{catalog} (and ship the "
                "iceberg-spark-runtime jar) or use format='parquet'"
            )

    def _write(
        self,
        df: DataFrame,
        stage: str,
        partition_by: list[str] | None,
        data_dir: str = "data",
    ) -> None:
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
        writer.parquet(self.data_path(stage, data_dir))

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
        prev = self.manifest(stage)
        version: int | None = None
        data_dir = "data"
        if self.retain_versions and self.format == "parquet":
            # each commit is a NEW snapshot directory; a failed attempt
            # leaves an orphan dir without a manifest, and the retry
            # recomputes the same version and overwrites it (idempotent).
            # The counter is the max over BOTH the current manifest and the
            # snapshot log: the log is append-only and survives a crash in
            # the publish window, so a retry can never recompute version=1
            # and clobber a retained data_v1 snapshot.
            prev_ver = (prev.get("version") or 0) if prev else 0
            log_ver = max(
                (m.get("version") or 0 for m in self.history(stage)), default=0
            )
            version = max(prev_ver, log_ver) + 1
            data_dir = f"data_v{version}"
            # versioned commits write to a fresh directory, so the current
            # manifest stays published (and readable) until the atomic
            # os.replace below swaps it — no removal needed or wanted.
        elif os.path.exists(self._manifest_path(stage)):
            # non-versioned commits overwrite data/ in place: a stale
            # manifest from a different fingerprint must not survive a
            # crash mid-write, so unpublish before touching the data.
            os.remove(self._manifest_path(stage))

        self._write(df, stage, partition_by, data_dir)

        spark = df.sparkSession
        out = (
            self.read(spark, stage)
            if self.format == "iceberg"
            else spark.read.parquet(self.data_path(stage, data_dir))
        )
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
        if version is not None:
            manifest["version"] = version
            manifest["data_dir"] = data_dir
        os.makedirs(stage_dir, exist_ok=True)
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(stage))
        if version is not None:
            # snapshot log append AFTER the publish (log records only
            # published snapshots, mirroring Iceberg's metadata ordering)
            with open(self._snapshot_log_path(stage), "a") as f:
                f.write(json.dumps(manifest, sort_keys=True) + "\n")
        return StageResult(stage=stage, rows=rows, resumed=False, manifest=manifest)

    def expire_snapshots(self, stage: str, keep_last: int = 1) -> list[int]:
        """Delete all but the newest ``keep_last`` retained snapshots —
        Iceberg's ``expire_snapshots`` maintenance action: bounds storage,
        keeps the current snapshot always readable. Returns the expired
        version numbers."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (current snapshot stays)")
        hist = self.history(stage)
        if len(hist) <= keep_last:
            return []
        hist.sort(key=lambda m: m["version"])
        expired, kept = hist[:-keep_last], hist[-keep_last:]
        for m in expired:
            shutil.rmtree(self.data_path(stage, m["data_dir"]), ignore_errors=True)
        tmp = self._snapshot_log_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            for m in kept:
                f.write(json.dumps(m, sort_keys=True) + "\n")
        os.replace(tmp, self._snapshot_log_path(stage))
        return [m["version"] for m in expired]

    def invalidate(self, stage: str) -> None:
        """Drop a stage's commit (test hook for resume scenarios)."""
        shutil.rmtree(self._dir(stage), ignore_errors=True)
