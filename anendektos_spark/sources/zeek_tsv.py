"""Zeek TSV log-file source: directory of logs → transcripts-shaped DataFrame.

The reference's source is a shallow directory walk of Zeek log files with a
per-file header sniff (parser.d:57-69). This connector keeps that contract
but reads the data lines distributed:

- file discovery + header sniffing happen driver-side (headers are a few
  lines per file — O(files), not O(bytes));
- data lines are read with ``spark.read.text`` (splittable, distributed),
  tagged with their source file, and shaped into transcripts rows:
  ``tool`` = the header's #path routing key, ``conv_id`` = the record key
  token, ``turn_idx`` = the line's ordinal within its file, ``ts`` = the
  line's leading epoch field.

A missing directory is fatal, like the reference (parser.d:62); a file
whose header fails to sniff is skipped with a warning, like the
reference's per-file error channel (parser.d:87-89).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..dialect import Dialect, DialectError, Header, parse_header_lines

log = logging.getLogger(__name__)


def sniff_file_header(path: str, max_lines: int = 64) -> Header:
    lines: list[str] = []
    with open(path, errors="replace") as f:
        for _ in range(max_lines):
            line = f.readline()
            if not line:
                break
            lines.append(line)
            if not line.startswith("#"):
                break
    return parse_header_lines(lines)


def read_zeek_dir(spark: SparkSession, directory: str) -> DataFrame:
    """Read every sniffable log in ``directory`` (shallow) as transcripts."""
    if not os.path.isdir(directory):
        raise FileNotFoundError(f"{directory} does not exist")  # parser.d:62 analog

    groups: dict[tuple, list[str]] = {}
    for name in sorted(os.listdir(directory)):
        path = os.path.join(directory, name)
        if not os.path.isfile(path):
            continue
        try:
            hdr = sniff_file_header(path)
        except (DialectError, ValueError, IndexError) as e:
            log.warning("skipping %s: header sniff failed (%s)", path, e)
            continue
        key = (hdr.dialect, hdr.path)
        groups.setdefault(key, []).append(path)

    parts: list[DataFrame] = []
    for (dialect, tool), paths in groups.items():
        raw = spark.read.text(paths).select(
            F.col("value").alias("text"),
            F.col("_metadata.file_path").alias("_file"),
            F.col("_metadata.file_block_start").alias("_block"),
            F.monotonically_increasing_id().alias("_seq"),
        )
        data = raw.filter(
            (F.length(F.col("text")) > 0) & (~F.col("text").startswith("#"))
        )
        # Split-safe line ordinal. monotonically_increasing_id alone is NOT
        # a file-order contract once a file exceeds one split (its task-id
        # high bits order by partition, and partition order across splits of
        # one file is an implementation detail). The _metadata.file_block_
        # start byte offset orders the splits; within one split a single
        # task reads lines sequentially, so _seq orders rows of that split.
        # (_block, _seq) is therefore total arrival order per file at any
        # file size / maxPartitionBytes setting (tested in
        # tests/test_sources.py::test_ordinals_split_safe).
        w = Window.partitionBy("_file").orderBy("_block", "_seq")
        toks = F.split(F.regexp_replace("text", r"^\s+|\s+$", ""), _re_escape(dialect.separator), -1)
        parts.append(
            data.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int")).select(
                toks.getItem(1).alias("conv_id"),
                "turn_idx",
                F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant").alias("role"),
                "text",
                F.lit(tool).alias("tool"),
                F.timestamp_seconds(toks.getItem(0).cast("double")).alias("ts"),
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _re_escape(sep: str) -> str:
    import re

    return re.escape(sep)
