"""Z-order (Morton-curve) table layout for multi-dimensional data skipping.

At 100 TB the cheapest query is the one that never reads a file: engines
prune parquet files / row groups whose min-max ranges miss the predicate
(Iceberg stores these per data file; parquet in footers). A table sorted
on ONE column prunes filters on that column only — a filter on a second
column still touches every file. Interleaving the bits of two quantized
dimensions (the Morton / Z-value) and laying files out by Z-range gives
each file a small rectangle in (x, y) space, so filters on EITHER
dimension (or a box on both) skip most files — the same technique behind
Iceberg/Delta ``OPTIMIZE ZORDER BY``, rebuilt here from first principles.

Everything is integer bit arithmetic plus one double quantization — pure
Column expressions, whole-stage-codegen, reproducible bit-for-bit in the
DuckDB oracle. The write path at scale is
``df.repartitionByRange(n_files, "z").sortWithinPartitions("z")``
(one range shuffle, then files carry tight min-max ranges);
``zorder_file_stats`` models that layout analytically — per-file row
counts and min-max ranges — which is exactly the pruning metadata a
reader consults, so layout quality is testable without writing files.

The ``documents``/``events`` quantization bounds come from one extra
narrow aggregate here; production reads them free from table-level
statistics (Iceberg snapshot summaries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(x: Column) -> Column:
    """Spread the low 16 bits of ``x`` into the even bit positions of a
    32-bit value (the classic Morton part1by1 magic-mask sequence)."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _quantize(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a value into the integer grid [0, 2^bits - 1].

    Double arithmetic in a pinned evaluation order — ((c - lo) / span) *
    levels — then floor and clamp; IEEE-identical across engines."""
    levels = (1 << bits) - 1
    span = (hi - lo).cast("double")
    q = F.floor(((c - lo).cast("double") / span) * F.lit(float(levels)))
    q = F.when(span == 0, F.lit(0)).otherwise(q)
    return F.least(F.greatest(q, F.lit(0)), F.lit(levels)).cast("long")


def with_zvalue(
    df: DataFrame, x_col: str, y_col: str, bits: int = 16
) -> DataFrame:
    """Add column ``z``: the Morton interleave of the two quantized dims.

    Bounds are computed with one narrow min/max aggregate and attached by
    broadcast cross join (4 scalars — at scale, read them from table
    statistics instead and pass constant columns)."""
    bounds = df.agg(
        F.min(x_col).alias("_xlo"),
        F.max(x_col).alias("_xhi"),
        F.min(y_col).alias("_ylo"),
        F.max(y_col).alias("_yhi"),
    )
    b = df.crossJoin(F.broadcast(bounds))
    qx = _quantize(F.col(x_col), F.col("_xlo"), F.col("_xhi"), bits)
    qy = _quantize(F.col(y_col), F.col("_ylo"), F.col("_yhi"), bits)
    z = _spread_bits(qx).bitwiseOR(F.shiftleft(_spread_bits(qy), 1))
    return b.withColumn("z", z).drop("_xlo", "_xhi", "_ylo", "_yhi")


def zorder_file_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int = 64,
    bits: int = 16,
) -> DataFrame:
    """Per-file pruning metadata under a Z-ordered layout.

    Files are the equal-width Z-ranges ``file_id = z >> (2*bits -
    log2(n_files))`` — the analytic model of ``repartitionByRange(n_files,
    "z")`` on uniform data. Returns (file_id, n_rows, min/max of both
    dims): exactly the per-data-file stats Iceberg manifests carry, i.e.
    what a reader's pruning consults. A file's (min, max) box is a small
    rectangle, so single-dimension AND box predicates both skip."""
    if n_files & (n_files - 1) or n_files <= 0:
        raise ValueError(f"n_files must be a power of two, got {n_files}")
    shift = 2 * bits - n_files.bit_length() + 1
    zdf = with_zvalue(df, x_col, y_col, bits)
    return (
        zdf.withColumn("file_id", F.shiftright(F.col("z"), shift))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(x_col).alias(f"min_{x_col}"),
            F.max(x_col).alias(f"max_{x_col}"),
            F.min(y_col).alias(f"min_{y_col}"),
            F.max(y_col).alias(f"max_{y_col}"),
        )
    )


def linear_file_stats(
    df: DataFrame, sort_col: str, other_col: str, n_files: int = 64
) -> DataFrame:
    """Pruning metadata under a single-column sorted layout (the
    comparison baseline): files are equal-frequency ranks of ``sort_col``.
    Filters on ``sort_col`` prune well; filters on ``other_col`` touch
    every file — the failure mode Z-ordering removes."""
    # ntile over a global sort: single-partition window — acceptable for a
    # comparison BASELINE on test data (production writes sorted layouts
    # with repartitionByRange, not a global window)
    ranked = df.withColumn(
        "file_id", (F.ntile(n_files).over(Window.orderBy(sort_col)) - 1).cast("long")
    )
    return ranked.groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min(sort_col).alias(f"min_{sort_col}"),
        F.max(sort_col).alias(f"max_{sort_col}"),
        F.min(other_col).alias(f"min_{other_col}"),
        F.max(other_col).alias(f"max_{other_col}"),
    )


def plan_compaction(
    files: DataFrame,
    bytes_col: str = "bytes",
    name_col: str = "file",
    partition_cols: list[str] | None = None,
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Group small files into ~target-size rewrite bins (the maintenance
    pass behind Iceberg's ``rewrite_data_files``): streaming ingest leaves
    thousands of tiny files per partition, and every future scan pays
    per-file open cost until they are compacted.

    Assignment is deterministic cumulative-size binning in file-name
    order: ``group_id = floor(bytes_before_this_file / target)``. Each
    group's total lands in [target, target + max_file) except the last
    per partition, and a single file larger than target keeps a group to
    itself. With ``partition_cols`` the window runs per table partition —
    compaction never merges across partitions, and the global sort the
    bare window needs degrades to many small per-partition sorts (the
    scale path; a bare global window is fine only for one partition's
    file listing)."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    w = (
        Window.partitionBy(*partition_cols).orderBy(name_col)
        if partition_cols
        else Window.orderBy(name_col)
    )
    cum_before = F.sum(bytes_col).over(w) - F.col(bytes_col)
    return files.withColumn(
        "group_id", F.floor(cum_before / F.lit(float(target_bytes))).cast("long")
    )


def files_read(
    stats: DataFrame,
    x_col: str,
    y_col: str,
    x_range: tuple | None = None,
    y_range: tuple | None = None,
) -> int:
    """How many files a min-max-pruning reader touches for a box predicate
    — the planning metric that makes layout quality measurable. A file is
    read iff its [min, max] interval overlaps the predicate range on every
    constrained dimension."""
    cond = F.lit(True)
    if x_range is not None:
        cond = cond & (F.col(f"min_{x_col}") <= x_range[1]) & (
            F.col(f"max_{x_col}") >= x_range[0]
        )
    if y_range is not None:
        cond = cond & (F.col(f"min_{y_col}") <= y_range[1]) & (
            F.col(f"max_{y_col}") >= y_range[0]
        )
    return stats.filter(cond).count()
