"""Z-order layout: Morton math + measurable data-skipping advantage."""

from __future__ import annotations

from pyspark.sql import functions as F

from anendektos_spark.functions import layout


def _grid(spark, n=64):
    rows = [(x, y) for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, "x long, y long")


def test_zvalue_interleaves_bits(spark):
    # corner points of the quantized grid have known Morton codes
    df = spark.createDataFrame(
        [(0, 0), (65535, 0), (0, 65535), (65535, 65535)], "x long, y long"
    )
    z = {(r.x, r.y): r.z for r in layout.with_zvalue(df, "x", "y").collect()}
    assert z[(0, 0)] == 0
    assert z[(65535, 0)] == 0x55555555  # x occupies even bits
    assert z[(0, 65535)] == 0xAAAAAAAA  # y occupies odd bits
    assert z[(65535, 65535)] == 0xFFFFFFFF


def test_zorder_skips_on_either_dimension(spark):
    """The layout-quality claim itself: under min-max pruning, a filter on
    the SECOND dimension reads every file of a linearly-sorted layout but
    only the matching Z-blocks of a Z-ordered one."""
    df = _grid(spark)
    zstats = layout.zorder_file_stats(df, "x", "y", n_files=64).cache()
    lstats = layout.linear_file_stats(df, "x", "y", n_files=64).cache()
    # both layouts produce 64 files covering all 4096 rows
    assert zstats.count() == 64 and lstats.count() == 64
    assert zstats.agg(F.sum("n_rows")).first()[0] == 4096
    assert lstats.agg(F.sum("n_rows")).first()[0] == 4096

    # filter on x (the linear sort key): both layouts prune to 8/64
    assert layout.files_read(lstats, "x", "y", x_range=(0, 7)) == 8
    assert layout.files_read(zstats, "x", "y", x_range=(0, 7)) == 8
    # filter on y: linear layout reads EVERYTHING, Z-order reads 8/64
    assert layout.files_read(lstats, "x", "y", y_range=(0, 7)) == 64
    assert layout.files_read(zstats, "x", "y", y_range=(0, 7)) == 8
    # box on both dims: Z-order reads exactly the one matching block
    assert layout.files_read(zstats, "x", "y", (0, 7), (0, 7)) == 1
    assert layout.files_read(lstats, "x", "y", (0, 7), (0, 7)) == 8
    zstats.unpersist()
    lstats.unpersist()


def test_zorder_validates_n_files(spark):
    import pytest

    with pytest.raises(ValueError):
        layout.zorder_file_stats(_grid(spark, 4), "x", "y", n_files=60)
