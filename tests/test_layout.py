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


def test_plan_compaction_bins(spark):
    files = spark.createDataFrame(
        [("p1", f"f{i:02d}", 40) for i in range(10)]  # 10 × 40B
        + [("p1", "zbig", 500)]                        # oversize file
        + [("p2", f"g{i}", 90) for i in range(3)],
        "part string, file string, bytes long",
    )
    out = layout.plan_compaction(
        files, partition_cols=["part"], target_bytes=100
    ).collect()
    by_part = {}
    for r in out:
        by_part.setdefault(r.part, {}).setdefault(r.group_id, []).append(r)
    # p1 small files: cumulative 40B each → groups of ~100B: sizes per
    # group in [target, target+max) except the last
    p1_sizes = {
        g: sum(x.bytes for x in rows)
        for g, rows in by_part["p1"].items()
        if not any(x.file == "zbig" for x in rows)
    }
    for g, sz in p1_sizes.items():
        assert sz < 100 + 40
    # the oversize file must not share its bin budget with later files
    # (it is last alphabetically here, so it simply lands alone or at a
    # boundary — the invariant is deterministic assignment)
    again = layout.plan_compaction(
        files, partition_cols=["part"], target_bytes=100
    ).collect()
    assert {(r.file, r.group_id) for r in again} == {
        (r.file, r.group_id) for r in out
    }
    # partitions never merge and restart at group 0: p2's 3×90B files
    # have cumulative-before 0/90/180 → groups 0, 0, 1
    p2_groups = {
        r.file: r.group_id for rows in by_part["p2"].values() for r in rows
    }
    assert p2_groups == {"g0": 0, "g1": 0, "g2": 1}


def test_plan_compaction_validates(spark):
    import pytest

    with pytest.raises(ValueError):
        layout.plan_compaction(_grid(spark, 2), target_bytes=0)
