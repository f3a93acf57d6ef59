"""StageStore snapshot retention: time travel, history, expiry."""

from __future__ import annotations

import pytest

from anendektos_spark.checkpoint import StageStore


def _df(spark, n):
    return spark.range(n).withColumnRenamed("id", "v")


def test_versioned_commits_time_travel(spark, tmp_path):
    store = StageStore(str(tmp_path), retain_versions=True)
    store.commit(_df(spark, 3), "agg", fingerprint="fpA")
    store.commit(_df(spark, 5), "agg", fingerprint="fpB")

    # latest read follows the current manifest pointer
    assert store.read(spark, "agg").count() == 5
    # time travel: the superseded snapshot is still readable
    assert store.read(spark, "agg", version=1).count() == 3
    assert store.read(spark, "agg", version=2).count() == 5
    versions = [m["version"] for m in store.history("agg")]
    assert versions == [1, 2]

    # resume with the current fingerprint makes NO new snapshot
    r = store.commit(_df(spark, 5), "agg", fingerprint="fpB")
    assert r.resumed
    assert [m["version"] for m in store.history("agg")] == [1, 2]


def test_expire_snapshots(spark, tmp_path):
    store = StageStore(str(tmp_path), retain_versions=True)
    for i, fp in enumerate(["a", "b", "c"], start=1):
        store.commit(_df(spark, i), "s", fingerprint=fp)
    assert store.expire_snapshots("s", keep_last=2) == [1]
    assert [m["version"] for m in store.history("s")] == [2, 3]
    with pytest.raises(FileNotFoundError):
        store.read(spark, "s", version=1)
    # current snapshot and the retained one still read fine
    assert store.read(spark, "s").count() == 3
    assert store.read(spark, "s", version=2).count() == 2
    with pytest.raises(ValueError):
        store.expire_snapshots("s", keep_last=0)


def test_unversioned_store_unchanged(spark, tmp_path):
    store = StageStore(str(tmp_path))
    store.commit(_df(spark, 4), "s", fingerprint="x")
    assert store.history("s") == []
    assert store.read(spark, "s").count() == 4
    with pytest.raises(FileNotFoundError):
        store.read(spark, "s", version=1)
