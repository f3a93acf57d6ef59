"""Driver-contract invariants for __spark_entry__.

Cheap structural checks (no heavy Spark work): every oracle key has a
query, names are unique and stable, and entry() returns a DataFrame with
rows at sf0.001 — what the driver's smoke test does.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracle without query: {missing}"
    # no rows-only queries remain: every operator is oracle-checked
    rows_only = set(q) - set(o)
    assert rows_only == set(), rows_only


def test_driver_window_priority():
    """The driver records CORRECTNESS rows for only the first DRIVER_WINDOW
    entries of queries() (dict-insertion order). Pin the window to the
    documented PRIORITY_QUERIES list so a future registration can't
    silently push a core query out of the verified set (round-2 lesson)."""
    q = entrymod.queries()
    window = list(q)[: entrymod.DRIVER_WINDOW]
    assert len(entrymod.PRIORITY_QUERIES) == entrymod.DRIVER_WINDOW
    assert window == entrymod.PRIORITY_QUERIES
    # round-4 rotation: the window holds only queries with NO official
    # CORRECTNESS row from rounds 1-3 (the zeek_sink_* goldens et al. keep
    # their recorded r1-r3 rows); the ten transcript_* north_star analytics
    # legs lead it (VERDICT r3 ask #2)
    legs = {
        f"transcript_{x}"
        for x in (
            "route_counts", "rejects", "tool_summary", "hourly", "topk_tools",
            "retry_loops", "latency_pctl", "conv_outcomes", "tool_cooccur",
            "templates",
        )
    }
    assert legs <= set(window), legs - set(window)
    # round-5 rotation head follows immediately after the window
    after = list(q)[
        entrymod.DRIVER_WINDOW : entrymod.DRIVER_WINDOW + len(entrymod.NEXT_ROTATION)
    ]
    assert after == entrymod.NEXT_ROTATION
    # no duplicates in the priority list (dict would silently collapse them)
    assert len(set(entrymod.PRIORITY_QUERIES)) == len(entrymod.PRIORITY_QUERIES)
    assert not set(entrymod.NEXT_ROTATION) & set(entrymod.PRIORITY_QUERIES)


def test_query_callables_shape():
    q = entrymod.queries()
    assert len(q) >= 30
    assert all(callable(f) for f in q.values())


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"), reason="driver testdata absent"
)
def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"mktsegment", "event_type", "n_events", "sum_value"}
    # stable schema across invocations (driver runs it twice)
    assert entrymod.entry(spark).columns == df.columns
