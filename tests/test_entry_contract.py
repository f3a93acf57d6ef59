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
    # round-5 rotation (VERDICT r4 ask #1): the window holds only queries
    # with NO official CORRECTNESS row from rounds 1-4 — the first 40 of
    # round 4's staged backlog (its head was the three deferred TPC-H
    # mirrors) plus the ten round-5 additions (whose tail is the
    # JSONL-source legs)
    assert window[:3] == ["tpch_q11", "tpch_q12", "tpch_q15"]
    assert window[-2:] == ["jsonl_route_counts", "jsonl_rejects"]
    r5_new = {
        "transcript_status_flaps", "transcript_slo_burn",
        "transcript_latency_by_status", "transcript_retry_recovery",
        "transcript_response_gap", "conv_session_stats", "conv_concurrency",
        "text_hapax_rate", "jsonl_route_counts", "jsonl_rejects",
    }
    assert r5_new <= set(window), r5_new - set(window)
    # round-6 rotation head follows immediately after the window
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
