"""Enrich: broadcast hash join to the (tool, role) lookup.

The reference's nearest anchor is the routing key itself (header.path,
parser.d:72-86); the enrich stage realizes BASELINE.json:north_star —
attach role/tool metadata via a broadcast join so no shuffle of the big
side ever happens. ``F.broadcast`` forces BroadcastHashJoin regardless of
statistics; left join preserves every fact row (unmatched → nulls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich(facts: DataFrame, lookup: DataFrame, keys: list[str] | None = None) -> DataFrame:
    keys = keys or ["tool", "role"]
    return facts.join(F.broadcast(lookup), on=keys, how="left")
