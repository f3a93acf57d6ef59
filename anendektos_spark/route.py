"""Routing fan-out: one source scan → six typed sinks + rejects.

The reference dispatches each file to a typed parser on the header's
``#path`` and warns on unknown paths (parser.d:71-89). The Spark analog is
filter-based fan-out on the ``tool`` column: each sink's plan is
``filter(tool = t) → parse_sink(t)``, with Catalyst pushing the tool
predicate into the scan (partition-pruned when the table is partitioned by
tool, as the production layout is). Rows that fail the parse go to a
rejects channel with the failing column named (the errorf + continue
row-drop, conn.d:73-78); rows with an unknown tool go there with reason
``unimplemented_tool`` (the warningf path, parser.d:85).

At scale: callers persist the comment-filtered source once before fan-out
(pipeline.py does) so local runs don't re-scan per sink; on a cluster with
a tool-partitioned table the six scans are disjoint partition reads and
persisting is unnecessary.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .dialect import Dialect
from .parse import ParseOptions, parse_sink
from .schemas import KNOWN_TOOLS, SINKS

REJECT_COLUMNS = ["conv_id", "turn_idx", "role", "tool", "src_ts", "text", "reject_reason"]


@dataclass
class Routed:
    sinks: dict[str, DataFrame]   # tool -> parsed good rows (lineage + record cols)
    rejects: DataFrame            # REJECT_COLUMNS


def route(
    transcripts: DataFrame,
    dialect: Dialect | None = None,
    opts: ParseOptions | None = None,
) -> Routed:
    """Fan the transcripts out to per-tool parsed sinks + one rejects DF."""
    sinks: dict[str, DataFrame] = {}
    reject_parts: list[DataFrame] = []

    for tool in KNOWN_TOOLS:
        parsed = parse_sink(transcripts.filter(F.col("tool") == tool), tool, dialect, opts=opts)
        good_cols = ["conv_id", "turn_idx", "role", "tool", "src_ts"] + [c.name for c in SINKS[tool]]
        sinks[tool] = parsed.filter(F.col("reject_reason").isNull()).select(*good_cols)
        reject_parts.append(
            parsed.filter(F.col("reject_reason").isNotNull()).select(*REJECT_COLUMNS)
        )

    unknown = transcripts.filter(~F.col("tool").isin(list(KNOWN_TOOLS))).select(
        "conv_id", "turn_idx", "role", "tool",
        F.col("ts").alias("src_ts"), "text",
        F.lit("unimplemented_tool").alias("reject_reason"),
    )
    rejects = unknown
    for part in reject_parts:
        rejects = rejects.unionByName(part)
    return Routed(sinks=sinks, rejects=rejects)
