"""Stable ordering + skew-safe repartitioning.

The reference materializes each file's records into an ordinal-keyed map —
key = arrival order (parser.d:170-180). The input table already carries the
arrival identity as (conv_id, turn_idx), so the distributed analog is a
row_number window per conversation: no global sort, one shuffle on conv_id,
local sort within each conversation.

Hot-conversation skew (north_rule): a single conv_id holding p% of all
turns makes one reducer the straggler. ``salted_repartition`` spreads rows
of the same conversation over SALT buckets for the *stateless* stages
(parse is embarrassingly parallel — salt freely); the ordinal window itself
must see a whole conversation in one partition, so it repartitions by
conv_id alone and relies on AQE + the fact that the window's sort is local
and O(n log n) in the conversation size, not the partition size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def with_ordinal(df: DataFrame, out_col: str = "ord") -> DataFrame:
    """0-based stable ordinal per conversation (parser.d:173-179 analog)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn(out_col, F.row_number().over(w) - 1)


def salted_repartition(df: DataFrame, num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Repartition on (conv_id, salt) so one hot conversation spreads over
    ``salt_buckets`` partitions. Salt derives from turn_idx — deterministic,
    and never touches the sort keys (SURVEY.md §7)."""
    salt = F.pmod(F.hash("turn_idx"), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.col("conv_id"), salt)


def plan_salted_repartition(
    df: DataFrame,
    plan: DataFrame,
    num_partitions: int,
    key_col: str = "conv_id",
    salt_source: str = "turn_idx",
) -> DataFrame:
    """Plan-driven salting: where :func:`salted_repartition` splits EVERY
    key over a fixed bucket count (cold keys lose co-location for
    nothing), this consumes a ``logops.shuffle_plan`` relation and salts
    each key by ITS OWN factor — hot keys split across exactly the
    partitions their payload needs, keys absent from the plan keep
    salt 0 and stay whole.

    The plan is broadcast (bounded by hot keys, never the corpus), the
    salt derives deterministically from ``salt_source``, and the output
    is hash-partitioned on (key, salt). Stateless stages only, like
    salted_repartition — the ordinal window still needs whole
    conversations."""
    p = plan.select(F.col("key").alias(key_col), "salt_factor")
    salt = F.pmod(F.hash(salt_source), F.coalesce(F.col("salt_factor"), F.lit(1)))
    return (
        df.join(F.broadcast(p), key_col, "left")
        .withColumn("_salt", salt)
        .repartition(num_partitions, F.col(key_col), F.col("_salt"))
        .drop("salt_factor", "_salt")
    )
