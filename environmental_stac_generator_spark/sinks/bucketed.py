"""Bucketed tables: co-located joins with no exchange.

At 100 TB the dominant cost of a fact-fact join (items ⋈ assets,
lineitem ⋈ orders) is shuffling both sides on the key. Writing both
tables bucketed by that key — ``bucketBy(n, key).sortBy(key)`` — puts
matching keys in matching files at WRITE time, so every later join on
the key is exchange-free: Spark reads bucket i of each side into the
same task and sort-merge joins in place. One shuffle at write time is
amortized over every subsequent join.

Bucketed writes go through the session catalog (``saveAsTable``); the
local warehouse dir stands in for the cluster metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` (overwrites)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key with a
    FORCED sort-merge join: only SMJ exploits the bucket layout
    (zero Exchange on either side); left to itself, Catalyst would
    pick a BroadcastHashJoin under the auto-broadcast threshold —
    correct, but paying a broadcast the bucketing exists to avoid
    and leaving the documented exchange-free plan unexercised. Plan
    asserted on THIS function in tests/test_bucketed.py."""
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), key
    )
