"""Scalable global running totals (prefix sums).

A plain ``sum().over(Window.orderBy(...))`` with no partition key
funnels EVERY row through one reducer (``Exchange SinglePartition``)
— fine at test scale, a wall at 100 TB. :func:`global_running_sum`
computes the identical result with the classic two-phase algorithm:

1. range-partition the relation by the global sort key, so partition
   p's keys all precede partition p+1's;
2. per-partition totals (map-side partial agg → ``n_partitions``
   rows) prefix-summed into per-partition offsets by a window over
   that tiny relation;
3. a PARALLEL within-partition cumsum window, plus the
   broadcast-joined offset, yields the exact global running total.

Everything is ONE lazy plan: the range exchange appears in both the
totals branch and the cumsum branch as the identical subtree, so
Catalyst's ReuseExchange materializes the shuffle once and both
branches read the same partitioning (``spark_partition_id`` is
therefore consistent between them). No persist, no driver collect —
nothing pins a corpus-sized cache for the session (VERDICT r3 #4).
The explicit partition count makes the shuffle REPARTITION_BY_NUM,
which AQE never coalesces, so the two reads cannot diverge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def global_running_sum(
    df: DataFrame,
    order: list[Column],
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` in ``order``,
    without a single-partition sort. ``order`` must be a total order
    (add a unique tiebreak column)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    # tiny: one row per non-empty partition; the offset is the sum of
    # all STRICTLY PRECEDING partition totals (sum skips null totals,
    # matching "treat an all-null partition as 0").
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_t"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off")
    )
    w = Window.partitionBy("_pid").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.sum(value_col).over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )
