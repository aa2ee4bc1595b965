"""Scalable global running totals (prefix sums).

A plain ``sum().over(Window.orderBy(...))`` with no partition key
funnels EVERY row through one reducer (``Exchange SinglePartition``)
— fine at test scale, a wall at 100 TB. :func:`global_running_sum`
computes the identical result with the classic two-phase algorithm:

1. range-partition the relation by the global sort key, so partition
   p's keys all precede partition p+1's;
2. per-partition totals → driver (``n_partitions`` rows — tiny);
   prefix-sum them into per-partition offsets;
3. a PARALLEL within-partition cumsum window, plus the broadcast
   offset, yields the exact global running total.

The result does not depend on where the (sampled) range boundaries
land: offsets are derived from the actual per-partition totals. Two
passes over the input, both fully parallel.
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
    # persist: range boundaries are sampled per execution, so the
    # totals pass and the cumsum pass must see the SAME partitioning
    ranged = (
        df.repartitionByRange(n, *order)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # tiny: one row per partition
    totals = {
        r["_pid"]: r["t"]
        for r in ranged.groupBy("_pid").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ranged.withColumn(out_col, F.sum(value_col).over(w) + offset_expr)
        .drop("_pid")
    )
