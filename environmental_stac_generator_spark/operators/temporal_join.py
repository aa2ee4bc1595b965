"""As-of join and range join — operators Spark lacks natively.

- :func:`as_of_join`: for each left row, the most recent right row
  with ``right.ts <= left.ts`` per key. Implemented as the
  union-marker pattern: both sides union into one stream, a single
  window pass per key carries the latest right payload forward, and
  left rows read it. ONE shuffle on the key (the same one the window
  needs) — no join node, no per-row probe, no range condition that
  would force a nested-loop join. Equal timestamps match (right sorts
  before left at the same instant).
- :func:`range_join`: join rows to interval tiers. The naive form is
  a nested-loop join (non-equi predicate); the scale form here
  expands each tier into the fixed-width buckets it covers and
  equi-joins on the bucket, then re-checks the exact bounds — a hash
  join whose fan-out is bounded by interval_width / bucket_width.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    matched_col: str = "matched_ts",
) -> DataFrame:
    """Left rows + the latest ``right_ts`` at-or-before ``left_ts``
    per ``on`` key (null when no prior right row exists).

    NULL keys follow SQL equality: a NULL never matches a NULL, so
    null-key left rows come back with a null ``matched_col`` (the
    window's partitionBy would otherwise group all null keys together
    and match them to each other — semantics no SQL/DuckDB ASOF join
    has, and a silent divergence from the registered oracle)."""
    from pyspark.sql import Window

    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_payload"),
    )
    r = right.filter(F.col(on).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_payload"].dataType).alias("_payload"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        matched_col,
        F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w),
    )
    out = carried.filter(F.col("_side") == 1)
    return out.select(
        *[F.col("_payload").getField(c).alias(c) for c in left.columns],
        F.col(matched_col),
    )


def range_join(
    rows: DataFrame,
    tiers: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 50.0,
) -> DataFrame:
    """Equi-join ``rows`` to the tier whose [lo, hi) interval contains
    ``value_col``. Tiers are exploded into covering buckets (map-side;
    tiers are small), the join key is the bucket, and the exact bound
    check runs post-join — Catalyst gets a plain hash/broadcast join
    instead of a BroadcastNestedLoopJoin.

    ``rows`` must not share column names with ``tiers`` (the bound
    filter would be ambiguous) or carry ``_bucket`` (the internal join
    key would silently overwrite it, then be dropped): both are
    rejected loudly rather than crashing downstream or losing data."""
    overlap = set(rows.columns) & set(tiers.columns)
    if overlap:
        raise ValueError(
            f"rows and tiers share column names {sorted(overlap)}; "
            "rename one side before range_join"
        )
    if "_bucket" in rows.columns or "_bucket" in tiers.columns:
        raise ValueError("'_bucket' is reserved by range_join")
    expanded = tiers.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                # OVER-cover the exclusive hi bound: floor(hi/width)
                # may add one bucket no contained value can land in
                # (hi exactly on a boundary), but the exact post-join
                # filter drops it. An epsilon subtraction UNDER-covers
                # instead — a value within epsilon below a hi just
                # past a boundary silently loses its match — so
                # correctness demands the extra bucket, not the trim.
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    bucketed = rows.withColumn(
        "_bucket", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    return (
        bucketed.join(F.broadcast(expanded), "_bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("_bucket")
    )
