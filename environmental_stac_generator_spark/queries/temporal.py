"""As-of and range join queries over the events stream.

The as-of oracle uses DuckDB's native ASOF JOIN; the Spark side is
the union-marker window form (operators/temporal_join.py) — same
semantics, one shuffle, no nested-loop join. The range join's oracle
is the plain non-equi join; the Spark side is the bucket-expansion
hash join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from environmental_stac_generator_spark.functions.rounding import rnd, sql_rnd
from environmental_stac_generator_spark.operators.temporal_join import as_of_join, range_join
from environmental_stac_generator_spark.registry import register
from environmental_stac_generator_spark.tables import load

TIERS = [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 500.0, "high")]
_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


@register(
    "asof_join_events",
    """
    SELECT c.event_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%dT%H:%M:%SZ') AS click_ts,
           strftime(v.ts, '%Y-%m-%dT%H:%M:%SZ') AS matched_view_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
    doc="As-of join: each click matched to the user's most recent "
    "prior view. Union-marker window form — one shuffle on user_id, "
    "no nested-loop join (oracle: DuckDB native ASOF JOIN, which "
    "drops unmatched rows, hence the inner-match filter).",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = as_of_join(clicks, views, on="user_id", matched_col="matched_ts")
    return (
        out.filter(F.col("matched_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", _FMT).alias("click_ts"),
            F.date_format("matched_ts", _FMT).alias("matched_view_ts"),
        )
    )


@register(
    "range_join_tiers",
    f"""
    WITH tiers(lo, hi, tier) AS (VALUES
      {", ".join(f"({lo}, {hi}, '{name}')" for lo, hi, name in TIERS)})
    SELECT t.tier,
           CAST(count(*) AS BIGINT) AS n_events,
           {sql_rnd("avg(e.value)", 4)} AS avg_value
    FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
    doc="Range join: events classified into value tiers via "
    "bucket-expansion equi-join (hash join, fan-out bounded by "
    "interval/bucket width) instead of the nested-loop join a naive "
    "non-equi predicate produces.",
)
def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    tiers = spark.createDataFrame(TIERS, "lo double, hi double, tier string")
    joined = range_join(ev, tiers, value_col="value")
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        rnd(F.avg("value"), 4).alias("avg_value"),
    )
