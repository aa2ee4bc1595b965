"""Sketch/approximation operators (SURVEY §2.11 scale profiling).

A 100 TB training-data pipeline profiles itself with sketches, not
exact scans: HyperLogLog++ cardinalities (`approx_count_distinct`)
and Greenwald-Khanna quantiles (`percentile_approx`) are single-pass,
mergeable, constant-memory per group — the map-side partials ARE the
sketch, so the shuffle carries kilobytes regardless of corpus size.

Exact percentiles are oracle-checked against DuckDB's
``quantile_cont`` (both engines linearly interpolate); the approx
forms are engine-specific sketches, so the driver does a rows-only
check and tests/test_sketches.py pins their error bounds against the
exact values instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from environmental_stac_generator_spark.functions.rounding import rnd, sql_rnd
from environmental_stac_generator_spark.registry import register
from environmental_stac_generator_spark.tables import load

QUANTILES = (0.25, 0.5, 0.75, 0.95)


@register(
    "exact_percentiles",
    f"""
    SELECT l_returnflag,
           {", ".join(
               sql_rnd(f"quantile_cont(l_extendedprice, {q})", 4)
               + " AS p" + str(int(q * 100))
               for q in QUANTILES
           )}
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact distribution profile: linearly-interpolated percentiles "
    "per group. One shuffle; the per-group sort is the cost that the "
    "approx_percentiles sketch avoids at scale.",
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem", fan_out=True)
    pcts = F.percentile("l_extendedprice", F.array(*[F.lit(q) for q in QUANTILES]))
    g = li.groupBy("l_returnflag").agg(pcts.alias("ps"))
    return g.select(
        "l_returnflag",
        *[rnd(F.col("ps")[i], 4).alias(f"p{int(q * 100)}") for i, q in enumerate(QUANTILES)],
    )


@register(
    "hll_cardinality",
    None,
    doc="HyperLogLog++ distinct counts per group (rsd 1%): mergeable "
    "constant-size sketch — the shuffle carries one sketch per "
    "(group, partition), never the keys. Error bound pinned in "
    "tests/test_sketches.py.",
)
def hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    )


@register(
    "approx_percentiles",
    None,
    doc="Greenwald-Khanna approximate percentiles (accuracy 10000): "
    "single-pass mergeable quantile sketch — no per-group sort at any "
    "scale. Error bound pinned in tests/test_sketches.py.",
)
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx(
        "l_extendedprice", F.array(*[F.lit(q) for q in QUANTILES]), 10000
    )
    g = li.groupBy("l_returnflag").agg(pcts.alias("ps"))
    return g.select(
        "l_returnflag",
        *[F.col("ps")[i].alias(f"p{int(q * 100)}") for i, q in enumerate(QUANTILES)],
    )
