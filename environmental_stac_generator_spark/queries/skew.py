"""Skew-mitigation queries: salted aggregation / salted join produce
results bit-identical to the plain plans, so the oracles are the
unsalted SQL — what the driver verifies is exactly the claim that
salting changes the shuffle layout, not the answer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from environmental_stac_generator_spark.functions.rounding import rnd, sql_rnd
from environmental_stac_generator_spark.operators.skew import salted_agg, salted_join
from environmental_stac_generator_spark.registry import register
from environmental_stac_generator_spark.tables import load


@register(
    "salted_agg",
    f"""
    SELECT l_returnflag,
           {sql_rnd("CAST(sum(l_quantity) AS DOUBLE)", 2)} AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           {sql_rnd("avg(l_discount)", 4)} AS avg_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Two-stage salted aggregation over the skewed l_returnflag "
    "(3 hot keys for 600k rows): partial agg on (key, salt) spreads "
    "each hot key over 32 reducers; final agg on key combines. Exact "
    "for algebraic aggregates, so the oracle is the plain GROUP BY.",
)
def salted_agg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": ("sum", "l_quantity"),
            # count("*") = row count, matching the oracle's count(*)
            # — count(col) skips nulls and would silently diverge on a
            # null-bearing column (the _ALGEBRAIC table documents this)
            "n_rows": ("count", "*"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
            "avg_disc": ("avg", "l_discount"),
        },
        salt_from="l_orderkey",
        n_salt=32,
    )
    return out.select(
        "l_returnflag",
        rnd(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
        "n_rows",
        "min_price",
        "max_price",
        rnd("avg_disc", 4).alias("avg_disc"),
    )


@register(
    "salted_join",
    """
    SELECT o.o_orderpriority, p.priority_class,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN (SELECT DISTINCT o_orderpriority,
                 substr(o_orderpriority, 1, 1) AS priority_class
          FROM orders) p
      ON o.o_orderpriority = p.o_orderpriority
    GROUP BY o.o_orderpriority, p.priority_class
    """,
    doc="Skew-safe join on a 5-value key (every key is hot): the tiny "
    "dim is replicated once per salt so each hot key spreads over 32 "
    "reducers instead of 5. Identical result to the plain join.",
)
def salted_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    dim = (
        o.select("o_orderpriority")
        .distinct()
        .withColumn("priority_class", F.substring("o_orderpriority", 1, 1))
    )
    joined = salted_join(
        o.select("o_orderpriority", "o_orderkey"),
        dim,
        key="o_orderpriority",
        salt_from="o_orderkey",
        n_salt=32,
    )
    return joined.groupBy("o_orderpriority", "priority_class").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
