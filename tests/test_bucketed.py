"""Bucketed co-located join: exchange-free plan + correct results."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from environmental_stac_generator_spark.sinks.bucketed import colocated_join, write_bucketed
from environmental_stac_generator_spark.tables import load


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    lineitem = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    yield "b_orders", "b_lineitem"
    # drop catalog entries and the local warehouse dir they live in
    import shutil
    from pathlib import Path

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    wh = Path(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"))
    shutil.rmtree(wh, ignore_errors=True)


def test_join_has_no_exchange(spark, bucketed_tables, sf_dir):
    lt, rt = bucketed_tables
    # colocated_join itself forces the sort-merge path (at sf0.001 the
    # planner would rather broadcast; at scale SMJ is what bucketing
    # exists for): assert the FUNCTION's plan is exchange-free
    joined = colocated_join(spark, lt, rt, "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan

    # same answer as the plain join over the raw parquet
    expected = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == expected


def test_bucketed_agg_reuses_layout(spark, bucketed_tables):
    lt, _ = bucketed_tables
    # groupBy on the bucket key also avoids the exchange
    agg = spark.table(lt).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
