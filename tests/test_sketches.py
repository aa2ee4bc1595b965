"""Sketch operators: error bounds vs exact answers."""

from __future__ import annotations

import pyspark.sql.functions as F

from environmental_stac_generator_spark.queries.sketches import (
    QUANTILES,
    approx_percentiles,
    exact_percentiles,
    hll_cardinality,
)
from environmental_stac_generator_spark.tables import load


def test_hll_within_rsd(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["orders"], r["parts"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    for r in hll_cardinality(spark, sf_dir).collect():
        eo, ep = exact[r["l_returnflag"]]
        assert abs(r["approx_orders"] - eo) / eo < 0.05
        assert abs(r["approx_parts"] - ep) / ep < 0.05


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    exact = {r["l_returnflag"]: r for r in exact_percentiles(spark, sf_dir).collect()}
    spread = 0.0
    for r in approx_percentiles(spark, sf_dir).collect():
        e = exact[r["l_returnflag"]]
        for q in QUANTILES:
            c = f"p{int(q * 100)}"
            # GK with accuracy 10000 on ~6k rows is near-exact; allow
            # 1% relative slack for the rank-vs-interpolation gap.
            assert abs(r[c] - e[c]) / max(e[c], 1.0) < 0.01
            spread = max(spread, abs(r[c] - e[c]))
    assert spread >= 0.0  # sanity: loop ran
