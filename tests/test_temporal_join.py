"""as_of_join / range_join operator semantics."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from environmental_stac_generator_spark.operators.temporal_join import as_of_join, range_join


def _ts(s):
    return pd.Timestamp(s).to_pydatetime()


def test_asof_basic_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2025-01-01 10:00")), (2, 10, _ts("2025-01-01 08:00")),
         (3, 20, _ts("2025-01-01 12:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2025-01-01 09:00")), (10, _ts("2025-01-01 09:30")),
         (20, _ts("2025-01-02 00:00"))],
        "user_id long, ts timestamp",
    )
    out = {r["event_id"]: r["matched_ts"] for r in as_of_join(left, right, "user_id").collect()}
    # latest at-or-before wins
    assert out[1] == pd.Timestamp("2025-01-01 09:30")
    # left precedes every right row -> null
    assert out[2] is None
    # right row is after the left ts -> null
    assert out[3] is None


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2025-01-01 09:00"))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, _ts("2025-01-01 09:00"))], "user_id long, ts timestamp"
    )
    row = as_of_join(left, right, "user_id").first()
    assert row["matched_ts"] == pd.Timestamp("2025-01-01 09:00")


def test_range_join_boundaries(spark):
    rows = spark.createDataFrame(
        [(0.0,), (49.999,), (50.0,), (149.999,), (150.0,), (499.0,), (500.0,)],
        "value double",
    )
    tiers = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 500.0, "high")],
        "lo double, hi double, tier string",
    )
    got = {r["value"]: r["tier"] for r in range_join(rows, tiers, "value").collect()}
    assert got[0.0] == "low" and got[49.999] == "low"
    assert got[50.0] == "mid" and got[149.999] == "mid"
    assert got[150.0] == "high" and got[499.0] == "high"
    assert 500.0 not in got  # hi is exclusive
    # hash join, not nested-loop
    plan = (
        range_join(rows, tiers, "value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
