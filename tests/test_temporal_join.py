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


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def asof_case(draw):
    n_l = draw(st.integers(1, 12))
    n_r = draw(st.integers(0, 12))
    keys = st.integers(0, 2)
    secs = st.integers(0, 3600)
    left = [(i, draw(keys), draw(secs)) for i in range(n_l)]
    right = [(draw(keys), draw(secs)) for _ in range(n_r)]
    return left, right


@settings(max_examples=12, deadline=None)
@given(case=asof_case())
def test_asof_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows = case
    base = pd.Timestamp("2025-01-01")
    left = spark.createDataFrame(
        [(i, k, (base + pd.Timedelta(seconds=s)).to_pydatetime()) for i, k, s in left_rows],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, (base + pd.Timedelta(seconds=s)).to_pydatetime()) for k, s in right_rows],
        "user_id long, ts timestamp",
    ) if right_rows else spark.createDataFrame([], "user_id long, ts timestamp")
    got = {
        r["event_id"]: r["matched_ts"]
        for r in as_of_join(left, right, "user_id").collect()
    }
    lp = pd.DataFrame(
        [(i, k, base + pd.Timedelta(seconds=s)) for i, k, s in left_rows],
        columns=["event_id", "user_id", "ts"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        [(k, base + pd.Timedelta(seconds=s)) for k, s in right_rows],
        columns=["user_id", "rts"],
    ).sort_values("rts", kind="stable")
    if rp.empty:
        expected = {i: None for i, _, _ in left_rows}
    else:
        m = pd.merge_asof(
            lp, rp, left_on="ts", right_on="rts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        expected = {
            int(r["event_id"]): (None if pd.isna(r["rts"]) else r["rts"])
            for _, r in m.iterrows()
        }
    got_n = {k: (pd.Timestamp(v) if v is not None else None) for k, v in got.items()}
    assert got_n == expected


@st.composite
def range_case(draw):
    n_vals = draw(st.integers(1, 25))
    vals = [draw(st.floats(0, 400, allow_nan=False)) for _ in range(n_vals)]
    bounds = sorted(
        {draw(st.floats(0, 400, allow_nan=False)) for _ in range(draw(st.integers(2, 5)))}
    )
    tiers = [
        (bounds[i], bounds[i + 1], f"t{i}") for i in range(len(bounds) - 1)
        if bounds[i] < bounds[i + 1]
    ]
    return vals, tiers


@settings(max_examples=12, deadline=None)
@given(case=range_case())
def test_range_join_matches_plain_filter_join(spark, case):
    vals, tiers = case
    if not tiers:
        return
    rows = spark.createDataFrame([(v,) for v in vals], "value double")
    tiers_df = spark.createDataFrame(tiers, "lo double, hi double, tier string")
    got = sorted(
        (r["value"], r["tier"])
        for r in range_join(rows, tiers_df, "value", bucket_width=37.0).collect()
    )
    expected = sorted(
        (v, t) for v in vals for lo, hi, t in tiers if lo <= v < hi
    )
    assert got == expected


def test_range_join_value_just_under_hi_across_bucket_boundary(spark):
    """A value within float-epsilon below a hi that sits just past a
    bucket boundary must still match: the old hi-1e-9 bucket trim
    under-covered and silently dropped it."""
    from environmental_stac_generator_spark.operators.temporal_join import (
        range_join,
    )

    rows = spark.createDataFrame([(100.0000000001,)], "v double")
    tiers = spark.createDataFrame(
        [("t", 0.0, 100.0000000005)], "tier string, lo double, hi double"
    )
    out = range_join(rows, tiers, "v", bucket_width=50.0).collect()
    assert len(out) == 1 and out[0]["tier"] == "t"


def test_asof_null_keys_follow_sql_equality(spark):
    """NULL never matches NULL: a null-key left row gets a null
    matched_ts (the window's partitionBy would otherwise match all
    null-key rows to each other — semantics no SQL ASOF join has)."""
    import pandas as pd

    t = lambda s: pd.Timestamp(s).to_pydatetime()  # noqa: E731
    left = spark.createDataFrame(
        [(1, None, t("2025-01-02")), (2, "u1", t("2025-01-02"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, t("2025-01-01")), ("u1", t("2025-01-01"))],
        "user_id string, ts timestamp",
    )
    rows = {
        r["event_id"]: r["matched_ts"]
        for r in as_of_join(left, right, on="user_id").collect()
    }
    assert rows[1] is None  # null key: no match, row still present
    assert rows[2] == t("2025-01-01")


def test_range_join_rejects_colliding_column_names(spark):
    import pytest

    rows = spark.createDataFrame([(1.0, "x")], "value double, lo string")
    tiers = spark.createDataFrame([(0.0, 10.0, "t")], "lo double, hi double, tier string")
    with pytest.raises(ValueError, match="share column names"):
        range_join(rows, tiers, value_col="value")
    rows2 = spark.createDataFrame([(1.0, 9)], "value double, _bucket int")
    with pytest.raises(ValueError, match="_bucket"):
        range_join(rows2, tiers, value_col="value")
