"""Partitioned forecast-store layout: pruning + layout checks."""

from __future__ import annotations

import pandas as pd

from environmental_stac_generator_spark.sinks.table import read_partition, write_partitioned


def _long_df(spark):
    rows = []
    for coll in ("icenet", "osisaf"):
        for day in ("2025-01-01", "2025-01-02"):
            for lead in range(3):
                rows.append(
                    (coll, pd.Timestamp(day).to_pydatetime(), lead, "sic_mean", 1.0)
                )
    return spark.createDataFrame(
        rows,
        "collection string, forecast_reference_time timestamp, "
        "leadtime_idx int, variable string, value double",
    )


def test_layout_and_pruning(spark, tmp_path):
    out = tmp_path / "store"
    write_partitioned(_long_df(spark), out)

    # hive layout: collection=<c>/forecast_date=<d>/
    dirs = {p.relative_to(out).as_posix() for p in out.glob("collection=*/forecast_date=*")}
    assert "collection=icenet/forecast_date=2025-01-01" in dirs
    assert len(dirs) == 4

    pruned = read_partition(spark, out, "icenet", "2025-01-02")
    assert pruned.count() == 3
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # both partition predicates must be pushed to the listing, not
    # evaluated post-scan
    assert "isnotnull(collection" in plan
    assert "isnotnull(forecast_date" in plan


def test_read_whole_collection(spark, tmp_path):
    out = tmp_path / "store2"
    write_partitioned(_long_df(spark), out)
    assert read_partition(spark, out, "osisaf").count() == 6
