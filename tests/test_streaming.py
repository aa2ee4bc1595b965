"""T1–T4: incremental streaming merge, idempotent under replays."""

from __future__ import annotations

import pandas as pd
import pytest

from environmental_stac_generator_spark.streaming import incremental


SCHEMA = "collection string, item_id string, forecast_reference_time timestamp"


def _write_batch(spark, landing, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(landing)
    )


def test_incremental_merge_and_idempotency(spark, tmp_path):
    landing = tmp_path / "landing"
    table = tmp_path / "catalog_items"
    ckpt = tmp_path / "ckpt"
    t = pd.Timestamp("2025-01-01").to_pydatetime()
    _write_batch(spark, landing, [("icenet", "a", t), ("icenet", "b", t)])

    def run():
        stream = incremental.stream_source(spark, landing, SCHEMA)
        q = incremental.start_incremental_merge(
            stream, table, ckpt, ["collection", "item_id"]
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(str(table)).count() == 2

    # new file arrives: only new keys land (T3 idempotency)
    t2 = pd.Timestamp("2025-01-02").to_pydatetime()
    _write_batch(spark, landing, [("icenet", "b", t), ("icenet", "c", t2)])
    run()
    out = spark.read.parquet(str(table))
    assert out.count() == 3
    assert sorted(r["item_id"] for r in out.collect()) == ["a", "b", "c"]


def test_running_extent_stream(spark, tmp_path):
    landing = tmp_path / "landing2"
    t1 = pd.Timestamp("2025-01-01").to_pydatetime()
    t2 = pd.Timestamp("2025-03-01").to_pydatetime()
    _write_batch(spark, landing, [("icenet", "a", t1), ("icenet", "b", t2)])
    stream = incremental.stream_source(spark, landing, SCHEMA)
    extent = incremental.running_extent(stream)
    q = (
        extent.writeStream.format("memory")
        .queryName("extent_tbl")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = spark.sql("SELECT * FROM extent_tbl").first()
    assert row["extent_start"] == pd.Timestamp("2025-01-01")
    assert row["extent_end"] == pd.Timestamp("2025-03-01")
