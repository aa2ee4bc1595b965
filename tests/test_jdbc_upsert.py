"""K5/J4/J5/J7 sink planning (no live database needed)."""

from __future__ import annotations

import pytest

from environmental_stac_generator_spark.sinks.jdbc_upsert import (
    build_upsert_sql,
    skip_existing,
    wait_for_sink,
)


def test_build_upsert_sql_single_key():
    sql = build_upsert_sql("collections", ["id", "title", "json"], ["id"])
    assert sql == (
        "INSERT INTO collections (id, title, json) VALUES (%s, %s, %s) "
        "ON CONFLICT (id) DO UPDATE SET title = EXCLUDED.title, "
        "json = EXCLUDED.json"
    )


def test_build_upsert_sql_composite_key():
    # items keyed (id, collection) — ref stac/dataloader.py:93-98
    sql = build_upsert_sql("items", ["id", "collection", "json"], ["id", "collection"])
    assert "ON CONFLICT (id, collection)" in sql
    assert "EXCLUDED.json" in sql
    assert "EXCLUDED.id" not in sql


def test_build_upsert_sql_keys_only():
    assert build_upsert_sql("t", ["id"], ["id"]).endswith("DO NOTHING")


def test_build_upsert_sql_bad_keys():
    with pytest.raises(ValueError):
        build_upsert_sql("t", ["a"], ["missing"])


def test_skip_existing_anti_join(spark):
    incoming = spark.createDataFrame(
        [(i, f"c{i % 2}", f"v{i}") for i in range(10)], "id int, collection string, v string"
    )
    existing = spark.createDataFrame(
        [(i, f"c{i % 2}") for i in range(0, 10, 2)], "id int, collection string"
    )
    out = skip_existing(incoming, existing, ["id", "collection"])
    assert sorted(r["id"] for r in out.collect()) == [1, 3, 5, 7, 9]


def test_wait_for_sink_retries():
    calls = []

    def probe():
        calls.append(1)
        return len(calls) >= 3

    assert wait_for_sink(probe, retries=5, delay_s=0.0)
    assert len(calls) == 3
    assert not wait_for_sink(lambda: False, retries=2, delay_s=0.0)
