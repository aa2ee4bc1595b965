"""C1 config guard: store on first run, raise on drift."""

from __future__ import annotations

import pytest

from environmental_stac_generator_spark.plans.config_guard import (
    ConfigMismatchError,
    config_diff,
    store_or_validate_config,
)


def test_store_new_file(spark, tmp_path):
    # ref test_store_config_new_file (test_generator.py:70-98)
    p = tmp_path / "config.json"
    store_or_validate_config(spark, p, {"test_collection": {"forecast_frequency": "1days"}})
    assert p.exists()
    assert "1days" in p.read_text()


def test_existing_match_passes(spark, tmp_path):
    p = tmp_path / "config.json"
    cfg = {"test_collection": {"forecast_frequency": "1days"}}
    store_or_validate_config(spark, p, cfg)
    store_or_validate_config(spark, p, cfg)  # no raise


def test_existing_mismatch_raises(spark, tmp_path):
    # ref test_store_config_existing_mismatch (test_generator.py:101-132)
    p = tmp_path / "config.json"
    store_or_validate_config(spark, p, {"test_collection": {"forecast_frequency": "1days"}})
    with pytest.raises(ConfigMismatchError):
        store_or_validate_config(
            spark, p, {"test_collection": {"forecast_frequency": "2days"}}
        )


def test_other_collections_in_shared_config_ignored(spark, tmp_path):
    # ADVICE r1: a shared output_dir config.json holding ANOTHER
    # collection's entry must not raise ('removed ...') — the
    # reference validates only the current collection's entry.
    p = tmp_path / "config.json"
    store_or_validate_config(
        spark,
        p,
        {
            "coll_a": {"forecast_frequency": "1days"},
            "coll_b": {"forecast_frequency": "7days"},
        },
    )
    store_or_validate_config(spark, p, {"coll_a": {"forecast_frequency": "1days"}})


def test_new_collection_allowed(spark, tmp_path):
    # ref _store_config: collection not in stored config -> no check
    p = tmp_path / "config.json"
    store_or_validate_config(spark, p, {"coll_a": {"forecast_frequency": "1days"}})
    store_or_validate_config(spark, p, {"coll_new": {"forecast_frequency": "6hours"}})


def test_shared_collection_drift_still_raises(spark, tmp_path):
    p = tmp_path / "config.json"
    store_or_validate_config(
        spark,
        p,
        {
            "coll_a": {"forecast_frequency": "1days"},
            "coll_b": {"forecast_frequency": "7days"},
        },
    )
    with pytest.raises(ConfigMismatchError):
        store_or_validate_config(spark, p, {"coll_b": {"forecast_frequency": "1days"}})


def test_config_diff_empty_when_equal(spark):
    df = spark.createDataFrame([("c", "f", "1days")], "collection string, param string, value string")
    assert config_diff(df, df).count() == 0
