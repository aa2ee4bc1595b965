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


def test_identical_config_with_tuple_and_nested_dict_values(spark, tmp_path):
    """Values compare through the same sorted-keys JSON the file
    stores: an IDENTICAL re-run with a tuple-valued param (stored as
    a JSON list) or a dict whose insertion order differs must NOT
    raise a spurious mismatch."""
    from environmental_stac_generator_spark.plans.config_guard import (
        store_or_validate_config,
    )

    p = tmp_path / "config.json"
    cfg = {"c": {"leadtimes": (0, 6), "opts": {"b": 1, "a": 2}}}
    store_or_validate_config(spark, p, cfg)
    # same content, tuple still a tuple, dict keys in different order
    again = {"c": {"leadtimes": (0, 6), "opts": {"a": 2, "b": 1}}}
    store_or_validate_config(spark, p, again)  # must not raise


def test_corrupt_config_file_raises_clear_error(spark, tmp_path):
    import pytest

    from environmental_stac_generator_spark.plans.config_guard import (
        ConfigMismatchError,
        store_or_validate_config,
    )

    p = tmp_path / "config.json"
    p.write_text('{"truncat')  # crash mid-write remnant
    with pytest.raises(ConfigMismatchError, match="not valid JSON"):
        store_or_validate_config(spark, p, {"c": {"f": "1days"}})
