"""F4/F13 geo functions (ref utils.py:161-187, stac/generator.py:582-583)."""

from __future__ import annotations

import pyspark.sql.functions as F

from environmental_stac_generator_spark.functions.geo import reproject_bbox


def _fake_transform(src_crs, xmin, ymin, xmax, ymax):
    # Deterministic stand-in for pyproj.transform_bounds.
    assert src_crs == "EPSG:6931"
    return (-180.0, ymin / 100.0, 180.0, 90.0)


def test_wgs84_rows_pass_through_exact(spark):
    df = spark.createDataFrame(
        [("a", "EPSG:4326", 10.0, 40.0, 30.0, 60.0)],
        "id string, crs string, xmin double, ymin double, xmax double, ymax double",
    )
    row = reproject_bbox(df, transform=_fake_transform).first()
    assert (row.xmin, row.ymin, row.xmax, row.ymax) == (10.0, 40.0, 30.0, 60.0)
    assert row.crs == "EPSG:4326"


def test_foreign_crs_goes_through_kernel(spark):
    df = spark.createDataFrame(
        [
            ("polar", "EPSG:6931", -5387.0, -5387.0, 5387.0, 5387.0),
            ("geo", "EPSG:4326", 1.0, 2.0, 3.0, 4.0),
        ],
        "id string, crs string, xmin double, ymin double, xmax double, ymax double",
    )
    out = {r.id: r for r in reproject_bbox(df, transform=_fake_transform).collect()}
    assert out["polar"].xmin == -180.0
    assert out["polar"].ymin == -53.87
    assert out["polar"].xmax == 180.0
    assert out["polar"].ymax == 90.0
    assert out["polar"].crs == "EPSG:4326"
    assert (out["geo"].xmin, out["geo"].ymax) == (1.0, 4.0)


def test_other_columns_untouched(spark):
    df = spark.createDataFrame(
        [("x", "EPSG:4326", 0.0, 0.0, 1.0, 1.0, 42)],
        "id string, crs string, xmin double, ymin double, xmax double, ymax double, extra int",
    )
    out = reproject_bbox(df, transform=_fake_transform)
    assert out.columns == df.columns
    assert out.filter(F.col("extra") == 42).count() == 1
