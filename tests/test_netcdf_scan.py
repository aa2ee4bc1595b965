"""U1 NetCDF scan plumbing with the deterministic fake decoder."""

from __future__ import annotations

import pytest

from environmental_stac_generator_spark.sources import netcdf


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    d = tmp_path_factory.mktemp("landing") / "icenet_south"
    d.mkdir()
    for i in range(3):
        (d / f"fc.2025-01-0{i + 1}.nc").write_bytes(b"\x89HDF-fake" + bytes([i]))
    (d / "ignore.txt").write_text("not netcdf")
    return d


def test_scan_schema_and_rows(spark, landing):
    df = netcdf.scan_netcdf(spark, str(landing), decoder=netcdf.fake_decoder())
    assert df.schema == netcdf.LONG_SCHEMA
    n = df.count()
    # 3 files x 2 vars x 3 leadtimes x 8x8 grid
    assert n == 3 * 2 * 3 * 64
    assert df.select("collection").distinct().first()[0] == "icenet_south"


def test_scan_is_deterministic(spark, landing):
    dec = netcdf.fake_decoder()
    a = netcdf.scan_netcdf(spark, str(landing), decoder=dec).toPandas()
    b = netcdf.scan_netcdf(spark, str(landing), decoder=dec).toPandas()
    cols = list(a.columns)
    a = a.sort_values(cols).reset_index(drop=True)
    b = b.sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_glob_filter_excludes_non_nc(spark, landing):
    files = netcdf.list_files(spark, str(landing))
    assert files.count() == 3


def test_metadata_scan(spark, landing):
    meta = netcdf.scan_netcdf_metadata(spark, str(landing))
    rows = meta.collect()
    assert len(rows) == 3
    assert all(r["crs"].startswith("EPSG:") for r in rows)
    assert all(r["attrs"]["geospatial_bounds_crs"] == "EPSG:6931" for r in rows)


def test_find_coord():
    # ref utils.py:17-31
    assert netcdf.find_coord(["lon", "lat"], netcdf.X_CANDIDATES) == "lon"
    assert netcdf.find_coord(["xc", "x"], netcdf.X_CANDIDATES) == "xc"
    assert netcdf.find_coord(["foo"], netcdf.X_CANDIDATES) is None


def test_content_pruned_from_scan_by_default(spark, tmp_path):
    landing = tmp_path / "nc_prune"
    landing.mkdir()
    (landing / "a.nc").write_bytes(b"CDF\x01fake")
    df = netcdf.scan_netcdf(spark, str(landing), decoder=netcdf.fake_decoder())
    plan = df._jdf.queryExecution().executedPlan().toString()
    # path-only projection: the binaryFile content column never loads
    assert "ReadSchema: struct<path:string>" in plan
    assert df.count() > 0

    meta = netcdf.scan_netcdf_metadata(spark, str(landing))
    mplan = meta._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<path:string>" in mplan

    full = netcdf.scan_netcdf(
        spark, str(landing), decoder=netcdf.fake_decoder(), with_content=True
    )
    fplan = full._jdf.queryExecution().executedPlan().toString()
    assert "content" in fplan.split("ReadSchema:")[-1]


def test_long_from_grids_matches_long_scan(spark, tmp_path):
    landing = tmp_path / "lfg"
    landing.mkdir()
    (landing / "fc0.nc").write_bytes(b"\x00")
    dec = netcdf.fake_decoder(grid=8, n_lead=2)
    cols = ["collection", "forecast_reference_time", "leadtime_idx",
            "variable", "yc", "xc", "value"]
    direct = (
        netcdf.scan_netcdf(spark, str(landing), decoder=dec)
        .select(cols).toPandas().sort_values(cols[:6]).reset_index(drop=True)
    )
    derived = (
        netcdf.long_from_grids(netcdf.scan_netcdf_grids(spark, str(landing), decoder=dec))
        .select(cols).toPandas().sort_values(cols[:6]).reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(direct, derived)
    # and the derived path is pure JVM after the slab scan
    plan = (
        netcdf.long_from_grids(netcdf.scan_netcdf_grids(spark, str(landing), decoder=dec))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1  # only the slab scan
