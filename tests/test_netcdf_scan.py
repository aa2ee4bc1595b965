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
    meta = netcdf.scan_netcdf_metadata(
        spark, str(landing), meta_decoder=netcdf.fake_meta_decoder
    )
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

    meta = netcdf.scan_netcdf_metadata(
        spark, str(landing), meta_decoder=netcdf.fake_meta_decoder
    )
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


def test_metadata_scan_default_is_real_decoder(spark, tmp_path):
    """Without an injected meta_decoder the scan must use the REAL
    xarray header read — which in this container (no raster stack)
    raises NotImplementedError at execute time instead of silently
    fabricating CRS/hemisphere values."""
    import pytest

    landing = tmp_path / "nc_real"
    landing.mkdir()
    (landing / "a.nc").write_bytes(b"CDF\x01fake")
    meta = netcdf.scan_netcdf_metadata(spark, str(landing))
    with pytest.raises(Exception, match="xarray|NotImplemented"):
        meta.collect()


def test_north_up_matches_lexsort():
    """The O(n) fast path must return exactly what the lexsort
    returns: already-north-up slabs pass through, south-up slabs flip,
    irregular cell orders fall back to the exact sort."""
    import numpy as np

    from environmental_stac_generator_spark.sources.netcdf import _north_up

    ys = np.array([3.0, 2.0, 1.0])  # descending (north-up)
    xs = np.array([10.0, 20.0])
    ny, nx = 3, 2

    def ref(y, x, v):
        return v[np.lexsort((x, -y))]

    # south-up meshgrid (the decoders' natural order)
    yy, xx = np.meshgrid(ys[::-1], xs, indexing="ij")
    v = np.arange(6, dtype="float64")
    got = _north_up(yy.ravel(), xx.ravel(), v, ys, xs, ny, nx)
    np.testing.assert_array_equal(got, ref(yy.ravel(), xx.ravel(), v))
    # already north-up
    yy2, xx2 = np.meshgrid(ys, xs, indexing="ij")
    got2 = _north_up(yy2.ravel(), xx2.ravel(), v, ys, xs, ny, nx)
    np.testing.assert_array_equal(got2, ref(yy2.ravel(), xx2.ravel(), v))
    # irregular (shuffled) order -> lexsort fallback
    rng = np.random.default_rng(7)
    p = rng.permutation(6)
    got3 = _north_up(yy.ravel()[p], xx.ravel()[p], v[p], ys, xs, ny, nx)
    np.testing.assert_array_equal(got3, ref(yy.ravel()[p], xx.ravel()[p], v[p]))
