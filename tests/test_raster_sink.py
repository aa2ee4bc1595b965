"""K1/K2/K3 raster sinks: grid round trip, skip-existing, stats tags."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from environmental_stac_generator_spark.sinks import raster
from environmental_stac_generator_spark.sources import netcdf
from environmental_stac_generator_spark.sources.raster_probe import (
    parse_tiff_header,
)


@pytest.fixture(scope="module")
def long_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rast") / "icenet_test"
    d.mkdir()
    (d / "fc0.nc").write_bytes(b"\x00")
    return netcdf.scan_netcdf(
        spark, str(d), decoder=netcdf.fake_decoder()
    ).persist()


def test_grid_from_long_roundtrip(long_df):
    pdf = long_df.toPandas()
    one = pdf[(pdf.leadtime_idx == 0)]
    arr, bands, ys, xs = raster.grid_from_long(one)
    assert arr.shape == (2, 8, 8)
    assert bands == ["sic_mean", "sic_stddev"]
    assert ys[0] > ys[-1]  # north-up: yc descending
    assert xs[0] < xs[-1]
    # spot-check a cell against the long rows
    row = one[(one.variable == "sic_mean")].iloc[7]
    yi = list(ys).index(row["yc"])
    xi = list(xs).index(row["xc"])
    v = arr[0, yi, xi]
    assert (np.isnan(v) and np.isnan(row["value"])) or v == row["value"]


def test_encode_cogs_and_thumbnails(long_df, tmp_path):
    res = raster.encode_cogs(long_df, tmp_path).collect()
    assert len(res) == 3  # one per leadtime
    assert all(not r["skipped"] for r in res)
    for r in res:
        data = open(r["path"], "rb").read()
        # K2->S5: the encoded file is a structurally valid tiled TIFF
        # that the repo's own IFD walker parses back
        info = parse_tiff_header(data)
        assert info is not None and info["format"] == "GTiff"
        assert info["band_count"] == 2 and info["dtype"] == "float64"
        assert (info["width"], info["height"]) == (8, 8)
        assert info["tile_width"] == raster.TIFF_TILE
        assert r["multihash"] == raster.multihash_md5(data)
        assert r["multihash"].startswith("d50110")  # F9 varint multihash prefix
        assert r["n_bands"] == 2 and r["height"] == 8 and r["width"] == 8
    # thumbnail only for leadtime 0 (ref generator.py:913-921);
    # lead-0 valid time == init time, so the stamps match
    jpgs = list(tmp_path.rglob("*.jpg"))
    assert len(jpgs) == 1
    init_stamp = jpgs[0].name.split("_lead_")[0].removeprefix("forecast_init_")
    assert jpgs[0].name.split("_lead_")[1].startswith(init_stamp[:10])


def test_fake_cog_embeds_band_stats(long_df):
    pdf = long_df.toPandas()
    one = pdf[pdf.leadtime_idx == 0]
    arr, bands, _, _ = raster.grid_from_long(one)
    blob = raster.fake_tiff_encoder(arr, bands, {})
    info = parse_tiff_header(blob)
    assert info["band_names"] == bands
    # A4: embedded GDAL_METADATA tags equal nan-stats of the array
    # (ref cog.py:78-87); repr/float round-trips doubles exactly
    stats = info["band_stats"]
    assert stats[0]["STATISTICS_MINIMUM"] == np.nanmin(arr[0])
    assert stats[0]["STATISTICS_MAXIMUM"] == np.nanmax(arr[0])
    assert stats[0]["STATISTICS_MEAN"] == np.nanmean(arr[0])
    assert stats[0]["STATISTICS_STDDEV"] == np.nanstd(arr[0])


def test_skip_existing(long_df, tmp_path):
    first = raster.encode_cogs(long_df, tmp_path, overwrite=True).collect()
    second = raster.encode_cogs(long_df, tmp_path, overwrite=False).collect()
    assert all(not r["skipped"] for r in first)
    assert all(r["skipped"] for r in second)  # P9/J6
    # overwrite=True re-encodes
    third = raster.encode_cogs(long_df, tmp_path, overwrite=True).collect()
    assert all(not r["skipped"] for r in third)


def test_write_netcdf_slices(long_df, tmp_path):
    res = raster.write_netcdf_slices(long_df, tmp_path).collect()
    assert len(res) == 1  # one init time
    r = res[0]
    assert r["n_variables"] == 2
    data = open(r["path"], "rb").read()
    assert data.startswith(b"FAKENC_1")
    # path layout netcdf/{collection}/{date}/{ts}.nc (ref :689-701)
    assert "/netcdf/icenet_test/" in r["path"]


def test_grid_fast_path_byte_identical(spark, tmp_path):
    from environmental_stac_generator_spark.sinks.raster import encode_cogs_grids

    # one collection per subdir so (collection, init, leadtime) groups
    # never merge cells from two files (same-key collisions are
    # ill-defined in the long path too)
    landing = tmp_path / "grid_landing"
    for i in range(2):
        (landing / f"coll{i}").mkdir(parents=True)
        (landing / f"coll{i}" / "fc.nc").write_bytes(bytes([i]))
    landing = landing / "*"
    dec = netcdf.fake_decoder(grid=8, n_lead=3)

    long_df = netcdf.scan_netcdf(spark, str(landing), decoder=dec)
    slow = {
        (r["collection"], r["leadtime_idx"], r["path"].rsplit("/", 1)[-1]): r["multihash"]
        for r in raster.encode_cogs(long_df, tmp_path / "out_long").collect()
    }
    grids = netcdf.scan_netcdf_grids(spark, str(landing), decoder=dec)
    fast = {
        (r["collection"], r["leadtime_idx"], r["path"].rsplit("/", 1)[-1]): r["multihash"]
        for r in encode_cogs_grids(grids, tmp_path / "out_grid").collect()
    }
    # same files, byte-identical content, via ~50x less shuffle
    assert slow == fast and len(slow) == 6


def test_netcdf_slices_grid_path_byte_identical(spark, tmp_path):
    from environmental_stac_generator_spark.sinks.raster import write_netcdf_slices_grids

    landing = tmp_path / "ncg"
    for i in range(2):
        (landing / f"c{i}").mkdir(parents=True)
        (landing / f"c{i}" / "fc.nc").write_bytes(bytes([i]))
    src = str(landing / "*")
    dec = netcdf.fake_decoder(grid=8, n_lead=3)
    slow = {
        r["path"].rsplit("/", 3)[-3]: r["multihash"]
        for r in raster.write_netcdf_slices(
            netcdf.scan_netcdf(spark, src, decoder=dec), tmp_path / "out_l"
        ).collect()
    }
    fast = {
        r["path"].rsplit("/", 3)[-3]: r["multihash"]
        for r in write_netcdf_slices_grids(
            netcdf.scan_netcdf_grids(spark, src, decoder=dec), tmp_path / "out_g"
        ).collect()
    }
    assert slow == fast and len(slow) == 2


def test_average_downsample_nan_block_mean():
    band = np.array(
        [[1.0, 3.0, 5.0], [np.nan, 7.0, np.nan], [9.0, 11.0, 13.0]]
    )
    ov = raster.average_downsample(band, 2)
    # 2x2 block (1,3 / nan,7) -> nanmean 11/3; ragged edges pad NaN
    assert ov.shape == (2, 2)
    assert abs(ov[0, 0] - (1 + 3 + 7) / 3) < 1e-12
    assert ov[0, 1] == 5.0  # (5, nan) block
    assert ov[1, 0] == 10.0  # (9, 11)
    assert ov[1, 1] == 13.0


def test_external_overviews_sidecar(long_df, tmp_path):
    out = raster.encode_cogs(
        long_df,
        tmp_path,
        external_overviews=raster.default_external_overviews,
    )
    from pathlib import Path

    rows = out.collect()
    assert rows
    for r in rows:
        assert Path(r["path"] + ".ovr").exists(), r["path"]
    # fake sidecar decodes to the /2,/4,/8,/16 pyramid
    raw = Path(rows[0]["path"] + ".ovr").read_bytes()
    if raw.startswith(b"FAKEOVR1"):
        payload = zlib.decompress(raw[8:])
        level, h, w = struct.unpack_from("<3i", payload, 0)
        assert level == 2 and h >= 1 and w >= 1


def test_thumbnail_encoder_selection(long_df, tmp_path):
    arr = np.arange(12.0).reshape(1, 3, 4)
    data = raster.default_thumbnail_encoder(arr, ["b0"], {})
    try:
        import matplotlib  # noqa: F401

        assert data[:2] == b"\xff\xd8", "matplotlib path must emit real JPEG"
    except ImportError:
        assert data.startswith(b"FAKEJPG1")


def test_matplotlib_encoder_guarded():
    arr = np.zeros((1, 2, 2))
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            raster.matplotlib_jpeg_encoder(arr, ["b0"], {})


def test_reproject_kernel_applied(long_df, tmp_path):
    # F14: injected warp kernel runs inside the K2 encode kernel
    calls = []

    def mark_kernel(arr, ys, xs, meta):
        calls.append(arr.shape)
        return arr * 2.0, ys, xs, {**meta, "crs": "EPSG:4326"}

    plain = raster.encode_cogs(long_df, tmp_path / "a").collect()
    warped = raster.encode_cogs(
        long_df, tmp_path / "b", reproject=mark_kernel
    ).collect()
    # kernel ran once per (init, leadtime) group and changed the bytes
    by_key = {(r["forecast_reference_time"], r["leadtime_idx"]): r["multihash"] for r in plain}
    for r in warped:
        assert by_key[(r["forecast_reference_time"], r["leadtime_idx"])] != r["multihash"]


def test_passthrough_reproject_semantics():
    arr = np.ones((1, 2, 2))
    ys, xs = np.array([1.0, 0.0]), np.array([0.0, 1.0])
    out, oys, oxs, meta = raster.passthrough_grid_reproject(arr, ys, xs, {"crs": "EPSG:4326"})
    assert (out == arr).all() and meta["crs"] == "EPSG:4326"
    with pytest.raises(NotImplementedError):
        raster.passthrough_grid_reproject(arr, ys, xs, {"crs": "EPSG:6931"})
    try:
        import rasterio  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            raster.rasterio_grid_reproject(arr, ys, xs, {"crs": "EPSG:6931"})


def test_valid_time_matches_relativedelta_semantics():
    """The kernel twin follows leadtime_offset's relativedelta
    semantics: integral month/year offsets are calendar-aware and
    preserve time-of-day, non-integer ones raise (dateutil's
    'ambiguous' rule — the old int(lead*step) truncation silently
    collapsed two fractional-step leadtimes onto one output path)."""
    import pandas as pd
    import pytest

    from environmental_stac_generator_spark.sinks.raster import _valid_time

    ref = pd.Timestamp("2024-01-31 06:00")
    # integral offsets: month-end clamp + time-of-day preserved
    assert _valid_time(ref, 1, "months", 1.0) == pd.Timestamp("2024-02-29 06:00")
    assert _valid_time(ref, 1, "years", 1.0) == pd.Timestamp("2025-01-31 06:00")
    # lead*step integral is fine even when step alone is fractional
    assert _valid_time(ref, 2, "months", 0.5) == pd.Timestamp("2024-02-29 06:00")
    with pytest.raises(ValueError, match="ambiguous"):
        _valid_time(ref, 1, "months", 0.5)
    # fractional smaller units stay exact durations
    assert _valid_time(ref, 3, "hours", 0.5) == ref + pd.Timedelta(hours=1.5)


def test_skip_existing_outputs_missing_dir_passes_through(spark, tmp_path):
    """First run: no output dir yet — the planned frame must pass
    through unchanged instead of failing the binaryFile load."""
    import pyspark.sql.functions as F

    from environmental_stac_generator_spark.sinks.raster import (
        skip_existing_outputs,
    )

    planned = spark.range(3).select(
        F.concat(F.lit(str(tmp_path / "missing_out/cogs/f")), F.col("id"))
        .alias("path")
    )
    out = skip_existing_outputs(planned, tmp_path / "missing_out", spark)
    assert out.count() == 3


def test_sub_minute_leadtime_step_rejected(spark, tmp_path):
    """A leadtime step below the output naming scheme's 1-minute
    resolution would silently collide distinct leadtimes onto one
    path; both encode entry points must fail loudly instead."""
    import pytest

    from environmental_stac_generator_spark.sinks.raster import (
        encode_cogs,
        encode_cogs_grids,
    )
    from environmental_stac_generator_spark.sources import netcdf

    landing = tmp_path / "nc"
    (landing / "c").mkdir(parents=True)
    (landing / "c" / "f.nc").write_bytes(b"x")
    long_df = netcdf.scan_netcdf(
        spark, str(landing / "*"), decoder=netcdf.fake_decoder(grid=4, n_lead=2)
    )
    with pytest.raises(ValueError, match="1-minute resolution"):
        encode_cogs(long_df, tmp_path / "o", leadtime_unit="hours", leadtime_step=0.01)
    grids = netcdf.scan_netcdf_grids(
        spark, str(landing / "*"), decoder=netcdf.fake_decoder(grid=4, n_lead=2)
    )
    with pytest.raises(ValueError, match="1-minute resolution"):
        encode_cogs_grids(
            grids, tmp_path / "o2", leadtime_unit="hours", leadtime_step=0.01
        )


def test_valid_time_matches_leadtime_offset_microseconds(spark):
    """The kernel-side valid time and the STAC assembly's column form
    must agree to the microsecond for fractional steps — a divergence
    makes asset hrefs point at files that don't exist."""
    import pandas as pd

    from environmental_stac_generator_spark.functions.frequency import (
        leadtime_offset,
    )
    from environmental_stac_generator_spark.sinks.raster import _valid_time

    ref = pd.Timestamp("2025-03-01 06:30:00")
    cases = [
        ("hours", 0.25, 7),
        ("hours", 1.5, 3),
        ("days", 0.1, 13),   # 0.1*13 is inexact in binary
        ("weeks", 0.5, 5),
        ("days", 1.0, 40),
    ]
    import pyspark.sql.functions as F

    for unit, step, lead in cases:
        kernel = _valid_time(ref, lead, unit, step)
        df = spark.createDataFrame([(ref.to_pydatetime(),)], "ts timestamp")
        col = df.select(
            leadtime_offset("ts", unit, float(lead) * step).alias("t")
        ).first()["t"]
        assert pd.Timestamp(col) == kernel, (unit, step, lead, col, kernel)
