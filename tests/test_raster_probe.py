"""S5/S6 + F12: distributed asset format/dtype probe
(ref stac/utils.py:77-133)."""

from __future__ import annotations

import json
import struct

from environmental_stac_generator_spark.sources import raster_probe as rp


def make_tiff(little: bool = True, bits: int = 16, sfmt: int = 1, bands: int = 3) -> bytes:
    """Minimal structurally-valid TIFF: header + one IFD with
    BitsPerSample/SamplesPerPixel/SampleFormat."""
    end = "<" if little else ">"
    bom = b"II" if little else b"MM"
    entries = [
        (256, 3, 1, 2),      # ImageWidth
        (257, 3, 1, 2),      # ImageLength
        (258, 3, 1, bits),   # BitsPerSample
        (277, 3, 1, bands),  # SamplesPerPixel
        (339, 3, 1, sfmt),   # SampleFormat
    ]
    ifd = struct.pack(end + "H", len(entries))
    for tag, typ, count, val in entries:
        ifd += struct.pack(end + "HHI", tag, typ, count) + struct.pack(end + "H", val) + b"\x00\x00"
    ifd += struct.pack(end + "I", 0)
    return bom + struct.pack(end + "HI", 42, 8) + ifd


def test_parse_tiff_little_endian_float():
    info = rp.parse_tiff_header(make_tiff(little=True, bits=32, sfmt=3, bands=2))
    core = {k: info[k] for k in
            ("format", "dtype", "bit_depth", "byte_order", "band_count")}
    assert core == {
        "format": "GTiff",
        "dtype": "float32",
        "bit_depth": 32,
        "byte_order": "little",
        "band_count": 2,
    }
    assert info["n_overviews"] == 0  # single-IFD file


def test_parse_tiff_big_endian_uint():
    info = rp.parse_tiff_header(make_tiff(little=False, bits=16, sfmt=1, bands=1))
    assert info["dtype"] == "uint16"
    assert info["byte_order"] == "big"


def test_probe_bytes_zarr_and_netcdf_and_image():
    z = json.dumps({"dtype": "<f8", "shape": [4, 4], "chunks": [2, 2]}).encode()
    info = rp.probe_bytes("store/.zarray", z)
    assert (info["format"], info["dtype"], info["bit_depth"]) == ("Zarr", "float64", 64)

    nc = rp.probe_bytes("x.nc", b"\x89HDF\r\n\x1a\n" + b"\x00" * 16)
    assert nc["format"] == "NetCDF"

    jpg = rp.probe_bytes("t.jpg", b"\xff\xd8\xff\xe0rest")
    assert (jpg["format"], jpg["dtype"]) == ("Image", "uint8")

    assert rp.probe_bytes("w.bin", b"\x00\x01\x02")["format"] == "unknown"


def test_probe_assets_distributed(spark, tmp_path):
    (tmp_path / "a.tif").write_bytes(make_tiff(bits=64, sfmt=3, bands=4))
    (tmp_path / "store").mkdir()
    (tmp_path / "store" / "zarr.json").write_bytes(
        json.dumps(
            {"zarr_format": 3, "node_type": "array", "data_type": "int32"}
        ).encode()
    )
    (tmp_path / "thumb.jpg").write_bytes(b"\xff\xd8\xff\xe0data")
    out = {r["path"].rsplit("/", 1)[-1]: r for r in rp.probe_assets(spark, str(tmp_path)).collect()}
    assert out["a.tif"]["dtype"] == "float64"
    assert out["a.tif"]["band_count"] == 4
    assert out["zarr.json"]["dtype"] == "int32"
    assert out["zarr.json"]["format"] == "Zarr"
    assert out["thumb.jpg"]["format"] == "Image"
    # A5 directory size sum over the same listing
    total = sum(r["length"] for r in out.values())
    assert total == sum(
        p.stat().st_size for p in tmp_path.rglob("*") if p.is_file()
    )


def test_probe_assets_uri_escaped_path(spark, tmp_path):
    """Paths with spaces / '#' must probe cleanly whether the scan
    emits them verbatim (current Spark) or percent-escaped (older
    Hadoop renderings) — previously an escaped character aborted the
    whole probe scan with OSError (ADVICE r6)."""
    sub = tmp_path / "band 1 data"
    sub.mkdir()
    (sub / "a b.tif").write_bytes(make_tiff(bits=32, sfmt=3, bands=1))
    (sub / "c#d.tif").write_bytes(make_tiff(bits=16, sfmt=1, bands=1))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in rp.probe_assets(spark, str(tmp_path)).collect()}
    assert rows["a b.tif"]["dtype"] == "float32"
    # '#' would be truncated as a URL fragment by a urlparse-based
    # reader -- the scheme-prefix parser must keep it in the path
    assert rows["c#d.tif"]["dtype"] == "uint16"


def test_read_header_scheme_dispatch(tmp_path):
    """_read_header: bare paths open directly, file: URIs unquote,
    and s3a/s3n normalize to pyarrow's s3 scheme (resolution fails
    without credentials/region here, but it must fail INSIDE pyarrow
    — not with the OSError of open('s3a:/...'))."""
    p = tmp_path / "x y.bin"
    p.write_bytes(b"hello")
    assert rp._read_header(str(p), 5) == b"hello"
    assert rp._read_header("file:" + str(p).replace(" ", "%20"), 5) == b"hello"
    import pytest

    with pytest.raises(Exception) as exc:
        rp._read_header("s3a://no-such-bucket-envstac/x.tif", 4)
    assert not isinstance(exc.value, FileNotFoundError)


def test_read_header_authority_and_drive_forms(tmp_path):
    """ADVICE r7: RFC 8089 authority-form file URIs resolve locally
    (empty and localhost authorities), a foreign authority fails with
    a message naming it (not a bare ENOENT on //host/...), and a
    Windows drive letter is a path, not a URI scheme."""
    import pytest

    p = tmp_path / "hdr.bin"
    p.write_bytes(b"payload")
    assert rp._read_header(f"file://{p}", 7) == b"payload"  # file:///abs
    assert rp._read_header(f"file://localhost{p}", 7) == b"payload"
    with pytest.raises(OSError, match="remote authority 'otherhost'"):
        rp._read_header(f"file://otherhost{p}", 7)
    # single-letter scheme == drive path: must route to open(), whose
    # FileNotFoundError proves it was not handed to pyarrow as a URI
    with pytest.raises(FileNotFoundError):
        rp._read_header(r"C:\no\such\drive-path.tif", 4)
