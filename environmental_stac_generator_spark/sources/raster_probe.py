"""S5/S6 + F12: asset format/dtype introspection as a distributed scan.

The reference probes each asset's dtype, bit depth, and byte order
one file at a time on the driver (``stac/utils.py:96-133``: GTiff via
rasterio, images assumed uint8, NetCDF first variable, Zarr first
array) and sums Zarr directory sizes with ``os.walk``
(``stac/utils.py:77-85``, A5). Here the same facts come from ONE
``binaryFile`` scan + ``mapInPandas`` over the asset tree — executors
read only file headers' worth of bytes from the already-fetched
content, so the probe is a single embarrassingly-parallel map stage
at any corpus size.

No raster libraries are required: TIFF metadata is parsed directly
from the public TIFF 6.0 header layout (byte-order mark, IFD tags
258 BitsPerSample / 277 SamplesPerPixel / 339 SampleFormat), Zarr v2
from its ``.zarray`` JSON, NetCDF by magic (classic ``CDF``/HDF5) with
dtype extraction gated behind an xarray import-try.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PROBE_SCHEMA = (
    "path string, length long, format string, dtype string, "
    "bit_depth int, byte_order string, band_count int"
)

# TIFF tag ids (TIFF 6.0 spec) and SampleFormat enum.
_TAG_BITS = 258
_TAG_SAMPLES = 277
_TAG_FORMAT = 339
_FMT_NAME = {1: "uint", 2: "int", 3: "float"}


def parse_tiff_header(data: bytes) -> dict | None:
    """Pure-Python TIFF IFD walk. Returns dtype/bit_depth/byte_order/
    band_count, or None if not a TIFF."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        return None
    little = data[:2] == b"II"
    end = "<" if little else ">"
    magic, ifd_off = struct.unpack(end + "HI", data[2:8])
    if magic != 42:
        return None
    try:
        (n_entries,) = struct.unpack(end + "H", data[ifd_off : ifd_off + 2])
        tags: dict[int, int] = {}
        for i in range(n_entries):
            off = ifd_off + 2 + 12 * i
            tag, typ, count = struct.unpack(end + "HHI", data[off : off + 8])
            if tag in (_TAG_BITS, _TAG_SAMPLES, _TAG_FORMAT):
                # SHORT(3)/LONG(4) with count 1 fit inline; count>1
                # values live at an offset — first element suffices
                # (bands share a dtype in rasters we write/read).
                if count == 1:
                    fmt = "H" if typ == 3 else "I"
                    (val,) = struct.unpack_from(end + fmt, data, off + 8)
                else:
                    (ptr,) = struct.unpack_from(end + "I", data, off + 8)
                    fmt = "H" if typ == 3 else "I"
                    (val,) = struct.unpack_from(end + fmt, data, ptr)
                tags[tag] = int(val)
    except (struct.error, IndexError):
        return None
    bits = tags.get(_TAG_BITS, 8)
    sfmt = _FMT_NAME.get(tags.get(_TAG_FORMAT, 1), "uint")
    dtype = f"{sfmt}{bits}" if sfmt != "float" else f"float{bits}"
    return {
        "format": "GTiff",
        "dtype": dtype,
        "bit_depth": bits,
        "byte_order": "little" if little else "big",
        "band_count": tags.get(_TAG_SAMPLES, 1),
    }


def probe_bytes(path: str, data: bytes) -> dict:
    """Classify one asset from its leading bytes (ref
    ``stac/utils.py:96-133`` decision tree, minus the driver loop)."""
    tiff = parse_tiff_header(data)
    if tiff is not None:
        return tiff
    looks_json = data[:1] == b"{" and (
        b'"dtype"' in data[:4096] or b'"data_type"' in data[:4096]
    )
    if path.endswith((".zarray", "zarr.json")) or looks_json:
        try:
            meta = json.loads(data)
            if "dtype" in meta:  # Zarr v2: numpy struct format, e.g. "<f8"
                code = meta["dtype"]
                kind = {"f": "float", "i": "int", "u": "uint"}.get(code[1], code[1])
                bits = int(code[2:]) * 8
                dtype, order = f"{kind}{bits}", "little" if code[0] == "<" else "big"
            else:  # Zarr v3 zarr.json: named dtype (NOT a hidden file,
                # so distributed listings see it — v2's .zarray is
                # filtered out by Hadoop's hidden-file rule and is only
                # reachable via probe_bytes on explicit paths)
                dtype = meta["data_type"]
                bits = int("".join(c for c in dtype if c.isdigit()) or 8)
                order = "little"
            return {
                "format": "Zarr",
                "dtype": dtype,
                "bit_depth": bits,
                "byte_order": order,
                "band_count": 1,
            }
        except (ValueError, KeyError, IndexError):
            pass
    if data[:3] == b"CDF" or data[:8] == b"\x89HDF\r\n\x1a\n":
        out = {
            "format": "NetCDF",
            "dtype": None,
            "bit_depth": None,
            "byte_order": None,
            "band_count": None,
        }
        try:  # dtype of the first data variable, as the reference does
            import io

            import xarray as xr

            ds = xr.open_dataset(io.BytesIO(data))
            first = next(iter(ds.data_vars), None)
            if first is not None:
                dt = ds[first].dtype
                out.update(
                    dtype=str(dt), bit_depth=dt.itemsize * 8, byte_order="little"
                )
        except Exception:
            pass
        return out
    if data[:2] == b"\xff\xd8" or data[:8] == b"\x89PNG\r\n\x1a\n":
        # images assumed uint8 (ref stac/utils.py:106-109)
        return {
            "format": "Image",
            "dtype": "uint8",
            "bit_depth": 8,
            "byte_order": None,
            "band_count": None,
        }
    return {
        "format": "unknown",
        "dtype": None,
        "bit_depth": None,
        "byte_order": None,
        "band_count": None,
    }


def probe_assets(spark: SparkSession, root: str, glob: str = "*") -> DataFrame:
    """Distributed F12: binaryFile scan over the asset tree -> one
    probe row per file. Column pruning keeps this cheap relative to
    the data — executors parse headers of bytes already local."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "length", "content")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                info = probe_bytes(r["path"], bytes(r["content"]))
                rows.append({"path": r["path"], "length": r["length"], **info})
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "length",
                    "format",
                    "dtype",
                    "bit_depth",
                    "byte_order",
                    "band_count",
                ],
            )

    return files.mapInPandas(kernel, schema=PROBE_SCHEMA)
