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
import re
import struct
from collections.abc import Iterator
from urllib.parse import unquote, urlparse

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
# Extended geometry/layout tags the K2->S5 round trip reads back.
_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_COMPRESSION = 259
_TAG_PLANAR = 284
_TAG_TILE_W = 322
_TAG_TILE_H = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_GDAL_META = 42112
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}
_MAX_IFDS = 32  # chain guard against cyclic/corrupt next pointers

_GDAL_ITEM_RE = re.compile(
    r'<Item name="([A-Z_]+|DESCRIPTION)" sample="(\d+)"'
    r'(?: role="description")?>([^<]*)</Item>'
)


def _read_ifd(end: str, data: bytes, ifd_off: int) -> tuple[dict, int]:
    """One IFD: {tag: (count, raw_bytes)} plus the next-IFD offset.
    Values ≤4 bytes are inline, larger live at an offset — both paths
    return the raw value bytes."""
    (n_entries,) = struct.unpack(end + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, bytes]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(end + "HHI", data[off : off + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # RATIONAL etc. — not used by our readers
        total = size * count
        if total <= 4:
            raw = data[off + 8 : off + 8 + total]
        else:
            (ptr,) = struct.unpack_from(end + "I", data, off + 8)
            raw = data[ptr : ptr + total]
        tags[tag] = (count, raw)
    (nxt,) = struct.unpack_from(
        end + "I", data, ifd_off + 2 + 12 * n_entries
    )
    return tags, nxt


def _tag_first(end: str, tags: dict, tag: int, typ_hint: int = 3) -> int | None:
    """First integer value of a SHORT/LONG tag (bands share dtype in
    rasters we write/read, so the first element suffices)."""
    if tag not in tags:
        return None
    count, raw = tags[tag]
    if count == 0 or not raw:  # malformed tag: nothing to decode
        return None
    for typ in (3, 4, 1):  # infer width from the raw size
        size = _TYPE_SIZE[typ]
        if len(raw) == size * count:
            return int(struct.unpack_from(end + _TYPE_FMT[typ], raw, 0)[0])
    return None


def _tag_ints(end: str, tags: dict, tag: int) -> list[int]:
    """All integer values of a SHORT/LONG array tag."""
    if tag not in tags:
        return []
    count, raw = tags[tag]
    for typ in (3, 4):
        size = _TYPE_SIZE[typ]
        if len(raw) == size * count:
            return list(struct.unpack(end + f"{count}{_TYPE_FMT[typ]}", raw))
    return []


def _parse_gdal_metadata(raw: bytes) -> tuple[list[str], list[dict]]:
    """(band_names, per-band stats dicts) from a GDAL_METADATA XML
    payload (``<Item name=... sample=N>`` rows, as GDAL and our
    encoder write them)."""
    names: dict[int, str] = {}
    stats: dict[int, dict] = {}
    for key, sample, val in _GDAL_ITEM_RE.findall(
        raw.rstrip(b"\x00").decode("utf-8", "replace")
    ):
        i = int(sample)
        if key == "DESCRIPTION":
            # the encoder XML-escapes band names; reverse it so the
            # K2->S5 round trip returns the original name
            from xml.sax.saxutils import unescape

            names[i] = unescape(val)
        else:
            try:
                stats.setdefault(i, {})[key] = float(val)
            except ValueError:
                pass
    nb = max(list(names) + list(stats), default=-1) + 1
    return (
        [names.get(i, "") for i in range(nb)],
        [stats.get(i, {}) for i in range(nb)],
    )


def parse_tiff_header(data: bytes) -> dict | None:
    """Pure-Python TIFF IFD walk. Core keys (the probe schema):
    dtype/bit_depth/byte_order/band_count. Extended keys (consumed by
    the K2->S5 round-trip tests, dropped by the probe's column
    projection): width/height/tile_width/tile_height/compression/
    planar/n_overviews/band_names/band_stats/tile_offsets/
    tile_byte_counts. Returns None if not a TIFF."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        return None
    little = data[:2] == b"II"
    end = "<" if little else ">"
    magic, ifd_off = struct.unpack(end + "HI", data[2:8])
    if magic != 42:
        return None
    # tag-value decoding stays INSIDE the try: a truncated or corrupt
    # file with a valid magic can still carry tags whose raw bytes
    # don't unpack (count=0, short reads) — malformed TIFFs must
    # return None ("not a TIFF"), never crash the probe task
    try:
        tags, nxt = _read_ifd(end, data, ifd_off)
        n_overviews = 0
        while nxt and n_overviews < _MAX_IFDS:
            _, nxt = _read_ifd(end, data, nxt)
            n_overviews += 1
        bits = _tag_first(end, tags, _TAG_BITS) or 8
        sfmt = _FMT_NAME.get(_tag_first(end, tags, _TAG_FORMAT) or 1, "uint")
        dtype = f"{sfmt}{bits}" if sfmt != "float" else f"float{bits}"
        band_names: list[str] = []
        band_stats: list[dict] = []
        if _TAG_GDAL_META in tags:
            band_names, band_stats = _parse_gdal_metadata(
                tags[_TAG_GDAL_META][1]
            )
    except (struct.error, IndexError):
        return None
    return {
        "format": "GTiff",
        "dtype": dtype,
        "bit_depth": bits,
        "byte_order": "little" if little else "big",
        "band_count": _tag_first(end, tags, _TAG_SAMPLES) or 1,
        "width": _tag_first(end, tags, _TAG_WIDTH),
        "height": _tag_first(end, tags, _TAG_HEIGHT),
        "tile_width": _tag_first(end, tags, _TAG_TILE_W),
        "tile_height": _tag_first(end, tags, _TAG_TILE_H),
        "compression": _tag_first(end, tags, _TAG_COMPRESSION),
        "planar": _tag_first(end, tags, _TAG_PLANAR),
        "n_overviews": n_overviews,
        "band_names": band_names,
        "band_stats": band_stats,
        "tile_offsets": _tag_ints(end, tags, _TAG_TILE_OFFSETS),
        "tile_byte_counts": _tag_ints(end, tags, _TAG_TILE_COUNTS),
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
                # '<' little, '>' big, '|' = not applicable (1-byte):
                # the old `little if '<' else big` mislabeled '|u1'
                dtype = f"{kind}{bits}"
                order = {"<": "little", ">": "big"}.get(code[0])
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
        except (ValueError, KeyError, IndexError, TypeError):
            # TypeError included: a structured dtype (list-valued
            # "dtype") or a non-string value makes the subscripts /
            # dict lookup raise TypeError — one odd sidecar must fall
            # through to "unknown", not abort the whole probe scan
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
                import sys

                # derive endianness from the dtype itself — classic
                # CDF is big-endian on disk, so hardcoding "little"
                # produced self-contradictory metadata ('>f4'+little)
                order = {
                    "<": "little",
                    ">": "big",
                    "=": sys.byteorder,
                }.get(dt.byteorder)
                out.update(
                    dtype=str(dt), bit_depth=dt.itemsize * 8, byte_order=order
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


# Leading-bytes budget per probed file: covers every header this
# module parses (TIFF IFD chains of our COGs sit well inside it, Zarr
# sidecars are KBs, NetCDF/HDF metadata is front-loaded) while keeping
# the per-file read bounded no matter how large the asset is.
PROBE_HEADER_BYTES = 16 * 1024 * 1024

# Hadoop filesystem schemes that pyarrow registers under a different
# canonical name; anything else is handed to FileSystem.from_uri as-is.
_SCHEME_ALIASES = {"s3a": "s3", "s3n": "s3"}

# RFC 3986 scheme prefix. Deliberately NOT urlparse: Hadoop path
# strings may carry raw '#' or '?' in file names, which urlparse
# would split off as fragment/query and silently truncate the path.
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _read_header(uri: str, n: int) -> bytes:
    """Read the first ``n`` bytes of ``uri``, whatever its scheme.

    The ``binaryFile`` source emits Hadoop-style path strings; local
    ones open directly (falling back to percent-unquoting, since
    Hadoop versions differ on whether they escape), while non-local
    schemes (s3a://, hdfs://, gs://...) resolve through pyarrow's
    filesystem registry so the probe works on every store the scan
    itself could list — the kernel previously assumed ``file:`` and
    aborted the whole scan on anything else (ADVICE r6).
    """
    m = _SCHEME_RE.match(uri)
    scheme = m.group(0)[:-1].lower() if m else ""
    # A single-letter "scheme" is a Windows drive path (C:\data\x.tif),
    # not a URI — real schemes are >= 2 chars (ADVICE r7).
    if m and len(scheme) < 2:
        m, scheme = None, ""
    if scheme in ("", "file"):
        local = uri[len(scheme) + 1 :] if m else uri
        # RFC 8089 authority form: file://[host]/path. Empty and
        # localhost authorities mean this machine; strip them so the
        # path opens (//host/path is not an openable POSIX path,
        # ADVICE r7). A foreign host cannot be opened locally — say
        # so instead of the bare ENOENT a verbatim open would raise.
        if m and local.startswith("//"):
            authority, _, tail = local[2:].partition("/")
            if authority not in ("", "localhost"):
                raise OSError(
                    f"file:// URI names remote authority {authority!r}; "
                    "only empty or localhost file URIs resolve locally"
                )
            local = "/" + tail
        try:
            with open(local, "rb") as fh:
                return fh.read(n)
        except OSError:
            # current Spark emits the path verbatim, but escaped forms
            # (%20 for a space) exist in the wild; only reinterpret
            # when the verbatim open failed AND an escape is present,
            # so a file literally named with '%' still resolves
            if "%" not in local:
                raise
            with open(unquote(local), "rb") as fh:
                return fh.read(n)
    from pyarrow import fs as pafs

    canonical = _SCHEME_ALIASES.get(scheme)
    resolved = uri if canonical is None else f"{canonical}:{uri.split(':', 1)[1]}"
    filesystem, path = pafs.FileSystem.from_uri(resolved)
    with filesystem.open_input_stream(path) as stream:
        return stream.read(n)


def probe_assets(
    spark: SparkSession,
    root: str,
    glob: str = "*",
    header_bytes: int = PROBE_HEADER_BYTES,
) -> DataFrame:
    """Distributed F12: one probe row per file in the asset tree.

    The listing is CONTENT-PRUNED (path + length only — binaryFile
    never materializes file bytes) and the kernel opens each path
    itself, reading at most ``header_bytes`` leading bytes: a header
    parse must not ship whole rasters through Arrow, and binaryFile's
    whole-file read has a hard 2 GB cap that a single large NetCDF
    would trip, aborting the scan. Reading a bounded slice makes the
    probe O(files), not O(bytes), at any asset size."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "length")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                head = _read_header(r["path"], header_bytes)
                info = probe_bytes(r["path"], head)
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
