"""Geo scalar functions: F4 ensure_utc, F13 bbox reprojection.

F13 (ref ``proj_to_geo``, ``utils.py:161-166``) wraps a
``transform_bounds``-style kernel in an Arrow-batched scalar pandas
UDF. The reference calls it once per collection (one row each), so
the Python cost is irrelevant at any scale — and because it is a
scalar UDF over 5 narrow columns, Catalyst keeps the surrounding
projections/filters JVM-side and ships only those columns through
Arrow. The container has no pyproj, so the kernel is pluggable:
EPSG:4326 input passes through EXACTLY (the reference also skips
reprojection then, ``stac/generator.py:582-583``); other CRSs raise
a clear NotImplementedError unless a transform fn is injected.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

WGS84 = "EPSG:4326"

# (src_crs, xmin, ymin, xmax, ymax) -> (xmin, ymin, xmax, ymax) in EPSG:4326
TransformFn = Callable[[str, float, float, float, float], tuple[float, float, float, float]]


def ensure_utc(col: Column | str) -> Column:
    """F4 (ref ``utils.py:169-187``): with the session timezone
    pinned to UTC (session.py), naive timestamps are already UTC;
    this normalizes any remaining local rendering explicitly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_utc_timestamp(c, "UTC")


def pyproj_transform(
    src_crs: str, xmin: float, ymin: float, xmax: float, ymax: float
) -> tuple[float, float, float, float]:
    """Real kernel (ref ``utils.py:161-166``, which uses
    ``rasterio.warp.transform_bounds``). pyproj's densified
    ``Transformer.transform_bounds`` computes the same envelope;
    ``always_xy=True`` pins (lon, lat) axis order like rasterio.
    Needs pyproj, which this container lacks — callers inject a
    substitute transform."""
    try:
        from pyproj import Transformer
    except ImportError as exc:
        raise NotImplementedError(
            "bbox reprojection for CRS != EPSG:4326 needs pyproj; "
            "inject transform= for environments without it"
        ) from exc
    tr = Transformer.from_crs(src_crs, WGS84, always_xy=True)
    return tr.transform_bounds(xmin, ymin, xmax, ymax)


def reproject_bbox(
    df: DataFrame,
    crs_col: str = "crs",
    bbox_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    transform: TransformFn = pyproj_transform,
) -> DataFrame:
    """F13: bbox columns -> WGS84 in place; ``crs_col`` becomes
    ``EPSG:4326``. Rows already in WGS84 pass through bit-exact (the
    kernel copies them without touching the floats); only foreign-CRS
    rows invoke ``transform``. One Arrow batch round-trip over 5
    columns; every other column of ``df`` never leaves the JVM."""

    @F.pandas_udf("array<double>")
    def _kernel(
        crs: pd.Series, x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series
    ) -> pd.Series:
        out = []
        for c, a, b, d, e in zip(crs, x0, y0, x1, y1):
            if c == WGS84 or c is None:
                out.append([a, b, d, e])
            else:
                out.append(list(transform(c, a, b, d, e)))
        return pd.Series(out)

    xmin, ymin, xmax, ymax = bbox_cols
    boxed = df.withColumn(
        "_bbox4326", _kernel(F.col(crs_col), F.col(xmin), F.col(ymin), F.col(xmax), F.col(ymax))
    )
    return (
        boxed.withColumn(xmin, F.col("_bbox4326")[0])
        .withColumn(ymin, F.col("_bbox4326")[1])
        .withColumn(xmax, F.col("_bbox4326")[2])
        .withColumn(ymax, F.col("_bbox4326")[3])
        .withColumn(crs_col, F.lit(WGS84))
        .drop("_bbox4326")
    )
