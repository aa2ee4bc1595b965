"""K4: STAC catalog JSON tree writer.

The reference normalizes hrefs and saves a SELF_CONTAINED pystac
tree (``stac/generator.py:1035-1058``). Here item/collection JSON
documents are DataFrames (``plans.stac_catalog``); the writer lays
them out as

    out_dir/catalog.json
    out_dir/<collection_id>/collection.json
    out_dir/<collection_id>/<item_id>/<item_id>.json

Items are written partition-parallel via ``foreachPartition`` (one
tiny JSON per item — at 100 TB of rasters the catalog is still only
~1 row per item, so this is the cheap part); the catalog root is a
single driver-side write.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame

from environmental_stac_generator_spark.plans.stac_catalog import STAC_VERSION


def save_items(items_json: DataFrame, out_dir: str | Path) -> None:
    """Write one JSON file per item, executor-side."""
    out = str(out_dir)

    def write_partition(rows) -> None:
        for row in rows:
            d = Path(out) / row["collection_id"] / row["item_id"]
            d.mkdir(parents=True, exist_ok=True)
            (d / f"{row['item_id']}.json").write_text(row["json"])

    items_json.foreachPartition(write_partition)


def save_collections(collections_json: DataFrame, out_dir: str | Path) -> None:
    out = str(out_dir)

    def write_partition(rows) -> None:
        for row in rows:
            d = Path(out) / row["collection_id"]
            d.mkdir(parents=True, exist_ok=True)
            (d / "collection.json").write_text(row["json"])

    collections_json.foreachPartition(write_partition)


def save_catalog_root(
    catalog_id: str,
    description: str,
    collection_ids: list[str],
    out_dir: str | Path,
) -> Path:
    """Catalog root document — tiny, driver-side
    (ref ``stac/generator.py:111-142``)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    doc = {
        "type": "Catalog",
        "stac_version": STAC_VERSION,
        "id": catalog_id,
        "description": description,
        "links": [
            {"rel": "child", "href": f"./{cid}/collection.json"}
            for cid in sorted(collection_ids)
        ],
    }
    p = out / "catalog.json"
    p.write_text(json.dumps(doc, indent=2))
    return p


def load_catalog_tree(spark, out_dir: str | Path) -> DataFrame:
    """S3: read an existing catalog tree back as DataFrames
    (resume/incremental; ref ``Catalog.from_file``,
    ``stac/generator.py:130-131``)."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .option("multiLine", "true")
        .json(str(out_dir))
    )
