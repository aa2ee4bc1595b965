"""STAC catalog assembly: collections/items/assets, merges, JSON."""

from __future__ import annotations

import json

import pandas as pd
import pyspark.sql.functions as F
import pytest

from environmental_stac_generator_spark.operators import forecast as fc
from environmental_stac_generator_spark.plans import stac_catalog as sc
from environmental_stac_generator_spark.sources import netcdf


@pytest.fixture(scope="module")
def long_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cat") / "icenet_test"
    d.mkdir()
    for i in range(2):
        (d / f"fc{i}.nc").write_bytes(bytes([i]))
    return netcdf.scan_netcdf(
        spark, str(d), decoder=netcdf.fake_decoder()
    ).persist()


@pytest.fixture(scope="module")
def info(long_df):
    return fc.forecast_info(long_df)


def test_build_collections(info):
    rows = sc.build_collections(info, license="MIT").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["collection_id"] == "icenet_test"
    assert r["description"] == "Icenet test collection"  # F6 capitalize+underscores
    assert r["license"] == "MIT"
    assert len(r["bbox"]) == 4


def test_merge_collections_extent(spark, info):
    import pyspark.sql.functions as F

    base = sc.build_collections(info)
    newer = base.withColumn("extent_end", F.expr("extent_end + INTERVAL 30 DAY")).withColumn(
        "title", F.lit("SHOULD_NOT_WIN")
    )
    merged = sc.merge_collections(base, newer).collect()[0]
    assert merged["title"] != "SHOULD_NOT_WIN"  # existing metadata wins (J1)
    base_row = base.collect()[0]
    assert merged["extent_start"] == base_row["extent_start"]
    assert merged["extent_end"] == base_row["extent_end"] + pd.Timedelta(days=30)  # J8


def test_build_items_and_merge(long_df, info):
    times = fc.leadtime_counts(long_df)
    items = sc.build_items(times, info, leadtime_unit="days")
    rows = items.collect()
    assert len(rows) == long_df.select("forecast_reference_time").distinct().count()
    r = rows[0]
    assert r["item_id"].startswith("forecast_init_2025-01-0")
    assert r["item_id"].endswith("Z")
    # forecast:end_time = ref + (nlead-1) days (ref generator.py:680-682)
    assert r["forecast_end_time_str"] > r["forecast_reference_time_str"]
    # merge: re-adding the same items creates nothing (J2)
    assert sc.merge_items(items, items).count() == len(rows)


def test_cog_assets_band_meta(long_df, info):
    stats = fc.band_statistics(long_df)
    times = fc.leadtime_counts(long_df)
    items = sc.build_items(times, info)
    cogs = sc.build_cog_assets(stats, items)
    rows = cogs.collect()
    n_items = len(items.collect())
    assert len(rows) == n_items * 3  # 3 leadtimes per item
    r = min(rows, key=lambda r: (r["item_id"], r["leadtime_idx"]))
    bands = r["band_meta"]
    assert [b["name"] for b in bands] == ["sic_mean", "sic_stddev"]
    assert [b["index"] for b in bands] == [1, 2]  # 1-based bidx (N2)
    assert r["href"].startswith("./cogs/icenet_test/")
    assert "Variables: sic_mean, sic_stddev" == r["description"]


def test_thumbnails_first_wins(long_df, info):
    stats = fc.band_statistics(long_df)
    items = sc.build_items(fc.leadtime_counts(long_df), info)
    cogs = sc.build_cog_assets(stats, items)
    thumbs = sc.build_thumbnail_assets(cogs)
    per_item = thumbs.filter("item_id IS NOT NULL").collect()
    coll_level = thumbs.filter("item_id IS NULL").collect()
    assert len(per_item) == items.count()  # leadtime-0 thumb per item
    assert len(coll_level) == 1  # J9: one promoted per collection
    assert coll_level[0]["href"].endswith(".jpg")


def test_href_rewrite(spark, long_df, info):
    stats = fc.band_statistics(long_df)
    items = sc.build_items(fc.leadtime_counts(long_df), info)
    cogs = sc.build_cog_assets(stats, items)
    rewritten = sc.rewrite_hrefs(cogs, "https://files.example.com")  # no trailing /
    assert all(
        r["href"].startswith("https://files.example.com/cogs/")
        for r in rewritten.collect()
    )


def test_items_to_json_valid_stac(long_df, info):
    stats = fc.band_statistics(long_df)
    items = sc.build_items(fc.leadtime_counts(long_df), info)
    cogs = sc.build_cog_assets(stats, items)
    nc = sc.build_netcdf_assets(items)
    assets = cogs.unionByName(nc).unionByName(sc.build_thumbnail_assets(cogs))
    docs = sc.items_to_json(items, assets).collect()
    for d in docs:
        doc = json.loads(d["json"])
        assert doc["type"] == "Feature"
        assert doc["stac_version"] == "1.0.0"
        assert doc["id"] == d["item_id"]
        assert set(doc["assets"]) >= {"netcdf", "thumbnail"}
        assert doc["properties"]["forecast:leadtime_length"] == 3
        geom = json.loads(doc["geometry"]) if isinstance(doc["geometry"], str) else doc["geometry"]
        assert geom["type"] == "Polygon"


def test_collections_to_json(info):
    colls = sc.build_collections(info)
    doc = json.loads(sc.collections_to_json(colls).first()["json"])
    assert doc["type"] == "Collection"
    assert doc["extent"]["temporal"]["interval"][0][0].endswith("Z")


def test_catalog_roundtrip_traversal(spark, long_df, info, tmp_path):
    from environmental_stac_generator_spark.operators import forecast as fc
    from environmental_stac_generator_spark.sinks import stac_json as sj

    items = sc.build_items(fc.leadtime_counts(long_df), info)
    cogs = sc.build_cog_assets(fc.band_statistics(long_df), items)
    out = tmp_path / "catalog"
    sj.save_items(sc.items_to_json(items, cogs), out)
    sj.save_collections(sc.collections_to_json(sc.build_collections(info)), out)
    tree = sj.load_catalog_tree(spark, out)
    types = {r["type"] for r in tree.select("type").distinct().collect()}
    assert types == {"Feature", "Collection"}
    n_items = items.count()
    joined = (
        tree.filter(tree.type == "Feature")
        .select("id", "collection")
        .join(
            tree.filter(tree.type == "Collection").select(
                F.col("id").alias("collection")
            ),
            "collection",
        )
    )
    # every item's collection link resolves in the read-back tree
    assert joined.count() == n_items


def test_save_collections_merges_extents_across_runs(spark, tmp_path):
    """Multi-input preprocess saves the catalog once per input: a
    collection re-written by a later input must keep the UNION of
    extents, not shrink to the latest input's coverage."""
    from environmental_stac_generator_spark.sinks import stac_json

    def coll_df(bbox, interval):
        doc = {
            "type": "Collection",
            "id": "icenet",
            "extent": {
                "spatial": {"bbox": [bbox]},
                "temporal": {"interval": [interval]},
            },
        }
        return spark.createDataFrame(
            [("icenet", json.dumps(doc))], "collection_id string, json string"
        )

    stac_json.save_collections(
        coll_df([-10.0, -5.0, 10.0, 5.0], ["2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z"]),
        tmp_path,
    )
    stac_json.save_collections(
        coll_df([0.0, 0.0, 20.0, 15.0], ["2024-03-01T00:00:00Z", "2024-04-01T00:00:00Z"]),
        tmp_path,
    )
    doc = json.loads((tmp_path / "icenet" / "collection.json").read_text())
    assert doc["extent"]["spatial"]["bbox"][0] == [-10.0, -5.0, 20.0, 15.0]
    assert doc["extent"]["temporal"]["interval"][0] == [
        "2024-01-01T00:00:00Z",
        "2024-04-01T00:00:00Z",
    ]


def test_save_catalog_root_keeps_earlier_children(tmp_path):
    """The root document merges child links across saves so an
    earlier input's collections stay linked from the catalog."""
    from environmental_stac_generator_spark.sinks import stac_json

    stac_json.save_catalog_root("cat", "d", ["coll_a"], tmp_path)
    stac_json.save_catalog_root("cat", "d", ["coll_b"], tmp_path)
    doc = json.loads((tmp_path / "catalog.json").read_text())
    hrefs = sorted(l["href"] for l in doc["links"] if l["rel"] == "child")
    assert hrefs == ["./coll_a/collection.json", "./coll_b/collection.json"]


def test_merge_collection_doc_malformed_temporal_is_all_or_nothing():
    """A malformed temporal section must not leave a half-merged doc
    (spatial already unioned, temporal from new only) — the merge is
    all-or-nothing: on any malformed section, return `new` untouched."""
    from environmental_stac_generator_spark.sinks.stac_json import (
        _merge_collection_doc,
    )

    old = {
        "extent": {
            "spatial": {"bbox": [[-10.0, -10.0, 0.0, 0.0]]},
            "temporal": {"interval": "not-a-list"},  # malformed
        }
    }
    new = {
        "extent": {
            "spatial": {"bbox": [[0.0, 0.0, 10.0, 10.0]]},
            "temporal": {"interval": [["2024-01-01", "2024-02-01"]]},
        }
    }
    merged = _merge_collection_doc(old, new)
    # spatial must NOT have been unioned when temporal merge failed
    assert merged["extent"]["spatial"]["bbox"][0] == [0.0, 0.0, 10.0, 10.0]
    assert merged["extent"]["temporal"]["interval"][0] == [
        "2024-01-01",
        "2024-02-01",
    ]
