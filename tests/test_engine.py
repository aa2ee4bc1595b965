"""End-to-end: EnvStacEngine.process() + save_catalog() on fake data."""

from __future__ import annotations

import json

import pytest

from environmental_stac_generator_spark.engine import EnvStacEngine
from environmental_stac_generator_spark.plans.config_guard import ConfigMismatchError
from environmental_stac_generator_spark.sources import netcdf


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e") / "icenet_south"
    d.mkdir()
    for i in range(2):
        (d / f"fc{i}.nc").write_bytes(bytes([i]))
    return d


def test_process_end_to_end(spark, inputs, tmp_path):
    eng = EnvStacEngine(
        spark,
        catalog_name="icenet",
        output_dir=tmp_path,
        file_server_url="https://files.example.com",
        decoder=netcdf.fake_decoder(),
    )
    results = eng.process(str(inputs), forecast_frequency="1days")
    assert results["collections"].count() == 1
    n_items = results["items"].count()
    assert n_items >= 1
    # sinks ran: COGs + netcdf slices on disk
    cogs = list(tmp_path.rglob("*.tif"))
    assert len(list(tmp_path.rglob("*.nc"))) == n_items
    assert len(cogs) == results["cog_results"].count()
    # href rewrite applied (F8)
    hrefs = [r["href"] for r in results["assets"].collect()]
    assert all(h.startswith("https://files.example.com/") for h in hrefs)
    # every COG/thumbnail href resolves to a file the raster sink wrote
    for h in hrefs:
        rel = h.removeprefix("https://files.example.com/")
        if rel.startswith("cogs/"):
            assert (tmp_path / rel).exists(), rel

    # catalog JSON tree (K4)
    root = eng.save_catalog(results)
    assert root.name == "catalog.json"
    doc = json.loads(root.read_text())
    assert doc["id"] == "icenet"
    stac_dir = tmp_path / "stac" / "icenet"  # ref layout, generator.py:106
    coll_doc = json.loads((stac_dir / "icenet_south" / "collection.json").read_text())
    assert coll_doc["type"] == "Collection"
    item_files = list((stac_dir / "icenet_south").glob("forecast_init_*/*.json"))
    assert len(item_files) == n_items
    item_doc = json.loads(item_files[0].read_text())
    assert item_doc["stac_version"] == "1.0.0"

    # config guard: rerun with changed frequency raises (C1)
    with pytest.raises(ConfigMismatchError):
        eng.process(str(inputs), forecast_frequency="2days")


def test_process_stac_only(spark, inputs, tmp_path):
    eng = EnvStacEngine(
        spark, catalog_name="icenet2", output_dir=tmp_path,
        decoder=netcdf.fake_decoder(),
    )
    results = eng.process(str(inputs), stac_only=True)
    assert "cog_results" not in results  # heavy sinks elided
    assert results["assets"].count() > 0
    assert not list(tmp_path.rglob("*.tif"))


def test_release_unpersists_process_caches(spark, inputs, tmp_path):
    """process() caches its multi-consumer frames; release() must free
    every one of them (no session-lifetime executor memory pin)."""
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    eng = EnvStacEngine(
        spark, catalog_name="icenet3", output_dir=tmp_path,
        decoder=netcdf.fake_decoder(),
    )
    results = eng.process(str(inputs))
    assert results["items"].count() > 0
    mid = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert mid - before, "process() should have cached frames"
    eng.release()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set()
    # released frames recompute rather than fail
    assert results["cog_results"].count() > 0
