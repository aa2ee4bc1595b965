"""Sharded corpus export: totality, balance, determinism, shuffle."""

from __future__ import annotations

import tempfile
from pathlib import Path

import pyspark.sql.functions as F

from environmental_stac_generator_spark.sinks.shards import (
    read_shard,
    with_shard,
    write_training_shards,
)
from environmental_stac_generator_spark.tables import load

N_SHARDS = 8


def test_shards_total_balanced_and_shuffled(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    out = Path(tempfile.mkdtemp(prefix="envstac_shards_")) / "corpus"
    write_training_shards(docs, out, key="doc_id", n_shards=N_SHARDS)

    back = spark.read.parquet(str(out))
    # every row exactly once
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # all shards present and size-balanced (hash balance: within 2x)
    sizes = {r["shard"]: r["n"] for r in
             back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(range(N_SHARDS))
    assert max(sizes.values()) < 2 * min(sizes.values())
    # a shard is not an input-order run: neighboring doc_ids scatter
    one = [r["doc_id"] for r in read_shard(spark, out, 0).collect()]
    runs = sum(1 for a, b in zip(one, one[1:]) if b == a + 1)
    assert runs < len(one) / 4


def test_shards_deterministic_across_partitioning(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(300)
    outs = []
    for repart in (1, 7):
        out = Path(tempfile.mkdtemp(prefix="envstac_shards_")) / "c"
        write_training_shards(
            docs.repartition(repart), out, key="doc_id", n_shards=4, seed=9
        )
        outs.append(out)
    for s in range(4):
        a = [r["doc_id"] for r in read_shard(spark, outs[0], s).collect()]
        b = [r["doc_id"] for r in read_shard(spark, outs[1], s).collect()]
        assert a == b and len(a) > 0
    # a different seed deals a different hand
    out2 = Path(tempfile.mkdtemp(prefix="envstac_shards_")) / "c"
    write_training_shards(docs, out2, key="doc_id", n_shards=4, seed=10)
    diff = [
        s for s in range(4)
        if [r["doc_id"] for r in read_shard(spark, out2, s).collect()]
        != [r["doc_id"] for r in read_shard(spark, outs[0], s).collect()]
    ]
    assert diff


def test_with_shard_is_map_stage(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    plan = with_shard(docs, "doc_id", 16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shards_byte_identical_with_non_unique_key(spark, tmp_path):
    """The byte-identical contract must hold when the shard key is
    NOT unique: rows sharing a key value tie on every key-derived
    sort column, so without the full-row tiebreak their order would
    be exchange-arrival (timing-dependent)."""
    import pyspark.sql.functions as F

    from environmental_stac_generator_spark.sinks.shards import (
        read_shard,
        write_training_shards,
    )

    df = spark.range(0, 400).select(
        (F.col("id") % 20).cast("string").alias("url"),  # 20 rows per key
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    outs = []
    for run in ("a", "b"):
        out = tmp_path / f"run_{run}"
        # different input partitioning per run: arrival order differs
        src = df.repartition(3 if run == "a" else 11)
        write_training_shards(src, out, key="url", n_shards=4, seed=7)
        outs.append(
            [
                [tuple(r) for r in read_shard(spark, out, s).collect()]
                for s in range(4)
            ]
        )
    assert outs[0] == outs[1]


def test_shards_tolerate_map_columns(spark, tmp_path):
    """Spark disallows xxhash64 over MapType — top-level AND nested
    in a struct — so the full-row tiebreak must route map-bearing
    columns through to_json instead of raising AnalysisException."""
    df = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id")).alias("text"),
        F.create_map(F.lit("lang"), F.lit("en")).alias("meta"),
        F.struct(
            F.create_map(F.lit("k"), F.col("id").cast("string")).alias("tags")
        ).alias("nested"),
    )
    out = tmp_path / "mapcol"
    write_training_shards(df, out, key="doc_id", n_shards=3, seed=1)
    back = spark.read.parquet(str(out))
    assert back.count() == 60
    assert {"meta", "nested"} <= set(back.columns)


def test_shards_byte_identical_when_rows_differ_only_in_map(spark, tmp_path):
    """Map columns still contribute to the tie hash (via to_json):
    rows identical in every non-map column but different in a map
    keep a deterministic relative order across input partitionings —
    the byte-identical contract can't except map columns."""
    df = spark.range(0, 120).select(
        (F.col("id") % 6).cast("string").alias("url"),  # non-unique key
        F.lit("same text").alias("text"),  # all non-map cols tie
        F.create_map(F.lit("n"), F.col("id").cast("string")).alias("meta"),
    )
    outs = []
    for repart in (3, 11):
        out = tmp_path / f"m{repart}"
        write_training_shards(
            df.repartition(repart), out, key="url", n_shards=4, seed=5
        )
        outs.append(
            [
                [r["meta"]["n"] for r in read_shard(spark, out, s).collect()]
                for s in range(4)
            ]
        )
    assert outs[0] == outs[1] and sum(len(s) for s in outs[0]) == 120
