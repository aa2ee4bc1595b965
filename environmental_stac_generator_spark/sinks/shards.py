"""Sharded training-corpus export: deterministic shuffle + balance.

The last stage of a curation pipeline writes the selected corpus as
N shard files that (a) together hold every row exactly once, (b) are
size-balanced so data-loader workers finish together, and (c) are
globally pseudo-randomly shuffled — neighboring input rows (same
source, same crawl) must not land in the same training batch — yet
(d) fully deterministic given a seed, so a re-run of the pipeline
reproduces byte-identical shards for training reproducibility.

Spark-first: the shard id and intra-shard order are both
``xxhash64(key, seed)`` columns, so the "shuffle" is an ordinary
hash — no RNG state, no driver involvement, reproducible at any
parallelism. The write is one exchange (repartition on the shard id)
followed by a within-partition sort; ``partitionBy`` lays each shard
in its own directory, and because every row of a shard sits in one
task, each shard directory holds exactly one file (re-split only by
``maxRecordsPerFile`` when a shard is genuinely huge).

At 100 TB: n_shards scales with corpus size (aim ~100-500 MB per
shard file); the single hash-partitioned exchange is the theoretical
minimum data movement for a global shuffle, and balance follows from
the hash (no coordinator, no sampling pass).
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def _contains_map(dt: DataType) -> bool:
    """True when ``dt`` holds a MapType anywhere (top-level or nested
    in a struct/array) — every shape xxhash64 rejects."""
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _tie_inputs(df: DataFrame) -> list[Column]:
    """One hashable expression per column. Spark disallows hashing
    MapType (map equality ignores entry order, so a hash would be
    ill-defined), including maps nested in structs/arrays; those
    columns go through to_json — a deterministic function of the
    stored row bytes — so EVERY column still contributes to the tie
    and rows differing only in a map column keep a deterministic
    order (the byte-identical contract)."""
    return [
        F.to_json(F.struct(F.col(f.name))) if _contains_map(f.dataType) else F.col(f.name)
        for f in df.schema.fields
    ]


def with_shard(
    df: DataFrame, key: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Assign each row a deterministic shard id and intra-shard sort
    key derived from ``key`` — a pure map stage. ``_tie`` hashes the
    WHOLE row: when ``key`` is not unique, rows sharing its value tie
    on every key-derived sort column and their relative order would
    be exchange-arrival order (timing-dependent, breaking the
    byte-identical contract); the full-row hash gives them a
    deterministic total order, and full-duplicate rows — the only
    remaining ties — are interchangeable bytes anyway."""
    return (
        df.withColumn(
            "shard", F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(n_shards))
        )
        .withColumn("_ord", F.xxhash64(F.col(key), F.lit(seed + 1)))
        .withColumn(
            "_tie", F.xxhash64(*_tie_inputs(df), F.lit(seed + 2))
        )
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str | Path,
    key: str,
    n_shards: int,
    seed: int = 0,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write ``df`` as ``shard=K`` parquet directories, globally
    shuffled and deterministic (same input + seed → same shards, at
    any input partitioning)."""
    sharded = with_shard(df, key, n_shards, seed)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord", key, "_tie")
        .drop("_ord", "_tie")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(str(out_dir))
    )


def read_shard(spark: SparkSession, out_dir: str | Path, shard: int) -> DataFrame:
    """Partition-pruned read of one shard, in its written order."""
    return spark.read.parquet(str(out_dir)).filter(F.col("shard") == shard)
