"""Partitioned table layout for the long forecast store.

The reference's output layout ``data/{cogs,netcdf}/{collection}/{date}/``
(``stac/generator.py:404-405,689-701``) is a manual partitioning
scheme. The Spark-native form is a hive-partitioned parquet table:

- ``partitionBy(collection, forecast_date)`` — queries filtered on
  collection/date (every per-run query in the reference) scan only
  their directories (partition pruning, visible as PartitionFilters
  in the plan);
- ``sortWithinPartitions(collection, forecast_date, leadtime_idx,
  variable)`` — row groups are leadtime-clustered, so parquet min/max
  stats prune leadtime slices inside a partition (the
  COG-per-leadtime access pattern); the partition columns lead the
  sort because the V1 write path discards any sort that doesn't;
- file sizing via ``maxRecordsPerFile`` so a 100 TB table lands as
  healthy ~100-500 MB files instead of one file per task.
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    long_df: DataFrame,
    out_dir: str | Path,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write the long forecast table with the pruning-friendly layout.

    The pre-write ``repartition(collection, forecast_date)`` routes
    each hive partition's rows to one writer task, so an N-task input
    emits one file per partition (``maxRecordsPerFile`` re-splits the
    genuinely large ones) instead of up to N small files per
    partition — the difference between ~date-count files and
    ~date-count × task-count files at cluster scale.
    """
    # the sort MUST lead with the partitionBy columns: Spark's V1
    # write path replaces any user sort that does not start with the
    # partition columns by its own Sort on just (collection,
    # forecast_date) — silently discarding the leadtime/variable
    # clustering this module exists to provide (verified against the
    # executed write plan; the prefix-including form keeps all four
    # sort keys)
    (
        long_df.withColumn("forecast_date", F.to_date("forecast_reference_time"))
        .repartition("collection", "forecast_date")
        .sortWithinPartitions(
            "collection", "forecast_date", "leadtime_idx", "variable"
        )
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("collection", "forecast_date")
        .parquet(str(out_dir))
    )


def read_partition(
    spark: SparkSession,
    table_dir: str | Path,
    collection: str,
    forecast_date: str | None = None,
) -> DataFrame:
    """Partition-pruned read: the filters land in PartitionFilters,
    so only the matching directories are listed and scanned."""
    df = spark.read.parquet(str(table_dir)).filter(F.col("collection") == collection)
    if forecast_date is not None:
        df = df.filter(F.col("forecast_date") == F.lit(forecast_date).cast("date"))
    return df
