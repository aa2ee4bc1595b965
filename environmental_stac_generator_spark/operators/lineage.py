"""Lineage truncation with fault-tolerance-aware storage.

Iterative fixpoints (duplicate clustering) and read-modify-overwrite
sinks (the incremental catalog merge) must materialize a DataFrame:
the former to keep plans bounded, the latter because overwriting the
parquet directory a plan still reads from would truncate the input
mid-job. HOW to materialize is an availability decision:

- a reliable checkpoint dir configured via
  ``spark.sparkContext.setCheckpointDir`` → ``checkpoint()``:
  executor loss mid-job recovers from the checkpoint store — what a
  multi-hour 100 TB run needs;
- otherwise → ``localCheckpoint()``: executor-local blocks, fast,
  but a lost executor kills the job — fine for local-mode tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """``eager=False`` defers materialization to the first action over
    the returned frame — use it when the very next step is itself an
    action (a totals collect, a boundary sample), so one job both
    computes and stores the partitions instead of two."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
