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

import threading

from pyspark.sql import DataFrame


# THREAD-LOCAL registry of persisted relations that outlive their
# query function (pair-generation buckets consumed by two plan
# branches). A bare ``persist()`` with no unpersist path pins a
# relation-sized cache in the CacheManager for the session — one per
# DISTINCT input frame, so repeated curate() runs over different
# corpora accumulate pins (ADVICE r4). ``persist_tracked`` keeps the
# CacheManager reuse (ReuseExchange alone re-runs reduce-side collect
# aggs per consumer) while making every pin releasable:
# ``release_tracked()`` drains the registry, and the curate chain
# calls it after each stage materializes (the stage output is
# checkpointed, so nothing still needs the cache). The registry is
# per-DRIVER-THREAD so a curate() on one thread never unpersists the
# in-flight buckets of a pipeline running concurrently on another
# (pins must be released on the thread that created them).
_TRACKED = threading.local()


def _tracked_list() -> list[DataFrame]:
    lst = getattr(_TRACKED, "frames", None)
    if lst is None:
        lst = _TRACKED.frames = []
    return lst


def persist_tracked(df: DataFrame) -> DataFrame:
    _tracked_list().append(df.persist())
    return df


def release_tracked() -> None:
    lst = _tracked_list()
    while lst:
        lst.pop().unpersist()


def drain_tracked() -> list[DataFrame]:
    """Hand the CURRENT thread's tracked pins to the caller WITHOUT
    unpersisting, clearing the registry. For owners with their own
    release lifecycle (EnvStacEngine adopts the pins its process()
    created into ``_persisted``): unpersist() is thread-safe, so the
    adopting owner may release them from ANY thread later — which the
    thread-local registry alone cannot offer (engine.release() on the
    main thread could never see pins created by a process() run on a
    worker thread)."""
    lst = _tracked_list()
    out, lst[:] = list(lst), []
    return out


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """``eager=False`` defers materialization to the first action over
    the returned frame — use it when the very next step is itself an
    action (a totals collect, a boundary sample), so one job both
    computes and stores the partitions instead of two."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
