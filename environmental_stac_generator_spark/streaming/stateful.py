"""T2 on the Spark 4.x arbitrary-state API (``transformWithState``).

``streaming/windows.py`` implements the running catalog extent with
``applyInPandasWithState`` (the 3.x API). This module is the same
operator on the 4.x ``transformWithStateInPandas`` API — typed state
variables on a ``StatefulProcessor``, RocksDB-backed state store —
which is where Structured Streaming's custom-stateful surface is
headed: state schema evolution, composite state types (value / list /
map), and timers come with it for free.

The operator semantics are identical to
``windows.stateful_running_extent`` (ref analog: the reference's
extent merge, ``stac/generator.py:191-207``): one state row per
collection holding (start, end, n_items), merged per micro-batch,
update-mode output for exactly the collections seen in the batch.

``transformWithState`` requires the RocksDB state store provider;
:func:`stateful_running_extent_tws` sets it on the session (the
HDFS-backed default provider rejects the operator). The operator's
Python protocol additionally needs ``protobuf`` (PySpark's
``StateMessage_pb2``), which is not shipped in this container — the
test is import-guarded like the real-codec lane and runs live where
protobuf is installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EXTENT_OUTPUT_SCHEMA = StructType(
    [
        StructField("collection", StringType()),
        StructField("extent_start", TimestampType()),
        StructField("extent_end", TimestampType()),
        StructField("n_items", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start", TimestampType()),
        StructField("end", TimestampType()),
        StructField("n", LongType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class ExtentProcessor(StatefulProcessor):
    """Running (min, max, count) of forecast_reference_time per
    collection, held in a typed ValueState across micro-batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._extent = handle.getValueState("extent", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        # ONE shared merge implementation with the 3.x API (NaT-freeze
        # and count-only guards included) — see windows.merge_extent
        from environmental_stac_generator_spark.streaming.windows import (
            extent_output_row,
            merge_extent,
        )

        prior = self._extent.get() if self._extent.exists() else None
        start, end, n = merge_extent(prior, rows)
        if start is not None and end is not None:
            self._extent.update((pd.Timestamp(start), pd.Timestamp(end), int(n)))
        elif n:
            # rows seen but no valid timestamp yet: persist the COUNT
            # with null bounds so it isn't lost — otherwise n_items
            # would depend on whether the null-ts rows arrived before
            # or after the first valid batch
            self._extent.update((None, None, int(n)))
        yield extent_output_row(key, start, end, n)

    def close(self) -> None:
        pass


def stateful_running_extent_tws(stream_df: DataFrame) -> DataFrame:
    """T2 via ``transformWithStateInPandas``. Sets the RocksDB state
    store provider on the session IF NOT already configured (the
    operator requires RocksDB; it is also the provider a 100 TB
    deployment wants — state spills off-heap with changelog
    checkpointing instead of living in executor heap). An explicit
    provider set by the application is respected: silently flipping a
    session-wide config would change how OTHER streaming queries on
    the session load their checkpointed state."""
    conf = stream_df.sparkSession.conf
    configured = conf.get("spark.sql.streaming.stateStore.providerClass", None)
    if configured is None:  # unset: default to the provider tWS needs
        conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    elif "HDFSBackedStateStoreProvider" in configured:
        # EXPLICITLY configured to the one provider this operator
        # cannot run on: fail loudly rather than silently flipping a
        # session-wide config — the app's other streaming queries may
        # hold HDFS-format checkpoints that RocksDB cannot load.
        raise ValueError(
            "transformWithState requires the RocksDB state store "
            "provider, but the session explicitly configures "
            f"{configured}; set {ROCKSDB_PROVIDER} (or unset the conf) "
            "before calling stateful_running_extent_tws"
        )
    return stream_df.groupBy("collection").transformWithStateInPandas(
        statefulProcessor=ExtentProcessor(),
        outputStructType=EXTENT_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
