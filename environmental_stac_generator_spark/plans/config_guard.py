"""C1: run-parameter consistency guard.

The reference stores ``{collection: {forecast_frequency}}`` JSON on
first run and DeepDiffs it against later runs, raising
``ConfigMismatchError`` on drift (ref ``stac/generator.py:425-459``,
error class ``stac/utils.py:13-14``). Here the stored config is a
tiny DataFrame/JSON file and drift detection is a two-way
``exceptAll`` — empty means consistent.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class ConfigMismatchError(RuntimeError):
    """Raised when the current run's parameters differ from the
    stored configuration (ref ``stac/utils.py:13-14``)."""


def config_diff(stored: DataFrame, current: DataFrame) -> DataFrame:
    """Two-way EXCEPT ALL — the relational DeepDiff (F17)."""
    added = current.exceptAll(stored).withColumn("drift", F.lit("added"))
    removed = stored.exceptAll(current).withColumn("drift", F.lit("removed"))
    return added.unionByName(removed)


def store_or_validate_config(
    spark: SparkSession, config_path: str | Path, current: dict[str, dict]
) -> None:
    """First run: persist. Later runs: raise on drift — but, like the
    reference's ``_store_config`` (``stac/generator.py:440-459``),
    only the collections the CURRENT run touches are validated: a
    shared config file holding OTHER collections' entries is not our
    business, and brand-new collections are silently allowed."""
    from environmental_stac_generator_spark.sinks.stac_json import (
        _atomic_write_text,
    )

    p = Path(config_path)
    if not p.exists():
        p.parent.mkdir(parents=True, exist_ok=True)
        # atomic: a crash mid-write must not leave truncated JSON that
        # bricks every later run at json.loads
        # default=str: the comparison path canonicalizes values with
        # it (to_df below), so the store must too — a non-JSON-native
        # param (datetime, Path) would otherwise crash the first store
        # instead of persisting in the form the validator compares
        _atomic_write_text(p, json.dumps(current, sort_keys=True, default=str))
        return
    try:
        stored = json.loads(p.read_text())
    except json.JSONDecodeError as exc:
        raise ConfigMismatchError(
            f"stored config at {p} is not valid JSON ({exc}); it was "
            "written non-atomically by an earlier version or edited by "
            "hand — delete or repair it to proceed"
        ) from exc
    # collections first seen THIS run: validated never (nothing to
    # compare against), but they must be persisted now — otherwise
    # they stay absent from the file and are exempt from drift
    # detection on every future run, which defeats the guard
    new_colls = {c: v for c, v in current.items() if c not in stored}
    if new_colls:
        _atomic_write_text(
            p, json.dumps({**stored, **new_colls}, sort_keys=True, default=str)
        )
    # per-collection scope: ref DeepDiffs config_data[collection] only
    # when collection already exists in the stored file — so only
    # collections present on BOTH sides are compared
    stored_scoped = {c: v for c, v in stored.items() if c in current}
    current = {c: v for c, v in current.items() if c in stored}

    def to_df(d: dict) -> DataFrame:
        # values normalize through the SAME canonicalization the file
        # stores (sorted-keys JSON): str(v) would compare the stored
        # side post-JSON-round-trip against the live Python value, so
        # an IDENTICAL config with a tuple-valued param ([0, 6] vs
        # "(0, 6)") or a dict whose insertion order differs from the
        # sort would raise a spurious mismatch
        rows = [
            (coll, k, json.dumps(v, sort_keys=True, default=str))
            for coll, params in d.items()
            for k, v in sorted(params.items())
        ]
        return spark.createDataFrame(rows, "collection string, param string, value string")

    diff = config_diff(to_df(stored_scoped), to_df(current))
    drift = diff.collect()
    if drift:
        raise ConfigMismatchError(
            f"stored config at {p} differs from current run: "
            + "; ".join(f"{r['drift']} {r['collection']}.{r['param']}={r['value']}" for r in drift)
        )
