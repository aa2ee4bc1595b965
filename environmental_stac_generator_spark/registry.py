"""Query registry — the driver-facing correctness surface.

Every operator from SURVEY.md §2 that is SQL-expressible registers a
``QuerySpec`` here: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus an equivalent DuckDB oracle SQL string. The driver runs both at
sf=0.01 and compares row count + schema + order-insensitive value
hash, so every registered query:

- aliases every computed column identically on both sides,
- renders timestamps as ISO strings (removes tz-representation
  ambiguity between engines),
- rounds floating aggregates (sum→2dp, avg/stddev/ratios→4-6dp) so
  summation-order noise cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_full_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: they register) and return
    the full fine-grained registry (every operator as its own entry —
    used by tests and bench for granular checks)."""
    # Imports are inside the function so `import registry` stays cheap.
    from environmental_stac_generator_spark.queries import (  # noqa: F401
        aggregates,
        ann_index,
        arrays,
        curation,
        dedup,
        geo,
        joins,
        kernels,
        scalars,
        similarity,
        sketches,
        skew,
        temporal,
        text,
        windows,
    )

    return REGISTRY


def load_registry() -> dict[str, QuerySpec]:
    """The driver-facing registry: the full inventory consolidated to
    ≤50 entries (the driver's CORRECTNESS window checks the first 50
    ``queries()`` entries) — every SURVEY §2 row and every §2.11
    extension family lands inside the window. See
    ``queries/consolidated.py`` for the merge map."""
    full = load_full_registry()
    from environmental_stac_generator_spark.queries import consolidated

    return consolidated.build(full)
