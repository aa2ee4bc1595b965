"""The core correctness gate: every registered query must match its
DuckDB oracle at sf0.001 (the driver runs the same check at sf0.01)."""

from __future__ import annotations

import pytest

from environmental_stac_generator_spark.registry import load_registry
from tests.oracle import compare, run_duckdb

REG = load_registry()
SQL_QUERIES = sorted(name for name, spec in REG.items() if spec.sql is not None)
ROWS_ONLY = sorted(name for name, spec in REG.items() if spec.sql is None)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    spec = REG[name]
    sdf = spec.fn(spark, sf_dir)
    ddf = run_duckdb(spec.sql, sf_dir)
    errs = compare(sdf, ddf, name)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = REG[name].fn(spark, sf_dir)
    assert df.count() >= 0
