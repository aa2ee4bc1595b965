"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side,
sorts columns by name and rows by all values, and compares cell by
cell (exact for ints/strings, 1e-9 tolerance for floats — both sides
already round, so a tolerance failure means a real mismatch risk).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from environmental_stac_generator_spark.tables import TABLE_NAMES


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def compare(spark_df, duck_df: pd.DataFrame, name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    sp = _normalize(spark_df.toPandas())
    du = _normalize(duck_df)
    errs: list[str] = []
    if list(sp.columns) != list(du.columns):
        errs.append(f"{name}: columns differ spark={list(sp.columns)} duck={list(du.columns)}")
        return errs
    if len(sp) != len(du):
        errs.append(f"{name}: row count spark={len(sp)} duck={len(du)}")
        return errs
    for c in sp.columns:
        a, b = sp[c], du[c]
        for i in range(len(a)):
            x, y = a.iloc[i], b.iloc[i]
            xnull = x is None or (isinstance(x, float) and math.isnan(x)) or pd.isna(x)
            ynull = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
            if xnull and ynull:
                continue
            if xnull != ynull:
                errs.append(f"{name}.{c}[{i}]: null mismatch {x!r} vs {y!r}")
            elif isinstance(x, float) or isinstance(y, float):
                # a type drift (one engine renders a string where the
                # other returns a number) must surface as a MISMATCH
                # diagnostic, not a ValueError crashing the test
                try:
                    fx, fy = float(x), float(y)
                except (TypeError, ValueError):
                    errs.append(
                        f"{name}.{c}[{i}]: type mismatch {x!r} vs {y!r}"
                    )
                    continue
                if abs(fx - fy) > 1e-9 * max(1.0, abs(fy)):
                    errs.append(f"{name}.{c}[{i}]: {x!r} != {y!r}")
            elif str(x) != str(y):
                errs.append(f"{name}.{c}[{i}]: {x!r} != {y!r}")
            if len(errs) > 5:
                return errs
    return errs
