#!/usr/bin/env python
"""Driver-style correctness sweep over the consolidated registry.

Mimics the external driver's CORRECTNESS check: for every entry in
``__spark_entry__.queries()``, run the Spark query at the given sf dir
and, when an ``oracle_sql()`` twin exists, run it in DuckDB over the
same parquet tables and compare row count, schema (column names), and
an order-insensitive value comparison (sorted by all columns).

    python tools/driver_sweep.py [sf_dir]        # default sf0.01
    python tools/driver_sweep.py sf0.01 name...  # only these entries

Prints one line per query: PASS / RAN / MISMATCH / ERR, then a summary.
Exit code 0 iff no MISMATCH/ERR.
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from environmental_stac_generator_spark.tables import TABLE_NAMES as TABLES


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


def _equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if sorted(a.columns) != sorted(b.columns) or len(a) != len(b):
        return False
    ca, cb = _canon(a), _canon(b)
    for c in ca.columns:
        va, vb = ca[c], cb[c]
        if pd.api.types.is_numeric_dtype(va) and pd.api.types.is_numeric_dtype(vb):
            # widths differ across engines (int32 vs int64, float32 vs
            # float64) — compare values, not dtypes
            va_n = pd.to_numeric(va, errors="coerce").astype("float64")
            vb_n = pd.to_numeric(vb, errors="coerce").astype("float64")
            if not ((va_n - vb_n).abs().fillna(0) < 1e-6).all():
                return False
            if not (va_n.isna() == vb_n.isna()).all():
                return False
        elif not va.astype(str).equals(vb.astype(str)):
            return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not sf_dir.startswith("/"):
        sf_dir = f"/root/testdata/{sf_dir}"
    only = set(sys.argv[2:])

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from environmental_stac_generator_spark.session import get_spark

    spark = get_spark(app_name="driver-sweep")
    qs, osql = mod.queries(), mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_ran = n_bad = 0
    # a typo'd name silently matching nothing would print an all-zero
    # summary with exit 0 — report unknown names as failures up front
    unknown = only - set(qs)
    for name in sorted(unknown):
        n_bad += 1
        print(f"UNKNOWN  {name}  (not a registry entry)")
    t_all = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name in osql:
                ddf = con.execute(osql[name]).fetchdf()
                if _equal(sdf, ddf):
                    n_pass += 1
                    print(f"PASS  {name}  rows={len(sdf)}  {time.time()-t0:.1f}s")
                else:
                    n_bad += 1
                    print(
                        f"MISMATCH  {name}  spark_rows={len(sdf)} "
                        f"oracle_rows={len(ddf)}  {time.time()-t0:.1f}s"
                    )
            else:
                if len(sdf) > 0:
                    n_ran += 1
                    print(f"RAN   {name}  rows={len(sdf)}  {time.time()-t0:.1f}s")
                else:
                    n_bad += 1
                    print(f"EMPTY {name}  {time.time()-t0:.1f}s")
        except Exception:
            n_bad += 1
            print(f"ERR   {name}  {time.time()-t0:.1f}s")
            traceback.print_exc()
    print(
        f"== {n_pass} pass, {n_ran} ran, {n_bad} bad "
        f"({time.time()-t_all:.0f}s total)"
    )
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
