#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from environmental_stac_generator_spark.registry import load_full_registry
from environmental_stac_generator_spark.session import get_spark

# Representative of every operator family: scan+agg, joins, windows,
# pivots, regex/string map stages, dedup/similarity/text extensions.
HEADLINE = [
    "q1_pricing_summary",
    "orders_lineitem_join",
    "star_join_enrich",
    "band_stats",
    "overview_pyramid",
    "skip_existing_items",
    "first_per_group",
    "band_pivot",
    "freq_parse",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "embedding_near_dup",
    "cosine_topk",
    "ivf_ann_probe",
    "quality_score",
    "dedup_exact",
    "simhash",
    "salted_agg",
    "tumbling_window_agg",
    "session_window_agg",
    "json_props_extract",
    "asof_join_events",
    "range_join_tiers",
    "time_rollup",
    "exact_percentiles",
    "duplicate_clusters",
    "stratified_sample",
    "decontaminate",
    "token_budget_select",
    "sequence_pack",
    "repetition_profile",
    "kmeans_clusters",
    "chunk_documents",
    "incremental_lsh_dedup",
    "span_dedup",
    "vocab_top_tokens",
    "pii_scan",
    "semdedup_pairs",
    "importance_weights",
    "perplexity_score",
    "int8_quantize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="envstac-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_full_registry()

    # Warm the JVM / IO path once so per-query numbers measure the
    # queries, not session startup.
    reg["q1_pricing_summary"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # best of 2 runs: the first pays one-time plan compilation /
        # code-gen, the second is the steady-state number — which is
        # what throughput at scale tracks. Queries with driver-side
        # state (iterative centroid/label collects) rerun fully both
        # times, so nothing is cached between attempts.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = reg[name].fn(spark, sf_dir)
            # noop sink executes the full plan without driver-side
            # collection, so timings measure the query, not row
            # transfer.
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cog_pipeline": _cog_pipeline_throughput(spark),
            }
        )
    )
    spark.stop()


def _cog_pipeline_throughput(spark) -> dict:
    """The reference's actual workload: NetCDF cells -> per-leadtime
    multi-band COGs (BASELINE.md: 432x432x93x2 ~ 34.7M cells/file on
    a 4-worker pool). Measures our scan->grid->encode pipeline in
    cells/sec with the deterministic codec, so the number tracks the
    Spark plumbing (shuffle, grouping, Arrow) rather than zlib."""
    import shutil
    import tempfile
    from pathlib import Path

    from environmental_stac_generator_spark.sinks.raster import encode_cogs
    from environmental_stac_generator_spark.sources import netcdf

    from environmental_stac_generator_spark.sinks.raster import encode_cogs_grids

    base = Path(tempfile.mkdtemp(prefix="envstac_bench_cog_"))
    landing = base / "bench_in"
    n_files, grid, n_lead, n_vars = 4, 216, 12, 2
    for i in range(n_files):
        (landing / f"coll{i}").mkdir(parents=True)
        (landing / f"coll{i}" / "fc.nc").write_bytes(bytes([i]))
    src = str(landing / "*")
    dec = netcdf.fake_decoder(grid=grid, n_lead=n_lead)
    cells = n_files * grid * grid * n_lead * n_vars

    t0 = time.perf_counter()
    encode_cogs(
        netcdf.scan_netcdf(spark, src, decoder=dec), base / "cogs_long"
    ).write.mode("overwrite").format("noop").save()
    sec_long = time.perf_counter() - t0

    t0 = time.perf_counter()
    encode_cogs_grids(
        netcdf.scan_netcdf_grids(spark, src, decoder=dec), base / "cogs_grid"
    ).write.mode("overwrite").format("noop").save()
    sec_grid = time.perf_counter() - t0

    shutil.rmtree(base, ignore_errors=True)
    return {
        "cells": cells,
        "long_rows": {"sec": round(sec_long, 3), "cells_per_sec": int(cells / sec_long)},
        "packed_grids": {"sec": round(sec_grid, 3), "cells_per_sec": int(cells / sec_grid)},
    }


if __name__ == "__main__":
    main()
