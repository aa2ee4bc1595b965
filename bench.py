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

from environmental_stac_generator_spark.registry import load_registry
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
    reg = load_registry()

    # Warm the JVM / IO path once so per-query numbers measure the
    # queries, not session startup.
    reg["q1_pricing_summary"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = reg[name].fn(spark, sf_dir)
        # noop sink executes the full plan without driver-side
        # collection, so timings measure the query, not row transfer.
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
