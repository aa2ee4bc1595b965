"""Results must not depend on parallelism.

The 100 TB correctness property: every operator's OUTPUT is identical
whatever `spark.sql.shuffle.partitions` (and therefore executor
count / task layout) happens to be. Runs each shuffle-heavy query
under two very different partition settings and compares full result
sets. Catches order-dependent aggregates, nondeterministic sampling,
and any accidental reliance on partition boundaries (the
prefix-sum / salting / LSH operators are the risk surface).
"""

from __future__ import annotations

import pytest

QUERIES = [
    "q1_pricing_summary",
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "duplicate_clusters",
    "kmeans_clusters",
    "token_budget_select",
    "sequence_pack",
    "stratified_sample",
    "salted_agg",
    "exact_percentiles",
    "repetition_profile",
    "chunk_documents",
    "span_dedup",
    "incremental_lsh_dedup",
    "importance_weights",
    "perplexity_score",
    "int8_quantize",
    # r8 ANN additions: top-k probes with deterministic tiebreaks
    "ann_lsh_multiprobe",
    "ivf_ann_nprobe",
    "ivfpq_residual_probe",
    "ivfpq_residual_nprobe",
    # r9: probes against the materialized partitionBy(cell) index
    "ivf_index_probe",
    "ivfpq_index_probe",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_shuffle_partitions(spark, sf_dir, name):
    from environmental_stac_generator_spark.registry import load_full_registry

    fn = load_full_registry()[name].fn
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _rows(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        high = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert low == high
    assert len(low) > 0
