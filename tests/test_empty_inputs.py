"""Operators must degrade to empty results — never crash — on an
empty corpus.

Real pipelines see empty partitions, empty daily batches, and fresh
deployments with no data yet. Builds an empty mirror of the testdata
layout (same schemas, zero rows) and runs every corpus-facing
operator family against it.
"""

from __future__ import annotations

import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = [
    "q1_pricing_summary",
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "incremental_lsh_dedup",
    "simhash",
    "ngram_jaccard_vs_probe",
    "duplicate_clusters",
    "quality_score",
    "repetition_profile",
    "chunk_documents",
    "token_budget_select",
    "sequence_pack",
    "stratified_sample",
    "decontaminate",
    "vocab_top_tokens",
    "span_dedup",
    "importance_weights",
    "perplexity_score",
    "pii_scan",
    "kmeans_clusters",
    "semdedup_pairs",
    "cosine_topk",
    "knn_join",
    "ann_lsh_buckets",
    "ivf_ann_probe",
    "ivf_index_probe",
    "ivfpq_index_probe",
    "embedding_near_dup",
    "int8_quantize",
    "salted_agg",
    "exact_percentiles",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("empty_sf")
    # events.ts is TIMESTAMP(NANOS): read it the way tables.load does
    # (nanos as long) so the empty mirror keeps a load()-compatible
    # physical type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(base / f"{t}.parquet"))
    return str(base)


@pytest.mark.parametrize("name", QUERIES)
def test_empty_corpus_yields_empty_result(spark, empty_sf_dir, name):
    from environmental_stac_generator_spark.registry import load_full_registry

    df = load_full_registry()[name].fn(spark, empty_sf_dir)
    assert df.count() == 0
