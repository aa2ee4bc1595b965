"""Similarity search over embeddings (SURVEY §2.11 north-star).

Brute-force cosine top-k as the exact baseline, plus a
random-hyperplane LSH bucketing as the 100 TB scale path. The dot
products stay JVM-side as ``zip_with`` + ``aggregate`` higher-order
functions (whole-stage codegen, no Python), and the probe side is
always broadcast — the big embeddings table is never shuffled.

At scale: brute-force is one broadcast-join map pass O(n·d) — fine
for one probe; the LSH variant buckets the corpus once (one map
pass + one small shuffle) and then answers probes by scanning a
single bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from environmental_stac_generator_spark.functions.rounding import rnd
from environmental_stac_generator_spark.registry import register
from environmental_stac_generator_spark.tables import load

N_PLANES = 8  # LSH hyperplanes -> 2^8 buckets


def _dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-order double-precision dot product of two float
    array columns — bit-identical to a C loop, so oracle-comparable."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _cosine(a: str | Column, b: str | Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


@register(
    "cosine_topk",
    """
    WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           floor((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(p.p AS DOUBLE[]))) * 100000.0 + 0.5) / 100000.0 AS cosine
    FROM embeddings e CROSS JOIN probe p
    WHERE e.vec_id <> 0
    ORDER BY cosine DESC, e.vec_id
    LIMIT 10
    """,
    doc="Brute-force cosine top-k: exact nearest neighbors of probe "
    "vec 0; broadcast probe, single map pass over the corpus.",
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("p"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", rnd(_cosine("embedding", "p"), 5).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


@register(
    "knn_join",
    """
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding AS p FROM embeddings WHERE vec_id < 5
    ),
    sims AS (
      SELECT p.probe_id, e.vec_id,
             floor((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(p.p AS DOUBLE[]))) * 100000.0 + 0.5) / 100000.0 AS cosine
      FROM embeddings e CROSS JOIN probes p
      WHERE e.vec_id <> p.probe_id
    )
    SELECT probe_id, vec_id, cosine FROM (
      SELECT probe_id, vec_id, cosine,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, vec_id) AS rn
      FROM sims
    ) WHERE rn <= 5
    """,
    doc="k-NN join: top-5 cosine neighbors for each of a broadcast "
    "probe set — the batched form of similarity search.",
)
def knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p")
    )
    sims = (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id", "vec_id", rnd(_cosine("embedding", "p"), 5).alias("cosine")
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "vec_id", "cosine")
    )


@register(
    "ann_lsh_buckets",
    f"""
    WITH planes AS (
      SELECT vec_id AS plane_id, embedding AS plane
      FROM embeddings WHERE vec_id < {N_PLANES}
    ),
    bits AS (
      SELECT e.vec_id, p.plane_id,
             CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(p.plane AS DOUBLE[])) >= 0
                  THEN '1' ELSE '0' END AS bit
      FROM embeddings e CROSS JOIN planes p
    )
    SELECT vec_id, string_agg(bit, '' ORDER BY plane_id) AS bucket
    FROM bits GROUP BY vec_id
    """,
    doc="ANN via random-hyperplane LSH: bucket = sign bits of the dot "
    "product against 8 fixed hyperplanes (deterministically chosen as "
    "the first 8 corpus vectors). One map pass buckets the corpus; "
    "probes then scan a single bucket instead of the full table.",
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    planes = e.filter(F.col("vec_id") < N_PLANES).select(
        F.col("vec_id").alias("plane_id"), F.col("embedding").alias("plane")
    )
    bits = e.crossJoin(F.broadcast(planes)).select(
        "vec_id",
        "plane_id",
        F.when(_dot("embedding", "plane") >= 0, "1").otherwise("0").alias("bit"),
    )
    return (
        bits.groupBy("vec_id")
        .agg(
            F.concat_ws(
                "",
                F.sort_array(F.collect_list(F.struct("plane_id", "bit"))).getField(
                    "bit"
                ),
            ).alias("bucket")
        )
    )


@register(
    "ann_lsh_probe",
    f"""
    WITH planes AS (
      SELECT vec_id AS plane_id, embedding AS plane
      FROM embeddings WHERE vec_id < {N_PLANES}
    ),
    bits AS (
      SELECT e.vec_id, p.plane_id, e.embedding,
             CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(p.plane AS DOUBLE[])) >= 0
                  THEN '1' ELSE '0' END AS bit
      FROM embeddings e CROSS JOIN planes p
    ),
    buckets AS (
      SELECT vec_id, any_value(embedding) AS embedding,
             string_agg(bit, '' ORDER BY plane_id) AS bucket
      FROM bits GROUP BY vec_id
    ),
    probe AS (SELECT embedding AS p, bucket FROM buckets WHERE vec_id = 0)
    SELECT b.vec_id,
           floor((list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                        CAST(p.p AS DOUBLE[]))) * 100000.0 + 0.5) / 100000.0 AS cosine
    FROM buckets b JOIN probe p ON b.bucket = p.bucket
    WHERE b.vec_id <> 0
    ORDER BY cosine DESC, b.vec_id
    """,
    doc="ANN probe: rank only the probe's LSH bucket by exact cosine — "
    "the candidate set is ~n/2^planes of the corpus.",
)
def ann_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    buckets = ann_lsh_buckets(spark, sf_dir).join(e, "vec_id")
    probe = buckets.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("p"), F.col("bucket").alias("probe_bucket")
    )
    return (
        buckets.crossJoin(F.broadcast(probe))
        .filter((F.col("bucket") == F.col("probe_bucket")) & (F.col("vec_id") != 0))
        .select("vec_id", rnd(_cosine("embedding", "p"), 5).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
    )
