"""Bit-exactness pins for the r16 Arrow pair-cosine kernels.

`_pair_cosines_arrow` (pairs-form, the blocked/mega metric) and
`_cluster_pair_cosines` (members-form applyInArrow, the bounded-
cluster path) both claim to be bit-identical twins of the JVM
explode-barrier HOF projection

    cosine = rnd(dot(emb_a, emb_b) / (nrm_a * nrm_b), 5)
    ... filter on the rounded (semdedup) or raw (near-dup) value

including the edge semantics: NULL cosine drops (null embedding,
null element — via the null norm — and cross-length raggedness),
NaN compares GREATER than the threshold (Spark's NaN ordering),
``rnd`` of NaN is 0.0 (Spark floor's double→long cast), and a zero
divisor raises (ANSI mode). These tests pin each claim against the
actual JVM expression so any Spark/pyarrow behavior change that
breaks a twin fails loudly.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from environmental_stac_generator_spark.functions.rounding import rnd
from environmental_stac_generator_spark.queries import similarity as S


def _hof_pairs(pairs, threshold, filter_raw):
    """The previous JVM formulation (explode barrier, single eval)."""
    cos_raw = S._dot("emb_a", "emb_b") / (F.col("nrm_a") * F.col("nrm_b"))
    if filter_raw:
        return (
            pairs.select(
                "vec_a", "vec_b", F.explode(F.array(cos_raw)).alias("_c")
            )
            .filter(F.col("_c") >= threshold)
            .select("vec_a", "vec_b", rnd(F.col("_c"), 5).alias("cosine"))
        )
    cos = rnd(cos_raw, 5)
    return pairs.select(
        "vec_a", "vec_b", F.explode(F.array(cos)).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def _with_norms(df):
    return df.select(
        "vec_a",
        "vec_b",
        "emb_a",
        "emb_b",
        F.sqrt(S._dot("emb_a", "emb_a")).alias("nrm_a"),
        F.sqrt(S._dot("emb_b", "emb_b")).alias("nrm_b"),
    )


def _rows_eq(got, want):
    if len(got) != len(want):
        return False
    for g, w in zip(sorted(got), sorted(want)):
        if g[:2] != w[:2]:
            return False
        if g[2] != w[2] and not (
            isinstance(g[2], float)
            and isinstance(w[2], float)
            and math.isnan(g[2])
            and math.isnan(w[2])
        ):
            return False
    return True


EDGE_ROWS = [
    (1, 2, [1.0, 2.0], [1.0, 2.0]),  # plain
    (3, 4, None, [1.0, 2.0]),  # null embedding → dropped
    (5, 6, [1.0, 2.0, 3.0], [1.0, 2.0]),  # ragged pair → NULL dot → dropped
    (11, 12, [float("nan"), 1.0], [1.0, 1.0]),  # NaN → kept (NaN > thr)
    (13, 14, [1e308, 1e308], [1e308, 1e308]),  # inf dot → NaN quotient
    (15, 16, [1.0, None, 2.0], [1.0, 1.0, 1.0]),  # null ELEMENT → null norm
    (17, 18, [0.5, -0.5], [0.5, 0.5]),  # below threshold
    (19, 20, [1.0, 1.0], [2.0, 2.0]),  # above threshold
]


@pytest.mark.parametrize("threshold,filter_raw", [
    (0.35, False), (0.35, True), (-10.0, True), (0.0, False),
])
def test_pairs_kernel_matches_hof_on_edges(spark, threshold, filter_raw):
    df = spark.createDataFrame(
        EDGE_ROWS,
        "vec_a bigint, vec_b bigint, emb_a array<double>, emb_b array<double>",
    )
    pairs = _with_norms(df)
    got = [tuple(r) for r in S._pair_cosines_arrow(pairs, threshold, filter_raw).collect()]
    want = [tuple(r) for r in _hof_pairs(pairs, threshold, filter_raw).collect()]
    assert _rows_eq(got, want) and len(want) > 0


def test_pairs_kernel_matches_hof_on_real_pairs(spark, sf_dir):
    e = S.load(spark, sf_dir, "embeddings")
    m = e.select(
        "vec_id", "embedding", F.sqrt(S._dot("embedding", "embedding")).alias("nrm")
    )
    a = m.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = m.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = (
        a.filter(F.col("vec_a") < 64)
        .crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
    )
    for thr, raw in ((0.35, False), (0.35, True), (0.0, False)):
        got = sorted(
            tuple(r) for r in S._pair_cosines_arrow(pairs, thr, raw).collect()
        )
        want = sorted(tuple(r) for r in _hof_pairs(pairs, thr, raw).collect())
        assert got == want and len(want) > 0


def test_pairs_kernel_zero_divisor_raises_like_ansi(spark):
    df = spark.createDataFrame(
        [(7, 8, [0.0, 0.0], [1.0, 1.0])],
        "vec_a bigint, vec_b bigint, emb_a array<double>, emb_b array<double>",
    )
    pairs = _with_norms(df)
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        _hof_pairs(pairs, 0.35, True).collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        S._pair_cosines_arrow(pairs, 0.35, True).collect()


def _cluster_members(spark, rows):
    df = spark.createDataFrame(
        rows, "cluster bigint, vec_id bigint, embedding array<double>"
    )
    return df.select(
        "cluster",
        "vec_id",
        "embedding",
        F.sqrt(S._dot("embedding", "embedding")).alias("nrm"),
    )


def _hof_cluster_pairs(members, threshold):
    """Within-cluster ordered pairs scored by the JVM expression —
    the pre-r16 collect_list shape, used here as the ground truth."""
    a = members.select(
        "cluster",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = members.select(
        "cluster",
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = a.join(b, "cluster").filter(F.col("vec_a") < F.col("vec_b"))
    return _hof_pairs(pairs, threshold, filter_raw=False)


def test_cluster_kernel_matches_hof_on_real_clusters(spark, sf_dir):
    e = S.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    members = (
        e.withColumn("cluster", F.pmod(F.col("vec_id"), F.lit(7)))
        .select(
            "cluster",
            "vec_id",
            "embedding",
            F.sqrt(S._dot("embedding", "embedding")).alias("nrm"),
        )
    )
    for thr in (0.35, 0.0):
        got = sorted(
            tuple(r) for r in S._cluster_pair_cosines(members, thr).collect()
        )
        want = sorted(
            tuple(r) for r in _hof_cluster_pairs(members, thr).collect()
        )
        assert got == want and len(want) > 0


def test_cluster_kernel_edges_match_hof(spark):
    rows = [
        (0, 1, [1.0, 2.0]),
        (0, 2, [1.0, 2.0]),
        (0, 3, None),  # null embedding: its pairs drop
        (0, 4, [1.0, 2.0, 3.0]),  # ragged vs the others: cross-length drops
        (0, 5, [2.0, 4.0, 6.0]),  # pairs with 4 within the 3-dim group
        (0, 6, [float("nan"), 1.0]),  # NaN norm: cosine NaN → kept
        (1, 7, [1.0, 0.0]),  # lone valid member in its cluster: no pairs
        (2, 8, [1.0, None]),  # null element → null norm: drops silently
        (2, 9, [1.0, 1.0]),
    ]
    members = _cluster_members(spark, rows)
    got = sorted(
        tuple(r) for r in S._cluster_pair_cosines(members, -10.0).collect()
    )
    want = sorted(
        tuple(r) for r in _hof_cluster_pairs(members, -10.0).collect()
    )
    assert _rows_eq(got, want) and len(want) > 0


def test_cluster_kernel_zero_norm_raises_like_ansi(spark):
    rows = [(0, 1, [0.0, 0.0]), (0, 2, [1.0, 1.0])]
    members = _cluster_members(spark, rows)
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        _hof_cluster_pairs(members, 0.35).collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        S._cluster_pair_cosines(members, 0.35).collect()


@pytest.mark.parametrize("rows", [
    # zero-norm member whose ONLY partner has a different length: the
    # cross-length NULL dot short-circuits the JVM's ANSI Divide to
    # NULL before the zero-divisor throw, so neither side raises and
    # the result is empty (ADVICE r16 — the old kernel aborted here)
    [(0, 1, [0.0, 0.0]), (0, 2, [1.0, 1.0, 1.0])],
    # two zero-norm members of DIFFERENT lengths: same short-circuit
    [(0, 1, [0.0, 0.0]), (0, 2, [0.0, 0.0, 0.0])],
    # zero-norm member whose same-length partners are all NaN-norm:
    # 0*NaN divisor is NaN, not zero — no throw, NaN cosine rounds
    # to 0.0 on both sides
    [(0, 1, [0.0, 0.0]), (0, 2, [float("nan"), 1.0])],
])
def test_cluster_kernel_cross_length_zero_norm_matches_hof(spark, rows):
    members = _cluster_members(spark, rows)
    want = sorted(
        tuple(r) for r in _hof_cluster_pairs(members, -10.0).collect()
    )
    got = sorted(
        tuple(r) for r in S._cluster_pair_cosines(members, -10.0).collect()
    )
    assert _rows_eq(got, want)


def test_cluster_kernel_zero_norm_same_length_still_raises(spark):
    # the zero-norm member has a cross-length partner AND a same-length
    # zero-norm partner: the same-length pair's 0.0 divisor must still
    # raise on both sides even though the cross-length pair would not
    rows = [
        (0, 1, [0.0, 0.0]),
        (0, 2, [1.0, 1.0, 1.0]),
        (0, 3, [0.0, 0.0]),
    ]
    members = _cluster_members(spark, rows)
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        _hof_cluster_pairs(members, 0.35).collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        S._cluster_pair_cosines(members, 0.35).collect()
