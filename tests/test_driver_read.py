"""Driver-side bootstrap-row fast path (r16, guide §1.2 per-task /
driver work).

`tables.load` stamps the single-file parquet source on the frame it
returns; `similarity._id_range_rows` then serves the tiny
centroid/plane/codebook/probe fetches through a pyarrow
footer-predicate read — no Spark job — instead of a collect. The
fast path must be bit-identical to the collect it replaces, and any
transformed frame (stamp lost) or oversized file must fall back to
the Spark path.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from environmental_stac_generator_spark.queries import similarity as S
from environmental_stac_generator_spark.tables import load


def test_stamp_present_only_on_base_load(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    assert getattr(e, "_envstac_parquet", None)
    derived = e.select("vec_id", "embedding")
    assert getattr(derived, "_envstac_parquet", None) is None


def test_rows_bit_identical_to_collect(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    fast = S._id_range_rows(e, S.N_CENTROIDS)
    slow = sorted(
        e.filter(F.col("vec_id") < S.N_CENTROIDS)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    assert [int(r.vec_id) for r in fast] == [int(r.vec_id) for r in slow]
    for a, b in zip(fast, slow):
        assert list(map(float, a.embedding)) == list(map(float, b.embedding))


def test_ranged_rows_bit_identical(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    lo, hi = S.N_CENTROIDS, S.N_CENTROIDS + S.PQ_K
    fast = S._id_range_rows(e, hi, lo=lo)
    slow = sorted(
        e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    assert [int(r.vec_id) for r in fast] == [int(r.vec_id) for r in slow]
    for a, b in zip(fast, slow):
        assert list(map(float, a.embedding)) == list(map(float, b.embedding))


def test_probe_embedding_matches_head(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    fast = S._probe_embedding(e)
    row = e.filter(F.col("vec_id") == 0).select("embedding").head()
    assert fast is not None and row is not None
    assert list(map(float, fast)) == list(map(float, row[0]))


def test_unstamped_frame_falls_back_to_spark(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = S._id_range_rows(e, S.N_CENTROIDS)  # no stamp -> collect path
    assert len(rows) == S.N_CENTROIDS


def test_oversized_file_falls_back(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(S, "DRIVER_READ_MAX_BYTES", 1)
    e = load(spark, sf_dir, "embeddings")
    rows = S._id_range_rows(e, S.N_CENTROIDS)
    assert len(rows) == S.N_CENTROIDS
