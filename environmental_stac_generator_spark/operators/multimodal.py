"""Multimodal columns: image/audio/video as opaque binary + metadata.

North-star extension (SURVEY §2.11): media travel as ``binary``
columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample are Arrow-batched ``mapInPandas`` kernels.
The image/audio codecs are NOT in this container, so the decode
step is pluggable: :func:`fake_decode` is a deterministic stand-in
and the real decoders raise ``NotImplementedError`` naming the
missing library — the Spark-side plumbing (schemas, batch shapes,
partitioning) is identical and fully tested.

Scale notes: binary payloads dominate row size, so operators avoid
shuffling content — metadata-only projections go first
(column pruning keeps the binary out of exchanges), and per-row
kernels run where the data sits.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents table —
    text bytes stand in for encoded payloads so every pipeline stage
    has real binary data to move."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("content"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
            F.lit(16_000).alias("sample_rate"),
            (F.col("n_chars") % 120 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


DecodeFn = Callable[[bytes, dict], np.ndarray]


def fake_decode(content: bytes, meta: dict) -> np.ndarray:
    """Deterministic 8-dim feature vector from the payload bytes —
    the stand-in for image decode + embedding."""
    digest = hashlib.md5(content or b"").digest()
    raw = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    return (raw.reshape(2, 8).mean(axis=0) / 255.0).astype(np.float32)


def real_image_decode(content: bytes, meta: dict) -> np.ndarray:
    """Real decode path: PIL-decode the payload, resize to a fixed
    8x1 thumbnail strip in grayscale, return the normalized pixel
    vector — same 8-dim float32 feature shape as :func:`fake_decode`
    so the two are drop-in interchangeable. Behind an import guard
    (Pillow is not in this container)."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decode needs Pillow; inject fake_decode in "
            "environments without it"
        ) from exc
    with Image.open(io.BytesIO(content)) as img:
        strip = img.convert("L").resize((8, 1), Image.BILINEAR)
    raw = np.asarray(strip, dtype=np.float32).reshape(8)
    return (raw / 255.0).astype(np.float32)


def default_decode(content: bytes, meta: dict) -> np.ndarray:
    """Real PIL decode when both Pillow and a decodable payload are
    available, deterministic fake features otherwise."""
    try:
        return real_image_decode(content, meta)
    except (NotImplementedError, OSError, ValueError):
        # missing Pillow (NotImplementedError) OR an undecodable /
        # truncated payload (PIL's UnidentifiedImageError is an
        # OSError; some codecs raise ValueError). Deliberately NOT a
        # bare Exception: a programming error in the real decoder
        # (KeyError, MemoryError) must surface, not silently turn
        # every row into fake features.
        return fake_decode(content, meta)


def extract_features(media: DataFrame, decode: DecodeFn = default_decode) -> DataFrame:
    """mapInPandas decode→feature kernel; Arrow batches, no Python
    per-row overhead beyond the codec itself. The default kernel is
    :func:`default_decode` — the REAL PIL path when Pillow can handle
    the payload, the deterministic fake otherwise — so a
    Pillow-equipped environment gets real features without injection
    (previously the fake was the default everywhere, silently
    encoding nothing about the image). A NULL payload yields NULL
    n_bytes/content_hash/features — hashing missing content as
    md5(b'') would make it indistinguishable from a genuinely
    zero-byte payload in downstream dedup."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(c, m).tolist() if c is not None else None
                for c, m in zip(pdf["content"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(c) if c is not None else None for c in pdf["content"]
                    ],
                    "content_hash": [
                        hashlib.md5(c).hexdigest() if c is not None else None
                        for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


ResizeFn = Callable[[bytes, dict, int, int], bytes]


def fake_resize(content: bytes, meta: dict, width: int, height: int) -> bytes:
    """Deterministic stand-in for image resize: resample the payload
    bytes to a width×height grayscale plane by linear striding, so the
    output has the exact byte size a real resize would and still
    depends on every region of the input."""
    src = np.frombuffer(content or b"\x00", dtype=np.uint8)
    meta["format"] = "raw-l8"  # the payload is now a raw gray plane
    idx = np.floor(np.linspace(0, src.size - 1, width * height)).astype(np.int64)
    return src[idx].tobytes()


def real_image_resize(content: bytes, meta: dict, width: int, height: int) -> bytes:
    """Real resize path: PIL-decode, bilinear-resize, re-encode as
    PNG. Behind an import guard (Pillow is not in this container)."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image resize needs Pillow; inject fake_resize in "
            "environments without it"
        ) from exc
    with Image.open(io.BytesIO(content)) as img:
        out = io.BytesIO()
        img.resize((width, height), Image.BILINEAR).save(out, format="PNG")
        meta["format"] = "png"  # re-encoded: the codec changed
        return out.getvalue()


def default_resize(content: bytes, meta: dict, width: int, height: int) -> bytes:
    """Real PIL resize when Pillow can handle the payload,
    deterministic fake bytes otherwise."""
    try:
        return real_image_resize(content, meta, width, height)
    except (NotImplementedError, OSError, ValueError):
        # same narrow fallback as default_decode: decode failures fall
        # back, programming errors surface
        return fake_resize(content, meta, width, height)


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize: ResizeFn = default_resize,
) -> DataFrame:
    """mapInPandas resize kernel over image rows: new payload bytes +
    updated meta (width/height here; the resize fn updates
    meta["format"] when it re-encodes, so the metadata always
    describes the actual payload codec), same MEDIA_SCHEMA out as in
    so resize stages compose. Non-image rows pass through untouched.
    The payload never crosses an exchange — the kernel runs where the
    data sits."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content, out_meta = [], []
            for kind, content, meta in zip(pdf["kind"], pdf["content"], pdf["meta"]):
                meta = dict(meta) if meta is not None else {}
                if kind == "image" and content is not None:
                    content = resize(content, meta, width, height)
                    meta["width"], meta["height"] = width, height
                out_content.append(content)
                out_meta.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out_content,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame index
    (decode itself stays in the pluggable kernel). Pure built-in
    sequence/explode — no data movement of the payload. A video with
    UNKNOWN frame count (null meta.n_frames) emits no rows: explode
    of the null sequence — greatest() skips null operands, so without
    the isNotNull gate it would fabricate frame 0 for a frame that
    may not exist."""
    frames = F.when(
        F.col("meta.n_frames").isNotNull(),
        F.sequence(
            F.lit(0),
            F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
            F.lit(every_n),
        ),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Metadata-only projection — binary column pruned from the scan."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.n_frames").alias("avg_frames"),
    )
