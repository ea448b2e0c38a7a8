"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs over
``mapInPandas``.

The container has no image/audio codecs, so the actual decode step is a
STUB: ``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
a deterministic fake decoder is injected (tests do exactly that). Everything
Spark-side — schemas, batch iteration, partition sizing, UDF signatures,
metadata propagation — is real and tested; swapping in PIL/ffmpeg later
changes only the inner per-batch function.

Scale posture: media blobs are large, so batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` and the repartition knob on
``process_media`` — at 100 TB you size partitions so (rows_per_partition ×
avg_blob_bytes) fits executor memory, and the pipeline never collects blobs
to the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
    ]
)


def decode_image(content: bytes) -> "object":
    """STUB — no image codec in this environment. Replace with PIL/opencv;
    tests inject ``fake_decoder`` instead."""
    raise NotImplementedError("no image codec available in this environment")


def decode_audio(content: bytes) -> "object":
    """STUB — no audio codec in this environment."""
    raise NotImplementedError("no audio codec available in this environment")


def fake_decoder(content: bytes) -> dict:
    """Deterministic stand-in decoder: derives 'pixels' from the bytes
    themselves so tests are reproducible without codecs."""
    if content is None:
        return {"width": 0, "height": 0, "mean_pixel": None}
    n = len(content)
    return {
        "width": max(1, n % 64),
        "height": max(1, (n // 64) % 64 + 1),
        "mean_pixel": (sum(content) / n) if n else 0.0,
    }


def extract_image_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Decode + feature-extract image rows via ``mapInPandas``.

    Arrow ships each partition as pandas batches; the UDF yields one output
    frame per input batch (constant memory in the number of rows). Non-image
    rows are filtered *before* the Python boundary so the JVM-side scan
    prunes them (predicate pushdown still applies to the parquet source).
    """
    decode = decoder or decode_image

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            decoded = [decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": [
                        len(c) if c is not None else 0 for c in pdf["content"]
                    ],
                    "content_sha": [
                        hashlib.sha256(c).hexdigest() if c is not None else None
                        for c in pdf["content"]
                    ],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "mean_pixel": [d["mean_pixel"] for d in decoded],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        per_batch, IMAGE_FEATURES_SCHEMA
    )


def resize_images(
    media: DataFrame,
    target_width: int,
    target_height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize pipeline: same plumbing shape as feature extraction but
    binary→binary, preserving the media schema with updated dimensions."""

    def default_resizer(content: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError("no image codec available in this environment")

    resize = resizer or default_resizer

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [
                resize(c, target_width, target_height) if c is not None else None
                for c in pdf["content"]
            ]
            out["width"] = target_width
            out["height"] = target_height
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        per_batch, MEDIA_SCHEMA
    )


def sample_video_frames(
    media: DataFrame,
    every_ms: int,
    frame_extractor: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Frame sampling: one row in → N frame rows out (flat-map shape).
    Output schema: (media_id, frame_index, frame_ts_ms, frame binary)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def default_extractor(content: bytes, every: int) -> list[bytes]:
        raise NotImplementedError("no video codec available in this environment")

    extract = frame_extractor or default_extractor

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_index": [], "frame_ts_ms": [], "frame": []}
            for _, r in pdf.iterrows():
                frames = extract(r["content"], every_ms)
                for i, frame in enumerate(frames):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_index"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame"].append(frame)
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(
        per_batch, out_schema
    )


def media_summary(media: DataFrame) -> DataFrame:
    """JVM-side metadata aggregation (no Python boundary): per kind, blob
    count/bytes — the cheap pre-flight before any decode pass."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length(F.col("content"))).alias("total_bytes"),
        F.avg(F.length(F.col("content"))).alias("avg_bytes"),
    )


# --------------------------------------------------------------------------
# Oracle-gated binary metadata pass (driver correctness surface)
# --------------------------------------------------------------------------

_MAGIC = {0: "89504E47", 1: "FFD8FFE0", 2: "52494646"}  # png / jpeg / riff

CHUNK_BYTES = 64


def q_multimodal_metadata(spark, sf_dir):
    """Binary-column metadata pass with zero Python: synthesize a typed
    payload per document (magic header + utf8 bytes — the corpus has no
    real media), then sniff the modality from the magic bytes, checksum
    the content, and compute fixed-size chunk offsets. Everything is a
    narrow JVM-side projection over one scan — at 100 TB this is the
    pre-flight metadata pass that runs BEFORE any decode UDF, so the
    expensive Python stage only ever sees blobs already routed by type.
    DuckDB has no blob md5/substring, so both engines hash and sniff the
    HEX encoding of the payload (uppercase in both)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_MAGIC[0]))
        .when(F.col("doc_id") % 3 == 1, F.lit(_MAGIC[1]))
        .otherwise(F.lit(_MAGIC[2]))
    )
    payload = F.concat(F.unhex(magic), F.encode(F.col("text"), "UTF-8"))
    df = docs.select(
        "doc_id",
        F.hex(payload).alias("hx"),
        F.length(payload).alias("n_bytes"),
    )
    modality = (
        F.when(F.substring("hx", 1, 8) == _MAGIC[0], "image/png")
        .when(F.substring("hx", 1, 6) == "FFD8FF", "image/jpeg")
        .when(F.substring("hx", 1, 8) == _MAGIC[2], "audio/wav")
        .otherwise("application/octet-stream")
    )
    return df.select(
        "doc_id",
        modality.alias("modality"),
        "n_bytes",
        F.md5(F.col("hx")).alias("content_md5"),
        F.sequence(
            F.lit(0).cast("long"),
            (F.col("n_bytes") - 1).cast("long"),
            F.lit(CHUNK_BYTES).cast("long"),
        ).alias("chunk_offsets"),
    )


SQL_MULTIMODAL_METADATA = f"""
WITH p AS (
    SELECT doc_id,
           from_hex(CASE doc_id % 3 WHEN 0 THEN '{_MAGIC[0]}'
                                    WHEN 1 THEN '{_MAGIC[1]}'
                                    ELSE '{_MAGIC[2]}' END)
               || encode(text) AS blob
    FROM documents
),
h AS (
    SELECT doc_id, hex(blob) AS hx, octet_length(blob) AS n_bytes FROM p
)
SELECT doc_id,
       CASE WHEN substring(hx, 1, 8) = '{_MAGIC[0]}' THEN 'image/png'
            WHEN substring(hx, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
            WHEN substring(hx, 1, 8) = '{_MAGIC[2]}' THEN 'audio/wav'
            ELSE 'application/octet-stream' END AS modality,
       n_bytes,
       md5(hx) AS content_md5,
       range(0, n_bytes, {CHUNK_BYTES}) AS chunk_offsets
FROM h
"""


QUERIES = {
    "multimodal_metadata": (q_multimodal_metadata, SQL_MULTIMODAL_METADATA),
}
