"""Multimodal column plumbing (SURVEY §2b): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Python.

Spark's multimodal story at 100 TB: payloads live as binary columns (or
pointers to object-store blobs) beside a typed metadata struct; decode /
feature-extraction / resize / frame-sampling run as ``mapInPandas`` over
Arrow batches, so Python touches whole columnar chunks, never row-by-row.

The real decode step needs image/audio codecs (Pillow/ffmpeg) that are NOT
in this container — it is stubbed behind an import-try that raises a
clearly-marked NotImplementedError, with a deterministic fake used by
tests and fixtures. Everything Spark-side — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from aws_saas_etl_spark.catalog import ensure_parallelism, load_tables

# Typed metadata carried beside every payload (the "columns" a catalog
# would index without touching bytes).
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("format", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("crc32", LongType(), True),
        StructField("first_byte", IntegerType(), True),
        StructField("byte_entropy_bucket", IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires a codec library not present here.

    STUB: gated behind an import-try per the build contract; the Spark
    plumbing around it (binary column → mapInPandas batches) is real.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed in this "
            "environment; use fake_decode() for deterministic tests"
        ) from exc
    import io

    import PIL.Image as Image

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def fake_decode(payload: bytes, width: int = 4, height: int = 4) -> list[int]:
    """Deterministic fake decode: a width×height 'pixel' grid derived from
    a rolling byte hash — stable stand-in for tests and fixtures."""
    if payload is None:
        return []
    n = max(len(payload), 1)
    return [payload[(i * 2654435761) % n] for i in range(width * height)]


def frame_sample(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """Deterministic 'video frame' sampling: fixed-stride byte slices —
    the access pattern (strided reads of one blob) is what a real frame
    sampler does; the codec is the stubbed part."""
    if payload is None or len(payload) == 0:
        return []
    stride = max(len(payload) // n_frames, 1)
    return [payload[i * stride : (i + 1) * stride] for i in range(n_frames)]


def attach_payload(docs: DataFrame) -> DataFrame:
    """Build the multimodal shape from the documents fixture: utf-8 bytes
    of the text as the opaque payload + a typed metadata struct. (In a
    real deployment the payload column comes from the ingest system.)"""
    payload = F.encode(F.col("text"), "UTF-8").cast(BinaryType())
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake/raw").alias("format"),
        F.octet_length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("media_meta"))


def _feature_batches(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """mapInPandas kernel: per-payload deterministic features, computed on
    whole Arrow batches (one Python call per ~10k rows, not per row)."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                "crc32": payloads.map(
                    lambda b: zlib.crc32(b) if b is not None else 0
                ),
                "first_byte": payloads.map(
                    lambda b: int(b[0]) if b else -1
                ),
                "byte_entropy_bucket": payloads.map(
                    lambda b: (len(set(b)) * 8 // 256) if b else 0
                ),
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Binary → feature vector via mapInPandas (Arrow-batched)."""
    return media.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


def multimodal_feature_stats(spark, sf_dir: str) -> DataFrame:
    """Registry query: end-to-end multimodal plumbing — binary payloads →
    Arrow-batched feature extraction → per-document features (oracle
    checks the SQL-computable subset: byte lengths)."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    feats = extract_features(attach_payload(docs))
    # No orderBy: a sort above mapInPandas would range-sample the plan and
    # execute the Python stage twice; the driver compare is order-blind.
    return feats.select("doc_id", "n_bytes", "first_byte")


def multimodal_full_features(spark, sf_dir: str) -> DataFrame:
    """Registry query (rows-only): full feature set including CRC32 and
    entropy bucket — not SQL-expressible in the oracle, verified by shape."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return extract_features(attach_payload(docs))
