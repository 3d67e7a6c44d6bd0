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

import numpy as np
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


def _payload_features(b: bytes | None) -> tuple[int, int, int, int]:
    """(n_bytes, crc32, first_byte, entropy_bucket) for one payload.

    The per-byte work runs at C speed: ``zlib.crc32`` is a C call and the
    distinct-byte count uses a numpy boolean scatter over a 256-slot mask
    instead of ``len(set(b))`` (which walks the buffer in the interpreter).
    """
    if not b:  # None and b"" share the sentinel feature row
        return (0, 0, -1, 0)
    arr = np.frombuffer(b, dtype=np.uint8)
    mask = np.zeros(256, dtype=bool)
    mask[arr] = True
    return (len(b), zlib.crc32(b), int(arr[0]), int(mask.sum()) * 8 // 256)


def _feature_batches(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """mapInPandas kernel: per-payload deterministic features, computed on
    whole Arrow batches.

    ONE pass over the batch (a single list comprehension producing all four
    features per payload) instead of one ``Series.map`` per feature — the
    round-1 shape paid 4 interpreted passes per batch and timed 4.3s at
    sf0.1; this shape is bounded by the C-speed crc32/np work per payload.
    """
    for pdf in batches:
        feats = [_payload_features(b) for b in pdf["payload"].to_numpy()]
        out = pd.DataFrame(
            feats, columns=["n_bytes", "crc32", "first_byte", "byte_entropy_bucket"]
        )
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        yield out


def extract_features(media: DataFrame) -> DataFrame:
    """Binary → feature vector via mapInPandas (Arrow-batched)."""
    return media.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


def multimodal_feature_stats(spark, sf_dir: str) -> DataFrame:
    """Registry query: the SQL-computable slice of the payload features —
    byte length and first byte — computed with BUILT-IN expressions only
    (``octet_length`` + hex-decode of the first byte), entirely JVM-side.

    Round 1 routed this through the mapInPandas kernel (4.3s at sf0.1);
    features expressible as column expressions should never cross into
    Python — the Arrow path is reserved for genuinely codec-shaped work
    (``multimodal_full_features``)."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    media = attach_payload(docs)
    first_byte = (
        F.when(F.octet_length("payload") == 0, F.lit(-1))
        # hex() of the payload's first byte → base-16 string → int; exact
        # for any byte value (no ASCII assumption on the Spark side).
        .otherwise(F.conv(F.substring(F.hex("payload"), 1, 2), 16, 10).cast("int"))
    )
    return media.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        first_byte.alias("first_byte"),
    )


def multimodal_full_features(spark, sf_dir: str) -> DataFrame:
    """Registry query: full feature set including CRC32 and entropy
    bucket. Value-hash-checked since r6: the DuckDB twin reproduces
    zlib.crc32 as a table-driven list_reduce fold over the payload bytes
    (oracles.MULTIMODAL_FULL_FEATURES_SQL), so even the Arrow-kernel
    path is held to exact cross-engine equality."""
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents)
    return extract_features(attach_payload(docs))


# dHash parameters: 8×8 gradient grid → 64-bit hash, banded 4×16 bits for
# LSH-style candidate bucketing (same banding math as text SimHash).
DHASH_W, DHASH_H = 8, 8
DHASH_BANDS = 4


def _dhash_batches(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """mapInPandas kernel: difference-hash per payload over the decoded
    pixel grid. Decode is the deterministic fake (the codec is the stubbed
    part — see module docstring); the hash math is the real dHash:
    adjacent-pixel gradient signs packed into a 64-bit integer, computed
    with numpy over the whole grid per payload (no per-pixel Python)."""
    for pdf in batches:
        hashes = []
        for b in pdf["payload"].to_numpy():
            px = fake_decode(b, DHASH_W + 1, DHASH_H)
            if not px:
                hashes.append(-1)
                continue
            grid = np.asarray(px, dtype=np.int16).reshape(DHASH_H, DHASH_W + 1)
            bits = (grid[:, 1:] > grid[:, :-1]).ravel()
            packed = bits @ (1 << np.arange(64, dtype=np.uint64))
            # wrap to signed 64 (top gradient bit set → negative), the
            # same two's-complement convention as Spark's xxhash64
            hashes.append(int(np.uint64(packed).astype(np.int64)))
        yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(), "dhash": hashes})


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("dhash", LongType(), True),
    ]
)


def multimodal_phash_buckets(spark, sf_dir: str) -> DataFrame:
    """Perceptual near-dup candidates for image payloads: dHash via
    Arrow-batched Python, then 4×16-bit band buckets JVM-side — two
    payloads sharing any band are candidates (≤16 differing gradient bits
    guarantees a shared band, the SimHash pigeonhole argument applied to
    pixels).

    Scale shape: the Python stage is a map-only Arrow pass (hash per
    payload); banding and bucket-joins are built-in integer ops.
    Hash-checked (r6): the fake decode + gradient pack is pure integer
    arithmetic, so the DuckDB twin (hex-string byte probe → HUGEINT bit
    pack) is exact; band math additionally pinned by
    tests/test_multimodal.py.
    """
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).na.drop("any")
    media = attach_payload(docs)
    hashed = media.select("doc_id", "payload").mapInPandas(
        _dhash_batches, schema=DHASH_SCHEMA
    )
    return hashed.select(
        "doc_id",
        "dhash",
        *[
            F.shiftrightunsigned("dhash", 16 * band)
            .bitwiseAND(F.lit(0xFFFF))
            .alias(f"band_{band}")
            for band in range(DHASH_BANDS)
        ],
    ).orderBy("doc_id")


# --- Video frame sampling ---------------------------------------------------

N_FRAMES = 4

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("frame_no", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("frame_md5", StringType(), True),
    ]
)


def _frame_batches(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """mapInPandas kernel: strided frame extraction + per-frame digest.

    One interpreted pass per payload producing all N_FRAMES rows; the
    per-frame md5 is a C call. Explodes batch rows 1→N_FRAMES, which Arrow
    handles as a plain longer batch — no Spark-side explode needed."""
    import hashlib

    for pdf in batches:
        rows = []
        for doc_id, b in zip(pdf["doc_id"].to_numpy(), pdf["payload"].to_numpy()):
            for fno, fb in enumerate(frame_sample(bytes(b), N_FRAMES)):
                rows.append((doc_id, fno, len(fb), hashlib.md5(fb).hexdigest()))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "n_bytes", "frame_md5"])


def multimodal_frame_sample(spark, sf_dir: str) -> DataFrame:
    """Registry query: deterministic 'video' frame sampling over binary
    payloads (SURVEY §2b multimodal: the frame-sample verb).

    The payload stands in for an encoded clip; ``frame_sample`` takes
    N_FRAMES fixed-stride slices (the access pattern of a real keyframe
    sampler — strided range reads of one blob) and the kernel emits one
    row per frame with its byte length and md5. Because the fixture
    payload is the utf-8 text, the whole operator is oracle-checkable:
    DuckDB reproduces the slice arithmetic with substring + md5 — the
    Arrow plumbing (binary columns in, 1→N row explosion inside the
    kernel, typed schema out) is exactly what a codec-backed sampler
    uses, with only the decode call swapped.

    Scale shape: map-only Arrow pass, no shuffle; output is 4 narrow rows
    per payload (digests, not bytes), so the stage SHRINKS data ~stride×.
    """
    docs = (
        ensure_parallelism(load_tables(spark, sf_dir).documents)
        .na.drop(subset=["doc_id", "text"])
        .where(F.length("text") > 0)
    )
    media = attach_payload(docs)
    return media.select("doc_id", "payload").mapInPandas(
        _frame_batches, schema=FRAME_SCHEMA
    )


N_AUDIO_FRAMES = 8  # fixed frame grid per clip (like N_FRAMES for video)

AUDIO_SCHEMA = (
    "doc_id long, frame_no int, n_samples long, rms double, peak int"
)


def _audio_energy_batches(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """mapInPandas kernel: interpret each payload as 8-bit PCM samples and
    emit per-frame RMS energy + peak — the audio-summarization analog of
    the video frame sampler. All per-sample math is vectorized numpy
    (square/mean over a strided view); the interpreter touches only
    whole payloads."""
    for pdf in batches:
        doc_ids, frames, ns, rms, peak = [], [], [], [], []
        for doc_id, b in zip(pdf["doc_id"].to_numpy(), pdf["payload"].to_numpy()):
            if not b:
                continue
            arr = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
            stride = max(len(arr) // N_AUDIO_FRAMES, 1)
            for f in range(N_AUDIO_FRAMES):
                seg = arr[f * stride : (f + 1) * stride]
                if len(seg) == 0:
                    break
                doc_ids.append(doc_id)
                frames.append(f)
                ns.append(len(seg))
                rms.append(round(float(np.sqrt(np.mean(seg * seg))), 6))
                peak.append(int(seg.max()))
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "frame_no": frames,
                "n_samples": ns,
                "rms": rms,
                "peak": peak,
            }
        )


def multimodal_audio_energy(spark, sf_dir: str) -> DataFrame:
    """Registry query: per-frame audio energy over the opaque payload
    column — the audio rung of the multimodal ladder (image features /
    video frame sampling / audio framing share the same Spark plumbing:
    binary column + typed metadata + Arrow-batched kernel; a real
    pipeline swaps the PCM interpretation for a soundfile/ffmpeg decode
    behind the same import gate as ``decode_image``).

    Hash-checked (r6): frame sums of squared bytes stay below 2^53, so
    the float64 sum is exact under any accumulation order and the DuckDB
    byte-extraction twin reproduces rms/peak bit-for-bit;
    numpy-reference equality additionally pinned in
    tests/test_multimodal.py.
    """
    docs = ensure_parallelism(load_tables(spark, sf_dir).documents).where(
        F.col("doc_id").isNotNull()
    )
    media = attach_payload(docs)
    return (
        media.select("doc_id", "payload")
        .mapInPandas(_audio_energy_batches, schema=AUDIO_SCHEMA)
        .orderBy("doc_id", "frame_no")
    )
