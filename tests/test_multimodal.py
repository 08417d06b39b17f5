"""Multimodal plumbing: binary columns + metadata struct +
mapInPandas feature extraction (decode stubbed — see
operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators.multimodal import (
    attach_metadata,
    decode_image_features,
    sample_frames,
)


def _media(spark):
    # binary payloads synthesized from document text (the container has
    # no image libs; payload bytes are what matters to the plumbing)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    raw = docs.select("doc_id", F.col("text").cast("binary").alias("blob"))
    return attach_metadata(raw, "doc_id", "blob", mime="image/fake")


def test_attach_metadata_schema(spark):
    media = _media(spark)
    assert media.columns == ["media_id", "payload", "meta"]
    row = media.first()
    assert row.meta.mime == "image/fake"
    assert row.meta.n_bytes == len(bytes(row.payload))


def test_decode_features_deterministic(spark):
    media = _media(spark)
    feats = decode_image_features(media, batch_size=8)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 20
    # deterministic: second run identical
    rows2 = {r.media_id: r for r in decode_image_features(media, batch_size=8).collect()}
    for k in rows:
        assert rows[k] == rows2[k]
    # features consistent with payload bytes
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for k, r in rows.items():
        assert r.n_bytes == len(payloads[k])
        assert r.checksum == sum(payloads[k]) % (2**31)
        assert 0.0 <= r.brightness <= 1.0


def test_sample_frames_offsets(spark):
    media = _media(spark)
    frames = sample_frames(media, every_n_bytes=50)
    got = frames.groupBy("media_id").count().collect()
    sizes = {r.media_id: r.meta.n_bytes for r in media.select("media_id", "meta").collect()}
    for r in got:
        expected = (max(sizes[r.media_id] - 1, 0)) // 50 + 1
        assert r["count"] == expected


def test_resize_images_preserves_layout(spark):
    from data_lakehouse_platform_spark.operators.multimodal import resize_images

    media = _media(spark)
    resized = resize_images(media, width=8, height=4, batch_size=8)
    rows = {r.media_id: r for r in resized.collect()}
    assert set(rows) == {r.media_id for r in media.select("media_id").collect()}
    for r in rows.values():
        assert len(bytes(r.payload)) == 32
        assert r.meta.width == 8 and r.meta.height == 4
        assert r.meta.n_bytes == 32
    # composes: resized output feeds the decode stage unchanged
    from data_lakehouse_platform_spark.operators.multimodal import (
        decode_image_features,
    )

    feats = decode_image_features(resized, batch_size=8).collect()
    assert all(f.n_bytes == 32 for f in feats)
