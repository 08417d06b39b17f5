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


def test_rgray_real_decode_features(spark):
    """RGRAY is genuinely decoded: features computed by Spark match
    numpy computed locally on the same pixel arrays, bit for bit."""
    import numpy as np

    from data_lakehouse_platform_spark.operators.multimodal import (
        attach_metadata,
        encode_rgray,
        gray_features,
    )

    imgs = {
        1: np.arange(64, dtype=np.uint8).reshape(8, 8),
        2: np.full((4, 16), 200, dtype=np.uint8),
        3: (np.indices((6, 10)).sum(axis=0) * 12 % 256).astype(np.uint8),
    }
    df = spark.createDataFrame(
        [(i, bytearray(encode_rgray(a))) for i, a in imgs.items()],
        "media_id long, payload binary",
    )
    media = attach_metadata(df, "media_id", "payload", "image/x-rgray")
    got = {r["media_id"]: r for r in gray_features(media).collect()}

    for i, a in imgs.items():
        f = a.astype(np.float64)
        assert got[i]["width"] == a.shape[1] and got[i]["height"] == a.shape[0]
        assert got[i]["mean_brightness"] == f.mean()
        assert got[i]["std_brightness"] == f.std()
        assert got[i]["edge_energy"] == np.abs(np.diff(f, axis=1)).mean()


def test_rgray_resize_then_decode_composes(spark):
    """Block-mean resize halves dimensions, stays a valid RGRAY
    payload, and the resized pixels equal the local numpy block
    means."""
    import numpy as np

    from data_lakehouse_platform_spark.operators.multimodal import (
        attach_metadata,
        decode_rgray,
        encode_rgray,
        gray_features,
        resize_rgray,
    )

    a = (np.indices((8, 12)).sum(axis=0) * 21 % 256).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_rgray(a)))], "media_id long, payload binary"
    )
    media = attach_metadata(df, "media_id", "payload", "image/x-rgray")
    small = resize_rgray(media, factor=2)

    row = small.collect()[0]
    assert row["meta"]["width"] == 6 and row["meta"]["height"] == 4
    got_img = decode_rgray(bytes(row["payload"]))
    want = a.reshape(4, 2, 6, 2).mean(axis=(1, 3)).round().astype(np.uint8)
    assert (got_img == want).all()

    # Composes: features over the resized stream still decode for real.
    feats = gray_features(small).collect()[0]
    assert feats["width"] == 6 and feats["mean_brightness"] == want.astype(np.float64).mean()


def test_rgray_corrupt_payload_fails_loudly(spark):
    """Truncated or wrong-magic payloads raise instead of decoding to
    garbage — media DQ mirrors the engine's fail-loud posture."""
    import pytest as _pytest

    from data_lakehouse_platform_spark.operators.multimodal import decode_rgray, encode_rgray
    import numpy as np

    good = encode_rgray(np.zeros((2, 2), dtype=np.uint8))
    with _pytest.raises(ValueError, match="truncated"):
        decode_rgray(good[:-1])
    with _pytest.raises(ValueError, match="not an RGRAY"):
        decode_rgray(b"JPEG" + good)


def test_rgray_phash_and_hamming_pairs(spark):
    """Perceptual hashing: a lightly-perturbed image hashes within a
    few bits of its original while unrelated images stay far; the
    banded hamming join finds exactly the brute-force pair set
    (pigeonhole completeness for max_hamming <= 3)."""
    import itertools

    import numpy as np

    from data_lakehouse_platform_spark.operators.multimodal import (
        attach_metadata,
        encode_rgray,
        phash_near_pairs,
        phash_rgray,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    tweaked = base.copy()
    tweaked[0, 0:3] ^= 255  # tiny local edit -> same perceptual hash region
    unrelated1 = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    unrelated2 = (np.indices((32, 32)).sum(axis=0) * 9 % 256).astype(np.uint8)
    imgs = {1: base, 2: tweaked, 3: unrelated1, 4: unrelated2}

    df = spark.createDataFrame(
        [(i, bytearray(encode_rgray(a))) for i, a in imgs.items()],
        "media_id long, payload binary",
    )
    media = attach_metadata(df, "media_id", "payload", "image/x-rgray")
    hashes = phash_rgray(media)
    hv = {r["media_id"]: r["phash"] for r in hashes.collect()}
    assert len(hv) == 4

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(hv[1], hv[2]) <= 3  # near-dup survives the edit
    assert ham(hv[1], hv[3]) > 3 and ham(hv[1], hv[4]) > 3

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(hashes, max_hamming=3).collect()
    }
    want = {
        (a, b): ham(hv[a], hv[b])
        for a, b in itertools.combinations(sorted(imgs), 2)
        if ham(hv[a], hv[b]) <= 3
    }
    assert got == want and (1, 2) in got


def test_rwav_real_audio_features(spark):
    """RWAV audio is genuinely decoded: RMS/peak/zero-crossings match
    numpy computed locally on the same samples, bit for bit; corrupt
    payloads fail loudly."""
    import numpy as np
    import pytest as _pytest

    from data_lakehouse_platform_spark.operators.multimodal import (
        attach_metadata,
        audio_features,
        decode_rwav,
        encode_rwav,
    )

    t = np.arange(4000)
    sigs = {
        1: (np.sin(2 * np.pi * 440 * t / 16000) * 12000).astype(np.int16),
        2: np.zeros(1600, dtype=np.int16),  # silence
        3: np.array([32767, -32768] * 500, dtype=np.int16),  # clipping square
    }
    df = spark.createDataFrame(
        [(i, bytearray(encode_rwav(a, 16000))) for i, a in sigs.items()],
        "media_id long, payload binary",
    )
    media = attach_metadata(df, "media_id", "payload", "audio/x-rwav")
    got = {r["media_id"]: r for r in audio_features(media).collect()}

    for i, a in sigs.items():
        f = a.astype(np.float64)
        assert got[i]["sample_rate"] == 16000 and got[i]["n_samples"] == a.size
        assert got[i]["rms"] == float(np.sqrt((f * f).mean()))
        assert got[i]["peak"] == int(np.abs(f).max())
    assert got[2]["rms"] == 0.0 and got[3]["zero_crossings"] == 999

    with _pytest.raises(ValueError, match="truncated RWAV"):
        decode_rwav(bytearray(encode_rwav(sigs[1]))[:-3])


def test_rwav_frame_sampling(spark):
    """Frame splitting: full coverage with a kept tail, per-frame RMS
    matches numpy on each window."""
    import numpy as np

    from data_lakehouse_platform_spark.operators.multimodal import (
        attach_metadata,
        audio_frames,
        encode_rwav,
    )

    x = (np.arange(2500) % 100 * 300 - 15000).astype(np.int16)
    df = spark.createDataFrame(
        [(7, bytearray(encode_rwav(x)))], "media_id long, payload binary"
    )
    media = attach_metadata(df, "media_id", "payload", "audio/x-rwav")
    frames = sorted(
        (r["frame_id"], r["start_sample"], r["n_samples"], r["frame_rms"])
        for r in audio_frames(media, frame_samples=1024).collect()
    )
    assert [(f[0], f[1], f[2]) for f in frames] == [
        (0, 0, 1024),
        (1, 1024, 1024),
        (2, 2048, 452),
    ]
    f64 = x.astype(np.float64)
    for fid, start, n, rms in frames:
        w = f64[start : start + 1024]
        assert rms == float(np.sqrt((w * w).mean()))


def test_rvid_roundtrip_and_features(spark):
    """RVID videos are genuinely decoded: whole-video features match
    numpy computed locally on the same frame arrays, bit for bit, and
    corrupt payloads fail loudly."""
    import numpy as np
    import pytest as _pytest

    from data_lakehouse_platform_spark.operators.multimodal import (
        decode_rvid,
        encode_rvid,
        video_features,
    )

    rng = np.random.default_rng(7)
    vids = {
        1: rng.integers(0, 256, size=(9, 6, 8), dtype=np.uint8),
        2: np.zeros((1, 4, 4), dtype=np.uint8),  # single black frame
    }
    fps, vb = decode_rvid(encode_rvid(vids[1], fps=12.5))
    assert fps == 12.5 and np.array_equal(vb, vids[1])
    with _pytest.raises(ValueError, match="truncated"):
        decode_rvid(encode_rvid(vids[1])[:-3])

    df = spark.createDataFrame(
        [(i, bytearray(encode_rvid(a, fps=10.0))) for i, a in vids.items()],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in video_features(df).collect()}
    for i, a in vids.items():
        f = a.astype(np.float64)
        assert got[i]["n_frames"] == a.shape[0]
        assert got[i]["width"] == a.shape[2] and got[i]["height"] == a.shape[1]
        assert got[i]["mean_brightness"] == f.mean()
        want_motion = (
            float(np.abs(np.diff(f, axis=0)).mean()) if a.shape[0] > 1 else 0.0
        )
        assert got[i]["motion_energy"] == want_motion
        assert got[i]["duration_s"] == a.shape[0] / 10.0


def test_rvid_frame_sampling_composes_with_image_kernels(spark):
    """Frame sampling keeps every k-th frame with exact timestamps and
    emits RGRAY payloads that flow straight into the image kernels —
    video → sampled frames → gray_features is one composed pipeline."""
    import numpy as np

    from data_lakehouse_platform_spark.operators.multimodal import (
        decode_rgray,
        encode_rvid,
        gray_features,
        sample_rvid_frames,
    )
    from pyspark.sql import functions as F

    frames = np.stack(
        [np.full((4, 6), 10 * i, dtype=np.uint8) for i in range(10)]
    )
    df = spark.createDataFrame(
        [(5, bytearray(encode_rvid(frames, fps=5.0)))],
        "media_id long, payload binary",
    )
    sampled = sample_rvid_frames(df, every_k=3).collect()
    assert [r["frame_id"] for r in sampled] == [0, 3, 6, 9]
    assert [r["t_offset_s"] for r in sampled] == [0.0, 0.6, 1.2, 1.8]
    # each payload is a decodable RGRAY of the right frame
    for r in sampled:
        img = decode_rgray(bytes(r["payload"]))
        assert np.array_equal(img, frames[r["frame_id"]])

    # compose: sampled frames (keyed by frame_id as media_id) feed the
    # image feature kernel unchanged
    as_media = sample_rvid_frames(df, every_k=3).select(
        F.col("frame_id").cast("long").alias("media_id"), "payload"
    )
    feats = {r["media_id"]: r for r in gray_features(as_media).collect()}
    for fid in (0, 3, 6, 9):
        assert feats[fid]["mean_brightness"] == float(10 * fid)


def test_phash_small_images_not_all_zero(spark):
    """Images smaller than the hash grid must NOT all hash to 0 (the
    empty-block NaN path): distinct tiny images get distinct hashes."""
    import numpy as np
    from data_lakehouse_platform_spark.operators.multimodal import (
        encode_rgray,
        phash_rgray,
    )

    a = (np.arange(24, dtype=np.uint8) * 10).reshape(4, 6)
    b = np.flipud(np.fliplr(a)).copy()
    media = spark.createDataFrame(
        [(1, bytearray(encode_rgray(a))), (2, bytearray(encode_rgray(b)))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r.phash for r in phash_rgray(media).collect()}
    assert got[1] != 0 and got[2] != 0
    assert got[1] != got[2]


def test_audio_frames_all_empty_batch(spark):
    """A batch whose payloads are all zero-sample audio must yield an
    empty, correctly-typed result — not an Arrow schema crash."""
    from data_lakehouse_platform_spark.operators.multimodal import (
        audio_frames,
        encode_rwav,
    )

    media = spark.createDataFrame(
        [(1, bytearray(encode_rwav([]))), (2, bytearray(encode_rwav([])))],
        "media_id long, payload binary",
    )
    got = audio_frames(media)
    assert got.count() == 0
    assert "frame_rms" in got.columns
