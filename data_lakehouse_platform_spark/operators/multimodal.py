"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

The decode step is STUBBED (Pillow/ffmpeg/torchaudio are not in this
container): ``decode_image_features`` computes deterministic
byte-level pseudo-features so the Spark-side plumbing — schema
evolution, batch iteration, partition sizing — is real and tested.
Swap ``_fake_decode`` for a real decoder and nothing else changes.

Scale notes:
* binary payloads ride in parquet pages; NEVER collect them — every
  transform is mapInPandas with bounded Arrow batches
  (spark.sql.execution.arrow.maxRecordsPerBatch caps batch memory;
  set it low (e.g. 64) for multi-MB payload columns).
* metadata (mime, width, height, duration) lives in a sibling struct
  column so filters/pruning run without touching bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<mime:string, width:int, height:int, n_bytes:long>"
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, checksum long, "
    "width int, height int, brightness double"
)



def _slices(batches: Iterator[pd.DataFrame], n: int) -> Iterator[pd.DataFrame]:
    """Bound each kernel's Python-side working set: iterate incoming
    Arrow batches in <= n-row slices. The Arrow batch itself is sized
    by the SESSION's spark.sql.execution.arrow.maxRecordsPerBatch —
    deliberately not touched here, because a conf set at DataFrame-
    build time is read once at execution and would leak across
    composed stages (video -> frames -> image dedup) and unrelated
    queries. Cap it session-wide when payloads are multi-MB."""
    for pdf in batches:
        for i in range(0, len(pdf), n):
            yield pdf.iloc[i : i + n]

def attach_metadata(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Wrap raw binary into the typed media layout. Width/height are
    unknown until decode; n_bytes comes free from the payload."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(payload_col).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decoder. Replace with
    PIL.Image.open(...) in a container that has it; the mapInPandas
    plumbing around it is identical."""
    n = len(payload)
    checksum = sum(payload) % (2**31)
    return {
        "n_bytes": n,
        "checksum": checksum,
        "width": (n % 64) + 1,  # fake dimensions derived from content
        "height": (n % 48) + 1,
        "brightness": (checksum % 255) / 255.0,
    }


def decode_image_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _slices(batches, batch_size):
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    # No repartition: payloads ride the existing parquet splits into a
    # map-only kernel — a shuffle here would move every payload byte
    # across the network for nothing. And no session-conf mutation:
    # Arrow batch sizing belongs to the caller's session (see module
    # docstring), since a conf set at BUILD time would be read once at
    # execution and leak across composed stages and later queries.
    return media.mapInPandas(decode, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<mime:string, width:int, height:int, n_bytes:long>"
)


def resize_images(
    media: DataFrame, width: int, height: int, batch_size: int = 64
) -> DataFrame:
    """Arrow-batched 'resize' preserving the media layout (payload +
    typed metadata), so resize stages compose with decode/sample in one
    pipeline.

    The pixel kernel is STUBBED deterministically (no Pillow in this
    container): output payload is the input truncated/cycled to
    width*height bytes — a real resampler drops in without touching
    the mapInPandas plumbing, output schema, or metadata handling.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in _slices(batches, batch_size):
            payloads = []
            for p in pdf["payload"]:
                b = bytes(p)
                resized = (b * (target // max(len(b), 1) + 1))[:target] if b else b"\x00" * target
                payloads.append(resized)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "payload": payloads,
                    "meta": [
                        {
                            "mime": m["mime"] if isinstance(m, dict) else m[0],
                            "width": width,
                            "height": height,
                            "n_bytes": target,
                        }
                        for m in pdf["meta"]
                    ],
                }
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' stub: emits one row per every_n_bytes offset of
    each payload (stands in for video frame extraction — the explode
    shape, offsets, and per-frame metadata are the real plumbing)."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_bytes") - 1, F.lit(0)),
                F.lit(every_n_bytes),
            )
        ).alias("frame_offset"),
    )


# ----------------------------------------------------------------------------
# RGRAY: a real (library-free) raw grayscale image path
# ----------------------------------------------------------------------------
# The stubs above stand in for Pillow/ffmpeg formats. RGRAY is a
# complete, genuinely-decoded format this container CAN process:
# b"RGRAY" + width(uint32 BE) + height(uint32 BE) + width*height uint8
# pixels. encode/decode/resize below do real numpy pixel math inside
# the same Arrow-batched mapInPandas plumbing — proving the multimodal
# path end-to-end, not just its schemas.

_RGRAY_MAGIC = b"RGRAY"

GRAY_FEATURE_SCHEMA = (
    "media_id long, width int, height int, "
    "mean_brightness double, std_brightness double, edge_energy double"
)


def encode_rgray(pixels) -> bytes:
    """numpy uint8 (h, w) array -> RGRAY payload bytes."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w = a.shape
    return (
        _RGRAY_MAGIC
        + int(w).to_bytes(4, "big")
        + int(h).to_bytes(4, "big")
        + a.tobytes()
    )


def decode_rgray(payload: bytes):
    """RGRAY payload -> numpy uint8 (h, w) array. Raises on bad magic
    or truncated pixels — corrupt media must fail loudly, not decode
    to garbage."""
    import numpy as np

    if payload[:5] != _RGRAY_MAGIC:
        raise ValueError("not an RGRAY payload")
    w = int.from_bytes(payload[5:9], "big")
    h = int.from_bytes(payload[9:13], "big")
    pix = payload[13:]
    if len(pix) != w * h:
        raise ValueError(f"truncated RGRAY: expected {w * h} pixels, got {len(pix)}")
    return np.frombuffer(pix, dtype=np.uint8).reshape(h, w)


def gray_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """REAL feature extraction over RGRAY payloads: mean/std
    brightness and horizontal edge energy (mean |dI/dx|), computed
    with numpy per Arrow batch. Same plumbing as the stubbed decoder
    — swapping the kernel changed nothing upstream or downstream."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _slices(batches, batch_size):
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_rgray(bytes(p)).astype(np.float64)
                h, w = img.shape
                edge = float(np.abs(np.diff(img, axis=1)).mean()) if w > 1 else 0.0
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "mean_brightness": float(img.mean()),
                        "std_brightness": float(img.std()),
                        "edge_energy": edge,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=GRAY_FEATURE_SCHEMA)


def resize_rgray(media: DataFrame, factor: int, batch_size: int = 64) -> DataFrame:
    """REAL block-mean downsample by an integer factor (dimensions
    must divide evenly — enforced, not silently cropped). Payloads
    stay RGRAY, metadata updates, and the stage composes with
    gray_features exactly like the stubbed pipeline."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _slices(batches, batch_size):
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                img = decode_rgray(bytes(p))
                h, w = img.shape
                if h % factor or w % factor:
                    raise ValueError(f"{h}x{w} not divisible by {factor}")
                small = (
                    img.reshape(h // factor, factor, w // factor, factor)
                    .mean(axis=(1, 3))
                    .round()
                    .astype(np.uint8)
                )
                payloads.append(encode_rgray(small))
                mime = m["mime"] if isinstance(m, dict) else m[0]
                metas.append(
                    {
                        "mime": mime,
                        "width": w // factor,
                        "height": h // factor,
                        "n_bytes": len(payloads[-1]),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


# ----------------------------------------------------------------------------
# Perceptual hashing (block-mean pHash) + hamming near-dup pairs
# ----------------------------------------------------------------------------

PHASH_SCHEMA = "media_id long, phash long"


def phash_rgray(media: DataFrame, hash_size: int = 8, batch_size: int = 64) -> DataFrame:
    """REAL block-mean perceptual hash over RGRAY payloads: the image
    is area-averaged onto a hash_size x hash_size grid (np.array_split
    handles non-divisible dimensions), each cell compares against the
    grid MEDIAN, and the 64 bits pack into one int64. Visually-similar
    images (noise, small edits, re-encodes) land within a few bits —
    the image twin of SimHash for text. Runs in the same Arrow-batched
    mapInPandas plumbing as the other RGRAY kernels."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _slices(batches, batch_size):
            ids, hashes = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_rgray(bytes(p)).astype(np.float64)
                # Upsample tiny images by pixel repetition so every
                # grid cell is non-empty: array_split of a dimension
                # smaller than hash_size yields EMPTY blocks whose
                # mean is NaN, which silently hashed every sub-grid
                # image to 0 (all mutual hamming-0 "duplicates").
                # Repetition preserves block-mean semantics exactly.
                if img.shape[0] < hash_size:
                    img = np.repeat(img, -(-hash_size // img.shape[0]), axis=0)
                if img.shape[1] < hash_size:
                    img = np.repeat(img, -(-hash_size // img.shape[1]), axis=1)
                rows = np.array_split(img, hash_size, axis=0)
                cells = np.array(
                    [
                        [blk.mean() for blk in np.array_split(r, hash_size, axis=1)]
                        for r in rows
                    ]
                )
                bits = (cells > np.median(cells)).flatten()
                h = 0
                for b in bits:
                    h = (h << 1) | int(b)
                # reinterpret the uint64 bit pattern as signed int64
                ids.append(int(mid))
                hashes.append(int(np.uint64(h).astype(np.int64)))
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Hamming near-dup pairs over 64-bit perceptual hashes WITHOUT a
    cross join: split each hash into 4 x 16-bit bands and self-join on
    (band_index, band_value). By pigeonhole, two hashes within
    max_hamming <= 3 bits differ in at most 3 bands, so at least one
    band matches exactly — candidate generation is complete, and the
    final bit_count(xor) filter is exact. Same banded-LSH shape the
    text MinHash path uses (operators/dedup.py), so the shuffle keys
    on bounded-width band buckets at any scale."""
    from pyspark.sql import functions as F

    n_bands, band_bits = 4, 16
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"pigeonhole completeness needs max_hamming <= {n_bands - 1}"
        )
    mask = (1 << band_bits) - 1
    banded = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"CAST(shiftrightunsigned(phash, {band_bits * b}) & {mask} AS INT)"
                        ).alias("bkey"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "phash", "bk.band", "bk.bkey")
    a = banded.select(
        F.col("band"),
        F.col("bkey"),
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("phash_a"),
    )
    b = banded.select(
        F.col("band").alias("band_b"),
        F.col("bkey").alias("bkey_b"),
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("phash_b"),
    )
    return (
        a.join(
            b,
            (a.band == b.band_b) & (a.bkey == b.bkey_b) & (a.id_a < b.id_b),
        )
        .select("id_a", "id_b", "phash_a", "phash_b")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(phash_a ^ phash_b)"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ----------------------------------------------------------------------------
# RWAV: a real (library-free) raw-PCM audio path — the audio twin of
# RGRAY. b"RWAV" + sample_rate(uint32 BE) + n_samples(uint32 BE) +
# int16 LE samples. decode/features/frame-split do real numpy signal
# math inside the same Arrow-batched mapInPandas plumbing.
# ----------------------------------------------------------------------------

_RWAV_MAGIC = b"RWAV"

AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_samples int, duration_s double, "
    "rms double, peak int, zero_crossings int"
)

AUDIO_FRAME_SCHEMA = (
    "media_id long, frame_id int, start_sample int, n_samples int, frame_rms double"
)


def encode_rwav(samples, sample_rate: int = 16_000) -> bytes:
    """numpy int16 1-D array -> RWAV payload bytes."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    return (
        _RWAV_MAGIC
        + int(sample_rate).to_bytes(4, "big")
        + int(a.size).to_bytes(4, "big")
        + a.tobytes()
    )


def decode_rwav(payload: bytes):
    """RWAV payload -> (sample_rate, numpy int16 array). Raises on bad
    magic or truncated samples — corrupt media fails loudly."""
    import numpy as np

    if payload[:4] != _RWAV_MAGIC:
        raise ValueError("not an RWAV payload")
    sr = int.from_bytes(payload[4:8], "big")
    n = int.from_bytes(payload[8:12], "big")
    raw = payload[12:]
    if len(raw) != 2 * n:
        raise ValueError(f"truncated RWAV: expected {n} samples, got {len(raw) // 2}")
    return sr, np.frombuffer(raw, dtype="<i2")


def audio_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """REAL audio feature extraction: RMS energy, peak amplitude, and
    zero-crossing count per payload — the audio-quality triage pass
    (silence / clipping / noise gates) before any expensive model."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _slices(batches, batch_size):
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                sr, x = decode_rwav(bytes(p))
                f = x.astype(np.float64)
                zc = int(np.count_nonzero(np.signbit(f[1:]) != np.signbit(f[:-1])))
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": sr,
                        "n_samples": int(x.size),
                        "duration_s": float(x.size / sr),
                        "rms": float(np.sqrt((f * f).mean())) if x.size else 0.0,
                        "peak": int(np.abs(f).max()) if x.size else 0,
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def audio_frames(media: DataFrame, frame_samples: int = 1024, batch_size: int = 64) -> DataFrame:
    """Frame sampling for audio: split each payload into fixed-size
    windows (tail kept) and emit per-frame RMS — one row per frame,
    the shape downstream VAD/embedding stages consume. The audio
    analog of video frame-sampling; fan-out is bounded by duration."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _slices(batches, batch_size):
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _, x = decode_rwav(bytes(p))
                f = x.astype(np.float64)
                for fid, start in enumerate(range(0, x.size, frame_samples)):
                    w = f[start : start + frame_samples]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_id": fid,
                            "start_sample": start,
                            "n_samples": int(w.size),
                            "frame_rms": float(np.sqrt((w * w).mean())) if w.size else 0.0,
                        }
                    )
            # explicit columns: a slice whose payloads are ALL empty
            # audio yields zero rows, and a column-less DataFrame would
            # fail the Arrow cast against AUDIO_FRAME_SCHEMA (same
            # guard as the video frame sampler)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "frame_id",
                    "start_sample",
                    "n_samples",
                    "frame_rms",
                ],
            )

    return media.mapInPandas(run, schema=AUDIO_FRAME_SCHEMA)


# ----------------------------------------------------------------------------
# RVID: a real (library-free) raw grayscale VIDEO path — completes the
# image/audio/video triple. b"RVID" + n_frames(uint32 BE) +
# width(uint32 BE) + height(uint32 BE) + fps_milli(uint32 BE) +
# n_frames contiguous w*h uint8 frames. Frame-sampling decodes real
# pixels and RE-EMITS RGRAY payloads, so sampled frames feed the
# existing image kernels (gray_features, phash_rgray, resize_rgray)
# unchanged — the compose-with-downstream contract a real
# ffmpeg-backed sampler would also honor.
# ----------------------------------------------------------------------------

_RVID_MAGIC = b"RVID"

VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_id int, t_offset_s double, payload binary"
)

VIDEO_FEATURE_SCHEMA = (
    "media_id long, n_frames int, width int, height int, fps double, "
    "duration_s double, mean_brightness double, motion_energy double"
)


def encode_rvid(frames, fps: float = 10.0) -> bytes:
    """numpy uint8 (n, h, w) array -> RVID payload bytes."""
    import numpy as np

    a = np.asarray(frames, dtype=np.uint8)
    n, h, w = a.shape
    return (
        _RVID_MAGIC
        + int(n).to_bytes(4, "big")
        + int(w).to_bytes(4, "big")
        + int(h).to_bytes(4, "big")
        + int(round(fps * 1000)).to_bytes(4, "big")
        + a.tobytes()
    )


def decode_rvid(payload: bytes):
    """RVID payload -> (fps, numpy uint8 (n, h, w) array). Raises on
    bad magic or truncated frames — corrupt media fails loudly."""
    import numpy as np

    if payload[:4] != _RVID_MAGIC:
        raise ValueError("not an RVID payload")
    n = int.from_bytes(payload[4:8], "big")
    w = int.from_bytes(payload[8:12], "big")
    h = int.from_bytes(payload[12:16], "big")
    fps = int.from_bytes(payload[16:20], "big") / 1000.0
    raw = payload[20:]
    if len(raw) != n * w * h:
        raise ValueError(
            f"truncated RVID: expected {n * w * h} pixels, got {len(raw)}"
        )
    return fps, np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w)


def sample_rvid_frames(
    media: DataFrame, every_k: int = 3, batch_size: int = 16
) -> DataFrame:
    """REAL video frame-sampling: decode each RVID payload, keep every
    k-th frame (always including frame 0), and emit each kept frame as
    an RGRAY payload row with its timestamp offset. One row per kept
    frame — fan-out bounded by duration/k, and the output column
    contract (media_id + RGRAY payload) plugs straight into
    gray_features / phash_rgray / resize_rgray, so "video → sampled
    frames → image dedup" is one composed pipeline.

    Batch sizing: videos are the largest payloads in the table, so the
    Arrow batch cap defaults lower than the image kernels' — at 100 TB
    the knob that matters is rows-per-batch × payload size fitting
    executor memory, not row count."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _slices(batches, batch_size):
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                fps, frames = decode_rvid(bytes(p))
                for fid in range(0, frames.shape[0], every_k):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_id": fid,
                            "t_offset_s": float(fid / fps) if fps else 0.0,
                            "payload": encode_rgray(frames[fid]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_id", "t_offset_s", "payload"],
            )

    return media.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


def video_features(media: DataFrame, batch_size: int = 16) -> DataFrame:
    """REAL whole-video triage features: dimensions, duration, global
    mean brightness, and motion energy (mean |frame difference|) — the
    static-clip / black-screen screen run before any expensive
    per-frame model, same Arrow-batched plumbing as the other
    kernels."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _slices(batches, batch_size):
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                fps, frames = decode_rvid(bytes(p))
                f = frames.astype(np.float64)
                n, h, w = f.shape
                motion = (
                    float(np.abs(np.diff(f, axis=0)).mean()) if n > 1 else 0.0
                )
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_frames": n,
                        "width": w,
                        "height": h,
                        "fps": fps,
                        "duration_s": float(n / fps) if fps else 0.0,
                        "mean_brightness": float(f.mean()),
                        "motion_energy": motion,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=VIDEO_FEATURE_SCHEMA)
