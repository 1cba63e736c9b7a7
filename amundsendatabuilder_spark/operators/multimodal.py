"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + typed metadata structs; all
Spark-side plumbing (schemas, batching, partition sizing) is real and
tested, while the codec step itself is stubbed: the container has no
image/audio libraries, so ``decode_image``/``extract_audio_features`` use a
deterministic fake (documented below) and raise ``NotImplementedError`` when
``strict=True``. Swapping in Pillow/torchaudio later only changes the body
of the per-batch function — the Spark contract is already exercised.

Scale notes: decode runs via ``mapInPandas`` so each Arrow batch of binary
blobs is decoded in one Python call; ``spark.sql.execution.arrow
.maxRecordsPerBatch`` bounds peak memory per batch; blobs never pass
through a shuffle (decode before any wide transform, project early).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("phash", T.StringType(), True),
])


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode: derives pseudo
    dimensions/luma/phash from the byte content so tests are stable."""
    import hashlib
    h = hashlib.md5(payload or b"").hexdigest()
    return {
        "width": 64 + int(h[:2], 16),
        "height": 64 + int(h[2:4], 16),
        "mean_luma": int(h[4:8], 16) / 65535.0,
        "phash": h[:16],
    }


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def _pil_decode(payload: bytes) -> dict:
    """Real decode via Pillow when the library is present: dimensions,
    grayscale mean luma, and an 8×8 average-hash perceptual hash.
    Undecodable payloads yield all-NULL features (honest corrupt-input
    semantics, not a job failure)."""
    import io
    try:
        from PIL import Image
        img = Image.open(io.BytesIO(payload))
        gray = img.convert("L")
        pixels = list(gray.getdata())
        mean = sum(pixels) / len(pixels) if pixels else 0.0
        thumb = list(gray.resize((8, 8)).getdata())
        avg = sum(thumb) / 64.0
        bits = 0
        for p in thumb:
            bits = (bits << 1) | (1 if p >= avg else 0)
        return {"width": img.width, "height": img.height,
                "mean_luma": mean / 255.0, "phash": f"{bits:016x}"}
    except Exception:
        return {"width": None, "height": None, "mean_luma": None, "phash": None}


def decode_image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """binary image column -> feature rows via mapInPandas (Arrow-batched).

    The codec kernel is chosen at plan time: Pillow when importable (the
    production path — this container lacks it, but the operator is real
    the moment the environment has the lib), else the deterministic fake.
    strict=True raises NotImplementedError only when no real codec is
    available.
    """
    use_real = _pil_available()
    if strict and not use_real:
        raise NotImplementedError(
            "real image decode requires Pillow; the Spark plumbing "
            "(schema/batching) is final and picks it up when installed")
    decode = _pil_decode if use_real else _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(lambda b: decode(bytes(b) if b is not None else b""))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                # nullable Int32: the PIL path yields NULL dims for
                # undecodable payloads (plain int32 would throw on NaN)
                "width": feats.map(lambda f: f["width"]).astype("Int32"),
                "height": feats.map(lambda f: f["height"]).astype("Int32"),
                "mean_luma": feats.map(lambda f: f["mean_luma"]),
                "phash": feats.map(lambda f: f["phash"]),
            })

    pruned = media.where(F.col("kind") == "image").select("media_id", "payload")
    return pruned.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the frame
    timestamps a decoder would extract (sequence + explode, JVM-side); the
    per-frame decode hangs off the same mapInPandas pattern as images."""
    return (
        media.where(F.col("kind") == "video")
        .select("media_id",
                F.explode(F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms))).alias("frame_ts_ms"))
    )


AUDIO_CHUNKS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("chunk_idx", T.IntegerType(), False),
    T.StructField("start_ms", T.LongType(), False),
    T.StructField("end_ms", T.LongType(), False),
    T.StructField("rms_energy", T.DoubleType(), True),
])


def audio_chunk_features(media: DataFrame, chunk_ms: int = 1000,
                         strict: bool = False) -> DataFrame:
    """Audio path: chunk boundaries expand JVM-side (sequence + explode on
    duration metadata — same shape as frame_sample_plan), then a per-chunk
    feature (RMS energy) is computed over the payload slice via
    mapInPandas. The codec (resample/decode) is the stubbed step: the
    deterministic fake derives energy from the chunk's byte window so the
    full Spark contract — metadata fan-out, Arrow batching, per-chunk
    feature schema — is real and testable without torchaudio."""
    if strict:
        raise NotImplementedError(
            "real audio decode requires torchaudio/librosa; replace the "
            "fake energy body — the Spark plumbing is final")
    chunks = (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload",
                F.posexplode(F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0))
                               - 1, F.lit(0)),
                    F.lit(chunk_ms))).alias("chunk_idx", "start_ms"))
        .withColumn("end_ms", F.col("start_ms") + chunk_ms))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in it:
            def energy(row):
                b = bytes(row["payload"] or b"")
                lo = int(row["chunk_idx"]) % max(1, len(b))
                window = b[lo:lo + 16] or b"\0"
                h = hashlib.md5(window).hexdigest()
                return int(h[:4], 16) / 65535.0
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "chunk_idx": pdf["chunk_idx"].astype("int32"),
                "start_ms": pdf["start_ms"].astype("int64"),
                "end_ms": pdf["end_ms"].astype("int64"),
                "rms_energy": pdf.apply(energy, axis=1) if len(pdf) else
                pd.Series([], dtype="float64"),
            })

    return chunks.mapInPandas(batches, AUDIO_CHUNKS_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = md5-derived
    bytes). Stands in for `spark.read.format('binaryFile')` ingestion."""
    import hashlib
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"media-{i}".encode()).digest() * 4
        kind = ("image", "audio", "video")[i % 3]
        rows.append((i, kind, bytearray(payload),
                     (64, 48, 16000, 5000, "fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("target_w", T.IntegerType(), False),
    T.StructField("target_h", T.IntegerType(), False),
    T.StructField("resized_digest", T.StringType(), True),
])


def resize_spec(features: DataFrame, max_w: int = 224,
                max_h: int = 224) -> DataFrame:
    """Aspect-preserving resize targets from decoded dimensions — pure
    JVM arithmetic over the feature rows (no payload touched): scale =
    min(max_w/w, max_h/h, 1), floor to integer pixels, never upscale.
    Returns (media_id, width, height, target_w, target_h, scale)."""
    scale = F.least(F.lit(max_w) / F.col("width"),
                    F.lit(max_h) / F.col("height"), F.lit(1.0))
    return features.select(
        "media_id", "width", "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1))
        .cast("int").alias("target_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1))
        .cast("int").alias("target_h"),
        F.round(scale, 6).alias("scale"))


def resize_images(media: DataFrame, max_w: int = 224, max_h: int = 224,
                  strict: bool = False) -> DataFrame:
    """binary image column -> resized payload digests via mapInPandas.

    The resample kernel is STUBBED (no image libs in this container): the
    output digest is a deterministic function of (payload md5, target
    dims), while everything Spark-side — column pruning to (media_id,
    payload), Arrow batching, target-dimension math shared with
    ``resize_spec`` — is the real production plumbing. strict=True raises
    NotImplementedError at plan time, marking where Pillow plugs in.
    """
    if strict:
        raise NotImplementedError(
            "real resampling requires Pillow; replace the digest stub — "
            "the Spark plumbing (pruning/batching/dim math) is final")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in it:
            rows = []
            for rec in pdf.itertuples():
                f = _fake_decode(bytes(rec.payload) if rec.payload is not None
                                 else b"")
                s = min(max_w / f["width"], max_h / f["height"], 1.0)
                tw = max(int(f["width"] * s), 1)
                th = max(int(f["height"] * s), 1)
                digest = hashlib.md5(
                    f"{f['phash']}:{tw}x{th}".encode()).hexdigest()
                rows.append((rec.media_id, tw, th, digest))
            yield pd.DataFrame(rows, columns=["media_id", "target_w",
                                              "target_h", "resized_digest"])

    pruned = media.where(F.col("kind") == "image").select("media_id", "payload")
    return pruned.mapInPandas(batches, RESIZED_SCHEMA)
