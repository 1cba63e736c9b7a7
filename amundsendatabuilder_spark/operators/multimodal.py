"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + typed metadata structs; all
Spark-side plumbing (schemas, batching, partition sizing) is real and
tested. The codec kernels are real pixel/sample math for the formats that
need no external library — uncompressed BMP / PPM images, PNG (stdlib
zlib inflate + NumPy unfiltering) and raw PCM16 audio
(operators/media_codecs.py) — with Pillow picked up automatically for
JPEG when installed. Payloads in no
recognizable container fall back to a deterministic fake under the default
policy (keeps arbitrary-bytes fixtures exercisable) or yield NULL features
under ``strict=True`` (honest corrupt-input semantics, never a job
failure).

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


def _numpy_decode(payload: bytes) -> dict | None:
    """Real decode for BMP/PPM payloads via the pure-NumPy codecs: actual
    dimensions, ITU-R 601 mean luma, 8x8 average-hash. None when the
    payload is no container the codecs understand. Preferred over Pillow
    even when Pillow is present, because the kernel (nearest-neighbor
    thumb, floor index map) is spec'd exactly for oracle reproducibility;
    Pillow's default resampling filter would produce a different phash."""
    from amundsendatabuilder_spark.operators.media_codecs import (
        avg_hash, sniff_decode, to_gray)
    rgb = sniff_decode(payload)
    if rgb is None:
        return None
    gray = to_gray(rgb)
    return {"width": int(rgb.shape[1]), "height": int(rgb.shape[0]),
            "mean_luma": float(gray.mean() / 255.0),
            "phash": avg_hash(gray)}


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


_NULL_FEATURES = {"width": None, "height": None, "mean_luma": None,
                  "phash": None}


def decode_image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """binary image column -> feature rows via mapInPandas (Arrow-batched).

    Codec chain per payload: NumPy BMP/PPM codec (real pixel math,
    dependency-free, oracle-reproducible) -> Pillow when importable
    (compressed formats) -> policy fallback. ``strict=False`` (default)
    falls back to the deterministic fake for unrecognizable payloads so
    arbitrary-bytes fixtures stay exercisable; ``strict=True`` yields
    all-NULL features for them instead — honest corrupt-input semantics,
    not a job failure.
    """
    use_pil = _pil_available()

    def decode(b: bytes) -> dict:
        feats = _numpy_decode(b)
        if feats is not None:
            return feats
        if use_pil:
            return _pil_decode(b)
        return dict(_NULL_FEATURES) if strict else _fake_decode(b)

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
                    # clamp corrupt negative durations: an explicit
                    # positive step with stop < start makes sequence()
                    # raise under ANSI mode — one bad metadata row must
                    # not kill the frame plan (the audio path already
                    # guards this way)
                    F.greatest(F.coalesce(F.col("meta.duration_ms"),
                                          F.lit(0)), F.lit(0)),
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
    duration metadata — same shape as frame_sample_plan), then per-chunk
    RMS energy is computed over the payload's sample window via
    mapInPandas. The kernel is REAL DSP for raw PCM16 (the codec-free
    format: payload = little-endian int16 mono at meta.sample_rate):
    rms = sqrt(mean(sample^2)) / 32768 over [start_ms, end_ms) — windows
    outside the payload yield NULL. Payloads whose ``meta.codec`` is some
    compressed format — or missing entirely — keep the legacy
    deterministic byte-hash energy under the default policy
    (torchaudio/librosa would plug in here), or NULL under
    ``strict=True``. The PCM16 kernel is reserved for rows that
    explicitly declare ``codec='pcm16'``: interpreting unlabeled bytes
    as raw int16 would produce meaningless-but-plausible RMS values."""
    chunks = (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload",
                F.coalesce(F.col("meta.sample_rate"), F.lit(16000)).alias("sr"),
                F.coalesce(F.col("meta.codec"), F.lit("unknown")).alias("codec"),
                F.posexplode(F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0))
                               - 1, F.lit(0)),
                    F.lit(chunk_ms))).alias("chunk_idx", "start_ms"))
        .withColumn("end_ms", F.col("start_ms") + chunk_ms))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from amundsendatabuilder_spark.operators.media_codecs import pcm16_rms
        for pdf in it:
            def energy(row):
                b = bytes(row["payload"] or b"")
                if row["codec"] == "pcm16":
                    sr = int(row["sr"])
                    return pcm16_rms(b, int(row["start_ms"]) * sr // 1000,
                                     int(row["end_ms"]) * sr // 1000)
                if strict:
                    return None
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
    """Deterministic synthetic media table with REAL payloads — stands in
    for ``spark.read.format('binaryFile')`` ingestion and feeds the codec
    oracles. Content is patterned so every feature has a closed form a
    SQL oracle can recompute:

    - image (i % 3 == 0): 24-bit BMP, w = 200 + (i%5)*30,
      h = 150 + (i%4)*40, every pixel of column x is the gray value
      ``(x * 255) // (w - 1)`` (horizontal ramp, rows identical);
    - audio (i % 3 == 1): raw PCM16 mono, 16 kHz, 5000 ms; sample j =
      ``((j * 9973 + i * 31) % 65536) - 32768`` (deterministic
      pseudo-noise spanning the full int16 range);
    - video (i % 3 == 2): opaque md5-derived bytes (only the duration
      metadata drives the frame-sampling plan).
    """
    import hashlib

    import numpy as np

    from amundsendatabuilder_spark.operators.media_codecs import encode_bmp
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = 200 + (i % 5) * 30, 150 + (i % 4) * 40
            ramp = (np.arange(w) * 255) // (w - 1)
            rgb = np.broadcast_to(ramp.astype(np.uint8)[None, :, None],
                                  (h, w, 3))
            rows.append((i, kind, bytearray(encode_bmp(np.ascontiguousarray(rgb))),
                         (w, h, None, None, "bmp")))
        elif kind == "audio":
            j = np.arange(5000 * 16000 // 1000, dtype=np.int64)
            samples = ((j * 9973 + i * 31) % 65536) - 32768
            rows.append((i, kind, bytearray(samples.astype("<i2").tobytes()),
                         (None, None, 16000, 5000, "pcm16")))
        else:
            payload = hashlib.md5(f"media-{i}".encode()).digest() * 4
            rows.append((i, kind, bytearray(payload),
                         (None, None, None, 5000, "fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_png_media(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic PNG image table — same horizontal-ramp
    pattern as ``synthetic_media``'s BMP assets (every pixel of column x
    is gray ``(x * 255) // (w - 1)``, rows identical, so mean luma and
    avg-hash have closed forms a SQL oracle recomputes), but encoded
    through the stdlib-zlib PNG codec with the row filter rotating
    ``i % 5`` — every asset batch exercises all five unfilter paths
    (None/Sub/Up/Average/Paeth) under the oracle's eyes."""
    import numpy as np

    from amundsendatabuilder_spark.operators.media_codecs import encode_png
    rows = []
    for i in range(n):
        w, h = 200 + (i % 5) * 30, 150 + (i % 4) * 40
        ramp = (np.arange(w) * 255) // (w - 1)
        rgb = np.ascontiguousarray(np.broadcast_to(
            ramp.astype(np.uint8)[None, :, None], (h, w, 3)))
        rows.append((i, "image", bytearray(encode_png(rgb, filter_type=i % 5)),
                     (w, h, None, None, "png")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FRAME_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("phash", T.StringType(), True),
])


def decode_frame_features(media: DataFrame) -> DataFrame:
    """Multi-frame (video-side) decode: each ``kind='video'`` payload that
    the GIF codec understands expands to one feature row PER FRAME —
    the real decode step behind frame_sample_plan's timestamp plan.
    Arrow-batched mapInPandas; a row whose payload is no multi-frame
    container this codec reads yields a single all-NULL frame row
    (honest corrupt-input semantics). Same luma/phash kernels as the
    still-image path, so features are container- and frame-position-
    comparable."""
    from amundsendatabuilder_spark.operators.media_codecs import (
        avg_hash, decode_gif_frames, to_gray)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "width": [],
                   "height": [], "mean_luma": [], "phash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_gif_frames(
                    bytes(payload) if payload is not None else b"")
                if not frames:
                    out["media_id"].append(mid)
                    out["frame_idx"].append(0)
                    for k in ("width", "height", "mean_luma", "phash"):
                        out[k].append(None)
                    continue
                for fi, rgb in enumerate(frames):
                    gray = to_gray(rgb)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["width"].append(rgb.shape[1])
                    out["height"].append(rgb.shape[0])
                    out["mean_luma"].append(float(gray.mean() / 255.0))
                    out["phash"].append(avg_hash(gray))
            pdf_out = pd.DataFrame(out)
            pdf_out["width"] = pdf_out["width"].astype("Int32")
            pdf_out["height"] = pdf_out["height"].astype("Int32")
            pdf_out["frame_idx"] = pdf_out["frame_idx"].astype("int32")
            yield pdf_out

    pruned = media.where(F.col("kind") == "video").select("media_id", "payload")
    return pruned.mapInPandas(batches, FRAME_FEATURES_SCHEMA)


def synthetic_gif_media(spark, n: int = 24, n_frames: int = 3) -> DataFrame:
    """Deterministic animated-GIF table: every asset is ``n_frames`` flat-
    8x8-block grayscale frames under the identity gray palette (index ==
    gray value), block value ``(bx*29 + by*53 + i*11 + f*17) % 256`` —
    LZW is lossless, so decoded pixels (and the per-frame luma/avg-hash
    closed forms) follow from the formula alone. Encoding rotates
    progressive/interlaced row order (i % 2) so both scan paths sit
    under the oracle hash."""
    import numpy as np

    from amundsendatabuilder_spark.operators.media_codecs import encode_gif
    rows = []
    for i in range(n):
        w, h = 96 + (i % 5) * 16, 80 + (i % 4) * 16
        bx = np.arange(w) // 8
        by = np.arange(h) // 8
        frames = [
            ((bx[None, :] * 29 + by[:, None] * 53 + i * 11 + f * 17) % 256)
            .astype(np.uint8) for f in range(n_frames)]
        rows.append((i, "video", bytearray(encode_gif(frames,
                                                      interlace=bool(i % 2))),
                     (w, h, None, n_frames * 100, "gif")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_jpeg_media(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic JPEG image table for the baseline-JPEG
    codec oracle. Each image is a grid of flat 8x8 gray blocks with value
    ``(bx*29 + by*53 + i*11) % 256`` — content chosen so the lossy format
    round-trips EXACTLY (flat block -> DC-only spectrum, quantized by the
    codec's DC step of 8 losslessly; gray pixels -> chroma exactly 128),
    giving mean luma and avg-hash closed forms the SQL twin recomputes
    from the block formula alone. The encoding rotates over the four
    real-world stream layouts (i % 4): 4:4:4, 4:2:0 subsampled,
    single-component grayscale, and 4:4:4 with DRI/RST3 restart markers —
    all four decode to identical pixels, so a broken subsampling,
    component-interleave, or restart path breaks the hash."""
    import numpy as np

    from amundsendatabuilder_spark.operators.media_codecs import encode_jpeg
    rows = []
    for i in range(n):
        w, h = 96 + (i % 5) * 16, 80 + (i % 4) * 16
        bx = np.arange(w) // 8
        by = np.arange(h) // 8
        v = ((bx[None, :] * 29 + by[:, None] * 53 + i * 11) % 256).astype(np.uint8)
        rgb = np.ascontiguousarray(np.repeat(v[:, :, None], 3, axis=2))
        variant = i % 4
        if variant == 0:
            payload = encode_jpeg(rgb, "444")
        elif variant == 1:
            payload = encode_jpeg(rgb, "420")
        elif variant == 2:
            payload = encode_jpeg(rgb, gray=True)
        else:
            payload = encode_jpeg(rgb, "444", restart_interval=3)
        rows.append((i, "image", bytearray(payload),
                     (w, h, None, None, "jpeg")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    # nullable: strict mode reports undecodable payloads as NULL rows
    T.StructField("target_w", T.IntegerType(), True),
    T.StructField("target_h", T.IntegerType(), True),
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
    """binary image column -> resized-content digests via mapInPandas.

    For BMP/PPM payloads the kernel is REAL: decode, aspect-preserving
    target dims (same math as ``resize_spec``: scale = min(max/w, max/h,
    1), floor, never upscale), nearest-neighbor resample of the grayscale
    plane, digest = md5 of the canonical row-joined pixel string
    (media_codecs.gray_digest_string — a text form a SQL oracle can
    rebuild byte-for-byte). Unrecognizable payloads keep the legacy
    deterministic digest stub under the default policy, or yield NULL
    dims/digest under ``strict=True``.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from amundsendatabuilder_spark.operators.media_codecs import (
            gray_digest_string, resize_nearest, sniff_decode, to_gray)
        for pdf in it:
            rows = []
            for rec in pdf.itertuples():
                payload = bytes(rec.payload) if rec.payload is not None else b""
                rgb = sniff_decode(payload)
                if rgb is not None:
                    h, w = rgb.shape[:2]
                    s = min(max_w / w, max_h / h, 1.0)
                    tw, th = max(int(w * s), 1), max(int(h * s), 1)
                    resized = resize_nearest(to_gray(rgb), tw, th)
                    digest = hashlib.md5(
                        gray_digest_string(resized).encode()).hexdigest()
                elif strict:
                    tw = th = digest = None
                else:
                    f = _fake_decode(payload)
                    s = min(max_w / f["width"], max_h / f["height"], 1.0)
                    tw = max(int(f["width"] * s), 1)
                    th = max(int(f["height"] * s), 1)
                    digest = hashlib.md5(
                        f"{f['phash']}:{tw}x{th}".encode()).hexdigest()
                rows.append((rec.media_id, tw, th, digest))
            out = pd.DataFrame(rows, columns=["media_id", "target_w",
                                              "target_h", "resized_digest"])
            out["target_w"] = out["target_w"].astype("Int32")
            out["target_h"] = out["target_h"].astype("Int32")
            yield out

    pruned = media.where(F.col("kind") == "image").select("media_id", "payload")
    return pruned.mapInPandas(batches, RESIZED_SCHEMA)


def synthetic_tones(spark, n: int = 32) -> DataFrame:
    """Pure-tone PCM16 fixtures for the spectral kernel: asset i is a
    2000 ms mono sine at 8 kHz, frequency 200 + (i % 16) * 100 Hz,
    amplitude 12000. Integer frequencies over exactly-1s analysis
    windows put all energy in one DFT bin (no leakage), so the dominant
    bin has the closed form ``freq_hz`` itself — which is what makes a
    real FFT kernel oracle-verifiable."""
    import numpy as np
    rows = []
    sr, dur_ms = 8000, 2000
    j = np.arange(sr * dur_ms // 1000, dtype=np.float64)
    for i in range(n):
        f = 200 + (i % 16) * 100
        samples = np.round(12000.0 * np.sin(2 * np.pi * f * j / sr))
        rows.append((i, "audio", bytearray(samples.astype("<i2").tobytes()),
                     (None, None, sr, dur_ms, "pcm16")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def audio_spectral_peak(media: DataFrame, chunk_ms: int = 1000) -> DataFrame:
    """Dominant-frequency extraction per audio chunk: real FFT over each
    PCM16 sample window, arg-max magnitude bin above DC —
    (media_id, chunk_idx, n_samples, peak_bin). peak_hz = peak_bin *
    sample_rate / n_samples; emitting the integer bin keeps the output
    engine-exact (magnitudes are floats, the arg-max index is not).

    Same shape as audio_chunk_features: chunk fan-out is JVM-side from
    duration metadata, the kernel is Arrow-batched NumPy rfft —
    the feature-extraction stage of an audio training pipeline (VAD,
    language/music tagging all start from spectral frames). Rows without
    an explicit pcm16 codec yield NULL (strict semantics: guessing a
    codec would produce plausible nonsense)."""
    chunks = (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload",
                F.coalesce(F.col("meta.sample_rate"), F.lit(16000))
                .alias("sr"),
                F.coalesce(F.col("meta.codec"), F.lit("unknown"))
                .alias("codec"),
                F.posexplode(F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"),
                                          F.lit(0)) - 1, F.lit(0)),
                    F.lit(chunk_ms))).alias("chunk_idx", "start_ms")))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            out = {"media_id": [], "chunk_idx": [], "n_samples": [],
                   "peak_bin": []}
            for _, row in pdf.iterrows():
                b = bytes(row["payload"] or b"")
                sr = int(row["sr"])
                lo = int(row["start_ms"]) * sr // 1000
                hi = lo + int(chunk_ms) * sr // 1000
                peak = None
                nsamp = 0
                if row["codec"] == "pcm16" and hi * 2 <= len(b):
                    x = np.frombuffer(b[lo * 2: hi * 2], dtype="<i2")
                    nsamp = len(x)
                    if nsamp:
                        mag = np.abs(np.fft.rfft(x.astype(np.float64)))
                        if len(mag) > 1:
                            peak = int(np.argmax(mag[1:])) + 1
                out["media_id"].append(row["media_id"])
                out["chunk_idx"].append(row["chunk_idx"])
                out["n_samples"].append(nsamp)
                out["peak_bin"].append(peak)
            yield pd.DataFrame(out)

    return chunks.mapInPandas(
        batches,
        "media_id long, chunk_idx int, n_samples long, peak_bin int")
