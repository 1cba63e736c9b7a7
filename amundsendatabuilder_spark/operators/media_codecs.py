"""Pure-NumPy media codecs for the multimodal operators.

The container ships no image/audio libraries, but two container formats
need none: uncompressed 24-bit BMP and binary PPM (P6) are plain headers
over raw pixel rows, and raw PCM16 is just little-endian samples. These
codecs make the decode/resize/feature kernels REAL pixel/sample math
(replacing the earlier deterministic stubs) while staying dependency-free;
Pillow, when present, is only needed for compressed formats (JPEG/PNG).

All kernels are deterministic and spec'd exactly so a SQL oracle can
reproduce their outputs in closed form on patterned synthetic inputs:

- grayscale  = round(0.299 R + 0.587 G + 0.114 B) per pixel (ints 0-255);
- resize     = nearest-neighbor with src index ``(dst_i * src_n) // dst_n``
  (the floor map — no centering offset — chosen for exact integer-math
  reproducibility cross-engine);
- avg-hash   = 8x8 nearest-neighbor thumb, bit = pixel >= mean(thumb),
  row-major MSB-first, 16 lowercase hex chars;
- PCM16 RMS  = sqrt(mean(sample^2)) / 32768 over the chunk's sample window.

These functions run INSIDE Arrow-batched ``mapInPandas`` workers (one call
per pixel array, vectorized NumPy inside) — they never touch a Spark shuffle.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB, the original Windows DIB format)
# ---------------------------------------------------------------------------

def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BMP bytes (bottom-up rows, BGR pixel
    order, rows padded to 4-byte boundaries — the canonical layout)."""
    h, w, _ = rgb.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    pixel_bytes = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes,
                       2835, 2835, 0, 0)
    bgr = rgb[:, :, ::-1]  # RGB -> BGR
    rows = bytearray()
    padding = b"\x00" * pad
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + padding
    return header + info + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray | None:
    """BMP bytes -> (H, W, 3) uint8 RGB, or None if not a decodable
    uncompressed 24/32-bit BMP. Handles bottom-up (positive height) and
    top-down (negative height) row orders."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    try:
        off = struct.unpack_from("<I", data, 10)[0]
        hdr_size = struct.unpack_from("<I", data, 14)[0]
        if hdr_size < 40:
            return None
        w, h_raw = struct.unpack_from("<ii", data, 18)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        compression = struct.unpack_from("<I", data, 30)[0]
        if planes != 1 or bpp not in (24, 32) or compression != 0:
            return None
        top_down = h_raw < 0
        h = -h_raw if top_down else h_raw
        if w <= 0 or h <= 0:
            return None
        nchan = bpp // 8
        stride = (w * nchan + 3) // 4 * 4
        if len(data) < off + stride * h:
            return None
        raw = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                            offset=off).reshape(h, stride)
        pix = raw[:, :w * nchan].reshape(h, w, nchan)
        rgb = pix[:, :, 2::-1][:, :, :3] if nchan == 4 else pix[:, :, ::-1]
        if not top_down:
            rgb = rgb[::-1]
        return np.ascontiguousarray(rgb)
    except (struct.error, ValueError):
        return None


# ---------------------------------------------------------------------------
# PPM (P6 binary, maxval <= 255)
# ---------------------------------------------------------------------------

def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


def decode_ppm(data: bytes) -> np.ndarray | None:
    """P6 PPM bytes -> (H, W, 3) uint8 RGB, or None. Skips '#' comments
    per the netpbm spec; only maxval <= 255 (1 byte/sample) supported."""
    if not data.startswith(b"P6"):
        return None
    try:
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(data) and data[pos:pos + 1].isspace():
                pos += 1
            if data[pos:pos + 1] == b"#":
                while pos < len(data) and data[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if w <= 0 or h <= 0 or maxval > 255 or len(data) < pos + w * h * 3:
            return None
        return np.frombuffer(data, dtype=np.uint8, count=w * h * 3,
                             offset=pos).reshape(h, w, 3).copy()
    except (ValueError, IndexError):
        return None


def sniff_decode(data: bytes) -> np.ndarray | None:
    """Magic-byte dispatch to the matching decoder; None when the payload
    is no container this module understands (caller then falls back to
    Pillow or the deterministic fake, per the operator's policy)."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    return None


# ---------------------------------------------------------------------------
# Pixel kernels
# ---------------------------------------------------------------------------

def to_gray(rgb: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, rounded to int (0-255). For r==g==b pixels this is
    exactly the channel value — the property the SQL oracles rely on."""
    luma = (rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587
            + rgb[:, :, 2] * 0.114)
    return np.rint(luma).astype(np.int64)


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize of a 2-D array with the floor index map
    ``src = (dst * src_n) // dst_n`` — integer-exact, so an oracle can
    reproduce any output pixel without float coordinates."""
    h, w = img.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return img[np.ix_(ys, xs)]


def avg_hash(gray: np.ndarray) -> str:
    """64-bit average hash: 8x8 nearest thumb, bit = pixel >= thumb mean,
    scanned row-major MSB-first; 16 lowercase hex chars."""
    thumb = resize_nearest(gray, 8, 8)
    avg = thumb.mean()
    bits = 0
    for p in thumb.ravel():
        bits = (bits << 1) | (1 if p >= avg else 0)
    return f"{bits:016x}"


def gray_digest_string(gray: np.ndarray) -> str:
    """Canonical textual form of a grayscale image for content digests:
    rows joined by ';', pixels by ',' — chosen over raw bytes so a SQL
    oracle can rebuild and md5 the identical string."""
    return ";".join(",".join(str(int(v)) for v in row) for row in gray)


# ---------------------------------------------------------------------------
# PCM16 audio
# ---------------------------------------------------------------------------

def pcm16_samples(payload: bytes) -> np.ndarray:
    """Raw little-endian int16 mono samples (trailing odd byte dropped)."""
    usable = len(payload) // 2 * 2
    return np.frombuffer(payload, dtype="<i2", count=usable // 2)


def pcm16_rms(payload: bytes, start_sample: int, end_sample: int) -> float | None:
    """sqrt(mean(sample^2)) / 32768 over [start, end) — None when the
    window lies outside the payload. Squares accumulate exactly (int64 <
    2^53 for any real chunk), so the value is bit-reproducible."""
    samples = pcm16_samples(payload)
    win = samples[start_sample:end_sample].astype(np.int64)
    if win.size == 0:
        return None
    return float(np.sqrt(np.mean(win ** 2)) / 32768.0)
