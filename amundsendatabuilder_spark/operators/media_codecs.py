"""Pure-NumPy media codecs for the multimodal operators.

The container ships no image/audio libraries, but three container formats
need none: uncompressed 24-bit BMP and binary PPM (P6) are plain headers
over raw pixel rows, raw PCM16 is just little-endian samples — and PNG is
stdlib ``zlib`` inflate plus per-row unfiltering (None/Sub/Up/Average/
Paeth), all NumPy byte math. These codecs make the decode/resize/feature
kernels REAL pixel/sample math (replacing the earlier deterministic
stubs) while staying dependency-free; Pillow, when present, is only
needed for JPEG.

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


# ---------------------------------------------------------------------------
# PNG (8-bit depth, non-interlaced; gray / gray+alpha / RGB / RGBA)
#
# Container spec: RFC 2083 / W3C PNG — 8-byte signature, then chunks of
# (length BE32, type, data, CRC32 over type+data). Pixel data is the zlib
# stream of per-row (filter_type byte + filtered bytes); the five filters
# predict each byte from its left / up / up-left reconstructed neighbors.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (filter 4): pick whichever of left/up/up-left is
    closest to a+b-c, ties resolved left, up, up-left — the spec's order."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(rgb: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG bytes (color type 2, depth 8, zlib
    level 9). ``filter_type`` applies one filter to every row — the test
    fixtures use all five so round-trips exercise every unfilter path."""
    import zlib
    assert filter_type in range(5), filter_type
    h, w, _ = rgb.shape
    prev = np.zeros(w * 3, np.int64)
    out = bytearray()
    for y in range(h):
        row = rgb[y].reshape(-1).astype(np.int64)
        left = np.concatenate([np.zeros(3, np.int64), row[:-3]])
        ul = np.concatenate([np.zeros(3, np.int64), prev[:-3]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prev
        elif filter_type == 3:
            filt = row - (left + prev) // 2
        else:
            filt = row - _paeth_predict(left, prev, ul)
        out += bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out), 9))
            + _png_chunk(b"IEND", b""))


def _unfilter_row(f: int, line: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray | None:
    """Reconstruct one scanline (int64 lane math, mod 256). Sub is a
    cumulative sum per byte lane; Up is fully vectorized; Average/Paeth
    carry a true left-to-right dependency, so they walk pixels with the
    channel lanes vectorized."""
    if f == 0:
        return line
    if f == 1:  # recon[x] = line[x] + recon[x-bpp]: prefix sum per lane
        return np.cumsum(line.reshape(-1, bpp), axis=0).reshape(-1) % 256
    if f == 2:
        return (line + prev) % 256
    if f not in (3, 4):
        return None
    ln = line.reshape(-1, bpp)
    pv = prev.reshape(-1, bpp)
    out = np.zeros_like(ln)
    left = np.zeros(bpp, np.int64)
    ul = np.zeros(bpp, np.int64)
    for x in range(ln.shape[0]):
        if f == 3:
            left = (ln[x] + (left + pv[x]) // 2) % 256
        else:
            left = (ln[x] + _paeth_predict(left, pv[x], ul)) % 256
            ul = pv[x]
        out[x] = left
    return out.reshape(-1)


def decode_png(data: bytes) -> np.ndarray | None:
    """PNG bytes -> (H, W, 3) uint8 RGB, or None for anything this
    decoder does not cover (depth != 8, palette, interlaced) or any
    corruption (bad CRC, truncated chunk, short pixel stream). Alpha is
    dropped; gray replicates across channels."""
    import zlib
    if not data.startswith(PNG_SIG):
        return None
    pos, ihdr, idat = len(PNG_SIG), None, bytearray()
    try:
        while pos + 12 <= len(data):
            ln, typ = struct.unpack_from(">I4s", data, pos)
            if pos + 12 + ln > len(data):
                return None
            chunk = data[pos + 8:pos + 8 + ln]
            crc = struct.unpack_from(">I", data, pos + 8 + ln)[0]
            if zlib.crc32(typ + chunk) & 0xFFFFFFFF != crc:
                return None
            if typ == b"IHDR":
                ihdr = chunk
            elif typ == b"IDAT":
                idat += chunk
            elif typ == b"IEND":
                break
            pos += 12 + ln
        if ihdr is None or len(ihdr) != 13 or not idat:
            return None
        w, h, depth, ctype, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", ihdr)
        nchan = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
        if (depth != 8 or comp != 0 or filt != 0 or interlace != 0
                or nchan is None or w == 0 or h == 0):
            return None
        raw = zlib.decompress(bytes(idat))
    except (struct.error, zlib.error):
        return None
    stride = w * nchan
    if len(raw) < h * (stride + 1):
        return None
    rows = np.zeros((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    at = 0
    for y in range(h):
        f = raw[at]
        line = np.frombuffer(raw, np.uint8, stride, at + 1).astype(np.int64)
        at += 1 + stride
        recon = _unfilter_row(f, line, prev, nchan)
        if recon is None:
            return None
        rows[y] = recon
        prev = recon
    px = rows.astype(np.uint8).reshape(h, w, nchan)
    if ctype == 2:
        rgb = px
    elif ctype == 6:
        rgb = px[:, :, :3]
    else:  # gray / gray+alpha
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(rgb)


def sniff_decode(data: bytes) -> np.ndarray | None:
    """Magic-byte dispatch to the matching decoder; None when the payload
    is no container this module understands (caller then falls back to
    Pillow or the deterministic fake, per the operator's policy)."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:8] == PNG_SIG:
        return decode_png(data)
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
