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
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)
    return None


# ---------------------------------------------------------------------------
# JPEG (ITU T.81 baseline sequential DCT, 8-bit; 4:4:4 / 4:2:2 / 4:2:0 /
# grayscale). Pure NumPy: FDCT/IDCT as orthogonal matrix products,
# canonical Huffman built from DHT, byte-stuffed entropy stream, DRI/RSTn
# restart handling. Progressive (SOF2), arithmetic coding, 12-bit
# precision, and hierarchical modes are out of scope and return None.
#
# The encoder exists to make fixtures: it writes real interleaved
# baseline streams (standard Annex K Huffman table layout via DHT, so the
# decoder exercises its generic table builder). With a DC quant step of 8,
# an image made of flat 8x8 gray blocks round-trips EXACTLY (flat block
# -> DC-only spectrum 8*(v-128), quantized /8 losslessly; chroma of a
# gray pixel is exactly 128 -> all-zero blocks), which is what lets a SQL
# oracle reproduce decoded-pixel features in closed form.
# ---------------------------------------------------------------------------

def _zigzag() -> list[tuple[int, int]]:
    """The spec's zigzag scan as (row, col) pairs: diagonals by r+c, even
    diagonals walked bottom-left -> top-right, odd ones top-right ->
    bottom-left (generated, not transcribed, to keep typos impossible)."""
    return sorted(((r, c) for r in range(8) for c in range(8)),
                  key=lambda rc: (rc[0] + rc[1],
                                  rc[1] if (rc[0] + rc[1]) % 2 == 0 else rc[0]))


_ZZ = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])


def _dct_matrix() -> np.ndarray:
    """Orthogonal 8-point DCT-II matrix M with M[u,x] = c(u)/2 *
    cos((2x+1)u*pi/16); 2-D FDCT = M f M^T, IDCT = M^T F M."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] /= np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()

# Annex K.1/K.2 example quantization tables, with the DC steps forced to 8
# so flat blocks survive exactly (see module comment). Stored in natural
# (row-major) order; DQT serializes them in zigzag order as the spec asks.
_QUANT_LUMA = np.array([
    [8, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.int64)
_QUANT_CHROMA = np.array([
    [8, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.int64)

# Annex K.3 typical Huffman tables as (BITS counts for lengths 1..16,
# HUFFVAL symbol list) — written into DHT verbatim; both sides of the
# round trip derive their codes from these bytes, so a transcription slip
# here cannot silently corrupt pixels (it would fail loudly as a missing
# symbol during encoding).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical construction:
    codes of each length are consecutive, starting from twice the previous
    length's end."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the shape the bit-at-a-time reader probes."""
    return {(ln, cd): sym for sym, (cd, ln) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category: (size, appended bits) for a signed value;
    negative values store value + 2^size - 1 (one's-complement style)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _fdct_quant(block: np.ndarray, quant: np.ndarray) -> np.ndarray:
    coef = _DCT_M @ (block.astype(np.float64) - 128.0) @ _DCT_M.T
    return np.rint(coef / quant).astype(np.int64)


def _encode_block(zz: np.ndarray, pred: int, dc_codes, ac_codes,
                  bw: _BitWriter) -> int:
    size, extra = _magnitude(int(zz[0]) - pred)
    code, ln = dc_codes[size]
    bw.put(code, ln)
    if size:
        bw.put(extra, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            bw.put(code, ln)
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size, extra = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.put(code, ln)
        bw.put(extra, size)
        run = 0
    return int(zz[0])


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.rint(np.stack([y, cb, cr], axis=2)), 0, 255)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:  # edge replication, the conventional pad
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(rgb: np.ndarray, subsampling: str = "444",
                gray: bool = False, restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes. ``subsampling``:
    '444' (no chroma subsampling) or '420' (2x2 box-averaged chroma,
    the dominant real-world layout); ``gray=True`` writes a
    single-component (luma-only) frame; ``restart_interval`` > 0 writes
    DRI + RSTn markers every N MCUs (the error-resilience layout real
    encoders emit). Interleaved single scan, standard Huffman tables,
    quant tables above (DC step 8)."""
    assert subsampling in ("444", "420"), subsampling
    h, w, _ = rgb.shape
    ycc = _rgb_to_ycbcr(rgb)
    if gray:
        hv = [(1, 1)]
        planes = [ycc[:, :, 0]]
    elif subsampling == "444":
        hv = [(1, 1), (1, 1), (1, 1)]
        planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
    else:
        hv = [(2, 2), (1, 1), (1, 1)]
        yp = _pad_to(ycc[:, :, 0], 2)
        cb = _pad_to(ycc[:, :, 1], 2)
        cr = _pad_to(ycc[:, :, 2], 2)
        # 2x2 box average, rounded — flat regions stay exact
        cb = np.rint((cb[0::2, 0::2] + cb[0::2, 1::2]
                      + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4.0)
        cr = np.rint((cr[0::2, 0::2] + cr[0::2, 1::2]
                      + cr[1::2, 0::2] + cr[1::2, 1::2]) / 4.0)
        planes = [yp, cb, cr]
    quants = [_QUANT_LUMA, _QUANT_CHROMA, _QUANT_CHROMA]
    hmax = max(x for x, _ in hv)
    vmax = max(x for _, x in hv)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for (chs, cvs), p in zip(hv, planes):
        # each component's block grid is (mcus_x*ch) x (mcus_y*cv) blocks
        tw, th = 8 * mcus_x * chs, 8 * mcus_y * cvs
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                             mode="edge"))

    enc_dc = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    enc_ac = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    entropy = bytearray()
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                entropy += bw.flush()
                entropy += bytes([0xFF, 0xD0 + (mcu_count // restart_interval
                                                - 1) % 8])
                bw = _BitWriter()
                preds = [0, 0, 0]
            for ci, (chs, cvs) in enumerate(hv):
                tsel = 0 if ci == 0 else 1
                for by in range(cvs):
                    for bx in range(chs):
                        y0 = (my * cvs + by) * 8
                        x0 = (mx * chs + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        q = _fdct_quant(block, quants[ci])
                        zz = q[_ZZ_ROWS, _ZZ_COLS]
                        preds[ci] = _encode_block(
                            zz, preds[ci], enc_dc[tsel], enc_ac[tsel], bw)
            mcu_count += 1
    entropy += bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(
            int(table[r, c]) for r, c in _ZZ))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    nc = len(hv)
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, nc) + b"".join(
        struct.pack(">BBB", cid + 1, (hv[cid][0] << 4) | hv[cid][1],
                    0 if cid == 0 else 1) for cid in range(nc)))
    sos = seg(0xDA, bytes([nc]) + b"".join(
        bytes([cid + 1, (0 if cid == 0 else 1) * 0x11]) for cid in range(nc))
        + bytes([0, 63, 0]))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    return (b"\xff\xd8" + app0 + dqt(0, _QUANT_LUMA) + dqt(1, _QUANT_CHROMA)
            + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
            + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
            + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
            + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
            + dri + sof + sos + bytes(entropy) + b"\xff\xd9")


class _BitReader:
    """MSB-first reader over a de-stuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= self.bits.size:
            raise EOFError
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.bits.size:
            raise EOFError
        chunk = self.bits[self.pos:self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(br: _BitReader, dc_tab, ac_tab, quant: np.ndarray,
                  pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, np.int64)
    size = _read_symbol(br, dc_tab)
    dc = pred + _extend(br.read_bits(size), size)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _read_symbol(br, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.read_bits(size), size)
        k += 1
    coef = np.zeros((8, 8), np.float64)
    coef[_ZZ_ROWS, _ZZ_COLS] = zz * quant[_ZZ_ROWS, _ZZ_COLS]
    pix = _DCT_M.T @ coef @ _DCT_M + 128.0
    return np.clip(np.rint(pix), 0, 255), dc


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """Baseline JPEG bytes -> (H, W, 3) uint8 RGB, or None for anything
    outside baseline sequential 8-bit Huffman (progressive, arithmetic,
    hierarchical, 12-bit) or any malformed stream. Handles 1- and
    3-component frames, sampling factors 1-2 per axis (4:4:4 / 4:2:2 /
    4:2:0), DRI/RSTn restarts, and FF00 byte unstuffing."""
    if data[:2] != b"\xff\xd8":
        return None
    try:
        pos = 2
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}
        frame = None
        restart_interval = 0
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                return None  # EOI before any scan decoded
            ln = struct.unpack_from(">H", data, pos + 2)[0]
            payload = data[pos + 4:pos + 2 + ln]
            if marker == 0xDB:
                at = 0
                while at < len(payload):
                    pq, tq = payload[at] >> 4, payload[at] & 0x0F
                    at += 1
                    if pq == 0:
                        vals = np.frombuffer(payload, np.uint8, 64, at)
                        at += 64
                    else:
                        vals = np.frombuffer(payload, ">u2", 64, at)
                        at += 128
                    tbl = np.zeros((8, 8), np.int64)
                    tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                    qt[tq] = tbl
            elif marker == 0xC4:
                at = 0
                while at < len(payload):
                    tc, th = payload[at] >> 4, payload[at] & 0x0F
                    bits = list(payload[at + 1:at + 17])
                    n = sum(bits)
                    vals = list(payload[at + 17:at + 17 + n])
                    huff[(tc, th)] = _decode_table(bits, vals)
                    at += 17 + n
            elif marker in (0xC0, 0xC1):
                prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
                if prec != 8 or nc not in (1, 3):
                    return None
                comps = []
                for i in range(nc):
                    cid, hvb, tq = struct.unpack_from(">BBB", payload, 6 + 3 * i)
                    comps.append((cid, hvb >> 4, hvb & 0x0F, tq))
                frame = (fh, fw, comps)
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame types
            elif marker == 0xDD:
                restart_interval = struct.unpack_from(">H", payload, 0)[0]
            elif marker == 0xDA:
                if frame is None:
                    return None
                return _decode_scan(data, pos + 2 + ln, payload, frame, qt,
                                    huff, restart_interval)
            pos += 2 + ln
        return None
    except (struct.error, ValueError, EOFError, IndexError, KeyError):
        return None


def _decode_scan(data: bytes, entropy_start: int, sos: bytes, frame,
                 qt, huff, restart_interval: int) -> np.ndarray | None:
    fh, fw, comps = frame
    ns = sos[0]
    if ns != len(comps):
        return None  # only single interleaved scans (baseline norm)
    scan_tabs = {}
    for i in range(ns):
        cs, tt = sos[1 + 2 * i], sos[2 + 2 * i]
        scan_tabs[cs] = (tt >> 4, tt & 0x0F)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(1 <= c[1] <= 2 and 1 <= c[2] <= 2 for c in comps):
        return None
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # split the entropy stream on markers, de-stuffing FF00 as we go
    segments: list[bytes] = []
    cur = bytearray()
    p = entropy_start
    while p < len(data):
        b = data[p]
        if b == 0xFF and p + 1 < len(data):
            nxt = data[p + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next real marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))

    planes = []
    for _, ch, cv, _tq in comps:
        planes.append(np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), np.uint8))
    preds = [0] * len(comps)
    seg_i = 0
    br = _BitReader(segments[0])
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                seg_i += 1
                if seg_i >= len(segments):
                    return None
                br = _BitReader(segments[seg_i])
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = scan_tabs[cid]
                dc_tab, ac_tab = huff.get((0, td)), huff.get((1, ta))
                if dc_tab is None or ac_tab is None or tq not in qt:
                    return None
                for by in range(cv):
                    for bx in range(ch):
                        pix, preds[ci] = _decode_block(
                            br, dc_tab, ac_tab, qt[tq], preds[ci])
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1

    if len(comps) == 1:
        gray = planes[0][:fh, :fw]
        return np.ascontiguousarray(np.repeat(gray[:, :, None], 3, axis=2))
    full = []
    ys = np.arange(fh)
    xs = np.arange(fw)
    for pi, (_, ch, cv, _tq) in enumerate(comps):
        # nearest upsample from the component grid to frame resolution
        full.append(planes[pi][np.ix_(ys * cv // vmax, xs * ch // hmax)]
                    .astype(np.float64))
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


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


# ---------------------------------------------------------------------------
# GIF (87a/89a): palette-indexed frames under variable-width LZW. The one
# mainstream container where multi-frame ("video") decode needs no codec
# library — so the frame-extraction surface (frame_sample_plan's decode
# step) can be REAL here, not a plan-only stub. Scope: global/local color
# tables, GCE blocks (skipped), multiple full- or sub-frame images
# composited onto the logical screen, interlace supported; transparency
# and disposal modes beyond 'draw over' are out of scope and simply
# composite as opaque draws.
# ---------------------------------------------------------------------------

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Standard GIF LZW: codes start at min_code_size+1 bits, dictionary
    grows to 4096 then emits CLEAR and resets. LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def reset():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    out_bits.append((clear, width))
    prefix: tuple[int, ...] = ()
    for px in indices:
        cand = prefix + (int(px),)
        if cand in table:
            prefix = cand
            continue
        out_bits.append((table[prefix], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            out_bits.append((clear, width))
            table, next_code, width = reset()
        prefix = (int(px),)
    if prefix:
        out_bits.append((table[prefix], width))
    out_bits.append((eoi, width))

    acc = 0
    nbits = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray | None:
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    out = np.empty(npix, np.uint8)
    at = 0
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset_table():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    while at < npix:
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = reset_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        n = min(len(entry), npix - at)
        out[at:at + n] = np.frombuffer(entry[:n], np.uint8)
        at += n
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out if at == npix else None


_GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def encode_gif(frames: list[np.ndarray], palette: bytes = _GRAY_PALETTE,
               interlace: bool = False) -> bytes:
    """List of (H, W) uint8 palette-index frames -> GIF89a bytes with a
    256-entry global color table (default: identity grayscale, so index
    == gray value — the property the SQL oracles lean on). Multi-frame
    inputs become an animated stream (one image block per frame, no
    GCE/delays — timing is not this codec's concern); ``interlace``
    stores rows in the 4-pass interlaced order."""
    h, w = frames[0].shape
    assert all(f.shape == (h, w) for f in frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256 entries
    out += palette
    order = ([*range(0, h, 8)] + [*range(4, h, 8)]
             + [*range(2, h, 4)] + [*range(1, h, 2)])
    for fr in frames:
        if interlace:
            fr = fr[order]
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0)
        out += bytes([8])  # LZW min code size
        lzw = _lzw_encode(fr.reshape(-1), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = ([*range(0, h, 8)] + [*range(4, h, 8)]
             + [*range(2, h, 4)] + [*range(1, h, 2)])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(data: bytes) -> list[np.ndarray] | None:
    """GIF bytes -> list of (H, W, 3) uint8 RGB frames (each the full
    logical screen, sub-frames composited over the previous frame), or
    None for malformed streams."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        canvas = np.zeros((h, w, 3), np.uint8)
        frames: list[np.ndarray] = []
        while pos < len(data):
            b = data[pos]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension: label + sub-blocks, skip
                pos += 2
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
                continue
            if b != 0x2C:
                return None
            fx, fy, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                return None
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(lzw), mcs, fw * fh)
            if idx is None or int(idx.max()) >= table.shape[0]:
                return None
            rows = idx.reshape(fh, fw)
            if iflags & 0x40:
                rows = _deinterlace(rows)
            canvas = canvas.copy()
            canvas[fy:fy + fh, fx:fx + fw] = table[rows]
            frames.append(canvas)
        return frames if frames else None
    except (struct.error, ValueError, IndexError):
        return None


def decode_gif(data: bytes) -> np.ndarray | None:
    """First frame of a GIF as (H, W, 3) RGB — the still-image view."""
    frames = decode_gif_frames(data)
    return frames[0] if frames else None
