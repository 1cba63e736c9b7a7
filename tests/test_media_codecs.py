"""Unit tests for the pure-NumPy media codecs (operators/media_codecs).

These run without Spark: the kernels execute inside mapInPandas workers,
so their contract is plain arrays-in/arrays-out. Orientation, padding and
format edge cases live here; the Spark-side plumbing and the closed-form
oracle parity live in the multimodal oracle-suite entries.
"""

import numpy as np
import pytest

from amundsendatabuilder_spark.operators.media_codecs import (
    PNG_SIG, _png_chunk, avg_hash, decode_bmp, decode_png, decode_ppm,
    encode_bmp, encode_png, encode_ppm, gray_digest_string, pcm16_rms,
    resize_nearest, sniff_decode, to_gray,
)


def _asym_image(h=13, w=17):
    # asymmetric content: catches row-order (bottom-up) and channel-order
    # (BGR) mistakes that a symmetric ramp would mask
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_asymmetric():
    img = _asym_image()
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_row_padding_widths():
    # widths 1..8 cover every 4-byte padding residue
    for w in range(1, 9):
        img = _asym_image(5, w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), w


def test_bmp_top_down_rows():
    img = _asym_image(4, 4)
    data = bytearray(encode_bmp(img))
    # flip the stored height negative (top-down) and reverse the rows:
    # decode must undo exactly one of the two inversions
    import struct
    w, h = 4, 4
    struct.pack_into("<i", data, 22, -h)
    stride = (w * 3 + 3) // 4 * 4
    off = 54
    rows = [bytes(data[off + i * stride: off + (i + 1) * stride])
            for i in range(h)]
    data[off:off + stride * h] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(data)), img)


def test_bmp_rejects_unsupported():
    img = _asym_image(4, 4)
    data = bytearray(encode_bmp(img))
    import struct
    struct.pack_into("<I", data, 30, 1)  # BI_RLE8 compression
    assert decode_bmp(bytes(data)) is None
    assert decode_bmp(b"BMshort") is None
    assert decode_bmp(b"") is None


def test_ppm_roundtrip_and_comments():
    img = _asym_image(7, 5)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    with_comment = (b"P6\n# a netpbm comment\n5 7\n255\n"
                    + img.tobytes())
    assert np.array_equal(decode_ppm(with_comment), img)
    assert decode_ppm(b"P6\n0 0\n255\n") is None


def test_sniff_dispatch():
    img = _asym_image(3, 3)
    assert np.array_equal(sniff_decode(encode_bmp(img)), img)
    assert np.array_equal(sniff_decode(encode_ppm(img)), img)
    assert sniff_decode(b"\x89PNG\r\n") is None
    assert sniff_decode(b"") is None


def test_to_gray_identity_on_gray_pixels():
    v = np.arange(256, dtype=np.uint8)
    rgb = np.stack([v, v, v], axis=-1)[None, :, :]
    assert np.array_equal(to_gray(rgb)[0], np.arange(256))


def test_resize_nearest_floor_map():
    img = np.arange(12).reshape(3, 4)
    out = resize_nearest(img, 2, 2)
    # src = (dst * n) // m: rows (0*3)//2=0, (1*3)//2=1; cols 0, 2
    assert out.tolist() == [[0, 2], [4, 6]]
    # identity when dims match
    assert np.array_equal(resize_nearest(img, 4, 3), img)


def test_avg_hash_known_value():
    # left-half 0, right-half 255: thumb row = 0,0,0,0,255,255,255,255;
    # avg 127.5 -> bits 00001111 -> byte 0x0f repeated
    gray = np.zeros((16, 16), dtype=np.int64)
    gray[:, 8:] = 255
    assert avg_hash(gray) == "0f" * 8
    # constant image: every pixel >= avg -> all ones
    assert avg_hash(np.full((5, 5), 7)) == "f" * 16


def test_gray_digest_string_canonical():
    assert gray_digest_string(np.array([[1, 2], [3, 4]])) == "1,2;3,4"


def test_pcm16_rms():
    full = np.full(100, 32768 // 2, dtype="<i2")
    assert pcm16_rms(full.tobytes(), 0, 100) == pytest.approx(0.5)
    assert pcm16_rms(full.tobytes(), 100, 200) is None  # window past end
    assert pcm16_rms(b"", 0, 10) is None
    # trailing odd byte dropped, window clipped to available samples
    assert pcm16_rms(full.tobytes() + b"\x01", 0, 100) == pytest.approx(0.5)


def test_png_round_trip_every_filter():
    rgb = _asym_image()
    for ft in range(5):
        data = encode_png(rgb, filter_type=ft)
        back = decode_png(data)
        assert back is not None and np.array_equal(back, rgb), f"filter {ft}"
        assert np.array_equal(sniff_decode(data), rgb)


def test_png_gray_and_rgba_color_types():
    import struct
    import zlib
    rng = np.random.default_rng(11)
    # color type 0 (grayscale): replicated across channels
    g = rng.integers(0, 256, (9, 12), dtype=np.uint8)
    raw = b"".join(bytes([0]) + g[y].tobytes() for y in range(9))
    png = (PNG_SIG
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 12, 9, 8, 0, 0, 0, 0))
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    back = decode_png(png)
    assert back.shape == (9, 12, 3)
    assert all(np.array_equal(back[:, :, c], g) for c in range(3))
    # color type 6 (RGBA): alpha dropped
    a4 = rng.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    raw = b"".join(bytes([0]) + a4[y].tobytes() for y in range(5))
    png = (PNG_SIG
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 6, 0, 0, 0))
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), a4[:, :, :3])


def test_png_rejects_corruption_and_unsupported():
    rgb = _asym_image()
    good = encode_png(rgb, filter_type=1)
    # flipped IDAT byte -> CRC mismatch -> None (not garbage pixels)
    bad = bytearray(good)
    bad[50] ^= 0xFF
    assert decode_png(bytes(bad)) is None
    # truncation mid-chunk
    assert decode_png(good[: len(good) // 2]) is None
    # wrong magic entirely
    assert decode_png(b"JFIF not a png") is None
    assert sniff_decode(b"JFIF not a png") is None
    # 16-bit depth unsupported -> None, never misdecoded
    import struct
    import zlib
    raw = bytes([0]) + bytes(12)
    png16 = (PNG_SIG
             + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0))
             + _png_chunk(b"IDAT", zlib.compress(raw))
             + _png_chunk(b"IEND", b""))
    assert decode_png(png16) is None


def test_png_decode_matches_bmp_decode_same_pixels():
    """The two real codecs must agree: the same RGB content encoded as
    BMP and as PNG decodes to identical pixel arrays (so every downstream
    feature — luma, phash, resize digest — is container-independent)."""
    rgb = _asym_image(h=21, w=10)
    assert np.array_equal(decode_bmp(encode_bmp(rgb)),
                          decode_png(encode_png(rgb, filter_type=4)))


# ---------------------------------------------------------------------------
# JPEG (baseline sequential, ITU T.81)
# ---------------------------------------------------------------------------

def _flat_block_image(w=96, h=80, seed=11):
    """Grid of flat 8x8 gray blocks — content whose lossy JPEG round trip
    is exact by construction (DC-only spectrum, DC quant step 8)."""
    bx = np.arange(w) // 8
    by = np.arange(h) // 8
    v = ((bx[None, :] * 29 + by[:, None] * 53 + seed) % 256).astype(np.uint8)
    return np.ascontiguousarray(np.repeat(v[:, :, None], 3, axis=2))


def test_jpeg_flat_blocks_exact_all_layouts():
    from amundsendatabuilder_spark.operators.media_codecs import (
        decode_jpeg, encode_jpeg)
    img = _flat_block_image()
    for kwargs in (dict(subsampling="444"), dict(subsampling="420"),
                   dict(gray=True),
                   dict(subsampling="444", restart_interval=4),
                   dict(subsampling="420", restart_interval=3),
                   dict(gray=True, restart_interval=7)):
        out = decode_jpeg(encode_jpeg(img, **kwargs))
        assert out is not None and out.shape == img.shape, kwargs
        assert np.array_equal(out, img), kwargs


def test_jpeg_non_multiple_of_8_dims():
    from amundsendatabuilder_spark.operators.media_codecs import (
        decode_jpeg, encode_jpeg)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    for kwargs in (dict(subsampling="444"),
                   dict(subsampling="420", restart_interval=2),
                   dict(gray=True)):
        out = decode_jpeg(encode_jpeg(img, **kwargs))
        assert out is not None and out.shape == img.shape, kwargs


def test_jpeg_smooth_content_close():
    # quantization noise only: a smooth gradient must survive with small
    # mean error (a Huffman/zigzag/IDCT bug produces garbage, not ~1 LSB)
    from amundsendatabuilder_spark.operators.media_codecs import (
        decode_jpeg, encode_jpeg)
    xx = np.linspace(0, 255, 90)
    yy = np.linspace(0, 255, 70)
    g = np.clip(np.rint((xx[None, :] + yy[:, None]) / 2), 0, 255).astype(np.uint8)
    img = np.stack([g, g, g], axis=2)
    out = decode_jpeg(encode_jpeg(img, "444"))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0


def test_jpeg_rejects_corrupt_and_non_baseline():
    from amundsendatabuilder_spark.operators.media_codecs import (
        decode_jpeg, encode_jpeg)
    img = _flat_block_image(48, 16)
    good = encode_jpeg(img)
    assert decode_jpeg(good[: len(good) // 2]) is None  # truncated scan
    assert decode_jpeg(b"\xff\xd8garbage") is None
    assert decode_jpeg(b"not a jpeg") is None
    # progressive (SOF2) flagged unsupported, not misdecoded: rewrite the
    # SOF0 marker byte in place
    prog = bytearray(good)
    at = prog.find(b"\xff\xc0")
    prog[at + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None


def test_jpeg_sniff_and_cross_codec_pixel_parity():
    # same content through BMP and JPEG (flat blocks -> exact) must give
    # identical pixels, keeping features container-independent
    from amundsendatabuilder_spark.operators.media_codecs import (
        decode_jpeg, encode_jpeg)
    img = _flat_block_image(64, 32, seed=5)
    assert np.array_equal(sniff_decode(encode_jpeg(img, "420")),
                          decode_bmp(encode_bmp(img)))
    assert sniff_decode(encode_jpeg(img)).shape == img.shape


# ---------------------------------------------------------------------------
# GIF (87a/89a, LZW)
# ---------------------------------------------------------------------------

def test_gif_lzw_round_trip_and_kwkwk():
    from amundsendatabuilder_spark.operators.media_codecs import (
        _lzw_decode, _lzw_encode)
    rng = np.random.default_rng(5)
    for n in (1, 10, 5000, 20000):  # 20k forces dict growth past 12 bits
        idx = rng.integers(0, 256, n).astype(np.uint8)
        assert np.array_equal(_lzw_decode(_lzw_encode(idx, 8), 8, n), idx), n
    runs = np.array([3, 3, 3, 3, 3, 3, 3, 3] * 100, np.uint8)  # KwKwK codes
    assert np.array_equal(
        _lzw_decode(_lzw_encode(runs, 8), 8, len(runs)), runs)


def test_gif_single_frame_and_interlace_round_trip():
    from amundsendatabuilder_spark.operators.media_codecs import (
        decode_gif, encode_gif)
    v = ((np.arange(40)[:, None] * 7 + np.arange(56)[None, :] * 3) % 256) \
        .astype(np.uint8)
    for il in (False, True):
        out = decode_gif(encode_gif([v], interlace=il))
        assert out.shape == (40, 56, 3), il
        # identity gray palette: every channel equals the index plane
        assert all(np.array_equal(out[:, :, c], v) for c in range(3)), il


def test_gif_animated_frames_in_order():
    from amundsendatabuilder_spark.operators.media_codecs import (
        decode_gif_frames, encode_gif)
    base = ((np.arange(24)[:, None] * 5 + np.arange(32)[None, :]) % 256) \
        .astype(np.uint8)
    frames = [((base.astype(int) + 13 * f) % 256).astype(np.uint8)
              for f in range(4)]
    got = decode_gif_frames(encode_gif(frames))
    assert len(got) == 4
    for f in range(4):
        assert np.array_equal(got[f][:, :, 0], frames[f]), f


def test_gif_rejects_corruption():
    from amundsendatabuilder_spark.operators.media_codecs import (
        decode_gif, encode_gif)
    v = np.zeros((16, 16), np.uint8)
    g = encode_gif([v])
    assert decode_gif(g[:30]) is None
    assert decode_gif(b"GIF89a garbage") is None
    assert decode_gif(b"nope") is None
    assert sniff_decode(g).shape == (16, 16, 3)
