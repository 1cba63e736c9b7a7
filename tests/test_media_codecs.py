"""Unit tests for the pure-NumPy media codecs (operators/media_codecs).

These run without Spark: the kernels execute inside mapInPandas workers,
so their contract is plain arrays-in/arrays-out. Orientation, padding and
format edge cases live here; the Spark-side plumbing and the closed-form
oracle parity live in the multimodal oracle-suite entries.
"""

import numpy as np
import pytest

from amundsendatabuilder_spark.operators.media_codecs import (
    avg_hash, decode_bmp, decode_ppm, encode_bmp, encode_ppm,
    gray_digest_string, pcm16_rms, resize_nearest, sniff_decode, to_gray,
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
