"""From-scratch PNG codec (functions/png.py): hand-computed,
encoder-independent filter vectors; round-trips over all five filters;
corrupt-byte rejection; the MediaDecoder real-decode path."""

import struct
import zlib

import numpy as np
import pytest

from ray_extract.functions.png import (
    PNG_MAGIC,
    PngError,
    _chunk,
    is_png,
    png_decode,
    png_encode_gray,
)


def _hand_png(w, h, raw):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_cycled_filters():
    rng = np.random.default_rng(7)
    for (h, w) in [(1, 1), (2, 3), (8, 8), (13, 31), (15, 31), (64, 64)]:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        d = png_decode(png_encode_gray(px))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
        assert np.array_equal(d["pixels"], px)


# Encoder-independent vectors: filtered scanline bytes hand-worked from the
# PNG spec's reconstruction formulas, so a matched encode/decode bug cannot
# cancel out.
def test_hand_vector_none():
    assert png_decode(_hand_png(1, 1, b"\x00\x99"))["pixels"][0, 0] == 0x99


def test_hand_vector_sub():
    # Recon(x) = Filt(x) + Recon(left): [10, 10+5, 15+7]
    d = png_decode(_hand_png(3, 1, bytes([1, 10, 5, 7])))
    assert d["pixels"][0].tolist() == [10, 15, 22]


def test_hand_vector_up():
    # row0 None [1,2,3]; row1 Up: Filt + up = [4+1, 5+2, 6+3]
    d = png_decode(_hand_png(3, 2, bytes([0, 1, 2, 3, 2, 4, 5, 6])))
    assert d["pixels"].tolist() == [[1, 2, 3], [5, 7, 9]]


def test_hand_vector_average():
    # row0 None [10,20,30]; row1 Avg: 1+(0+10)//2=6; 2+(6+20)//2=15;
    # 3+(15+30)//2=25
    d = png_decode(_hand_png(3, 2, bytes([0, 10, 20, 30, 3, 1, 2, 3])))
    assert d["pixels"].tolist() == [[10, 20, 30], [6, 15, 25]]


def test_hand_vector_paeth():
    # row0 None [10,20,30]; row1 Paeth predictors resolve to up each time:
    # 1+10=11; 2+20=22; 3+30=33
    d = png_decode(_hand_png(3, 2, bytes([0, 10, 20, 30, 4, 1, 2, 3])))
    assert d["pixels"].tolist() == [[10, 20, 30], [11, 22, 33]]


def test_crc_corruption_raises():
    good = png_encode_gray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    bad = bytearray(good)
    bad[40] ^= 0xFF  # inside IDAT payload -> CRC mismatch
    with pytest.raises(PngError):
        png_decode(bytes(bad))


def test_truncation_raises():
    good = png_encode_gray(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(PngError):
        png_decode(good[: len(good) // 2])


def test_not_png_rejected():
    assert not is_png(b"%PDF-1.7 etc")
    with pytest.raises(PngError):
        png_decode(b"%PDF-1.7 not a png at all")


def test_media_decoder_real_png_path():
    from ray_extract.pipelines.media import MediaDecoder

    px = (np.add.outer(np.arange(5), np.arange(7)) % 251).astype(np.uint8)
    feats = MediaDecoder().decode_bytes(png_encode_gray(px))
    assert feats == {
        "width": 7,
        "height": 5,
        "channels": 1,
        "pixel_sum": int(px.sum()),
        "pixel_min": int(px.min()),
        "pixel_max": int(px.max()),
    }
    with pytest.raises(NotImplementedError):
        MediaDecoder().decode_bytes(b"\xff\xd8\xff jpeg bytes")
