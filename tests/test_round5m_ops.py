"""Semantic pins for the round-5 media-metadata batch beyond oracle
parity: codec round-trips (BMP pixels, TIFF both endians, MP3 frame
chain, ID3 syncsafe) and malformed-input rejection for every decoder.
"""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_bmp_roundtrip_and_padding():
    from ray_extract.functions.mediameta import bmp_decode, bmp_encode

    # width 3 -> 9-byte rows -> 3 bytes padding per row: stride handling
    px = (np.arange(3 * 3 * 3) % 251).astype(np.uint8).reshape(3, 3, 3)
    d = bmp_decode(bmp_encode(3, 3, px))
    assert np.array_equal(d["pixels"], px)
    with pytest.raises(ValueError):
        bmp_decode(b"XX" + bytes(60))
    with pytest.raises(ValueError):
        bmp_decode(bmp_encode(3, 3, px)[:-5])  # truncated pixel data


def test_jpeg_marker_walk_skips_variable_segments():
    from ray_extract.functions.mediameta import jpeg_build, jpeg_dimensions

    for nc in range(3):
        d = jpeg_dimensions(jpeg_build(321, 123, nc))
        assert (d["width"], d["height"], d["n_segments"]) == (321, 123,
                                                              2 + nc)
    with pytest.raises(ValueError):
        jpeg_dimensions(b"\x00\x00")
    # corrupt a segment length: walk must fail, not return garbage
    blob = bytearray(jpeg_build(10, 10, 1))
    app0 = blob.index(b"\xff\xe0")
    blob[app0 + 2 : app0 + 4] = b"\x00\x05"  # wrong APP0 length
    with pytest.raises(ValueError):
        jpeg_dimensions(bytes(blob))


def test_tiff_both_endians_disagree_bytewise():
    from ray_extract.functions.mediameta import tiff_build, tiff_parse

    le = tiff_build(258, 300, 8, False)
    be = tiff_build(258, 300, 8, True)
    assert le != be  # same logical content, different bytes
    assert tiff_parse(le)["width"] == tiff_parse(be)["width"] == 258
    with pytest.raises(ValueError):
        tiff_parse(b"XX" + le[2:])


def test_mp3_frame_chain_desync_detected():
    from ray_extract.functions.mediameta import (
        MP3_BITRATES,
        MP3_RATES,
        mp3_build,
        mp3_parse,
    )

    spec = [(3, 1, 1), (10, 0, 0)]
    blob = mp3_build(spec)
    d = mp3_parse(blob)
    assert d["n_frames"] == 2
    assert d["total_bytes"] == sum(
        144 * MP3_BITRATES[b] * 1000 // MP3_RATES[s] + p for b, s, p in spec
    )
    # drop one byte: the length hop lands off-sync
    with pytest.raises(ValueError):
        mp3_parse(blob[:-1])


def test_id3_syncsafe_sizes():
    from ray_extract.functions.mediameta import (
        _syncsafe,
        _unsyncsafe,
        id3_build,
        id3_parse,
    )

    # 128 encodes as 0x00 0x00 0x01 0x00 (7-bit groups), NOT 0x00..0x80
    assert _syncsafe(128) == b"\x00\x00\x01\x00"
    assert _unsyncsafe(b"\x00\x00\x01\x00") == 128
    with pytest.raises(ValueError):
        _unsyncsafe(b"\x00\x00\x00\x80")
    long_title = "T" * 130  # frame size crosses the 7-bit boundary
    d = id3_parse(id3_build(long_title, "A"))
    assert d["TIT2"] == long_title and d["TPE1"] == "A"


def test_media_bmp_query_formula(ray_session):
    from ray_extract.pipelines.media import media_decode_bmp

    df = (
        media_decode_bmp(SF).to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(df) == len([d for d in range(500) if d % 11 == 0])
    row = df[df["doc_id"] == 0].iloc[0]
    w, h = 3, 2
    y, x = np.mgrid[0:h, 0:w]
    assert row["sum_b"] == ((0 + 3 * x + 7 * y) % 256).sum()
    assert row["sum_g"] == ((0 + x) % 256).sum()
    assert row["sum_r"] == ((x * y) % 256).sum()
