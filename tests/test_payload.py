"""SPDF codec: roundtrip, validation, page slicing, split ranges.

Mirrors the reference's split/merge test coverage (tests/test_utils.py:51-230).
"""

import numpy as np
import pytest

from ray_extract import payload as P
from ray_extract.derive import derive_flat, derive_payload
from ray_extract.fixtures import corrupt_payloads, edge_corpus


def test_roundtrip():
    flat = derive_flat("d1", "one two three four five six seven eight nine ten "
                             "eleven twelve thirteen fourteen fifteen sixteen")
    raw = P.encode(flat)
    assert P.is_valid(raw)
    back = P.decode(raw)
    for k in ("pages", "paras", "tables", "cells"):
        assert np.array_equal(back[k], np.asarray(flat[k])), k
    for k in ("text_blob", "media_blob", "cell_blob"):
        assert bytes(back[k]) == bytes(flat[k])


def test_magic_and_truncation():
    for name, raw in corrupt_payloads().items():
        assert not P.is_valid(raw), name
    good = derive_payload("d", "a b c d e f g h i j k l")
    assert P.is_valid(good)
    assert not P.is_valid(good + b"x")  # trailing garbage


def test_split_page_ranges_reference_cases():
    # reference tests/test_utils.py:185-230
    assert P.split_page_ranges(1, 1) == [(1, 1)]
    assert P.split_page_ranges(2, 1) == [(1, 1), (2, 2)]
    assert P.split_page_ranges(2, 2) == [(1, 2)]
    assert P.split_page_ranges(68, 12) == [
        (1, 12), (13, 24), (25, 36), (37, 48), (49, 60), (61, 68)
    ]
    assert P.split_page_ranges(68, 50) == [(1, 50), (51, 68)]
    with pytest.raises(ValueError):
        P.split_page_ranges(10, 0)  # reference utils.py:123-124


def test_slice_pages_standalone():
    raw = edge_corpus()["edge.sixty8"]
    flat = P.decode(raw)
    sub = P.slice_pages(flat, 13, 24)
    assert len(sub["pages"]) == 12
    # pages rebased to 1..12
    assert sub["paras"]["page"].min() == 1 and sub["paras"]["page"].max() == 12
    # shard payload is itself a valid standalone document
    sraw = P.encode(sub)
    assert P.is_valid(sraw)
    back = P.decode(sraw)
    # paragraph texts of pages 13..24 survive with doc-global offsets
    texts = P.strings_from_lens(back["paras"]["text_len"], back["text_blob"]).to_pylist()
    assert texts[0] == "page 13 text"
    assert back["paras"]["offset"][0] == 12 * 12


def test_slice_pages_tables_and_media():
    text = " ".join(f"w{i}" for i in range(160))  # 40 spans, 7 pages, tables+media
    flat = derive_flat("d2", text)
    n_pages = len(flat["pages"])
    assert n_pages == 7
    # reassemble all shards: concatenated content must equal the original
    parts = [P.slice_pages(flat, lo, hi) for lo, hi in P.split_page_ranges(n_pages, 3)]
    assert sum(len(p["paras"]) for p in parts) == len(flat["paras"])
    assert sum(len(p["cells"]) for p in parts) == len(flat["cells"])
    assert sum(len(p["tables"]) for p in parts) == len(flat["tables"])
    assert b"".join(bytes(p["text_blob"]) for p in parts) == bytes(flat["text_blob"])
    assert b"".join(bytes(p["media_blob"]) for p in parts) == bytes(flat["media_blob"])
    assert b"".join(bytes(p["cell_blob"]) for p in parts) == bytes(flat["cell_blob"])


def test_md5():
    raw = derive_payload("d", "a b c d")
    h = P.md5_hex(raw)
    import re

    assert re.fullmatch(r"[a-f0-9]{32}", h)  # reference tests/helpers.py:7-14
