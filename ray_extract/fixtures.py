"""Handcrafted edge-case SPDF documents for unit/property tests.

Each document targets a specific reference behavior (see SURVEY.md §5 and
FIXTURES.md F-1 coverage list):

- ``gaps``: paragraphs without bounding regions are dropped from text blocks
  but still consume an enumerate id (reference convert.py:88-96).
- ``badpage``: pages missing width/height are dropped from page metadata
  (reference convert.py:172-198).
- ``nospancell``: table cells with empty span lists never tag a paragraph
  (reference convert.py:214, tests/conftest.py:316-349).
- ``badcell``: cells missing kind/row_span/column_span/bounding region are
  filtered from experimental table blocks (reference convert.py:130-135).
- ``asym``: span keys where offset != length, catching (length, offset)
  key-order mistakes (reference convert.py:215 vs tests/test_convert.py:189).
- ``sixty8``: 68 pages to exercise split into 6 shards of 12 pages with ranges
  (1,12)...(61,68) (reference tests/test_utils.py:221-230).
- ``empty``: zero paragraphs (languages -> None path).
"""

from __future__ import annotations

import numpy as np

from .derive import derive_flat
from .payload import CELL_DT, PAGE_DT, PARA_DT, TAB_DT, Flat, encode
from .vocab import (
    CELL_KIND_TO_ID,
    FLAG_COLSPAN_PRESENT,
    FLAG_HAS_REGION,
    FLAG_HAS_SPAN,
    FLAG_KIND_PRESENT,
    FLAG_ROWSPAN_PRESENT,
    NO_ROLE,
    ROLE_TO_ID,
)

FULL_CELL_FLAGS = (
    FLAG_HAS_REGION | FLAG_HAS_SPAN | FLAG_KIND_PRESENT | FLAG_ROWSPAN_PRESENT | FLAG_COLSPAN_PRESENT
)

_POLY = [1.0, 1.0, 7.0, 1.0, 7.0, 2.0, 1.0, 2.0]


def build_flat(pages, paras, tables=()):
    """Assemble a Flat from compact python specs.

    pages: list of (width, height) — NaN allowed.
    paras: list of dicts {page, role(str|None), text, media, offset, length,
           has_region(bool)}.
    tables: list of dicts {page, row_count, col_count, cells: [
           {row, col, rowspan(int|None), colspan(int|None), kind(str|None),
            text, page, offset, length, has_region, has_span}]}.
    """
    pg = np.zeros(len(pages), dtype=PAGE_DT)
    for i, (w, h) in enumerate(pages):
        pg[i] = (w, h)

    pa_arr = np.zeros(len(paras), dtype=PARA_DT)
    text_parts, media_parts = [], []
    for i, p in enumerate(paras):
        tb = p["text"].encode()
        mb = p.get("media", "").encode()
        text_parts.append(tb)
        media_parts.append(mb)
        flags = (FLAG_HAS_REGION if p.get("has_region", True) else 0) | FLAG_HAS_SPAN
        role = NO_ROLE if p.get("role") is None else ROLE_TO_ID[p["role"]]
        pa_arr[i] = (p["page"], role, p["offset"], p["length"], flags, len(tb), len(mb), 0, _POLY)

    n_cells = sum(len(t["cells"]) for t in tables)
    tb_arr = np.zeros(len(tables), dtype=TAB_DT)
    cell_arr = np.zeros(n_cells, dtype=CELL_DT)
    cell_parts = []
    ci = 0
    for ti, t in enumerate(tables):
        tb_arr[ti] = (t["page"], t["row_count"], t["col_count"], len(t["cells"]), 0, 0, _POLY)
        for c in t["cells"]:
            ctb = c["text"].encode()
            cell_parts.append(ctb)
            flags = (
                (FLAG_HAS_REGION if c.get("has_region", True) else 0)
                | (FLAG_HAS_SPAN if c.get("has_span", True) else 0)
                | (FLAG_KIND_PRESENT if c.get("kind") is not None else 0)
                | (FLAG_ROWSPAN_PRESENT if c.get("rowspan") is not None else 0)
                | (FLAG_COLSPAN_PRESENT if c.get("colspan") is not None else 0)
            )
            cell_arr[ci] = (
                CELL_KIND_TO_ID.get(c.get("kind"), 0),
                c["row"],
                c["col"],
                c.get("rowspan") or 0,
                c.get("colspan") or 0,
                c["offset"],
                c["length"],
                flags,
                c["page"],
                len(ctb),
                _POLY,
            )
            ci += 1

    return Flat(
        pages=pg,
        paras=pa_arr,
        tables=tb_arr,
        cells=cell_arr,
        text_blob=b"".join(text_parts),
        media_blob=b"".join(media_parts),
        cell_blob=b"".join(cell_parts),
    )


def edge_corpus() -> dict[str, bytes]:
    """doc_id -> payload bytes for the edge-case documents."""
    docs: dict[str, bytes] = {}

    # gaps: paragraph 1 of 3 has no bounding region -> text_block_ids "0","2"
    docs["edge.gaps"] = encode(
        build_flat(
            pages=[(8.5, 11.0)],
            paras=[
                {"page": 1, "role": "title", "text": "kept one", "offset": 0, "length": 8},
                {"page": 1, "role": None, "text": "dropped", "offset": 9, "length": 7, "has_region": False},
                {"page": 1, "role": None, "text": "kept two", "offset": 17, "length": 8},
            ],
        )
    )

    # badpage: second page missing dimensions -> dropped from page metadata
    docs["edge.badpage"] = encode(
        build_flat(
            pages=[(8.5, 11.0), (float("nan"), float("nan")), (6.0, 9.0)],
            paras=[
                {"page": 1, "role": None, "text": "a b", "offset": 0, "length": 3},
                {"page": 2, "role": None, "text": "c d", "offset": 4, "length": 3},
                {"page": 3, "role": None, "text": "e f", "offset": 8, "length": 3},
            ],
        )
    )

    # nospancell: cell without spans -> paragraph NOT tagged TableCell
    docs["edge.nospancell"] = encode(
        build_flat(
            pages=[(8.5, 11.0)],
            paras=[
                {"page": 1, "role": None, "text": "cellish", "offset": 0, "length": 7},
                {"page": 1, "role": None, "text": "plain", "offset": 8, "length": 5},
            ],
            tables=[
                {
                    "page": 1,
                    "row_count": 1,
                    "col_count": 1,
                    "cells": [
                        {
                            "row": 0, "col": 0, "rowspan": 1, "colspan": 1, "kind": "content",
                            "text": "cellish", "page": 1, "offset": 0, "length": 7,
                            "has_span": False,
                        }
                    ],
                }
            ],
        )
    )

    # badcell: 3 cells; one missing kind, one missing rowspan -> 1 cell survives
    # in experimental table block, but all WITH spans still tag paragraphs
    docs["edge.badcell"] = encode(
        build_flat(
            pages=[(8.5, 11.0)],
            paras=[
                {"page": 1, "role": None, "text": "aaaa", "offset": 0, "length": 4},
                {"page": 1, "role": None, "text": "bbbb", "offset": 5, "length": 4},
                {"page": 1, "role": None, "text": "cccc", "offset": 10, "length": 4},
            ],
            tables=[
                {
                    "page": 1,
                    "row_count": 3,
                    "col_count": 1,
                    "cells": [
                        {"row": 0, "col": 0, "rowspan": 1, "colspan": 1, "kind": "content",
                         "text": "aaaa", "page": 1, "offset": 0, "length": 4},
                        {"row": 1, "col": 0, "rowspan": 1, "colspan": 1, "kind": None,
                         "text": "bbbb", "page": 1, "offset": 5, "length": 4},
                        {"row": 2, "col": 0, "rowspan": None, "colspan": 1, "kind": "content",
                         "text": "cccc", "page": 1, "offset": 10, "length": 4},
                    ],
                }
            ],
        )
    )

    # asym: paragraph span (offset=3, length=9) vs a cell span (offset=9,
    # length=3). A (length, offset) key implementation must NOT match them.
    docs["edge.asym"] = encode(
        build_flat(
            pages=[(8.5, 11.0)],
            paras=[
                {"page": 1, "role": None, "text": "ninechars", "offset": 3, "length": 9},
                {"page": 1, "role": None, "text": "abc", "offset": 9, "length": 3},
            ],
            tables=[
                {
                    "page": 1,
                    "row_count": 1,
                    "col_count": 1,
                    "cells": [
                        {"row": 0, "col": 0, "rowspan": 1, "colspan": 1, "kind": "content",
                         "text": "abc", "page": 1, "offset": 9, "length": 3},
                    ],
                }
            ],
        )
    )

    # empty: no paragraphs at all -> no blocks, languages None
    docs["edge.empty"] = encode(build_flat(pages=[(8.5, 11.0)], paras=[]))

    # sixty8: 68 pages, one paragraph per page (split tests use batch size 12)
    docs["edge.sixty8"] = encode(
        build_flat(
            pages=[(8.5, 11.0)] * 68,
            paras=[
                {"page": p + 1, "role": None, "text": f"page {p + 1} text", "offset": 12 * p, "length": 11}
                for p in range(68)
            ],
        )
    )

    # derived: a normal derived doc for parity with the derive rules
    docs["edge.derived"] = encode(
        derive_flat("edge.derived", "the quick brown fox jumps over the lazy dog and then "
                                    "runs far away into the woods to find a very big table "
                                    "of data with many rows and columns inside it today now "
                                    "plus some more words to cross a page boundary here soon "
                                    "and even more filler words to reach several pages total")
    )
    return docs


def corrupt_payloads() -> dict[str, bytes]:
    """Invalid byte-streams for the dead-letter path (magic check,
    reference tests/helpers.py:17-21 + run.py:38-39 silent-drop semantics)."""
    good = next(iter(edge_corpus().values()))
    return {
        "bad.notpdf": b"%PDF-1.7 this is a real pdf, not an SPDF",
        "bad.truncated": good[: len(good) // 2],
        "bad.empty": b"",
    }
