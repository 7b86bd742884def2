"""Pure-Python oracle implementing the reference's conversion semantics.

Row-oriented, unoptimized, independent of the Ray pipeline code paths — used in
tests as the ground truth for span-sequence equality (kind, text, media_ref,
order). Mirrors, step by step:

- tag_table_paragraphs / get_all_table_cell_spans: reference convert.py:203-236
  (span key is the (length, offset) tuple, convert.py:215,232 — key order kept)
- paragraph -> text block: reference convert.py:46-97 (x72 unit conversion,
  page-1, role-or-"Text", enumerate ids over ALL paragraphs so dropped
  paragraphs leave id gaps, convert.py:88-96)
- page metadata: reference convert.py:159-200 (drop pages missing dimensions)
- experimental tables: reference convert.py:100-156 (filter cells missing
  bounding regions / kind / row_span / column_span; first bounding region only)
- languages: experimental_base.py:135-192 via functions.language (deterministic
  marker-word detector replaces seeded langdetect; aggregation semantics exact)
- split/merge: payload.slice_pages + renumber_pages mirror utils.py:35-114
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from .functions.language import detect_language, document_languages, join_block_texts
from .payload import Flat, decode, strings_from_lens
from .vocab import (
    DEFAULT_BLOCK_TYPE,
    DIMENSION_CONVERSION_FACTOR,
    CELL_KINDS,
    FLAG_COLSPAN_PRESENT,
    FLAG_HAS_REGION,
    FLAG_HAS_SPAN,
    FLAG_KIND_PRESENT,
    FLAG_ROWSPAN_PRESENT,
    NO_ROLE,
    ROLES,
    TABLE_CELL_TYPE,
)


def analyze_result_from_flat(flat: Flat) -> dict:
    """Decode a Flat document into a row-oriented AnalyzeResult-style dict.

    Applies the layout parser's reading-order pass: paragraphs stably sorted
    by (page, top-y, left-x) — identity for byte-streams already in reading
    order, mirroring stages/parse.py. (The reference relies on Azure emitting
    paragraphs in reading order; paragraph order defines span order.)
    """
    paras = flat["paras"]
    texts = strings_from_lens(paras["text_len"], flat["text_blob"]).to_pylist()
    medias = strings_from_lens(paras["media_len"], flat["media_blob"]).to_pylist()
    order = np.lexsort((paras["poly"][:, 0], paras["poly"][:, 1], paras["page"]))
    paragraphs = []
    for k in (int(i) for i in order):
        p = paras[k]
        has_region = bool(p["flags"] & FLAG_HAS_REGION)
        paragraphs.append(
            {
                "role": None if p["role"] == NO_ROLE else ROLES[p["role"]],
                "content": texts[k],
                "media_ref": medias[k],
                "page_number": int(p["page"]),
                "polygon": [float(v) for v in p["poly"]] if has_region else None,
                "spans": [{"offset": int(p["offset"]), "length": int(p["length"])}],
            }
        )

    pages = [
        {
            "page_number": i + 1,
            "width": None if math.isnan(pg["width"]) else float(pg["width"]),
            "height": None if math.isnan(pg["height"]) else float(pg["height"]),
        }
        for i, pg in enumerate(flat["pages"])
    ]

    cells_arr = flat["cells"]
    cell_texts = strings_from_lens(cells_arr["text_len"], flat["cell_blob"]).to_pylist()
    tables = []
    ci = 0
    for t in flat["tables"]:
        cells = []
        for _ in range(int(t["ncells"])):
            c = cells_arr[ci]
            cells.append(
                {
                    "kind": CELL_KINDS[c["kind"]] if c["flags"] & FLAG_KIND_PRESENT else None,
                    "row_index": int(c["row"]),
                    "column_index": int(c["col"]),
                    "row_span": int(c["rowspan"]) if c["flags"] & FLAG_ROWSPAN_PRESENT else None,
                    "column_span": int(c["colspan"]) if c["flags"] & FLAG_COLSPAN_PRESENT else None,
                    "content": cell_texts[ci],
                    "page_number": int(c["page"]),
                    "polygon": [float(v) for v in c["poly"]]
                    if c["flags"] & FLAG_HAS_REGION
                    else None,
                    "spans": [{"offset": int(c["offset"]), "length": int(c["length"])}]
                    if c["flags"] & FLAG_HAS_SPAN
                    else [],
                }
            )
            ci += 1
        tables.append(
            {
                "row_count": int(t["row_count"]),
                "column_count": int(t["col_count"]),
                "page_number": int(t["page"]),
                "polygon": [float(v) for v in t["poly"]],
                "spans": [{"offset": int(t["offset"]), "length": int(t["length"])}],
                "cells": cells,
            }
        )
    return {"paragraphs": paragraphs, "pages": pages, "tables": tables}


def renumber_pages(ar: dict, range_lo: int) -> dict:
    """Reference propagate_page_number (utils.py:35-78): shard-local page k ->
    global page k + range_lo - 1, applied to paragraphs, cells, tables, pages."""
    off = range_lo - 1
    for p in ar["paragraphs"]:
        if p["polygon"] is not None:
            p["page_number"] += off
    for t in ar["tables"]:
        t["page_number"] += off
        for c in t["cells"]:
            c["page_number"] += off
    for pg in ar["pages"]:
        pg["page_number"] += off
    return ar


def merge_analyze_results(shards: list[dict]) -> dict:
    """Reference merge_responses (utils.py:81-114): list-concat paragraphs,
    tables, pages in shard (batch) order. Shards must already be renumbered."""
    out = {"paragraphs": [], "pages": [], "tables": []}
    for s in shards:
        out["paragraphs"].extend(s["paragraphs"])
        out["tables"].extend(s["tables"])
        out["pages"].extend(s["pages"])
    return out


def tag_table_paragraphs(ar: dict) -> dict:
    """Reference convert.py:220-236 — key is (length, offset), first span only."""
    cell_spans = set()
    for t in ar["tables"]:
        for c in t["cells"]:
            if isinstance(c["spans"], list) and len(c["spans"]) > 0:
                cell_spans.add((c["spans"][0]["length"], c["spans"][0]["offset"]))
    for p in ar["paragraphs"]:
        key = (p["spans"][0]["length"], p["spans"][0]["offset"])
        if key in cell_spans:
            p["role"] = TABLE_CELL_TYPE
    return ar


def _poly_px(polygon: list[float]) -> list[tuple[float, float]]:
    if len(polygon) != 8:
        raise ValueError("Polygon must have exactly four points.")
    f = DIMENSION_CONVERSION_FACTOR
    return [(f * polygon[2 * k], f * polygon[2 * k + 1]) for k in range(4)]


def to_parser_output(
    doc_id: str,
    md5_sum: str,
    ar: dict,
    experimental_extract_tables: bool = False,
) -> dict:
    """Reference azure_api_response_to_parser_output (convert.py:239-324)."""
    ar = tag_table_paragraphs(ar)

    text_blocks = []
    for index, p in enumerate(ar["paragraphs"]):
        if p is None or p["polygon"] is None:
            continue  # dropped, but still consumed an id (convert.py:88-96)
        text_blocks.append(
            {
                "text_block_id": str(index),
                "type": p["role"] or DEFAULT_BLOCK_TYPE,
                "type_confidence": 1.0,
                "text": [p["content"]],
                "media_ref": p["media_ref"],
                "language": None,
                "page_number": p["page_number"] - 1,
                "coords": _poly_px(p["polygon"]),
                "offset": p["spans"][0]["offset"],
            }
        )

    page_metadata = [
        {
            "page_number": pg["page_number"] - 1,
            "dimensions": (
                pg["width"] * DIMENSION_CONVERSION_FACTOR,
                pg["height"] * DIMENSION_CONVERSION_FACTOR,
            ),
        }
        for pg in ar["pages"]
        if pg["width"] is not None and pg["height"] is not None and pg["page_number"] is not None
    ]

    table_blocks = None
    if experimental_extract_tables:
        table_blocks = []
        for index, t in enumerate(ar["tables"]):
            table_blocks.append(
                {
                    "table_id": str(index),
                    "row_count": t["row_count"],
                    "column_count": t["column_count"],
                    "cells": [
                        {
                            "cell_type": c["kind"],
                            "row_index": c["row_index"],
                            "column_index": c["column_index"],
                            "row_span": c["row_span"],
                            "column_span": c["column_span"],
                            "content": c["content"],
                            "bounding_regions": [
                                {"page_number": c["page_number"] - 1, "polygon": _poly_px(c["polygon"])}
                            ],
                        }
                        for c in t["cells"]
                        if c["polygon"] is not None
                        and c["kind"] is not None
                        and c["row_span"] is not None
                        and c["column_span"] is not None
                    ],
                }
            )

    # language detection (A1 then A2, experimental_base.py:135-192)
    languages: Optional[list[str]] = None
    if len(text_blocks) > 0:
        detected = detect_language(join_block_texts(b["text"][0] for b in text_blocks))
        languages = [detected]
        for b in text_blocks:
            b["language"] = detected
    languages = document_languages([b["language"] for b in text_blocks]) if text_blocks else None

    return {
        "doc_id": doc_id,
        "md5sum": md5_sum,
        "languages": languages,
        "page_metadata": page_metadata,
        "text_blocks": text_blocks,
        "table_blocks": table_blocks,
        "spans": [
            {
                "kind": b["type"],
                "text": b["text"][0],
                "media_ref": b["media_ref"],
                "offset": b["offset"],
            }
            for b in text_blocks
        ],
    }


def extract_document(
    doc_id: str,
    payload: bytes,
    md5_sum: str = "",
    split_batch_pages: Optional[int] = None,
    experimental_extract_tables: bool = True,
) -> dict:
    """Full-document oracle: decode (optionally via the split/merge path) and
    convert. With split_batch_pages set, mirrors the reference large-document
    path (azure_wrapper.py:101-130): slice page ranges, parse each shard
    standalone, renumber, merge in batch order, then convert."""
    from .payload import slice_pages, split_page_ranges

    flat = decode(payload)
    if split_batch_pages is None:
        ar = analyze_result_from_flat(flat)
    else:
        ranges = split_page_ranges(len(flat["pages"]), split_batch_pages)
        shards = [
            renumber_pages(analyze_result_from_flat(slice_pages(flat, lo, hi)), lo)
            for lo, hi in ranges
        ]
        ar = merge_analyze_results(shards)
    return to_parser_output(doc_id, md5_sum, ar, experimental_extract_tables)


def oracle_spans(doc_id: str, payload: bytes) -> list[tuple[str, str, str, int]]:
    """The (kind, text, media_ref, order) equality surface for one document."""
    out = extract_document(doc_id, payload)
    return [(s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(out["spans"])]
