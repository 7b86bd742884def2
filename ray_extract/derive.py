"""Deterministic derivation of SPDF documents from plain text.

Turns a ``(doc_id, text)`` row from the driver's ``documents`` table into an
interleaved text+media SPDF document (the F-1 shape of `FIXTURES.md`): the text
is split into word-group spans, each span is assigned a block kind, a page, a
polygon and a character span by pure modular arithmetic. Every rule here is
deliberately expressible in ANSI SQL so the full extraction pipeline has a
DuckDB oracle (`__ray_entry__.oracle_sql`).

Rules (0-based span index i over m = ceil(n_words / WORDS_PER_SPAN) spans):

    kind(i):  i == 0             -> "title"
              elif i % 13 == 5   -> "sectionHeading"
              elif i % 11 == 7   -> media span (text "", media_ref set)
              elif i %  7 == 3   -> table cell (role None; tagged "TableCell"
                                    via span-join, reference convert.py:220-236)
              elif i % 19 == 17  -> "pageHeader"
              elif i % 23 == 21  -> "pageFooter"
              else               -> no role (-> "Text", reference convert.py:75)

    span text: "" for media spans, else the i-th group of WORDS_PER_SPAN words
    offset:    sum(len(text_j) for j < i) + i   (single-space-joined content)
    page:      i // SPANS_PER_PAGE + 1          (1-indexed)
    media_ref: "media://{doc_id}/{i}" for media spans, else ""
    polygon:   slot s = i % SPANS_PER_PAGE, inches, TL,TR,BR,BL order
               (reference convert.py:31-43)
    tables:    per page, all table-cell spans on that page form one
               single-column table (row_index = position, kind "content")
"""

from __future__ import annotations

import numpy as np

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

WORDS_PER_SPAN = 4
SPANS_PER_PAGE = 6
PAGE_WIDTH_IN = 8.5
PAGE_HEIGHT_IN = 11.0
SLOT_X0, SLOT_X1 = 1.0, 7.5
SLOT_Y0, SLOT_STEP, SLOT_H = 0.5, 1.7, 1.5

CELL_FLAGS_OK = (
    FLAG_HAS_REGION | FLAG_HAS_SPAN | FLAG_KIND_PRESENT | FLAG_ROWSPAN_PRESENT | FLAG_COLSPAN_PRESENT
)

# kinds as they appear in the FINAL extracted span sequence
K_TITLE = "title"
K_SECTION = "sectionHeading"
K_MEDIA = "media"
K_TABLE_CELL = "TableCell"
K_PAGE_HEADER = "pageHeader"
K_PAGE_FOOTER = "pageFooter"
K_TEXT = "Text"


def span_kind(i: int) -> str:
    if i == 0:
        return K_TITLE
    if i % 13 == 5:
        return K_SECTION
    if i % 11 == 7:
        return K_MEDIA
    if i % 7 == 3:
        return K_TABLE_CELL
    if i % 19 == 17:
        return K_PAGE_HEADER
    if i % 23 == 21:
        return K_PAGE_FOOTER
    return K_TEXT


def slot_polygon(i: int) -> list[float]:
    s = i % SPANS_PER_PAGE
    t = SLOT_Y0 + SLOT_STEP * s
    return [SLOT_X0, t, SLOT_X1, t, SLOT_X1, t + SLOT_H, SLOT_X0, t + SLOT_H]


def derive_spans(doc_id: str, text: str) -> list[dict]:
    """The expected final span sequence for a document (ground truth).

    Each span: {kind, text, media_ref, offset, length, page, i}. ``page`` is
    1-indexed here (the extracted output is 0-indexed, reference convert.py:71).
    """
    words = text.split(" ")
    m = (len(words) + WORDS_PER_SPAN - 1) // WORDS_PER_SPAN
    spans = []
    offset = 0
    for i in range(m):
        kind = span_kind(i)
        stext = "" if kind == K_MEDIA else " ".join(words[i * WORDS_PER_SPAN : (i + 1) * WORDS_PER_SPAN])
        spans.append(
            {
                "kind": kind,
                "text": stext,
                "media_ref": f"media://{doc_id}/{i}" if kind == K_MEDIA else "",
                "offset": offset,
                "length": len(stext),
                "page": i // SPANS_PER_PAGE + 1,
                "i": i,
            }
        )
        offset += len(stext) + 1
    return spans


def derive_flat(doc_id: str, text: str) -> Flat:
    """Build the SPDF Flat document for (doc_id, text)."""
    spans = derive_spans(doc_id, text)
    m = len(spans)
    n_pages = (m + SPANS_PER_PAGE - 1) // SPANS_PER_PAGE

    pages = np.zeros(n_pages, dtype=PAGE_DT)
    pages["width"] = PAGE_WIDTH_IN
    pages["height"] = PAGE_HEIGHT_IN

    paras = np.zeros(m, dtype=PARA_DT)
    text_parts: list[bytes] = []
    media_parts: list[bytes] = []
    for i, s in enumerate(spans):
        kind = s["kind"]
        if kind == K_MEDIA:
            role = ROLE_TO_ID["media"]
        elif kind in (K_TEXT, K_TABLE_CELL):
            role = NO_ROLE  # table-cell paragraphs carry no role pre-tagging
        else:
            role = ROLE_TO_ID[kind]
        tb = s["text"].encode()
        mb = s["media_ref"].encode()
        text_parts.append(tb)
        media_parts.append(mb)
        paras[i] = (
            s["page"],
            role,
            s["offset"],
            s["length"],
            FLAG_HAS_REGION | FLAG_HAS_SPAN,
            len(tb),
            len(mb),
            0,
            slot_polygon(i),
        )

    # one single-column table per page that has table-cell spans
    cell_spans = [s for s in spans if s["kind"] == K_TABLE_CELL]
    by_page: dict[int, list[dict]] = {}
    for s in cell_spans:
        by_page.setdefault(s["page"], []).append(s)
    tables = np.zeros(len(by_page), dtype=TAB_DT)
    cells = np.zeros(len(cell_spans), dtype=CELL_DT)
    cell_parts: list[bytes] = []
    ci = 0
    for ti, page in enumerate(sorted(by_page)):
        group = by_page[page]
        first, last = group[0], group[-1]
        tables[ti] = (
            page,
            len(group),
            1,
            len(group),
            first["offset"],
            last["offset"] + last["length"] - first["offset"],
            [SLOT_X0, SLOT_Y0, SLOT_X1, SLOT_Y0, SLOT_X1, 10.7, SLOT_X0, 10.7],
        )
        for j, s in enumerate(group):
            tb = s["text"].encode()
            cell_parts.append(tb)
            cells[ci] = (
                CELL_KIND_TO_ID["content"],
                j,
                0,
                1,
                1,
                s["offset"],
                s["length"],
                CELL_FLAGS_OK,
                page,
                len(tb),
                slot_polygon(s["i"]),
            )
            ci += 1

    return Flat(
        pages=pages,
        paras=paras,
        tables=tables,
        cells=cells,
        text_blob=b"".join(text_parts),
        media_blob=b"".join(media_parts),
        cell_blob=b"".join(cell_parts),
    )


def derive_payload(doc_id: str, text: str) -> bytes:
    return encode(derive_flat(doc_id, text))


def derived_doc_id(source: str, raw_doc_id: int) -> str:
    """String doc id for a driver documents-table row: '{source}.{doc_id}'."""
    return f"{source}.{raw_doc_id}"


# Deterministic document metadata (the reference ParserInput identity surface:
# document_name/description/source_url/cdn_object/content_type/slug,
# /root/reference/src/azure_pdf_parser/run.py:51-79, convert.py:302-324).
# Pure string arithmetic over (source, doc_id) so the DuckDB oracle can
# reconstruct every field. Documents with raw_doc_id % 53 == 13 get a non-.pdf
# cdn_object — exercising the reference's conversion-error path
# (convert.py:261-268): those documents dead-letter in the decode stage.
CDN_INVALID_MOD = 53
CDN_INVALID_REM = 13


def derive_metadata(source: str, raw_doc_id: int) -> dict:
    did = derived_doc_id(source, raw_doc_id)
    bad = raw_doc_id % CDN_INVALID_MOD == CDN_INVALID_REM
    return {
        "document_name": f"Document {did}",
        "document_description": f"Synthetic document {did}",
        "source_url": f"https://docs.example.org/{source}/{raw_doc_id}",
        "cdn_object": f"corpus/{did}." + ("bin" if bad else "pdf"),
        "content_type": "application/pdf",
        "slug": f"{source}-{raw_doc_id}",
    }
