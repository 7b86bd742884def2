"""Column layout of the intermediate shard representation.

Between parse and convert, each page-range shard is ONE row whose layout
content is stored as parallel lists of primitives (struct-of-lists). This keeps
every transform vectorizable with numpy over the flattened values and makes the
doc_id shuffle cheap (no payload bytes move past the parse stage).

Scalar carry-through columns:
    doc_id, status, error, md5, batch_number, range_lo, range_hi, n_shards,
    n_pages_doc, api_version, model_id

List columns (one entry per page / paragraph / table / cell of the shard):
    pages:      page_number, page_width, page_height
    paragraphs: para_role, para_page, para_offset, para_length, para_flags,
                para_text, para_media, para_poly (8 floats per paragraph)
    tables:     tab_page, tab_rows, tab_cols, tab_ncells, tab_offset,
                tab_length, tab_poly (8 floats per table)
    cells:      cell_kind, cell_row, cell_col, cell_rowspan, cell_colspan,
                cell_offset, cell_length, cell_flags, cell_page, cell_text,
                cell_poly (8 floats per cell; cells grouped by table in
                table order — tab_ncells gives the grouping)

Page numbers in para_page / tab_page / cell_page / page_number are GLOBAL
document pages: the parse stage applies the reference's page propagation
(utils.py:35-78, local + range_lo - 1) eagerly, so the merge stage is a pure
ordered concat (utils.py:81-114).
"""

from __future__ import annotations

import pyarrow as pa

SCALAR_FIELDS: list[tuple[str, pa.DataType]] = [
    ("doc_id", pa.string()),
    ("status", pa.string()),
    ("error", pa.string()),
    ("md5", pa.string()),
    ("batch_number", pa.int32()),
    ("range_lo", pa.int32()),
    ("range_hi", pa.int32()),
    ("n_shards", pa.int32()),
    ("n_pages_doc", pa.int32()),
    ("api_version", pa.string()),
    ("model_id", pa.string()),
    # ParserInput identity metadata (reference run.py:51-79, convert.py:302-324):
    # optional input columns; the decode stage injects nulls when absent so the
    # shard schema is uniform. They ride the pipeline as scalar carry columns
    # (metadata travels WITH the document — never a driver-side join).
    ("document_name", pa.string()),
    ("document_description", pa.string()),
    ("source_url", pa.string()),
    ("cdn_object", pa.string()),
    ("content_type", pa.string()),
    ("slug", pa.string()),
]

# the subset of SCALAR_FIELDS that is optional input metadata
META_FIELDS = (
    "document_name",
    "document_description",
    "source_url",
    "cdn_object",
    "content_type",
    "slug",
)

I32, F64, STR = pa.int32(), pa.float64(), pa.string()

# name -> (value type, group). Groups: page / para / tab / cell; poly columns
# carry 8 values per element of their group.
LIST_COLUMNS: dict[str, tuple[pa.DataType, str]] = {
    "page_number": (I32, "page"),
    "page_width": (F64, "page"),
    "page_height": (F64, "page"),
    "para_role": (I32, "para"),
    "para_page": (I32, "para"),
    "para_offset": (I32, "para"),
    "para_length": (I32, "para"),
    "para_flags": (I32, "para"),
    "para_text": (STR, "para"),
    "para_media": (STR, "para"),
    "para_poly": (F64, "para8"),
    "tab_page": (I32, "tab"),
    "tab_rows": (I32, "tab"),
    "tab_cols": (I32, "tab"),
    "tab_ncells": (I32, "tab"),
    "tab_offset": (I32, "tab"),
    "tab_length": (I32, "tab"),
    "tab_poly": (F64, "tab8"),
    "cell_kind": (I32, "cell"),
    "cell_row": (I32, "cell"),
    "cell_col": (I32, "cell"),
    "cell_rowspan": (I32, "cell"),
    "cell_colspan": (I32, "cell"),
    "cell_offset": (I32, "cell"),
    "cell_length": (I32, "cell"),
    "cell_flags": (I32, "cell"),
    "cell_page": (I32, "cell"),
    "cell_text": (STR, "cell"),
    "cell_poly": (F64, "cell8"),
}

# columns holding global page numbers (all already global after parse)
PAGE_INDEXED = ("page_number", "para_page", "tab_page", "cell_page")

SHARD_SCHEMA = pa.schema(
    [pa.field(n, t) for n, t in SCALAR_FIELDS]
    + [pa.field(n, pa.list_(t)) for n, (t, _) in LIST_COLUMNS.items()]
)

XY = pa.struct([("x", pa.float64()), ("y", pa.float64())])

TEXT_BLOCK = pa.struct(
    [
        ("text_block_id", pa.string()),
        ("type", pa.string()),
        ("type_confidence", pa.float32()),
        ("text", pa.string()),
        ("language", pa.string()),
        ("page_number", pa.int32()),
        ("coords", pa.list_(XY)),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
        ("length", pa.int32()),
    ]
)

TABLE_CELL = pa.struct(
    [
        ("cell_type", pa.string()),
        ("row_index", pa.int32()),
        ("column_index", pa.int32()),
        ("row_span", pa.int32()),
        ("column_span", pa.int32()),
        ("content", pa.string()),
        ("page_number", pa.int32()),
        ("polygon", pa.list_(XY)),
    ]
)

TABLE_BLOCK = pa.struct(
    [
        ("table_id", pa.string()),
        ("row_count", pa.int32()),
        ("column_count", pa.int32()),
        ("cells", pa.list_(TABLE_CELL)),
    ]
)

PAGE_META = pa.struct(
    [("page_number", pa.int32()), ("width", pa.float64()), ("height", pa.float64())]
)

SPAN = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("md5sum", pa.string()),
        # ParserOutput identity/metadata surface (reference convert.py:302-324):
        # passthrough of the ParserInput fields plus the PDF-path constants
        # translated=False and html_data=None (run.py:51-79).
        ("document_name", pa.string()),
        ("document_description", pa.string()),
        ("source_url", pa.string()),
        ("cdn_object", pa.string()),
        ("content_type", pa.string()),
        ("slug", pa.string()),
        ("translated", pa.bool_()),
        ("html_data", pa.string()),
        ("languages", pa.list_(pa.string())),
        ("n_pages", pa.int32()),
        ("n_text_blocks", pa.int32()),
        ("page_metadata", pa.list_(PAGE_META)),
        ("text_blocks", pa.list_(TEXT_BLOCK)),
        ("table_blocks", pa.list_(TABLE_BLOCK)),
        ("spans", pa.list_(SPAN)),
    ]
)
