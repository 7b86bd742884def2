"""Shared constants and vocabularies for the ray-extract engine.

Semantics mirrored from the reference (climatepolicyradar/azure-pdf-parser):
- DIMENSION_CONVERSION_FACTOR: reference `base.py:4` (inches -> 72-ppi pixels).
- Role vocabulary: roles observed in the reference golden fixtures
  (`tests/data/sample-sixteen-page.json`, `tests/data/document-paragraph.json:2`)
  plus "media" for interleaved media spans (this engine's extension) and
  TABLE_CELL assigned by span tagging (`convert.py:234`).
"""

from __future__ import annotations

# inches -> 72ppi pixels (reference base.py:4)
DIMENSION_CONVERSION_FACTOR = 72.0

# Paragraph role vocabulary. Index = role id in the SPDF payload; -1 = no role
# (converted to DEFAULT_BLOCK_TYPE downstream, reference convert.py:75).
ROLES: list[str] = [
    "title",
    "sectionHeading",
    "pageHeader",
    "pageFooter",
    "pageNumber",
    "Document Header",
    "media",
    "figure",
]
ROLE_TO_ID: dict[str, int] = {r: i for i, r in enumerate(ROLES)}
NO_ROLE = -1

# Block type assigned to paragraphs whose first span matches a table-cell span
# (reference convert.py:234, cpr_sdk BlockType.TABLE_CELL.value).
TABLE_CELL_TYPE = "TableCell"
# Default block type when a paragraph has no role (reference convert.py:75).
DEFAULT_BLOCK_TYPE = "Text"

# Table-cell kind vocabulary (Azure DocumentTableCell.kind values).
CELL_KINDS: list[str] = ["content", "columnHeader", "rowHeader", "stubHead", "description"]
CELL_KIND_TO_ID: dict[str, int] = {k: i for i, k in enumerate(CELL_KINDS)}
NO_CELL_KIND = -1

# Identity of the local layout parser (stands in for Azure api_version/model_id,
# reference utils.py:108-109 takes these from the first page-range batch).
API_VERSION = "ray-extract-0.1"
MODEL_ID = "spdf-layout-v1"

# Page-range split defaults. The reference default shard size is 50 pages
# (utils.py:15); this engine keeps the same semantics but defaults are set so the
# small synthetic corpora exercise the split/merge path.
DEFAULT_SPLIT_BATCH_PAGES = 50

# Paragraph/cell flag bits in the SPDF payload.
FLAG_HAS_REGION = 1 << 0   # bounding region present (reference convert.py:60-61,91)
FLAG_HAS_SPAN = 1 << 1     # span list non-empty (reference convert.py:214)
FLAG_KIND_PRESENT = 1 << 2      # cell.kind is not None (reference convert.py:132)
FLAG_ROWSPAN_PRESENT = 1 << 3   # cell.row_span is not None (reference convert.py:133)
FLAG_COLSPAN_PRESENT = 1 << 4   # cell.column_span is not None (reference convert.py:134)

# Language detection: minimum proportion of blocks for a language to count as a
# document language (reference experimental_base.py:162-192, strictly greater).
MIN_LANGUAGE_PROPORTION = 0.4
