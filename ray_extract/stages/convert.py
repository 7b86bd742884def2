"""P4: AnalyzeResult-shards -> ParserOutput rows, fully vectorized.

One map_batches kernel implementing the reference conversion chain
(convert.py:239-324) over the flat shard representation, with numpy segment
operations instead of per-document Python loops:

- tag_table_paragraphs (convert.py:220-236): hash semi-join of paragraph
  first-span keys against table-cell first-span keys, document-scoped; the key
  is (length, offset) exactly as the reference builds it (convert.py:215,232).
  Implemented as a vectorized np.isin over (doc, length, offset) row keys —
  the join never crosses documents, so no shuffle is involved.
- paragraph -> text block (convert.py:46-97): x72 unit conversion, page-1,
  role-or-"Text", type_confidence 1.0, enumerate ids over ALL paragraphs so
  dropped (region-less) paragraphs leave id gaps.
- page metadata (convert.py:159-200): drop pages with missing dimensions.
- experimental tables (convert.py:100-156): filter cells missing bounding
  regions / kind / row_span / column_span; first bounding region only.
- languages (experimental_base.py:135-192): one deterministic language per
  document detected over the space-joined stripped block texts, broadcast to
  every block; document languages via the strictly-greater-than-0.4 proportion
  rule (with a single detected language this composes to [lang] / None).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import vocab
from ..functions.language import detect_languages_arrow
from ..schema import OUTPUT_SCHEMA, XY


def rows_in(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise membership of (n, k) int64 ``a`` in (m, k) int64 ``b``."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros(len(a), dtype=bool)
    a = np.ascontiguousarray(a, dtype=np.int64)
    b = np.ascontiguousarray(b, dtype=np.int64)
    void = [("", np.int64)] * a.shape[1]
    return np.isin(a.view(void).ravel(), b.view(void).ravel())


def _flat(col: pa.ChunkedArray) -> pa.Array:
    return col.combine_chunks().flatten()


def _flat_np(col: pa.ChunkedArray) -> np.ndarray:
    return _flat(col).to_numpy(zero_copy_only=False)


def _counts(col: pa.ChunkedArray) -> np.ndarray:
    return pc.list_value_length(col.combine_chunks()).to_numpy().astype(np.int64)


def _offsets(counts: np.ndarray) -> np.ndarray:
    out = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(counts, out=out[1:])
    return out


def _xy_list(poly_px: np.ndarray) -> pa.ListArray:
    """(k, 8) polygon floats -> list<struct<x,y>> with 4 points per element."""
    k = len(poly_px)
    pts = poly_px.reshape(-1, 2)
    xy = pa.StructArray.from_arrays(
        [pa.array(np.ascontiguousarray(pts[:, 0])), pa.array(np.ascontiguousarray(pts[:, 1]))],
        fields=list(XY),
    )
    offs = pa.array(np.arange(0, 4 * k + 1, 4, dtype=np.int32))
    return pa.ListArray.from_arrays(offs, xy)


def make_convert_stage(experimental_tables: bool = True, detect_fn=None):
    """``detect_fn`` swaps the language detector (A1): any callable with the
    ``detect_languages_arrow`` contract (arrow string array -> numpy object
    array of language codes), e.g. ``detect_languages_arrow_wide`` for ~34
    languages. None -> the 5-language SQL-oracle-deterministic default."""
    detect_fn = detect_fn or detect_languages_arrow
    f = vocab.DIMENSION_CONVERSION_FACTOR
    # role-id -> final type string lookup; index NO_ROLE (-1) wraps to the end
    type_vocab = np.array(
        vocab.ROLES + [vocab.TABLE_CELL_TYPE, vocab.DEFAULT_BLOCK_TYPE], dtype=object
    )
    tag_id = len(vocab.ROLES)  # TABLE_CELL_TYPE index
    cell_kind_vocab = np.array(vocab.CELL_KINDS, dtype=object)

    def convert_stage(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return OUTPUT_SCHEMA.empty_table()

        # ---- paragraphs (flattened across the batch) ----
        para_counts = _counts(batch.column("para_page"))
        para_off = _offsets(para_counts)
        para_parent = np.repeat(np.arange(n, dtype=np.int64), para_counts)
        p_page = _flat_np(batch.column("para_page"))
        p_role = _flat_np(batch.column("para_role"))
        p_offset = _flat_np(batch.column("para_offset"))
        p_length = _flat_np(batch.column("para_length"))
        p_flags = _flat_np(batch.column("para_flags"))
        p_text = _flat(batch.column("para_text"))
        p_media = _flat(batch.column("para_media"))
        p_poly = _flat_np(batch.column("para_poly")).reshape(-1, 8)

        # ---- table cells: span-key semi-join (tagging) ----
        c_counts = _counts(batch.column("cell_page"))
        cell_parent = np.repeat(np.arange(n, dtype=np.int64), c_counts)
        c_offset = _flat_np(batch.column("cell_offset"))
        c_length = _flat_np(batch.column("cell_length"))
        c_flags = _flat_np(batch.column("cell_flags"))
        c_has_span = (c_flags & vocab.FLAG_HAS_SPAN) != 0
        cell_keys = np.stack(
            [cell_parent[c_has_span], c_length[c_has_span], c_offset[c_has_span]], axis=1
        )
        para_keys = np.stack([para_parent, p_length, p_offset], axis=1)
        tagged = rows_in(para_keys, cell_keys)

        # ---- block type / id / kept mask ----
        type_id = np.where(tagged, tag_id, p_role)  # NO_ROLE=-1 wraps to "Text"
        type_str = type_vocab[type_id]
        has_region = (p_flags & vocab.FLAG_HAS_REGION) != 0
        block_id = np.arange(len(p_page), dtype=np.int64) - np.repeat(para_off[:-1], para_counts)

        kept = np.nonzero(has_region)[0]
        kept_counts = np.bincount(para_parent[kept], minlength=n).astype(np.int64)
        kept_off = _offsets(kept_counts)
        kept_idx = pa.array(kept)
        kept_text = p_text.take(kept_idx)

        # ---- language (A1 + A2, composed) ----
        doc_text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(kept_off), pc.utf8_trim_whitespace(kept_text)),
            " ",
        )
        langs = detect_fn(doc_text)
        has_blocks = kept_counts > 0
        languages = pa.array(
            [[l] if hb else None for l, hb in zip(langs, has_blocks)],
            type=pa.list_(pa.string()),
        )

        # ---- text_blocks ----
        tb = pa.StructArray.from_arrays(
            [
                pc.cast(pa.array(block_id[kept]), pa.string()),
                pa.array(type_str[kept], type=pa.string()),
                pa.array(np.full(len(kept), 1.0, dtype=np.float32)),
                kept_text,
                pa.array(langs[para_parent[kept]], type=pa.string()),
                pa.array((p_page[kept] - 1).astype(np.int32)),
                _xy_list(p_poly[kept] * f),
                p_media.take(kept_idx),
                pa.array(p_offset[kept].astype(np.int32)),
                pa.array(p_length[kept].astype(np.int32)),
            ],
            names=[
                "text_block_id", "type", "type_confidence", "text", "language",
                "page_number", "coords", "media_ref", "offset", "length",
            ],
        )
        text_blocks = pa.ListArray.from_arrays(pa.array(kept_off), tb)

        # ---- spans equality surface ----
        spans = pa.ListArray.from_arrays(
            pa.array(kept_off),
            pa.StructArray.from_arrays(
                [
                    pa.array(type_str[kept], type=pa.string()),
                    kept_text,
                    p_media.take(kept_idx),
                    pa.array(p_offset[kept].astype(np.int32)),
                ],
                names=["kind", "text", "media_ref", "offset"],
            ),
        )

        # ---- page metadata ----
        pg_counts = _counts(batch.column("page_number"))
        pg_parent = np.repeat(np.arange(n, dtype=np.int64), pg_counts)
        g_num = _flat_np(batch.column("page_number"))
        g_w = _flat_np(batch.column("page_width"))
        g_h = _flat_np(batch.column("page_height"))
        pg_keep = np.nonzero(~(np.isnan(g_w) | np.isnan(g_h)))[0]
        pg_kept_counts = np.bincount(pg_parent[pg_keep], minlength=n).astype(np.int64)
        page_metadata = pa.ListArray.from_arrays(
            pa.array(_offsets(pg_kept_counts)),
            pa.StructArray.from_arrays(
                [
                    pa.array((g_num[pg_keep] - 1).astype(np.int32)),
                    pa.array(g_w[pg_keep] * f),
                    pa.array(g_h[pg_keep] * f),
                ],
                names=["page_number", "width", "height"],
            ),
        )

        # ---- experimental table blocks ----
        if experimental_tables:
            t_counts = _counts(batch.column("tab_page"))
            t_off = _offsets(t_counts)
            t_rows = _flat_np(batch.column("tab_rows"))
            t_cols = _flat_np(batch.column("tab_cols"))
            t_ncells = _flat_np(batch.column("tab_ncells"))
            n_tabs = len(t_rows)
            table_id = np.arange(n_tabs, dtype=np.int64) - np.repeat(t_off[:-1], t_counts)
            cell_tab = np.repeat(np.arange(n_tabs, dtype=np.int64), t_ncells)

            c_kind = _flat_np(batch.column("cell_kind"))
            c_row = _flat_np(batch.column("cell_row"))
            c_col = _flat_np(batch.column("cell_col"))
            c_rowspan = _flat_np(batch.column("cell_rowspan"))
            c_colspan = _flat_np(batch.column("cell_colspan"))
            c_page = _flat_np(batch.column("cell_page"))
            c_text = _flat(batch.column("cell_text"))
            c_poly = _flat_np(batch.column("cell_poly")).reshape(-1, 8)
            # reference convert.py:130-135 cell filter
            need = (
                vocab.FLAG_HAS_REGION
                | vocab.FLAG_KIND_PRESENT
                | vocab.FLAG_ROWSPAN_PRESENT
                | vocab.FLAG_COLSPAN_PRESENT
            )
            c_keep = np.nonzero((c_flags & need) == need)[0]
            c_keep_pa = pa.array(c_keep)
            cells_per_tab = np.bincount(cell_tab[c_keep], minlength=n_tabs).astype(np.int64)
            cell_struct = pa.StructArray.from_arrays(
                [
                    pa.array(cell_kind_vocab[c_kind[c_keep]], type=pa.string()),
                    pa.array(c_row[c_keep].astype(np.int32)),
                    pa.array(c_col[c_keep].astype(np.int32)),
                    pa.array(c_rowspan[c_keep].astype(np.int32)),
                    pa.array(c_colspan[c_keep].astype(np.int32)),
                    c_text.take(c_keep_pa),
                    pa.array((c_page[c_keep] - 1).astype(np.int32)),
                    _xy_list(c_poly[c_keep] * f),
                ],
                names=[
                    "cell_type", "row_index", "column_index", "row_span",
                    "column_span", "content", "page_number", "polygon",
                ],
            )
            tab_struct = pa.StructArray.from_arrays(
                [
                    pc.cast(pa.array(table_id), pa.string()),
                    pa.array(t_rows.astype(np.int32)),
                    pa.array(t_cols.astype(np.int32)),
                    pa.ListArray.from_arrays(pa.array(_offsets(cells_per_tab)), cell_struct),
                ],
                names=["table_id", "row_count", "column_count", "cells"],
            )
            table_blocks = pa.ListArray.from_arrays(pa.array(t_off), tab_struct)
        else:
            table_blocks = pa.array([None] * n, type=OUTPUT_SCHEMA.field("table_blocks").type)

        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "status": batch.column("status"),
                "error": batch.column("error"),
                "md5sum": batch.column("md5"),
                # identity metadata passthrough + PDF-path constants
                # (reference convert.py:302-324, run.py:51-79)
                "document_name": batch.column("document_name"),
                "document_description": batch.column("document_description"),
                "source_url": batch.column("source_url"),
                "cdn_object": batch.column("cdn_object"),
                "content_type": batch.column("content_type"),
                "slug": batch.column("slug"),
                "translated": pa.array(np.zeros(n, dtype=bool)),
                "html_data": pa.nulls(n, type=pa.string()),
                "languages": languages,
                "n_pages": batch.column("n_pages_doc"),
                "n_text_blocks": pa.array(kept_counts.astype(np.int32)),
                "page_metadata": page_metadata,
                "text_blocks": text_blocks,
                "table_blocks": table_blocks,
                "spans": spans,
            }
        )
        return out.cast(OUTPUT_SCHEMA)

    return convert_stage
