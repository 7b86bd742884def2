"""P2: the local layout parser — the stateful actor-pool stage.

This stage replaces the reference's Azure Document Intelligence round-trip
(`azure_wrapper.py:22-61`: one warm ``DocumentAnalysisClient`` reused for every
document, LRO polling loop) with an in-process layout parse of the SPDF
byte-stream. It is a callable CLASS for ``map_batches(..., concurrency=N)``:
``__init__`` runs once per actor and holds the warm parser state (vocab
tables, compiled dtypes — the slot where a real layout model would load);
``__call__`` parses a batch of page-range shards into the flat columnar shard
representation (see `ray_extract.schema`).

Page numbers are propagated to document-global here (reference
propagate_page_number, utils.py:35-78: local + range_lo - 1) so the merge
stage is a pure ordered concat.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import vocab
from ..payload import decode, strings_from_lens
from ..schema import LIST_COLUMNS, SCALAR_FIELDS


_GROUP_MULT = {"page": 1, "para": 1, "para8": 8, "tab": 1, "tab8": 8, "cell": 1, "cell8": 8}


class LayoutParser:
    """Warm-state layout parser for map_batches actor pools."""

    def __init__(self):
        # Warm per-actor state (the analogue of the reference's authenticated
        # client built once in AzureApiWrapper.__init__, azure_wrapper.py:22-30;
        # a real model's weights would load here).
        self.api_version = vocab.API_VERSION
        self.model_id = vocab.MODEL_ID
        self.roles = list(vocab.ROLES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        status = batch.column("status").to_pylist()
        payloads = batch.column("payload").combine_chunks()
        range_lo = batch.column("range_lo").to_numpy()

        num_cols = {
            name: [] for name, (t, _) in LIST_COLUMNS.items() if not pa.types.is_string(t)
        }
        counts = {name: np.zeros(n, dtype=np.int64) for name in LIST_COLUMNS}
        text_lens, text_blobs = [], []
        media_lens, media_blobs = [], []
        cell_lens, cell_blobs = [], []

        for i in range(n):
            raw = payloads[i].as_py()
            if status[i] != "ok" or not raw:
                continue
            flat = decode(raw)
            off = int(range_lo[i]) - 1
            pages, paras, tables, cells = flat["pages"], flat["paras"], flat["tables"], flat["cells"]

            counts["page_number"][i] = counts["page_width"][i] = counts["page_height"][i] = len(pages)
            num_cols["page_number"].append(np.arange(1, len(pages) + 1, dtype=np.int32) + off)
            num_cols["page_width"].append(np.ascontiguousarray(pages["width"]))
            num_cols["page_height"].append(np.ascontiguousarray(pages["height"]))

            for c in ("para_role", "para_offset", "para_length", "para_flags"):
                counts[c][i] = len(paras)
            counts["para_page"][i] = len(paras)
            counts["para_text"][i] = counts["para_media"][i] = len(paras)
            counts["para_poly"][i] = len(paras)
            num_cols["para_role"].append(np.ascontiguousarray(paras["role"]))
            num_cols["para_page"].append(paras["page"] + np.int32(off))
            num_cols["para_offset"].append(np.ascontiguousarray(paras["offset"]))
            num_cols["para_length"].append(np.ascontiguousarray(paras["length"]))
            num_cols["para_flags"].append(np.ascontiguousarray(paras["flags"]))
            num_cols["para_poly"].append(np.ascontiguousarray(paras["poly"]).ravel())
            text_lens.append(np.ascontiguousarray(paras["text_len"]))
            text_blobs.append(flat["text_blob"])
            media_lens.append(np.ascontiguousarray(paras["media_len"]))
            media_blobs.append(flat["media_blob"])

            for c in ("tab_page", "tab_rows", "tab_cols", "tab_ncells", "tab_offset", "tab_length", "tab_poly"):
                counts[c][i] = len(tables)
            num_cols["tab_page"].append(tables["page"] + np.int32(off))
            num_cols["tab_rows"].append(np.ascontiguousarray(tables["row_count"]))
            num_cols["tab_cols"].append(np.ascontiguousarray(tables["col_count"]))
            num_cols["tab_ncells"].append(np.ascontiguousarray(tables["ncells"]))
            num_cols["tab_offset"].append(np.ascontiguousarray(tables["offset"]))
            num_cols["tab_length"].append(np.ascontiguousarray(tables["length"]))
            num_cols["tab_poly"].append(np.ascontiguousarray(tables["poly"]).ravel())

            for c in (
                "cell_kind", "cell_row", "cell_col", "cell_rowspan", "cell_colspan",
                "cell_offset", "cell_length", "cell_flags", "cell_page", "cell_text", "cell_poly",
            ):
                counts[c][i] = len(cells)
            num_cols["cell_kind"].append(np.ascontiguousarray(cells["kind"]))
            num_cols["cell_row"].append(np.ascontiguousarray(cells["row"]))
            num_cols["cell_col"].append(np.ascontiguousarray(cells["col"]))
            num_cols["cell_rowspan"].append(np.ascontiguousarray(cells["rowspan"]))
            num_cols["cell_colspan"].append(np.ascontiguousarray(cells["colspan"]))
            num_cols["cell_offset"].append(np.ascontiguousarray(cells["offset"]))
            num_cols["cell_length"].append(np.ascontiguousarray(cells["length"]))
            num_cols["cell_flags"].append(np.ascontiguousarray(cells["flags"]))
            num_cols["cell_page"].append(cells["page"] + np.int32(off))
            num_cols["cell_poly"].append(np.ascontiguousarray(cells["poly"]).ravel())
            cell_lens.append(np.ascontiguousarray(cells["text_len"]))
            cell_blobs.append(flat["cell_blob"])

        def list_array(name: str) -> pa.ListArray:
            vtype, group = LIST_COLUMNS[name]
            mult = _GROUP_MULT[group]
            offs = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(counts[name] * mult, out=offs[1:])
            if pa.types.is_string(vtype):
                if name == "para_text":
                    lens, blobs = text_lens, text_blobs
                elif name == "para_media":
                    lens, blobs = media_lens, media_blobs
                else:
                    lens, blobs = cell_lens, cell_blobs
                joined = (
                    np.concatenate(lens) if lens else np.zeros(0, dtype=np.int64)
                )
                values = strings_from_lens(joined, b"".join(blobs))
            else:
                parts = num_cols[name]
                np_dtype = np.int32 if pa.types.is_int32(vtype) else np.float64
                flatv = np.concatenate(parts) if parts else np.zeros(0, dtype=np_dtype)
                values = pa.array(flatv.astype(np_dtype, copy=False), type=vtype)
            return pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), values)

        scalar_names = [f for f, _ in SCALAR_FIELDS]
        cols: dict[str, pa.Array] = {}
        for name in scalar_names:
            if name == "api_version":
                cols[name] = pa.array([self.api_version] * n, type=pa.string())
            elif name == "model_id":
                cols[name] = pa.array([self.model_id] * n, type=pa.string())
            else:
                cols[name] = batch.column(name)
        for name in LIST_COLUMNS:
            cols[name] = list_array(name)
        return pa.table(cols)
