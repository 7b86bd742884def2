"""Geometry kernels over extraction output rows.

``vertically_flip_text_blocks`` mirrors cpr_sdk's
``ParserOutput.vertically_flip_text_block_coords()`` as exercised by the
reference's large-document end-to-end test (tests/test_azure_wrapper.py:177):
flip each text block's polygon y coordinates about its page height
(top-left-origin <-> bottom-left-origin convention), leaving x untouched.
Vectorized over the flattened blocks of a batch of output rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def vertically_flip_text_blocks(batch: pa.Table) -> pa.Table:
    tb_col = batch.column("text_blocks").combine_chunks()
    pm_col = batch.column("page_metadata").combine_chunks()
    n = len(batch)

    # page heights per (doc, page_number) -> lookup array
    pm_counts = pc.list_value_length(pm_col).to_numpy().astype(np.int64)
    pm_parent = np.repeat(np.arange(n, dtype=np.int64), pm_counts)
    pm_flat = pm_col.flatten()
    pm_page = pm_flat.field("page_number").to_numpy()
    pm_h = pm_flat.field("height").to_numpy()

    tb_counts = pc.list_value_length(tb_col).to_numpy().astype(np.int64)
    tb_parent = np.repeat(np.arange(n, dtype=np.int64), tb_counts)
    tb_flat = tb_col.flatten()
    tb_page = tb_flat.field("page_number").to_numpy()

    # join block -> page height on (doc, page) via a dense key
    max_page = int(max(pm_page.max(initial=0), tb_page.max(initial=0))) + 1
    height_by_key = np.zeros(n * max_page + 1, dtype=np.float64)
    height_by_key[pm_parent * max_page + pm_page] = pm_h
    block_h = height_by_key[tb_parent * max_page + tb_page]

    coords = tb_flat.field("coords")
    xy = coords.flatten()  # 4 points per block
    x = xy.field("x").to_numpy()
    y = xy.field("y").to_numpy()
    flipped_y = np.repeat(block_h, 4) - y

    new_xy = pa.StructArray.from_arrays(
        [pa.array(x), pa.array(flipped_y)], names=["x", "y"]
    )
    new_coords = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 4 * len(block_h) + 1, 4, dtype=np.int32)), new_xy
    )
    fields = {f: tb_flat.field(f) for f in
              ("text_block_id", "type", "type_confidence", "text", "language",
               "page_number", "media_ref", "offset", "length")}
    new_tb_flat = pa.StructArray.from_arrays(
        [fields["text_block_id"], fields["type"], fields["type_confidence"],
         fields["text"], fields["language"], fields["page_number"], new_coords,
         fields["media_ref"], fields["offset"], fields["length"]],
        names=["text_block_id", "type", "type_confidence", "text", "language",
               "page_number", "coords", "media_ref", "offset", "length"],
    )
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(tb_counts, out=offs[1:])
    new_tb = pa.ListArray.from_arrays(pa.array(offs), new_tb_flat)
    idx = batch.schema.get_field_index("text_blocks")
    return batch.set_column(idx, "text_blocks", new_tb)
