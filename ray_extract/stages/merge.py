"""P3: reassemble split page-range shards — the pipeline's one shuffle.

``groupby("doc_id").map_groups(merge_group)`` implements the reference's
merge_responses (utils.py:81-114): shard contents concatenated in batch_number
order; api_version/model_id taken from the first batch; content/languages/
styles/documents/key_value_pairs deliberately absent (they are dropped by the
reference and never enter this engine's shard representation). Page numbers
were already propagated to document-global in the parse stage, so this is a
pure ordered concat of the flat list columns.

Single-shard groups are already in canonical merged form and pass through
untouched (the common case — only heavy-tail documents produce k > 1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import LIST_COLUMNS, SCALAR_FIELDS


def merge_group(group: pa.Table) -> pa.Table:
    if len(group) == 1:
        return group
    order = np.argsort(group.column("batch_number").to_numpy(), kind="stable")
    idx = pa.array(order.astype(np.int64))

    cols: dict[str, pa.Array] = {}
    for name, _ in SCALAR_FIELDS:
        col = group.column(name).combine_chunks()
        if name == "batch_number":
            cols[name] = pa.array([0], type=pa.int32())
        elif name == "range_lo":
            cols[name] = pa.array([1], type=pa.int32())
        elif name == "range_hi":
            cols[name] = pa.array([group.column("n_pages_doc")[0].as_py()], type=pa.int32())
        elif name == "n_shards":
            cols[name] = pa.array([len(group)], type=pa.int32())
        else:
            # first batch in batch_number order (utils.py:108-109)
            cols[name] = col.take(idx[:1])
    for name in LIST_COLUMNS:
        la = group.column(name).combine_chunks().take(idx)
        values = la.flatten()
        offs = pa.array([0, len(values)], type=pa.int32())
        cols[name] = pa.ListArray.from_arrays(offs, values)
    return pa.table(cols)
