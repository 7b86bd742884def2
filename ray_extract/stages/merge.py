"""P3: reassemble split page-range shards — the pipeline's one shuffle.

``merge_bucketed`` (hash-bucket int key + one vectorized merge per bucket) is
the production form; ``merge_group`` is the single-group reference kernel it
is equivalent to. Both implement the reference's
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


def merge_bucketed(ds, num_buckets: int = 64):
    """Bucketed merge: the scalable form of ``groupby(doc_id).map_groups``.

    A string-key groupby costs a string sort-shuffle plus one Python
    ``merge_group`` call per document (tens of thousands at bench scale).
    Hash-bucketing doc_id into an int64 key keeps the same co-location
    guarantee (equal doc_ids land in one bucket) while the shuffle sorts
    int64s and each bucket merges ALL its documents in one vectorized pass
    (``merge_bucket``). Same output semantics as merge_group, and the one
    all-to-all exchange of the pipeline."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        import pandas as pd

        h = pd.util.hash_pandas_object(
            pd.Series(batch.column("doc_id").to_pylist()), index=False
        ).to_numpy()
        return batch.append_column(
            "merge_bucket", pa.array((h % num_buckets).astype(np.int64))
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("merge_bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def merge_bucket(group: pa.Table) -> pa.Table:
    """Merge every document inside one hash bucket, vectorized.

    Rows are sorted by (doc_id, batch_number); each list column then merges
    by REBUILDING offsets at document boundaries over the already-ordered
    flattened values — no per-document Python loop. Scalar fields take the
    first shard's value per document (utils.py:108-109) with the same
    overrides merge_group applies."""
    if "merge_bucket" in group.column_names:
        group = group.drop_columns(["merge_bucket"])
    order = pa.compute.sort_indices(
        group,
        sort_keys=[("doc_id", "ascending"), ("batch_number", "ascending")],
    )
    t = group.take(order)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    n = len(ids)
    if n == 0:
        return t
    is_start = np.empty(n, dtype=bool)
    is_start[0] = True
    np.not_equal(ids[1:], ids[:-1], out=is_start[1:])
    starts = np.nonzero(is_start)[0]
    counts = np.diff(np.append(starts, n))
    if counts.max() == 1:
        return t  # every document single-shard: already canonical
    ends = starts + counts  # exclusive row index per doc
    starts_pa = pa.array(starts.astype(np.int64))

    cols: dict[str, pa.Array] = {}
    for name, _ in SCALAR_FIELDS:
        col = t.column(name).combine_chunks()
        if name == "batch_number":
            cols[name] = pa.array(np.zeros(len(starts), dtype=np.int32))
        elif name == "range_lo":
            cols[name] = pa.array(np.ones(len(starts), dtype=np.int32))
        elif name == "range_hi":
            cols[name] = pa.compute.cast(
                t.column("n_pages_doc").combine_chunks().take(starts_pa), pa.int32()
            )
        elif name == "n_shards":
            cols[name] = pa.array(counts.astype(np.int32))
        else:
            cols[name] = col.take(starts_pa)
    for name in LIST_COLUMNS:
        la = t.column(name).combine_chunks()
        lens = pa.compute.list_value_length(la).to_numpy().astype(np.int64)
        cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=cum[1:])
        new_offsets = np.empty(len(starts) + 1, dtype=np.int32)
        new_offsets[0] = 0
        new_offsets[1:] = cum[ends]
        cols[name] = pa.ListArray.from_arrays(pa.array(new_offsets), la.flatten())
    return pa.table(cols)


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
