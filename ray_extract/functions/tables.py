"""Small Arrow-table utilities shared by the pipelines."""

from __future__ import annotations

import pyarrow as pa


def strip_schema_metadata(ds):
    """Drop schema-level metadata from every block of a Dataset.

    Parquet files written by pandas carry a ``b'pandas'`` metadata dict on
    the schema; blocks that keep it break Ray Data's schema-hash
    deduplication in shuffle reduce tasks ("Failed to hash the schemas ...
    unhashable type: 'dict'"). Stripping is a metadata-only (zero-copy)
    map, fused into the read."""

    def strip(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None)

    return ds.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)
