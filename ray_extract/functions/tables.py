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


def concat_nonempty(tables, empty_schema: "dict[str, object] | None" = None):
    """``pa.concat_tables`` that tolerates Ray 2.49's column-less 0-row
    passthrough blocks (map_batches does not invoke the fn on some empty
    blocks, so ``to_arrow_refs`` can yield schema-less tables that break a
    naive concat). Filters 0-row tables; returns an empty table with
    ``empty_schema`` ({name: pa.DataType}) when nothing survives."""
    parts = [t for t in tables if t.num_rows]
    if parts:
        return pa.concat_tables(parts, promote_options="default")
    if empty_schema is None:
        raise ValueError("all blocks empty and no empty_schema given")
    return pa.table({k: pa.array([], type=v) for k, v in empty_schema.items()})


def try_cast_int64(sarr):
    """TRY_CAST(s AS BIGINT) semantics for a string array: values that do
    not fit int64 become NULL instead of raising (``pc.cast`` throws on
    overflow, so a single >19-digit match would crash the whole job where
    the DuckDB oracle's TRY_CAST skips the row).

    Hot path stays vectorized: any string of <= 18 digits (plus optional
    sign) always fits int64, so the slow per-row range check only runs on
    batches that actually contain a longer match — vanishingly rare."""
    import pyarrow.compute as pc

    lengths = pc.utf8_length(pc.fill_null(sarr, ""))
    if not pc.any(
        pc.and_(pc.is_valid(sarr), pc.greater(lengths, 18))
    ).as_py():
        return pc.cast(sarr, pa.int64())
    out = []
    for v in sarr.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            iv = int(v)
        except ValueError:
            out.append(None)
            continue
        out.append(iv if -(1 << 63) <= iv < (1 << 63) else None)
    return pa.array(out, type=pa.int64())
