"""File-based sources and sinks mirroring the reference's I/O surface.

- ``read_document_dir``: directory of raw document byte-streams -> Dataset of
  (doc_id, payload), doc_id = filename stem (reference S1, run.py:147-152:
  ``pdf_dir.glob("*.pdf")`` with ``file.stem`` as the import id).
- ``write_json_per_doc``: one JSON file per document named ``{doc_id}.json``
  with overwrite semantics (reference K1, run.py:88). This layout is the
  reference's resume unit; at 10^12 documents it is an anti-pattern (file
  count), so the engine's primary sink is partitioned parquet + manifests
  (state/checkpoint.py) and this sink exists for drop-in compatibility.
"""

from __future__ import annotations

import os

import pyarrow as pa


def read_document_dir(input_dir: str, suffix: str = ".spdf"):
    """Directory of payload files -> Dataset[(doc_id, payload)].

    Only files matching ``suffix`` become documents — mirroring the
    reference's ``pdf_dir.glob("*.pdf")`` — so stray files (manifests,
    hidden files) don't turn into dead-letter doc rows.
    """
    import ray.data as rd

    ds = rd.read_binary_files(
        input_dir,
        include_paths=True,
        file_extensions=[suffix.lstrip(".")] if suffix else None,
    )

    def to_rows(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        ids = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.string()),
                "payload": batch.column("bytes").cast(pa.large_binary()),
            }
        )

    return ds.map_batches(to_rows, batch_format="pyarrow")


def write_json_per_doc(output_ds, out_dir: str) -> int:
    """Write one ``{doc_id}.json`` per output row; returns rows written.

    Executed distributed (each batch writes its files from the worker);
    overwrite-idempotent like the reference sink.
    """
    import json

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        for row in rows:
            path = os.path.join(out_dir, f"{row['doc_id']}.json")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(row, f, default=str)
            os.replace(tmp, path)
        return pa.table({"written": pa.array([len(rows)], type=pa.int64())})

    counts = output_ds.map_batches(write_batch, batch_format="pyarrow")
    # sum aggregate instead of take_all: driver-bounded by construction
    return int(counts.sum("written") or 0)


def _normalize_documents(batch: pa.Table) -> pa.Table:
    """Coerce any (doc_id, text[, lang, source, n_chars]) batch to the
    parquet ``documents`` schema: missing lang/source default to '';
    n_chars is derived from the text when absent."""
    import pyarrow.compute as pc

    n = len(batch)
    names = set(batch.column_names)
    text = pc.cast(batch.column("text"), pa.string())
    if "lang" in names:
        lang = pc.cast(batch.column("lang"), pa.string())
    else:
        lang = pa.array([""] * n, type=pa.string())
    if "source" in names:
        source = pc.cast(batch.column("source"), pa.string())
    else:
        source = pa.array([""] * n, type=pa.string())
    if "n_chars" in names:
        n_chars = pc.cast(batch.column("n_chars"), pa.int64())
    else:
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    return pa.table(
        {
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "text": text,
            "lang": lang,
            "source": source,
            "n_chars": n_chars,
        }
    )


def read_documents_jsonl(path: str):
    """JSONL document source: newline-delimited JSON with at least
    (doc_id, text) per line -> a Dataset with the same schema as the
    parquet ``documents`` table (see _normalize_documents).

    Web-scraped corpora usually arrive as JSONL long before anyone
    converts them to parquet — this source lets every text/dedup pipeline
    run on them directly. Ray's native read_json handles ndjson splitting
    and parallel reads; the normalization is one vectorized map stage.
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    ds = rd.read_json(path)
    return strip_schema_metadata(
        ds.map_batches(_normalize_documents, batch_format="pyarrow")
    )


def read_documents_csv(path: str, **read_csv_kwargs):
    """CSV document source — same normalization contract as
    read_documents_jsonl: any CSV with at least (doc_id, text) columns
    becomes a Dataset with the parquet ``documents`` schema.

    Ray's native read_csv handles header inference, parallel reads and
    block splitting; extra ``read_csv_kwargs`` pass straight through to
    pyarrow's CSV reader (delimiter, column types, ...).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    ds = rd.read_csv(path, **read_csv_kwargs)
    return strip_schema_metadata(
        ds.map_batches(_normalize_documents, batch_format="pyarrow")
    )


def read_documents_arrow_ipc(path: str):
    """Arrow IPC (Feather v2) document source — same normalization
    contract as read_documents_jsonl: any .arrow/.feather file (or a
    directory of them) with at least (doc_id, text) columns becomes a
    Dataset with the parquet ``documents`` schema.

    Feature stores and exchange pipelines hand off Arrow IPC files
    zero-copy; Ray has no built-in IPC reader, so this source lists the
    shards and maps pyarrow.ipc over them via read_binary_files-free
    from_items fan-out (one task per shard — shards are the parallelism
    unit, matching how IPC files are produced)."""
    import os

    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    if os.path.isdir(path):
        shards = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".arrow", ".feather", ".ipc"))
        )
    else:
        shards = [path]
    if not shards:
        raise FileNotFoundError(f"no arrow-ipc shards under {path}")

    def load(batch: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc

        tables = []
        for p in batch.column("shard").to_pylist():
            with pa.memory_map(p) as mm:
                try:
                    t = ipc.open_file(mm).read_all()
                except pa.ArrowInvalid:
                    with pa.memory_map(p) as mm2:
                        t = ipc.open_stream(mm2).read_all()
            tables.append(t)
        merged = pa.concat_tables(tables, promote_options="default")
        return _normalize_documents(merged)

    shard_ds = rd.from_items([{"shard": s} for s in shards])
    return strip_schema_metadata(
        shard_ds.map_batches(load, batch_format="pyarrow", batch_size=1)
    )
