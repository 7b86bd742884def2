"""Synthesize the SPDF payload corpus from the driver's ``documents`` table.

The authoritative input shape for this engine is a Lance/parquet table of
interleaved text+media documents (`BASELINE.json` input_hint / FIXTURES.md
F-1). The sandbox has no external data, so the corpus is derived
deterministically from ``/root/testdata/sf*/documents.parquet``
(doc_id:int64, text, lang, source, n_chars) via `ray_extract.derive` — pure
modular rules, reproducible everywhere (including in the DuckDB oracle SQL).

``amplify``/``heavy_tail`` deterministically scale the corpus for benchmarks:
each source row becomes ``amplify`` documents (suffixed ids), and a small
deterministic subset gets its text repeated to create the heavy-tail
document-size skew the split stage exists to defuse (FIXTURES.md F-5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..derive import derive_metadata, derive_payload, derived_doc_id

META_COLUMNS = (
    "document_name",
    "document_description",
    "source_url",
    "cdn_object",
    "content_type",
    "slug",
)


def make_synth_stage(amplify: int = 1, heavy_tail: bool = False, with_meta: bool = False):
    """map_batches fn: documents.parquet rows -> (doc_id, payload, n_pages, n_spans).

    ``with_meta`` additionally emits the ParserInput identity columns
    (derive.derive_metadata) — including the deterministic invalid-cdn_object
    subset that exercises the conversion-error dead-letter path."""

    def synth(batch: pa.Table) -> pa.Table:
        from ..payload import peek_counts

        raw_ids = batch.column("doc_id").to_pylist()
        sources = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        doc_ids: list[str] = []
        payloads: list[bytes] = []
        meta: dict[str, list[str]] = {c: [] for c in META_COLUMNS}
        for rid, src, text in zip(raw_ids, sources, texts):
            base = derived_doc_id(src, rid)
            for rep in range(amplify):
                did = base if rep == 0 else f"{base}.r{rep}"
                t = text
                if heavy_tail:
                    # deterministic skew: ~1% of docs get 32x text, ~0.1% 128x
                    h = (rid * 2654435761 + rep * 40503) & 0xFFFF
                    if h % 1024 == 7:
                        t = " ".join([text] * 128)
                    elif h % 128 == 5:
                        t = " ".join([text] * 32)
                doc_ids.append(did)
                payloads.append(derive_payload(did, t))
                if with_meta:
                    m = derive_metadata(src, rid)
                    for c in META_COLUMNS:
                        meta[c].append(m[c])
        n_pages = np.array([peek_counts(p)[0] for p in payloads], dtype=np.int32)
        n_spans = np.array([peek_counts(p)[1] for p in payloads], dtype=np.int32)
        cols = {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "n_pages": pa.array(n_pages),
            "n_spans": pa.array(n_spans),
        }
        if with_meta:
            for c in META_COLUMNS:
                cols[c] = pa.array(meta[c], type=pa.string())
        return pa.table(cols)

    return synth


def synth_dataset(documents_path: str, amplify: int = 1, heavy_tail: bool = False,
                  with_meta: bool = False):
    """documents.parquet -> lazy Dataset of (doc_id, payload, n_pages, n_spans)."""
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    ds = strip_schema_metadata(
        rd.read_parquet(documents_path, columns=["doc_id", "source", "text"])
    )
    return ds.map_batches(
        make_synth_stage(amplify=amplify, heavy_tail=heavy_tail, with_meta=with_meta),
        batch_format="pyarrow",
        batch_size=256,
    )


def materialize_corpus(
    documents_path: str,
    out_dir: str,
    amplify: int = 1,
    heavy_tail: bool = False,
    num_files: int = 0,
    route_threshold_pages: int = 0,
) -> str:
    """Write the payload corpus to partitioned parquet (bench input; carries an
    n_pages column so the extract pipeline can route small/large documents with
    read-time predicate pushdown).

    The corpus is spread over many files (default ~5000 docs/file) — readers
    get one task per file group, so a single giant file would serialize the
    scan (observed: 3-file corpus -> 3-way-parallel read bottleneck).

    ``route_threshold_pages > 0`` partitions the corpus BY THE ROUTING KEY at
    ingest: documents at/below the threshold land under ``<out>/small/`` and
    the heavy tail under ``<out>/large/``, EACH spread round-robin over many
    uniform files. The routed job then reads each branch's own files — one
    scan total instead of two filtered full scans, and no repartition
    exchange on the heavy side. (SORTING one file set by n_pages was measured
    and REJECTED — equal row counts per file concentrate the heavy payload
    bytes into straggler files; per-branch round-robin keeps files uniform
    WITHIN each branch.)

    The threshold is recorded in ``<out>/_routing.json``; run_extract_job
    takes the unfiltered fast path ONLY when that recorded threshold equals
    its own split threshold. (Unfiltered reads at a MISMATCHED threshold
    would be wrong: small-branch docs with pages in (split, route] would be
    split into shards the small branch never merges.) On mismatch or a
    missing manifest the job falls back to filtered scans, which are correct
    for any threshold."""
    if num_files <= 0:
        import pyarrow.parquet as pq

        n_docs = pq.ParquetFile(documents_path).metadata.num_rows * amplify
        num_files = max(8, min(512, n_docs // 5000))
    if route_threshold_pages > 0:
        import pyarrow.compute as _pc

        for branch, pred in (
            ("small", lambda t: _pc.less_equal(t.column("n_pages"), route_threshold_pages)),
            ("large", lambda t: _pc.greater(t.column("n_pages"), route_threshold_pages)),
        ):
            ds = synth_dataset(documents_path, amplify=amplify, heavy_tail=heavy_tail)
            ds = ds.map_batches(
                lambda t, p=pred: t.filter(p(t)), batch_format="pyarrow"
            )
            # heavy tail is few docs but most bytes: fewer files, still uniform
            files = num_files if branch == "small" else max(8, num_files // 2)
            ds.repartition(files).write_parquet(f"{out_dir}/{branch}")
        import json
        import os

        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "_routing.json"), "w") as f:
            json.dump({"route_threshold_pages": route_threshold_pages}, f)
        return out_dir
    ds = synth_dataset(documents_path, amplify=amplify, heavy_tail=heavy_tail)
    ds = ds.repartition(num_files)
    ds.write_parquet(out_dir)
    return out_dir
