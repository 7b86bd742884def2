"""HTML main-content extraction pipeline (north-rule scope: boilerplate strip).

The corpus has no HTML column, so the pipeline derives a deterministic HTML
document per row (realistic boilerplate around the text content, see
functions.html.synthesize_html) and then runs the generic boilerplate-strip
kernel. A correct extractor recovers exactly the original text — which is the
DuckDB oracle (`SELECT doc_id, text AS main_text FROM documents`).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.html import strip_html_batch, synthesize_html


def html_main_content(sf_dir: str):
    import ray.data as rd

    def synth(batch: pa.Table) -> pa.Table:
        htmls = [
            synthesize_html(str(did), f"Doc {did}", text)
            for did, text in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            )
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "html": pa.array(htmls, type=pa.string())}
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(synth, batch_format="pyarrow")
    ds = ds.map_batches(strip_html_batch, batch_format="pyarrow")
    return ds.map_batches(
        lambda t: t.select(["doc_id", "main_text"]), batch_format="pyarrow"
    )
