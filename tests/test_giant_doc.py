"""Wide-row robustness: a single multi-thousand-page document (one output row
with tens of thousands of nested structs) survives split -> shuffle -> merge ->
convert intact."""

import pyarrow as pa

from ray_extract import oracle as O
from ray_extract.derive import derive_payload, derive_spans
from ray_extract.pipelines.extract import ExtractConfig, extract_from_payloads


def test_giant_document_roundtrip(ray_session):
    words = " ".join(f"w{i}" for i in range(48000))  # 12k spans, 2000 pages
    pl = derive_payload("giant", words)
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["giant"]),
                "payload": pa.array([pl], type=pa.large_binary()),
            }
        )
    )
    cfg = ExtractConfig(
        split_threshold_pages=8, split_batch_pages=16, parse_concurrency=(1, 3)
    )
    out = extract_from_payloads(ds, cfg).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    exp = derive_spans("giant", words)
    assert row.n_pages == 2000
    assert len(row.spans) == len(exp)
    got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row.spans]
    want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp]
    assert got == want
    # block ids re-enumerated 0..n-1 across all 125 merged shards, pages global
    assert row.text_blocks[0]["text_block_id"] == "0"
    assert row.text_blocks[-1]["text_block_id"] == str(len(exp) - 1)
    assert row.text_blocks[-1]["page_number"] == 1999
    # spot-check against the full oracle too
    oracle_out = O.extract_document("giant", pl, split_batch_pages=16)
    assert [b["text_block_id"] for b in oracle_out["text_blocks"][:5]] == [
        b["text_block_id"] for b in row.text_blocks[:5]
    ]


def test_giant_doc_object_store_budget(ray_session):
    """SURVEY §7's wide-nested-row hazard, pinned as a resource budget: a
    heavy-tail document (4000 pages -> 250 page-range shards -> one merged
    wide row) must flow split -> shuffle -> merge -> convert without the
    object store ever holding more than a small multiple of the document
    itself. A quadratic shard blow-up or a stage that materializes every
    shard copy trips the bound long before it ooms a worker.

    Threshold: 192 MiB peak object-store DELTA for a ~0.7 MB payload
    (~24k spans). Measured peak on this host is ~15-40 MB across Ray 2.49
    runs (shard payloads + parsed flat columns + the merged wide row, plus
    executor metadata); 192 MiB is ~5x headroom while still 100x under any
    whole-corpus materialization."""
    import threading
    import time

    import ray
    import ray.data as rd

    words = " ".join(f"w{i}" for i in range(96000))  # 24k spans, 4000 pages
    pl = derive_payload("budget", words)

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["budget"]),
                "payload": pa.array([pl], type=pa.large_binary()),
            }
        )
    )
    cfg = ExtractConfig(
        split_threshold_pages=8, split_batch_pages=16, parse_concurrency=(1, 3)
    )

    min_avail = [ray.available_resources().get("object_store_memory", 0.0)]
    baseline = min_avail[0]
    stop = threading.Event()

    def sample():
        while not stop.is_set():
            a = ray.available_resources().get("object_store_memory")
            if a is not None and a < min_avail[0]:
                min_avail[0] = a
            time.sleep(0.02)

    t = threading.Thread(target=sample, daemon=True)
    t.start()
    try:
        out = extract_from_payloads(ds, cfg).to_pandas()
    finally:
        stop.set()
        t.join(timeout=2)
    assert len(out) == 1 and out.iloc[0].n_pages == 4000
    peak_delta = baseline - min_avail[0]
    print(f"\npeak object-store delta: {peak_delta / 1e6:.1f} MB")
    assert peak_delta < 192 * 1024 * 1024, (
        f"object store peak delta {peak_delta/1e6:.1f} MB exceeds the "
        "192 MiB heavy-tail budget — a split/merge stage is materializing "
        "more than shard-scale data"
    )
