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
