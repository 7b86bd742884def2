"""End-to-end pipeline vs oracle: span-sequence equality (kind, text,
media_ref, order) per document, plus full nested-output equality, over both
the edge corpus and the sf0.001-derived corpus, in both topologies."""

import pyarrow as pa
import pytest

from ray_extract import oracle as O
from ray_extract import payload as P
from ray_extract.derive import derive_payload, derived_doc_id
from ray_extract.fixtures import corrupt_payloads, edge_corpus
from ray_extract.pipelines.extract import (
    ExtractConfig,
    extract_from_payloads,
    extract_routed,
    flatten_blocks,
)
from ray_extract.sources.synth import materialize_corpus, synth_dataset

# autoscaling (1, k) pools: the routed topology runs TWO parse pools at once,
# and fixed pools that together reserve every CPU deadlock the task stages
CFG = ExtractConfig(split_threshold_pages=4, split_batch_pages=4, parse_concurrency=(1, 2))


def _spans(row) -> list:
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]


def _oracle_spans(exp) -> list:
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["spans"]]


def _payload_ds(docs: dict[str, bytes]):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.string()),
                "payload": pa.array(list(docs.values()), type=pa.large_binary()),
            }
        )
    )


def test_edge_corpus_pipeline_vs_oracle(ray_session, edge_payloads):
    out = extract_from_payloads(_payload_ds(edge_payloads), CFG).to_pandas()
    assert len(out) == len(edge_payloads)
    for _, r in out.iterrows():
        exp = O.extract_document(
            r.doc_id, edge_payloads[r.doc_id], md5_sum=P.md5_hex(edge_payloads[r.doc_id])
        )
        assert _spans(r) == _oracle_spans(exp), r.doc_id
        assert [b["text_block_id"] for b in r.text_blocks] == [
            b["text_block_id"] for b in exp["text_blocks"]
        ], r.doc_id
        assert (list(r.languages) if r.languages is not None else None) == exp["languages"]
        assert r.md5sum == exp["md5sum"]
        assert [p["page_number"] for p in r.page_metadata] == [
            p["page_number"] for p in exp["page_metadata"]
        ]
        got_cells = [
            (c["cell_type"], c["content"], c["page_number"])
            for t in r.table_blocks
            for c in t["cells"]
        ]
        want_cells = [
            (c["cell_type"], c["content"], c["bounding_regions"][0]["page_number"])
            for t in exp["table_blocks"]
            for c in t["cells"]
        ]
        assert got_cells == want_cells, r.doc_id


def test_dead_letter_rows(ray_session):
    docs = dict(corrupt_payloads())
    docs["good.one"] = derive_payload("good.one", "a b c d e f g h")
    out = extract_from_payloads(_payload_ds(docs), CFG).to_pandas().set_index("doc_id")
    assert out.loc["good.one"].status == "ok"
    # bad.notpdf carries %PDF magic, so the codec registry (codecs.py) routes
    # it to PdfCodec and dead-letters it with a PDF-specific reason; the other
    # two fail SPDF validation.
    expect_reason = {
        "bad.notpdf": "invalid pdf",
        "bad.truncated": "invalid payload",
        "bad.empty": "invalid payload",
    }
    for bad, reason in expect_reason.items():
        row = out.loc[bad]
        assert row.status == "error" and reason in row.error, (bad, row.error)
        assert len(row.spans) == 0
    # errors never abort the job and good rows are unaffected
    assert len(out.loc["good.one"].spans) == 2


def test_sf_corpus_both_topologies(ray_session, sf_docs, tmp_path):
    expected = {}
    for rid, src, text in sf_docs:
        did = derived_doc_id(src, rid)
        pl = derive_payload(did, text)
        expected[did] = _oracle_spans(O.extract_document(did, pl))

    uni = extract_from_payloads(
        synth_dataset("/root/testdata/sf0.001/documents.parquet"), CFG
    ).to_pandas()
    assert len(uni) == len(expected)
    for _, r in uni.iterrows():
        assert _spans(r) == expected[r.doc_id], r.doc_id

    corp = materialize_corpus(
        "/root/testdata/sf0.001/documents.parquet", str(tmp_path / "corpus")
    )
    routed = extract_routed(corp, CFG).to_pandas()
    assert len(routed) == len(expected)
    for _, r in routed.iterrows():
        assert _spans(r) == expected[r.doc_id], r.doc_id
    # the corpus must exercise the split path
    assert (routed.n_pages > CFG.split_threshold_pages).sum() > 0


def test_flatten_blocks(ray_session):
    docs = {"d1": derive_payload("d1", " ".join(f"w{i}" for i in range(40)))}
    out = extract_from_payloads(_payload_ds(docs), CFG)
    flat = out.map_batches(flatten_blocks, batch_format="pyarrow").to_pandas()
    exp = O.extract_document("d1", docs["d1"])
    assert list(flat["ord"]) == list(range(len(exp["text_blocks"])))
    assert list(flat["kind"]) == [b["type"] for b in exp["text_blocks"]]
    assert list(flat["text"]) == [b["text"][0] for b in exp["text_blocks"]]


def test_language_detector_swap_changes_only_language_columns(ray_session):
    """A1 seam: swapping detect_languages_arrow_wide in via
    ExtractConfig.language_detector may change languages / per-block language
    only; every other column is byte-identical."""
    from ray_extract.functions.language import detect_languages_arrow_wide

    docs = {
        "doc.en": derive_payload("doc.en", "the cat and the dog is that good with this"),
        "doc.nl": derive_payload("doc.nl", "het huis is een mooi huis van niet zijn voor maar ook"),
        "doc.tr": derive_payload("doc.tr", "bir ev ve bu gibi daha sonra kadar"),
    }
    wide_cfg = ExtractConfig(
        split_threshold_pages=4, split_batch_pages=4, parse_concurrency=(1, 2),
        language_detector=detect_languages_arrow_wide,
    )
    base = extract_from_payloads(_payload_ds(docs), CFG).to_pandas().set_index("doc_id").sort_index()
    wide = extract_from_payloads(_payload_ds(docs), wide_cfg).to_pandas().set_index("doc_id").sort_index()

    assert list(base.loc["doc.nl"].languages) == ["en"]  # narrow default misses nl
    assert list(wide.loc["doc.nl"].languages) == ["nl"]
    assert list(wide.loc["doc.tr"].languages) == ["tr"]
    assert list(wide.loc["doc.en"].languages) == ["en"]

    lang_free = [
        c for c in base.columns if c not in ("languages", "text_blocks")
    ]
    import pandas.testing as pdt

    pdt.assert_frame_equal(base[lang_free], wide[lang_free])
    for did in docs:
        bb, wb = base.loc[did].text_blocks, wide.loc[did].text_blocks
        assert len(bb) == len(wb)
        import numpy as np

        for b, w in zip(bb, wb):
            for k in b:
                if k != "language":
                    assert np.array_equal(b[k], w[k]), (did, k)
