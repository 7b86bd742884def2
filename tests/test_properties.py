"""Property/assumption tests over the derived corpus (reference
tests/test_convert.py:240-298 analogues) + hypothesis roundtrips."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ray_extract import payload as P
from ray_extract.derive import derive_flat, derive_spans
from ray_extract.oracle import analyze_result_from_flat


def _ar_for(text, doc_id="p"):
    return analyze_result_from_flat(derive_flat(doc_id, text))


def test_paragraph_spans_unique(sf_docs):
    # reference tests/test_convert.py:277-281
    for rid, src, text in sf_docs[:50]:
        ar = _ar_for(text)
        keys = [(p["spans"][0]["offset"], p["spans"][0]["length"]) for p in ar["paragraphs"]]
        assert len(keys) == len(set(keys)), rid


def test_cell_spans_unique_and_have_matching_paragraph(sf_docs):
    # reference tests/test_convert.py:240-298: every table cell span has
    # exactly one paragraph with equal span, content and bounding region
    for rid, src, text in sf_docs[:50]:
        ar = _ar_for(text)
        by_span = {
            (p["spans"][0]["offset"], p["spans"][0]["length"]): p
            for p in ar["paragraphs"]
        }
        cell_keys = []
        for t in ar["tables"]:
            for c in t["cells"]:
                key = (c["spans"][0]["offset"], c["spans"][0]["length"])
                cell_keys.append(key)
                match = by_span[key]
                assert match["content"] == c["content"]
                assert match["page_number"] == c["page_number"]
                assert match["polygon"] == c["polygon"]
        assert len(cell_keys) == len(set(cell_keys))


words = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=9),
    min_size=1,
    max_size=300,
)


@settings(max_examples=40, deadline=None)
@given(words)
def test_roundtrip_any_text(ws):
    text = " ".join(ws)
    flat = derive_flat("h", text)
    raw = P.encode(flat)
    assert P.is_valid(raw)
    back = P.decode(raw)
    for k in ("pages", "paras", "tables", "cells"):
        assert np.array_equal(back[k], np.asarray(flat[k])), k
    spans = derive_spans("h", text)
    assert len(back["paras"]) == len(spans)
    # offsets strictly increasing except consecutive empty media spans
    offs = [s["offset"] for s in spans]
    assert offs == sorted(offs)


@settings(max_examples=25, deadline=None)
@given(words, st.integers(min_value=1, max_value=9))
def test_slice_reassembly_any_text(ws, batch_pages):
    text = " ".join(ws)
    flat = derive_flat("h", text)
    n_pages = len(flat["pages"])
    parts = [
        P.slice_pages(flat, lo, hi)
        for lo, hi in P.split_page_ranges(n_pages, batch_pages)
    ]
    assert sum(len(p["paras"]) for p in parts) == len(flat["paras"])
    assert sum(len(p["cells"]) for p in parts) == len(flat["cells"])
    assert b"".join(bytes(p["text_blob"]) for p in parts) == bytes(flat["text_blob"])
    # every shard is standalone-valid and rebased to page 1
    for p in parts:
        assert P.is_valid(P.encode(p))
        if len(p["paras"]):
            assert p["paras"]["page"].min() >= 1
            assert p["paras"]["page"].max() <= batch_pages


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=4000),
    st.binary(min_size=1, max_size=16),
)
def test_fuzzed_payloads_never_crash_front(pos, junk):
    """Arbitrary byte corruption of a valid payload either still parses or
    becomes a dead-letter row — the front stages never raise (the 10^12-doc
    poison-document property)."""
    import pyarrow as pa

    from ray_extract.stages.decode import decode_stage
    from ray_extract.stages.parse import LayoutParser
    from ray_extract.stages.split import make_split_stage

    base = bytearray(
        P.encode(derive_flat("fz", " ".join(f"w{i}" for i in range(60))))
    )
    pos = pos % len(base)
    corrupted = bytes(base[:pos]) + junk + bytes(base[pos + len(junk):])
    batch = pa.table(
        {
            "doc_id": pa.array(["fz"]),
            "payload": pa.array([corrupted], type=pa.large_binary()),
        }
    )
    out = LayoutParser()(make_split_stage(2, 2)(decode_stage(batch)))
    assert set(out.column("status").to_pylist()) <= {"ok", "error"}
    # ... and all the way through merge + convert: a corrupted payload that
    # survives decode validation must not crash the convert stage either
    # (e.g. an out-of-range role id would IndexError on the type vocab).
    from ray_extract.stages.convert import make_convert_stage
    from ray_extract.stages.merge import merge_group

    final = make_convert_stage(True)(merge_group(out))
    assert set(final.column("status").to_pylist()) <= {"ok", "error"}
