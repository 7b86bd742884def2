"""Reference-semantics oracle: conversion edge cases + split/merge identity.

Each test pins a behavior of the reference implementation (file:line cited in
ray_extract/oracle.py) on the handcrafted edge corpus.
"""

import pytest

from ray_extract import oracle as O
from ray_extract import payload as P
from ray_extract.derive import derive_payload, derive_spans
from ray_extract.fixtures import edge_corpus


@pytest.fixture(scope="module")
def ec():
    return edge_corpus()


def test_id_gaps_for_dropped_paragraphs(ec):
    # reference convert.py:88-96: enumerate over ALL paragraphs
    out = O.extract_document("edge.gaps", ec["edge.gaps"])
    assert [b["text_block_id"] for b in out["text_blocks"]] == ["0", "2"]
    assert [b["type"] for b in out["text_blocks"]] == ["title", "Text"]


def test_unit_conversion_and_page_offset(ec):
    out = O.extract_document("edge.gaps", ec["edge.gaps"])
    b = out["text_blocks"][0]
    assert b["page_number"] == 0  # azure 1-indexed -> 0-indexed (convert.py:71)
    assert b["coords"][0] == (72.0, 72.0)  # inches x72 (convert.py:66-69)
    assert b["type_confidence"] == 1.0


def test_page_metadata_drops_missing_dims(ec):
    # reference convert.py:172-198
    out = O.extract_document("edge.badpage", ec["edge.badpage"])
    assert [p["page_number"] for p in out["page_metadata"]] == [0, 2]
    assert out["page_metadata"][1]["dimensions"] == (6.0 * 72, 9.0 * 72)


def test_cell_without_span_does_not_tag(ec):
    # reference convert.py:214 + tests/conftest.py:316-349
    out = O.extract_document("edge.nospancell", ec["edge.nospancell"])
    assert [s["kind"] for s in out["spans"]] == ["Text", "Text"]


def test_bad_cells_filtered_from_table_block_but_still_tag(ec):
    # reference convert.py:130-135 (filter) vs convert.py:203-217 (tagging uses
    # spans regardless of kind/row_span/column_span)
    out = O.extract_document("edge.badcell", ec["edge.badcell"])
    assert [s["kind"] for s in out["spans"]] == ["TableCell"] * 3
    assert len(out["table_blocks"][0]["cells"]) == 1
    assert out["table_blocks"][0]["cells"][0]["content"] == "aaaa"


def test_span_key_is_length_offset(ec):
    # reference convert.py:215,232: key order (length, offset). A paragraph
    # with span (offset=3, length=9) must not match a cell span
    # (offset=9, length=3).
    out = O.extract_document("edge.asym", ec["edge.asym"])
    assert [s["kind"] for s in out["spans"]] == ["Text", "TableCell"]


def test_empty_document_languages_none(ec):
    out = O.extract_document("edge.empty", ec["edge.empty"])
    assert out["spans"] == [] and out["languages"] is None


def test_empty_tables_is_empty_list_not_none(ec):
    # reference convert.py:156: `table_blocks is not []` is always True, so an
    # input with zero tables yields [] (never None)
    out = O.extract_document("edge.empty", ec["edge.empty"], experimental_extract_tables=True)
    assert out["table_blocks"] == []


def test_split_merge_identity(ec):
    # split path output identical to whole-doc output for every batch size
    for bs in (1, 2, 12, 50):
        whole = O.extract_document("edge.sixty8", ec["edge.sixty8"])
        split = O.extract_document("edge.sixty8", ec["edge.sixty8"], split_batch_pages=bs)
        assert split == whole, bs
    # global page numbers: paragraph on page 68 -> output page 67
    out = O.extract_document("edge.sixty8", ec["edge.sixty8"], split_batch_pages=12)
    assert out["text_blocks"][-1]["page_number"] == 67


def test_derived_doc_matches_rules():
    text = " ".join(f"w{i}" for i in range(120))
    spans = derive_spans("d", text)
    out = O.extract_document("d", derive_payload("d", text))
    got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in out["spans"]]
    want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
    assert got == want


def test_document_languages_proportions():
    from ray_extract.functions.language import document_languages

    # strictly > 0.4 (reference experimental_base.py:183-190)
    assert document_languages(["en", "en", "fr", "fr", "de"]) == []
    assert document_languages(["en", "en", "en", "fr", "de"]) == ["en"]
    assert document_languages(["en", "en", "fr", None, None]) == []
    assert document_languages([None, None]) is None
    # None languages count in the denominator
    assert document_languages(["en", "en", None, None, None]) == []
    assert document_languages(["en", "en", "en", None, None]) == ["en"]
