"""Real-PDF codec: reference split/sniff parity on the reference's own
committed PDFs, plus codec-registry integration with the decode/split stages.

Reference semantics under test:
- is_valid_pdf magic sniff: /root/reference/tests/helpers.py:17-21
- split_into_batches: /root/reference/src/azure_pdf_parser/utils.py:117-163,
  cases from /root/reference/tests/test_utils.py:185-223 (sizes 1 and 2 for
  the committed one-page and two-page PDFs; batch_size < 1 raises).
"""

import pyarrow as pa
import pytest

from ray_extract.codecs import PdfCodec, SpdfCodec, codec_for
from ray_extract.functions.pdfio import (
    PdfReader,
    build_subpdf,
    count_pages,
    is_pdf,
    split_into_batches,
)

ONE_PAGE = "/root/reference/tests/data/sample-one-page.pdf"
TWO_PAGE = "/root/reference/tests/data/sample-two-page.pdf"


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def test_magic_sniff():
    one = _read(ONE_PAGE)
    assert is_pdf(one)
    assert not is_pdf(b"%SPDF-1\nxxxx")
    assert not is_pdf(b"")
    assert not is_pdf(b"%PDF-2.0")  # reference checks the '%PDF-1.' prefix


def test_count_pages_reference_pdfs():
    assert count_pages(_read(ONE_PAGE)) == 1  # linearized, xref streams
    assert count_pages(_read(TWO_PAGE)) == 2  # classic xref + trailer


def test_split_one_page_batch_size_1():
    # tests/test_utils.py:191-199
    batches = split_into_batches(_read(ONE_PAGE), 1)
    assert len(batches) == 1
    assert batches[0][1] == (1, 1)
    assert is_pdf(batches[0][0])


def test_split_two_page_batch_sizes():
    two = _read(TWO_PAGE)
    # tests/test_utils.py:201-206 (batch_size=1 -> two single-page docs)
    batches = split_into_batches(two, 1)
    assert [rng for _, rng in batches] == [(1, 1), (2, 2)]
    for sub, rng in batches:
        assert is_pdf(sub)
        assert count_pages(sub) == 1
    # tests/test_utils.py:208-211 (batch_size=2 -> one doc, range (1, 2))
    batches = split_into_batches(two, 2)
    assert [rng for _, rng in batches] == [(1, 2)]
    assert count_pages(batches[0][0]) == 2


def test_split_batch_size_zero_raises():
    with pytest.raises(ValueError, match="greater than 0"):
        split_into_batches(_read(TWO_PAGE), 0)


def test_subpdf_is_standalone_and_resplittable():
    # a split output must itself be a complete, parseable, re-splittable PDF
    two = _read(TWO_PAGE)
    (page2, rng) = split_into_batches(two, 1)[1]
    assert rng == (2, 2)
    again = split_into_batches(page2, 1)
    assert [r for _, r in again] == [(1, 1)]


def test_subpdf_preserves_content_stream():
    # stream bytes are copied verbatim: page 1's content stream must appear
    # unchanged inside the 1-page sub-PDF
    two = _read(TWO_PAGE)
    reader = PdfReader(two)
    pages = reader.pages()
    contents_ref = pages[0][1]["Contents"]
    src = reader.resolve(contents_ref)
    sub = build_subpdf(reader, [0])
    sub_reader = PdfReader(sub)
    sub_contents = sub_reader.resolve(sub_reader.pages()[0][1]["Contents"])
    assert sub_contents.raw == src.raw


def test_codec_registry_dispatch():
    from ray_extract.derive import derive_payload

    assert codec_for(_read(ONE_PAGE)) is PdfCodec
    assert codec_for(derive_payload("d.1", "hello world one two")) is SpdfCodec
    assert codec_for(b"\x00\x01junk") is None
    assert PdfCodec.validate(_read(TWO_PAGE)) == ""
    assert PdfCodec.validate(b"%PDF-1.4 truncated garbage").startswith("invalid pdf")


def test_decode_stage_routes_pdf_rows():
    """decode_stage: SPDF rows keep the batched path; PDF rows are validated
    and page-counted by their codec; junk dead-letters."""
    from ray_extract.derive import derive_payload
    from ray_extract.stages.decode import decode_stage

    spdf = derive_payload("doc.1", "alpha beta gamma delta " * 10)
    batch = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "payload": pa.array(
                [spdf, _read(TWO_PAGE), b"\xffnot-anything"], type=pa.large_binary()
            ),
        }
    )
    out = decode_stage(batch)
    status = out.column("status").to_pylist()
    npages = out.column("n_pages_doc").to_pylist()
    errors = out.column("error").to_pylist()
    assert status == ["ok", "ok", "error"]
    assert npages[1] == 2
    assert "invalid payload" in errors[2]


def test_split_stage_emits_standalone_pdf_shards():
    """The split stage slices a real PDF into standalone single-page PDFs
    with the reference's 1-indexed inclusive ranges."""
    from ray_extract.stages.decode import decode_stage
    from ray_extract.stages.split import make_split_stage

    batch = pa.table(
        {
            "doc_id": pa.array(["pdf2"]),
            "payload": pa.array([_read(TWO_PAGE)], type=pa.large_binary()),
        }
    )
    decoded = decode_stage(batch)
    split = make_split_stage(threshold_pages=1, batch_pages=1)
    shards = split(decoded)
    assert shards.column("batch_number").to_pylist() == [0, 1]
    assert shards.column("range_lo").to_pylist() == [1, 2]
    assert shards.column("range_hi").to_pylist() == [1, 2]
    assert shards.column("n_shards").to_pylist() == [2, 2]
    for payload in shards.column("payload").to_pylist():
        assert is_pdf(payload)
        assert count_pages(payload) == 1
