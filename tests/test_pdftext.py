"""Real-PDF content-stream text extraction (functions/pdftext.py).

Covers the loop the reference outsources to Azure Document Intelligence
(reference azure_wrapper.py:32-61): PDF bytes -> ordered paragraph blocks,
end-to-end through the default extract pipeline, over the reference's own
committed PDFs (tests/data/sample-one-page.pdf, sample-two-page.pdf).
"""

import shutil

import pytest

from ray_extract.functions.pdftext import (
    FontDecoder,
    extract_paragraphs,
    parse_auto,
    parse_pdf,
    parse_tounicode,
)
from ray_extract.functions.pdfio import PdfError, PdfReader, split_into_batches

ONE_PAGE = "/root/reference/tests/data/sample-one-page.pdf"
TWO_PAGE = "/root/reference/tests/data/sample-two-page.pdf"


def _read(p):
    with open(p, "rb") as f:
        return f.read()


# ------------------------------------------------------------------- kernels


def test_two_page_text_and_order():
    paras, dims = extract_paragraphs(_read(TWO_PAGE))
    assert dims == [(612.0, 792.0), (612.0, 792.0)]
    texts = [p.text for p in paras]
    assert texts[0] == "A Simple PDF File"
    assert paras[0].role == "title" and paras[0].page == 1
    # reading order: page 1 paragraphs strictly before page 2
    pages = [p.page for p in paras]
    assert pages == sorted(pages)
    joined = " ".join(texts)
    assert "Continued on page 2" in joined
    assert "Simple PDF File 2" in joined
    assert "Oh, how boring typing this stuff" in joined
    # within a page, paragraphs are top-to-bottom
    p1 = [p for p in paras if p.page == 1]
    tops = [p.y_top for p in p1]
    assert tops == sorted(tops, reverse=True)


def test_one_page_winansi_and_type0_fonts():
    paras, dims = extract_paragraphs(_read(ONE_PAGE))
    texts = [p.text for p in paras]
    assert texts[0] == "UNITED STATES SECURITIES AND EXCHANGE COMMISSION"
    assert texts[1] == "Washington, D.C. 20549"
    joined = " ".join(texts)
    # WinAnsi TrueType body text
    assert "MICROSOFT CORPORATION" in joined
    assert "Commission File Number 001-37845" in joined
    # Type0 / Identity-H symbol font (checkbox) decodes via its ToUnicode
    assert "☒ QUARTERLY REPORT" in joined
    # control chars some CMaps emit for symbol glyphs are scrubbed
    assert all(not any(ord(c) < 32 for c in t) for t in texts)
    # title classification: the largest heading on page 1
    title = [p for p in paras if p.role == "title"]
    assert [p.text for p in title] == ["MICROSOFT CORPORATION"]


def test_parse_pdf_flat_shape():
    from ray_extract import vocab
    from ray_extract.payload import PARA_DT

    flat = parse_pdf(_read(TWO_PAGE))
    assert flat["paras"].dtype == PARA_DT
    assert len(flat["pages"]) == 2
    # page dims are inches
    assert flat["pages"][0]["width"] == pytest.approx(8.5)
    assert flat["pages"][0]["height"] == pytest.approx(11.0)
    paras = flat["paras"]
    assert (paras["flags"] & vocab.FLAG_HAS_REGION).all()
    # offsets: doc-global running char offsets with one separator char
    texts = []
    off = 0
    blob = flat["text_blob"]
    pos = 0
    for rec in paras:
        assert rec["offset"] == off
        t = blob[pos : pos + rec["text_len"]].decode("utf-8")
        assert len(t) == rec["length"]
        texts.append(t)
        off += rec["length"] + 1
        pos += rec["text_len"]
    assert texts[0] == "A Simple PDF File"
    # polygons are finite, inside the page, top-left origin (y grows down)
    assert (paras["poly"][:, 1] >= 0).all()
    assert (paras["poly"][:, 5] <= 11.01).all()
    assert (paras["poly"][:, 1] < paras["poly"][:, 5]).all()


def test_parse_auto_dispatch():
    from ray_extract.payload import encode
    from ray_extract.fixtures import build_flat

    spdf = encode(build_flat(
        pages=[(8.5, 11.0)],
        paras=[{"page": 1, "role": None, "text": "hi", "offset": 0, "length": 2}],
    ))
    assert parse_auto(spdf)["paras"]["length"][0] == 2
    assert len(parse_auto(_read(TWO_PAGE))["paras"]) > 0
    with pytest.raises(PdfError):
        parse_auto(b"\x00\x01not a doc")


def test_subpdf_shards_reparse_with_correct_pages():
    """build_subpdf shards re-extract standalone; page rebased to 1..k."""
    whole, _ = extract_paragraphs(_read(TWO_PAGE))
    shards = split_into_batches(_read(TWO_PAGE), 1)
    assert [rng for _, rng in shards] == [(1, 1), (2, 2)]
    texts = []
    for sub, _rng in shards:
        paras, dims = extract_paragraphs(sub)
        assert len(dims) == 1
        assert all(p.page == 1 for p in paras)
        texts.extend(p.text for p in paras)
    assert texts == [p.text for p in whole]


def test_tounicode_simple_font_stays_single_byte():
    """A simple font's ToUnicode may declare a 2-byte codespace; codes are
    still single bytes (only Type0 fonts honor the CMap code width)."""
    data = _read(ONE_PAGE)
    r = PdfReader(data)
    fonts = r.resolve(r.resolve(r.pages()[0][1]["Resources"])["Font"])
    dec = FontDecoder(r, r.resolve(fonts["TT2"]))
    assert dec.nbytes == 1
    assert dec.char(ord("U")) == "U"
    t0 = FontDecoder(r, r.resolve(fonts["C2_0"]))
    assert t0.nbytes == 2


def test_parse_tounicode_bfrange_forms():
    cm, nb = parse_tounicode(
        b"1 begincodespacerange <00> <ff> endcodespacerange\n"
        b"2 beginbfchar <41> <0042> <42> <00630064> endbfchar\n"
        b"1 beginbfrange <50> <52> <0061> endbfrange\n"
        b"1 beginbfrange <60> <61> [<0070> <0071>] endbfrange\n"
    )
    assert nb == 1
    assert cm[0x41] == "B" and cm[0x42] == "cd"
    assert cm[0x50] == "a" and cm[0x52] == "c"
    assert cm[0x60] == "p" and cm[0x61] == "q"


# ----------------------------------------------------------------- pipeline


@pytest.fixture(scope="module")
def pdf_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdf_corpus")
    for f in ("sample-one-page.pdf", "sample-two-page.pdf"):
        shutil.copy(f"/root/reference/tests/data/{f}", d / f)
    return str(d)


def test_e2e_default_pipeline_extracts_real_pdfs(ray_session, pdf_corpus):
    from ray_extract.pipelines.extract import ExtractConfig, extract_from_payloads
    from ray_extract.sources.files import read_document_dir

    ds = read_document_dir(pdf_corpus, suffix=".pdf")
    out = extract_from_payloads(ds, ExtractConfig()).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert list(out["status"]) == ["ok", "ok"]
    two = list(out.loc["sample-two-page", "text_blocks"])
    assert two[0]["text"] == "A Simple PDF File"
    assert two[0]["type"] == "title"
    assert [b["page_number"] for b in two] == sorted(
        b["page_number"] for b in two
    )
    assert two[-1]["page_number"] == 1  # 0-indexed second page
    one = list(out.loc["sample-one-page", "text_blocks"])
    assert one[0]["text"] == "UNITED STATES SECURITIES AND EXCHANGE COMMISSION"


def test_e2e_split_path_real_pdf(ray_session, pdf_corpus):
    """Force the two-page PDF through split -> parse -> merge."""
    from ray_extract.pipelines.extract import ExtractConfig, extract_from_payloads
    from ray_extract.sources.files import read_document_dir

    ds = read_document_dir(pdf_corpus, suffix=".pdf")
    cfg = ExtractConfig(split_threshold_pages=1, split_batch_pages=1)
    out = extract_from_payloads(ds, cfg).to_pandas().set_index("doc_id")
    whole = extract_from_payloads(
        read_document_dir(pdf_corpus, suffix=".pdf"), ExtractConfig()
    ).to_pandas().set_index("doc_id")
    for doc in ("sample-one-page", "sample-two-page"):
        got = [(b["text"], b["page_number"]) for b in out.loc[doc, "text_blocks"]]
        want = [(b["text"], b["page_number"]) for b in whole.loc[doc, "text_blocks"]]
        assert got == want
