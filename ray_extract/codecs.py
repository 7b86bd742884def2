"""Pluggable payload-format codecs, keyed by magic-byte sniff.

The engine's native page/layout format is SPDF (payload.py); real corpora
also carry actual PDF bytes (the reference operates on them directly:
magic sniff in tests/helpers.py:17-21, pypdf page split in utils.py:117-163).
This registry puts the byte-level surface the ingest pipeline needs —
``sniff`` / ``validate`` / ``page_count`` / ``open``+``slice_pages`` —
behind one interface so the decode and split stages handle any registered
format:

- ``SpdfCodec``: the native format (zero-copy structured decode; the decode
  stage keeps its BATCHED validate fast path for SPDF rows and only
  dispatches per-row for other formats).
- ``PdfCodec``: real PDF bytes via the self-contained reader/splitter in
  functions/pdfio.py (classic + stream xref, object streams, FlateDecode).
  Page-range slices are STANDALONE sub-PDFs with the reference's
  split_into_batches semantics.

Layout ANALYSIS of PDF content is not a codec concern: the parse stage's
kernel is injectable (ExtractConfig.parse_fn), and its default dispatches by
magic sniff — SPDF to the structured decode, real PDF bytes to the
content-stream text extractor in functions/pdftext.py (the local replacement
for the reference's Azure round-trip, azure_wrapper.py:32-61).
"""

from __future__ import annotations

from . import payload as spdf
from .functions import pdfio


class SpdfCodec:
    name = "spdf"
    content_type = "application/x-spdf"

    @staticmethod
    def sniff(data: bytes) -> bool:
        return data[: len(spdf.MAGIC)] == spdf.MAGIC

    @staticmethod
    def validate(data: bytes) -> str:
        return spdf.validate_deep(data)

    @staticmethod
    def page_count(data: bytes) -> int:
        return spdf.peek_counts(data)[0]

    @staticmethod
    def open(data: bytes):
        return spdf.decode(data)

    @staticmethod
    def slice_pages(handle, lo: int, hi: int) -> bytes:
        return spdf.encode(spdf.slice_pages(handle, lo, hi))


class PdfCodec:
    name = "pdf"
    content_type = "application/pdf"

    @staticmethod
    def sniff(data: bytes) -> bool:
        return pdfio.is_pdf(data)

    @staticmethod
    def validate(data: bytes) -> str:
        try:
            pdfio.PdfReader(data).count_pages()
            return ""
        except Exception as e:
            return f"invalid pdf: {e}"

    @staticmethod
    def page_count(data: bytes) -> int:
        return pdfio.count_pages(data)

    @staticmethod
    def open(data: bytes):
        return pdfio.PdfReader(data)

    @staticmethod
    def slice_pages(handle, lo: int, hi: int) -> bytes:
        return pdfio.build_subpdf(handle, list(range(lo - 1, hi)))


REGISTRY = (SpdfCodec, PdfCodec)


def codec_for(data: bytes):
    """First registered codec whose magic matches, else None."""
    for c in REGISTRY:
        if c.sniff(data):
            return c
    return None
