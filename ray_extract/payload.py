"""SPDF: a deterministic binary page/layout payload format.

This is the engine's stand-in for PDF bytes. The reference round-trips PDF bytes
through Azure Document Intelligence to obtain an ``AnalyzeResult``
(`azure_wrapper.py:46-61`); this engine instead parses a local byte-stream whose
layout structure (pages, paragraphs, tables, cells, polygons, spans, roles) is
encoded directly, so the "layout parse" is a fast, fully deterministic decode.

Layout (little-endian):

    0   magic           8 bytes  b"%SPDF-1\\n"   (cf. PDF magic check, reference tests/helpers.py:17-21)
    8   header          7 x u32: n_pages, n_paras, n_tables, n_cells,
                                 text_blob_len, media_blob_len, cell_blob_len
    36  reserved        u32
    40  pages           n_pages  x PAGE_DT   (width/height in inches; NaN = missing)
        paras           n_paras  x PARA_DT   (sorted by page; reading order)
        tables          n_tables x TAB_DT    (sorted by page; each table on one page)
        cells           n_cells  x CELL_DT   (grouped by table, table order)
        text_blob       utf8, paragraph texts concatenated in paragraph order
        media_blob      utf8, paragraph media refs concatenated in paragraph order
        cell_blob       utf8, cell texts concatenated in cell order

Span ``offset``/``length`` are in characters into the document's logical content
string and are document-global (they survive page-range slicing unchanged; only
page numbers are rebased — cf. reference propagate_page_number, utils.py:35-78).
``text_len``/``media_len`` are utf8 BYTE lengths into the blobs.

Everything decodes to numpy structured-array views (zero-copy) and pyarrow
string arrays built directly on the blob buffers.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MAGIC = b"%SPDF-1\n"
HEADER_BYTES = 40

PAGE_DT = np.dtype([("width", "<f8"), ("height", "<f8")])
PARA_DT = np.dtype(
    [
        ("page", "<i4"),
        ("role", "<i4"),
        ("offset", "<i4"),
        ("length", "<i4"),
        ("flags", "<i4"),
        ("text_len", "<i4"),
        ("media_len", "<i4"),
        ("pad", "<i4"),
        ("poly", "<f8", (8,)),
    ]
)
TAB_DT = np.dtype(
    [
        ("page", "<i4"),
        ("row_count", "<i4"),
        ("col_count", "<i4"),
        ("ncells", "<i4"),
        ("offset", "<i4"),
        ("length", "<i4"),
        ("poly", "<f8", (8,)),
    ]
)
CELL_DT = np.dtype(
    [
        ("kind", "<i4"),
        ("row", "<i4"),
        ("col", "<i4"),
        ("rowspan", "<i4"),
        ("colspan", "<i4"),
        ("offset", "<i4"),
        ("length", "<i4"),
        ("flags", "<i4"),
        ("page", "<i4"),
        ("text_len", "<i4"),
        ("poly", "<f8", (8,)),
    ]
)


class Flat(dict):
    """A decoded SPDF document: numpy structured arrays + utf8 blobs.

    Keys: pages, paras, tables, cells (structured arrays) and text_blob,
    media_blob, cell_blob (bytes).
    """


def encode(flat: Flat) -> bytes:
    pages = np.ascontiguousarray(flat["pages"], dtype=PAGE_DT)
    paras = np.ascontiguousarray(flat["paras"], dtype=PARA_DT)
    tables = np.ascontiguousarray(flat["tables"], dtype=TAB_DT)
    cells = np.ascontiguousarray(flat["cells"], dtype=CELL_DT)
    text_blob = bytes(flat["text_blob"])
    media_blob = bytes(flat["media_blob"])
    cell_blob = bytes(flat["cell_blob"])
    header = np.array(
        [
            len(pages),
            len(paras),
            len(tables),
            len(cells),
            len(text_blob),
            len(media_blob),
            len(cell_blob),
            0,
        ],
        dtype="<u4",
    )
    return b"".join(
        [
            MAGIC,
            header.tobytes(),
            pages.tobytes(),
            paras.tobytes(),
            tables.tobytes(),
            cells.tobytes(),
            text_blob,
            media_blob,
            cell_blob,
        ]
    )


def is_valid(payload: bytes) -> bool:
    """Magic-byte + length sniff (cf. reference tests/helpers.py:17-21)."""
    if len(payload) < HEADER_BYTES or payload[:8] != MAGIC:
        return False
    h = np.frombuffer(payload, dtype="<u4", count=8, offset=8)
    need = (
        HEADER_BYTES
        + int(h[0]) * PAGE_DT.itemsize
        + int(h[1]) * PARA_DT.itemsize
        + int(h[2]) * TAB_DT.itemsize
        + int(h[3]) * CELL_DT.itemsize
        + int(h[4])
        + int(h[5])
        + int(h[6])
    )
    return len(payload) == need


def validate_deep(payload: bytes) -> str:
    """Structural validation beyond the magic/length sniff: internal counts
    and offsets must be consistent, or a downstream parse task would crash on
    a single poisoned document. Returns '' if valid, else a reason."""
    if not is_valid(payload):
        return "invalid payload: bad magic or truncated"
    try:
        flat = decode(payload)
    except Exception as e:  # pragma: no cover - decode is bounds-checked above
        return f"invalid payload: undecodable ({e})"
    n_pages = len(flat["pages"])
    paras, tables, cells = flat["paras"], flat["tables"], flat["cells"]
    if len(paras) and (
        paras["page"].min() < 1
        or paras["page"].max() > n_pages
        or (np.diff(paras["page"]) < 0).any()
    ):
        return "invalid payload: paragraph pages out of range or unsorted"
    if int(paras["text_len"].sum()) != len(flat["text_blob"]):
        return "invalid payload: text blob length mismatch"
    if int(paras["media_len"].sum()) != len(flat["media_blob"]):
        return "invalid payload: media blob length mismatch"
    if (paras["text_len"] < 0).any() or (paras["media_len"] < 0).any() or (
        paras["length"] < 0
    ).any():
        return "invalid payload: negative lengths"
    # role/kind ids index fixed vocab tables downstream (convert stage
    # type_vocab[type_id] / cell_kind_vocab[kind]); an out-of-range id would
    # crash the convert task and poison its whole batch, so range-check here
    # where a bad document becomes a dead-letter row instead.
    from .vocab import CELL_KINDS, FLAG_KIND_PRESENT, NO_ROLE, ROLES

    if len(paras) and (
        (paras["role"] < NO_ROLE).any() or (paras["role"] >= len(ROLES)).any()
    ):
        return "invalid payload: paragraph role out of range"
    if int(tables["ncells"].sum()) != len(cells):
        return "invalid payload: table cell count mismatch"
    if len(tables) and (
        (tables["ncells"] < 0).any()
        or tables["page"].min() < 1
        or tables["page"].max() > n_pages
        or (np.diff(tables["page"]) < 0).any()
    ):
        return "invalid payload: table pages out of range or unsorted"
    # unconditional (like the text/media blob checks): 0 declared cells with a
    # non-empty cell_blob is inconsistent — keeps exact parity with
    # validate_batch's unconditional seg_sum check
    if int(cells["text_len"].sum()) != len(flat["cell_blob"]):
        return "invalid payload: cell blob length mismatch"
    if len(cells):
        if (cells["text_len"] < 0).any() or cells["page"].min() < 1 or cells[
            "page"
        ].max() > n_pages:
            return "invalid payload: cell pages out of range"
        kind_present = (cells["flags"] & FLAG_KIND_PRESENT) != 0
        k = cells["kind"][kind_present]
        if len(k) and ((k < 0).any() or (k >= len(CELL_KINDS)).any()):
            return "invalid payload: cell kind out of range"
    # blobs feed pyarrow utf8 kernels downstream (trim/regex in convert):
    # corrupted bytes or an item boundary splitting a codepoint would raise
    # ArrowInvalid mid-batch — validate whole-blob UTF-8 and that every item
    # boundary lands on a character start (=> every slice is valid UTF-8).
    for blob, lens, what in (
        (flat["text_blob"], paras["text_len"], "text"),
        (flat["media_blob"], paras["media_len"], "media"),
        (flat["cell_blob"], cells["text_len"], "cell"),
    ):
        try:
            blob.decode("utf-8")
        except UnicodeDecodeError:
            return f"invalid payload: {what} blob is not valid utf8"
        if len(blob) and len(lens):
            bounds = np.cumsum(lens.astype(np.int64))[:-1]
            bounds = bounds[(bounds > 0) & (bounds < len(blob))]
            bb = np.frombuffer(blob, dtype=np.uint8)
            if ((bb[bounds] & 0xC0) == 0x80).any():
                return f"invalid payload: {what} blob boundary splits a codepoint"
    return ""


def concat_structured(parts: list[np.ndarray], dtype) -> np.ndarray:
    """Concatenate same-dtype structured arrays without numpy's pairwise
    field-promotion overhead (np.concatenate calls _promote_fields per pair —
    measured at ~50% of parse time for thousands of small shards)."""
    total = sum(len(p) for p in parts)
    out = np.empty(total, dtype=dtype)
    ob = out.view(np.uint8)  # raw byte copy: parts are contiguous same-dtype
    isz = dtype.itemsize
    pos = 0
    for p in parts:
        k = len(p) * isz
        ob[pos : pos + k] = p.view(np.uint8)
        pos += k
    return out


def validate_batch(payloads: list[bytes]) -> tuple[list[str], np.ndarray]:
    """Batched ``validate_deep``: same checks, vectorized across a batch.

    The per-document form costs ~100 us/doc in small-numpy-op overhead
    (~40 tiny allocations per document); at 10^6+ documents that is the
    decode stage's dominant cost. Here each document pays only its zero-copy
    struct decode; every range/monotonicity/sum/UTF-8 check runs ONCE per
    batch over concatenated arrays with per-document segment aggregation.

    Returns (reasons, n_pages): reasons[i] == '' when document i is valid,
    else the first failing check's message; n_pages[i] is the page count for
    valid documents (0 otherwise). Kept semantically equivalent to
    ``validate_deep`` (property-tested in tests/test_payload_batch.py).
    """
    from .vocab import CELL_KINDS, FLAG_KIND_PRESENT, NO_ROLE, ROLES

    n = len(payloads)
    reasons = [""] * n
    n_pages_out = np.zeros(n, dtype=np.int32)
    flats: list[Flat | None] = [None] * n
    for i, p in enumerate(payloads):
        if not is_valid(p):
            reasons[i] = "invalid payload: bad magic or truncated"
        else:
            flats[i] = decode(p)
    idxs = np.array([i for i in range(n) if flats[i] is not None], dtype=np.int64)
    k = len(idxs)
    if k == 0:
        return reasons, n_pages_out
    fl = [flats[i] for i in idxs]

    paras = concat_structured([f["paras"] for f in fl], PARA_DT)
    tabs = concat_structured([f["tables"] for f in fl], TAB_DT)
    cells = concat_structured([f["cells"] for f in fl], CELL_DT)
    np_doc = np.array([len(f["pages"]) for f in fl], dtype=np.int64)
    npar = np.array([len(f["paras"]) for f in fl], dtype=np.int64)
    ntab = np.array([len(f["tables"]) for f in fl], dtype=np.int64)
    ncel = np.array([len(f["cells"]) for f in fl], dtype=np.int64)
    tlen = np.array([len(f["text_blob"]) for f in fl], dtype=np.int64)
    mlen = np.array([len(f["media_blob"]) for f in fl], dtype=np.int64)
    clen = np.array([len(f["cell_blob"]) for f in fl], dtype=np.int64)
    para_doc = np.repeat(np.arange(k), npar)
    tab_doc = np.repeat(np.arange(k), ntab)
    cell_doc = np.repeat(np.arange(k), ncel)

    def seg_any(mask: np.ndarray, seg: np.ndarray) -> np.ndarray:
        if not mask.any():
            return np.zeros(k, dtype=bool)
        return np.bincount(seg[mask], minlength=k) > 0

    def seg_sum(vals: np.ndarray, seg: np.ndarray) -> np.ndarray:
        return np.bincount(seg, weights=vals.astype(np.float64), minlength=k)

    def nondecreasing_fail(pages: np.ndarray, seg: np.ndarray) -> np.ndarray:
        if len(pages) < 2:
            return np.zeros(k, dtype=bool)
        dec = pages[1:] < pages[:-1]
        same_doc = seg[1:] == seg[:-1]
        return seg_any(dec & same_doc, seg[1:])

    # ordered checks — first failing check names the reason (validate_deep order)
    checks: list[tuple[np.ndarray, str]] = []
    pp = paras["page"]
    checks.append(
        (
            seg_any((pp < 1) | (pp > np_doc[para_doc]), para_doc)
            | nondecreasing_fail(pp, para_doc),
            "invalid payload: paragraph pages out of range or unsorted",
        )
    )
    checks.append(
        (
            seg_sum(paras["text_len"], para_doc) != tlen,
            "invalid payload: text blob length mismatch",
        )
    )
    checks.append(
        (
            seg_sum(paras["media_len"], para_doc) != mlen,
            "invalid payload: media blob length mismatch",
        )
    )
    checks.append(
        (
            seg_any(
                (paras["text_len"] < 0)
                | (paras["media_len"] < 0)
                | (paras["length"] < 0),
                para_doc,
            ),
            "invalid payload: negative lengths",
        )
    )
    pr = paras["role"]
    checks.append(
        (
            seg_any((pr < NO_ROLE) | (pr >= len(ROLES)), para_doc),
            "invalid payload: paragraph role out of range",
        )
    )
    checks.append(
        (
            seg_sum(tabs["ncells"], tab_doc) != ncel,
            "invalid payload: table cell count mismatch",
        )
    )
    tp = tabs["page"]
    checks.append(
        (
            seg_any((tabs["ncells"] < 0) | (tp < 1) | (tp > np_doc[tab_doc]), tab_doc)
            | nondecreasing_fail(tp, tab_doc),
            "invalid payload: table pages out of range or unsorted",
        )
    )
    checks.append(
        (
            seg_sum(cells["text_len"], cell_doc) != clen,
            "invalid payload: cell blob length mismatch",
        )
    )
    cp = cells["page"]
    checks.append(
        (
            seg_any(
                (cells["text_len"] < 0) | (cp < 1) | (cp > np_doc[cell_doc]), cell_doc
            ),
            "invalid payload: cell pages out of range",
        )
    )
    ck = cells["kind"]
    kind_present = (cells["flags"] & FLAG_KIND_PRESENT) != 0
    checks.append(
        (
            seg_any(kind_present & ((ck < 0) | (ck >= len(CELL_KINDS))), cell_doc),
            "invalid payload: cell kind out of range",
        )
    )

    failed = np.zeros(k, dtype=bool)
    doc_reason = np.full(k, "", dtype=object)
    for mask, msg in checks:
        fresh = mask & ~failed
        doc_reason[fresh] = msg
        failed |= mask

    # UTF-8 checks only over documents that passed the structural checks
    # (their length fields are trusted). Fast path: ONE joined decode per
    # blob kind + one vectorized continuation-byte test over every slice
    # boundary (doc joins are themselves item boundaries, so joined-valid +
    # all-boundaries-on-char-starts => every per-doc slice is valid UTF-8).
    # Any failure falls back to the exact per-document checks — corruption
    # is the rare path by design.
    def utf8_doc_reason(f: Flat) -> str:
        for blob_key, lens, what in (
            ("text_blob", f["paras"]["text_len"], "text"),
            ("media_blob", f["paras"]["media_len"], "media"),
            ("cell_blob", f["cells"]["text_len"], "cell"),
        ):
            blob = f[blob_key]
            try:
                blob.decode("utf-8")
            except UnicodeDecodeError:
                return f"invalid payload: {what} blob is not valid utf8"
            if len(blob) and len(lens):
                bounds = np.cumsum(lens.astype(np.int64))[:-1]
                bounds = bounds[(bounds > 0) & (bounds < len(blob))]
                bb = np.frombuffer(blob, dtype=np.uint8)
                if ((bb[bounds] & 0xC0) == 0x80).any():
                    return f"invalid payload: {what} blob boundary splits a codepoint"
        return ""

    ok_doc = ~failed
    doc_sel = np.nonzero(ok_doc)[0]
    utf8_fast_ok = True
    for blob_key, lens_all, seg in (
        ("text_blob", paras["text_len"], para_doc),
        ("media_blob", paras["media_len"], para_doc),
        ("cell_blob", cells["text_len"], cell_doc),
    ):
        joined = b"".join(fl[j][blob_key] for j in doc_sel)
        if not joined:
            continue
        try:
            joined.decode("utf-8")
        except UnicodeDecodeError:
            utf8_fast_ok = False
            break
        lens = lens_all[ok_doc[seg]]
        if len(lens) == 0:
            continue
        bounds = np.cumsum(lens.astype(np.int64))
        bounds = bounds[(bounds > 0) & (bounds < len(joined))]
        bb = np.frombuffer(joined, dtype=np.uint8)
        if ((bb[bounds] & 0xC0) == 0x80).any():
            utf8_fast_ok = False
            break
    if not utf8_fast_ok:
        for j in doc_sel:
            msg = utf8_doc_reason(fl[j])
            if msg:
                doc_reason[j] = msg
                failed[j] = True

    for j in range(k):
        gi = int(idxs[j])
        if failed[j]:
            reasons[gi] = str(doc_reason[j])
        else:
            n_pages_out[gi] = len(fl[j]["pages"])
    return reasons, n_pages_out


def peek_counts(payload: bytes) -> tuple[int, int]:
    """(n_pages, n_paras) without a full decode."""
    h = np.frombuffer(payload, dtype="<u4", count=2, offset=8)
    return int(h[0]), int(h[1])


def decode(payload: bytes) -> Flat:
    """Zero-copy decode of a valid SPDF payload."""
    buf = memoryview(payload)
    h = np.frombuffer(buf, dtype="<u4", count=8, offset=8)
    n_pages, n_paras, n_tables, n_cells = (int(x) for x in h[:4])
    text_len, media_len, cell_len = (int(x) for x in h[4:7])
    off = HEADER_BYTES
    pages = np.frombuffer(buf, dtype=PAGE_DT, count=n_pages, offset=off)
    off += n_pages * PAGE_DT.itemsize
    paras = np.frombuffer(buf, dtype=PARA_DT, count=n_paras, offset=off)
    off += n_paras * PARA_DT.itemsize
    tables = np.frombuffer(buf, dtype=TAB_DT, count=n_tables, offset=off)
    off += n_tables * TAB_DT.itemsize
    cells = np.frombuffer(buf, dtype=CELL_DT, count=n_cells, offset=off)
    off += n_cells * CELL_DT.itemsize
    text_blob = bytes(buf[off : off + text_len])
    off += text_len
    media_blob = bytes(buf[off : off + media_len])
    off += media_len
    cell_blob = bytes(buf[off : off + cell_len])
    return Flat(
        pages=pages,
        paras=paras,
        tables=tables,
        cells=cells,
        text_blob=text_blob,
        media_blob=media_blob,
        cell_blob=cell_blob,
    )


def strings_from_lens(byte_lens: np.ndarray, blob: bytes) -> pa.StringArray:
    """Build a utf8 array over a concatenated blob from per-item byte lengths.

    Zero-copy on the data buffer: only the int32 offsets are materialized.
    """
    offsets = np.zeros(len(byte_lens) + 1, dtype=np.int32)
    np.cumsum(byte_lens, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.utf8(),
        len(byte_lens),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)],
    )


def slice_pages(flat: Flat, lo: int, hi: int) -> Flat:
    """Extract pages [lo, hi] (1-indexed inclusive) as a standalone document.

    Page numbers are rebased to 1..k (a standalone sub-document, mirroring the
    reference's pypdf page-range shards, utils.py:117-163). Span offsets stay
    document-global (see module docstring).
    """
    pages = flat["pages"][lo - 1 : hi]

    paras = flat["paras"]
    p0 = int(np.searchsorted(paras["page"], lo, side="left"))
    p1 = int(np.searchsorted(paras["page"], hi, side="right"))
    text_starts = np.zeros(len(paras) + 1, dtype=np.int64)
    np.cumsum(paras["text_len"], out=text_starts[1:])
    media_starts = np.zeros(len(paras) + 1, dtype=np.int64)
    np.cumsum(paras["media_len"], out=media_starts[1:])
    sub_paras = paras[p0:p1].copy()
    sub_paras["page"] -= lo - 1
    text_blob = flat["text_blob"][text_starts[p0] : text_starts[p1]]
    media_blob = flat["media_blob"][media_starts[p0] : media_starts[p1]]

    tables = flat["tables"]
    t0 = int(np.searchsorted(tables["page"], lo, side="left"))
    t1 = int(np.searchsorted(tables["page"], hi, side="right"))
    cell_starts = np.zeros(len(tables) + 1, dtype=np.int64)
    np.cumsum(tables["ncells"], out=cell_starts[1:])
    sub_tables = tables[t0:t1].copy()
    sub_tables["page"] -= lo - 1

    cells = flat["cells"]
    c0, c1 = int(cell_starts[t0]), int(cell_starts[t1])
    cblob_starts = np.zeros(len(cells) + 1, dtype=np.int64)
    np.cumsum(cells["text_len"], out=cblob_starts[1:])
    sub_cells = cells[c0:c1].copy()
    sub_cells["page"] -= lo - 1
    cell_blob = flat["cell_blob"][cblob_starts[c0] : cblob_starts[c1]]

    return Flat(
        pages=pages,
        paras=sub_paras,
        tables=sub_tables,
        cells=sub_cells,
        text_blob=text_blob,
        media_blob=media_blob,
        cell_blob=cell_blob,
    )


def split_page_ranges(n_pages: int, batch_size: int) -> list[tuple[int, int]]:
    """1-indexed inclusive page ranges of at most ``batch_size`` pages.

    Mirrors the reference's split (utils.py:117-163): ceil(pages/batch_size)
    shards; e.g. 68 pages / size 12 -> (1,12)...(61,68) (tests/test_utils.py:221-230).
    Raises ValueError for batch_size < 1 (utils.py:123-124).
    """
    if batch_size < 1:
        raise ValueError("Batch size must be greater than 0.")
    return [
        (lo + 1, min(lo + batch_size, n_pages))
        for lo in range(0, n_pages, batch_size)
    ]


def md5_hex(payload: bytes) -> str:
    """md5 of the document bytes (reference utils.py:166-168)."""
    return hashlib.md5(payload).hexdigest()
