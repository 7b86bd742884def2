"""Content-stream text extraction for real PDF bytes (stdlib only).

This closes the loop the reference outsources to Azure Document Intelligence
(reference azure_wrapper.py:32-61: PDF bytes -> AnalyzeResult with paragraphs
in reading order): a from-scratch text extractor over the object layer in
``pdfio`` that turns real PDF bytes into the engine's ``payload.Flat`` layout
representation — the same structure the SPDF decode produces — so every
downstream stage (split / parse / merge / convert / span assembly) works on
real PDFs unchanged.

What it implements (PDF 1.7 spec, public):

- content-stream tokenizer (operands via ``pdfio.parse_object``, operators,
  inline-image skip),
- the text-object state machine: ``q Q cm BT ET Tf Td TD Tm T* TL Tc Tw Tz
  Tj TJ ' "`` with full text/CTM matrix tracking, plus Form-XObject ``Do``
  recursion,
- font decoding: ToUnicode CMaps (bfchar/bfrange, 1- and 2-byte code spaces,
  Identity-H Type0 fonts), simple-font encodings (WinAnsi = cp1252,
  MacRoman, /Differences over an AGL subset), glyph widths (/Widths, CID /W)
  for advance tracking and space inference,
- layout assembly: show-op runs -> baseline-grouped lines -> gap-grouped
  paragraphs with deterministic heading/title classification by font size
  (the local stand-in for Azure's paragraph roles, reference convert.py:75).

Geometry lands in the SPDF convention: page dims in inches, paragraph
polygons as 4 points (x, y) in inches with a TOP-LEFT origin (y measured
down from the page top), matching what the downstream x72 conversion expects
(reference convert.py:60-61).

Like the reference's page-range shards (utils.py:117-163), a sub-PDF is
re-parsed standalone, so span offsets are SHARD-local after a split; page
numbers are rebased by the parse stage exactly as for SPDF shards.
"""

from __future__ import annotations

import re
from math import hypot

import numpy as np

from .pdfio import (
    PdfError,
    PdfReader,
    Stream,
    _skip_ws,
    decode_stream,
    parse_object,
)

# ------------------------------------------------------------------ encodings

# WinAnsiEncoding is cp1252; undefined bytes -> U+FFFD (never in real text).
_WINANSI = [bytes([i]).decode("cp1252", "replace") for i in range(256)]
_MACROMAN = [bytes([i]).decode("mac_roman", "replace") for i in range(256)]

# Adobe Glyph List subset: every name that appears in common /Differences
# arrays for Latin text (single letters map to themselves below).
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "bullet": "•", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "fi": "ﬁ", "fl": "ﬂ",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedilla": "ç", "ntilde": "ñ", "sterling": "£",
    "section": "§", "copyright": "©", "registered": "®",
    "degree": "°", "trademark": "™", "minus": "−",
    "Euro": "€",
}


def _glyph_to_char(name: str) -> str:
    if len(name) == 1:
        return name
    if name in _AGL:
        return _AGL[name]
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    return "�"


# ------------------------------------------------------------- ToUnicode CMap

_HEX_PAIR = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_BFCHAR = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CODESPACE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_HEX = re.compile(rb"<([0-9A-Fa-f]+)>")
_RANGE_ARR = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)"
)


def _utf16be(hexs: bytes) -> str:
    raw = bytes.fromhex(hexs.decode("ascii"))
    if len(raw) % 2:
        raw += b"\x00"
    return raw.decode("utf-16-be", "replace")


def parse_tounicode(data: bytes) -> tuple[dict[int, str], int]:
    """Parse a ToUnicode CMap stream -> (code -> text map, code byte width)."""
    cmap: dict[int, str] = {}
    nbytes = 0
    for m in _CODESPACE.finditer(data):
        for h in _HEX.finditer(m.group(1)):
            nbytes = max(nbytes, len(h.group(1)) // 2)
    for m in _BFCHAR.finditer(data):
        for src, dst in _HEX_PAIR.findall(m.group(1)):
            cmap[int(src, 16)] = _utf16be(dst)
    for m in _BFRANGE.finditer(data):
        for lo, hi, dst in _RANGE_ARR.findall(m.group(1)):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if dst.startswith(b"["):
                dsts = _HEX.findall(dst)
                for i, d in enumerate(dsts):
                    if lo_i + i <= hi_i:
                        cmap[lo_i + i] = _utf16be(d)
            else:
                base = _utf16be(dst[1:-1])
                if len(base) == 1:
                    b0 = ord(base)
                    for c in range(lo_i, hi_i + 1):
                        cmap[c] = chr(b0 + (c - lo_i))
                else:  # multi-char dst: increment last code unit
                    for c in range(lo_i, hi_i + 1):
                        cmap[c] = base[:-1] + chr(ord(base[-1]) + (c - lo_i))
    return cmap, nbytes


# ------------------------------------------------------------------ font model


class FontDecoder:
    """Per-font byte-string -> (unicode, advance) decoder with glyph widths."""

    def __init__(self, reader: PdfReader, font: dict):
        r = reader.resolve
        self.subtype = str(r(font.get("Subtype", "")))
        self.cmap: dict[int, str] = {}
        self.nbytes = 2 if self.subtype == "Type0" else 1
        tu = r(font.get("ToUnicode"))
        if isinstance(tu, Stream):
            try:
                cmap, nb = parse_tounicode(decode_stream(tu, r))
                self.cmap = cmap
                # the CMap codespace only governs code width for composite
                # fonts; simple fonts are always 1-byte even when their
                # ToUnicode declares <0000> <FFFF>
                if nb and self.subtype == "Type0":
                    self.nbytes = nb
            except Exception:
                pass
        # simple-font byte table (used when no ToUnicode entry for a code)
        enc = r(font.get("Encoding"))
        table = list(_WINANSI)
        diffs = None
        if isinstance(enc, dict):
            base = str(r(enc.get("BaseEncoding", "")))
            if base == "MacRomanEncoding":
                table = list(_MACROMAN)
            diffs = r(enc.get("Differences"))
        elif str(enc) == "MacRomanEncoding":
            table = list(_MACROMAN)
        if diffs:
            code = 0
            for item in diffs:
                if isinstance(item, (int, float)):
                    code = int(item)
                else:
                    if 0 <= code < 256:
                        table[code] = _glyph_to_char(str(item))
                    code += 1
        self.table = table
        # widths (glyph space, /1000) for advance tracking
        self.default_width = 500.0
        self.widths: dict[int, float] = {}
        if self.subtype == "Type0":
            self.default_width = 1000.0
            desc = r(font.get("DescendantFonts"))
            if isinstance(desc, list) and desc:
                df = r(desc[0])
                self.default_width = float(r(df.get("DW", 1000)) or 1000)
                w = r(df.get("W"))
                if isinstance(w, list):
                    i = 0
                    while i < len(w):
                        c = int(r(w[i]))
                        nxt = r(w[i + 1]) if i + 1 < len(w) else None
                        if isinstance(nxt, list):
                            for j, wv in enumerate(nxt):
                                self.widths[c + j] = float(r(wv))
                            i += 2
                        elif nxt is not None and i + 2 < len(w):
                            c2, wv = int(nxt), float(r(w[i + 2]))
                            for cc in range(c, c2 + 1):
                                self.widths[cc] = wv
                            i += 3
                        else:
                            break
        else:
            fc = r(font.get("FirstChar"))
            ws = r(font.get("Widths"))
            if isinstance(ws, list) and fc is not None:
                for j, wv in enumerate(ws):
                    self.widths[int(fc) + j] = float(r(wv) or 0)
            fd = r(font.get("FontDescriptor"))
            if isinstance(fd, dict) and "MissingWidth" in fd:
                self.default_width = float(r(fd["MissingWidth"]) or 500)

    def codes(self, b: bytes) -> list[int]:
        if self.nbytes == 2:
            if len(b) % 2:
                b = b + b"\x00"
            return [(b[i] << 8) | b[i + 1] for i in range(0, len(b), 2)]
        return list(b)

    def char(self, code: int) -> str:
        got = self.cmap.get(code)
        if got is not None:
            return got
        if self.nbytes == 1 and 0 <= code < 256:
            return self.table[code]
        return "�"

    def width(self, code: int) -> float:
        return self.widths.get(code, self.default_width)


# ------------------------------------------------------------- content tokens

_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")
_EI_RE = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)")


def content_tokens(data: bytes):
    """Yield ('o', operand) / ('op', name) over one content stream."""
    pos, n = 0, len(data)
    while True:
        pos = _skip_ws(data, pos)
        if pos >= n:
            return
        c = data[pos]
        if c in b"/(<[" or c in b"+-." or 0x30 <= c <= 0x39:
            try:
                obj, pos = parse_object(data, pos)
            except PdfError:
                pos += 1
                continue
            yield ("o", obj)
        else:
            m = _OP_RE.match(data, pos)
            if not m:
                pos += 1
                continue
            op = m.group()
            pos = m.end()
            if op == b"BI":  # inline image: skip to whitespace-delimited EI
                e = _EI_RE.search(data, pos)
                pos = e.end() if e else n
                continue
            yield ("op", op)


# --------------------------------------------------------------- interpreter

_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mul(m, nx):
    return (
        m[0] * nx[0] + m[1] * nx[2],
        m[0] * nx[1] + m[1] * nx[3],
        m[2] * nx[0] + m[3] * nx[2],
        m[2] * nx[1] + m[3] * nx[3],
        m[4] * nx[0] + m[5] * nx[2] + nx[4],
        m[4] * nx[1] + m[5] * nx[3] + nx[5],
    )


class Run:
    """One text-showing op in device space."""

    __slots__ = ("page", "x0", "y0", "x1", "size", "text")

    def __init__(self, page, x0, y0, x1, size, text):
        self.page, self.x0, self.y0 = page, x0, y0
        self.x1, self.size, self.text = x1, size, text


# TJ adjustment (thousandths of text space) beyond which a space is inferred
_TJ_SPACE = 180.0
_MAX_FORM_DEPTH = 8


class _TextState:
    __slots__ = ("font", "size", "tc", "tw", "tz", "tl", "ts", "tm", "tlm")

    def __init__(self):
        self.font: FontDecoder | None = None
        self.size = 0.0
        self.tc = self.tw = self.ts = 0.0
        self.tz = 100.0
        self.tl = 0.0
        self.tm = _ID
        self.tlm = _ID


def _extract_page_runs(reader, page_num, page_dict, out: list[Run],
                       font_cache: dict | None = None):
    r = reader.resolve
    contents = r(page_dict.get("Contents"))
    if contents is None:
        return
    if isinstance(contents, list):
        data = b"\n".join(
            decode_stream(r(c), r) for c in contents if isinstance(r(c), Stream)
        )
    elif isinstance(contents, Stream):
        data = decode_stream(contents, r)
    else:
        return
    resources = r(page_dict.get("Resources")) or {}
    _run_content(
        reader, page_num, data, resources, _ID, out,
        font_cache if font_cache is not None else {}, 0,
    )


def _run_content(reader, page_num, data, resources, ctm0, out, font_cache, depth):
    r = reader.resolve
    fonts = r(resources.get("Font")) or {}
    xobjects = r(resources.get("XObject")) or {}
    ctm = ctm0
    gstack: list[tuple] = []
    ts = _TextState()
    operands: list = []

    def decoder_for(name: str) -> FontDecoder | None:
        key = id(resources), name
        if key not in font_cache:
            fd = r(fonts.get(name))
            font_cache[key] = FontDecoder(reader, fd) if isinstance(fd, dict) else None
        return font_cache[key]

    def show(items):
        """items: list of bytes (show) or numbers (TJ adjustments)."""
        if ts.font is None:
            return
        th = ts.tz / 100.0
        trm = _mul(ts.tm, ctm)
        size_dev = ts.size * hypot(trm[2], trm[3])
        x0, y0 = trm[4], trm[5]
        parts: list[str] = []
        tx = 0.0
        for it in items:
            if isinstance(it, (int, float)):
                shift = -float(it) / 1000.0 * ts.size * th
                tx += shift
                if float(it) <= -_TJ_SPACE:
                    parts.append(" ")
                continue
            for code in ts.font.codes(it):
                parts.append(ts.font.char(code))
                w = ts.font.width(code) / 1000.0 * ts.size
                wsp = ts.tw if (code == 32 and ts.font.nbytes == 1) else 0.0
                tx += (w + ts.tc + wsp) * th
        ts.tm = _mul((1.0, 0.0, 0.0, 1.0, tx, 0.0), ts.tm)
        text = "".join(parts)
        if text:
            trm2 = _mul(ts.tm, ctm)
            out.append(Run(page_num, x0, y0, trm2[4], size_dev, text))

    for kind, tok in content_tokens(data):
        if kind == "o":
            operands.append(tok)
            continue
        op = tok
        try:
            if op == b"q":
                gstack.append(ctm)
            elif op == b"Q":
                if gstack:
                    ctm = gstack.pop()
            elif op == b"cm" and len(operands) >= 6:
                ctm = _mul(tuple(float(v) for v in operands[-6:]), ctm)
            elif op == b"BT":
                ts.tm = ts.tlm = _ID
            elif op == b"ET":
                pass
            elif op == b"Tf" and len(operands) >= 2:
                ts.font = decoder_for(str(operands[-2]))
                ts.size = float(operands[-1])
            elif op == b"Td" and len(operands) >= 2:
                ts.tlm = _mul(
                    (1, 0, 0, 1, float(operands[-2]), float(operands[-1])), ts.tlm
                )
                ts.tm = ts.tlm
            elif op == b"TD" and len(operands) >= 2:
                ts.tl = -float(operands[-1])
                ts.tlm = _mul(
                    (1, 0, 0, 1, float(operands[-2]), float(operands[-1])), ts.tlm
                )
                ts.tm = ts.tlm
            elif op == b"Tm" and len(operands) >= 6:
                ts.tm = ts.tlm = tuple(float(v) for v in operands[-6:])
            elif op == b"T*":
                ts.tlm = _mul((1, 0, 0, 1, 0.0, -ts.tl), ts.tlm)
                ts.tm = ts.tlm
            elif op == b"TL" and operands:
                ts.tl = float(operands[-1])
            elif op == b"Tc" and operands:
                ts.tc = float(operands[-1])
            elif op == b"Tw" and operands:
                ts.tw = float(operands[-1])
            elif op == b"Tz" and operands:
                ts.tz = float(operands[-1])
            elif op == b"Ts" and operands:
                ts.ts = float(operands[-1])
            elif op == b"Tj" and operands and isinstance(operands[-1], bytes):
                show([operands[-1]])
            elif op == b"'" and operands and isinstance(operands[-1], bytes):
                ts.tlm = _mul((1, 0, 0, 1, 0.0, -ts.tl), ts.tlm)
                ts.tm = ts.tlm
                show([operands[-1]])
            elif op == b'"' and len(operands) >= 3:
                ts.tw = float(operands[-3])
                ts.tc = float(operands[-2])
                ts.tlm = _mul((1, 0, 0, 1, 0.0, -ts.tl), ts.tlm)
                ts.tm = ts.tlm
                if isinstance(operands[-1], bytes):
                    show([operands[-1]])
            elif op == b"TJ" and operands and isinstance(operands[-1], list):
                show(operands[-1])
            elif op == b"Do" and operands and depth < _MAX_FORM_DEPTH:
                xo = r(xobjects.get(str(operands[-1])))
                if isinstance(xo, Stream) and str(r(xo.dict.get("Subtype"))) == "Form":
                    mtx = r(xo.dict.get("Matrix")) or [1, 0, 0, 1, 0, 0]
                    sub_ctm = _mul(tuple(float(v) for v in mtx), ctm)
                    sub_res = r(xo.dict.get("Resources")) or resources
                    _run_content(
                        reader, page_num, decode_stream(xo, r), sub_res,
                        sub_ctm, out, font_cache, depth + 1,
                    )
        except (PdfError, ValueError, TypeError, KeyError):
            pass  # malformed operator: skip, keep extracting
        operands = []


# ---------------------------------------------------------- layout assembly


class Line:
    __slots__ = ("y", "x0", "x1", "size", "text")

    def __init__(self, y, x0, x1, size, text):
        self.y, self.x0, self.x1, self.size, self.text = y, x0, x1, size, text


def runs_to_lines(runs: list[Run]) -> list[Line]:
    """Group show-op runs into baseline lines, top-of-page first."""
    if not runs:
        return []
    runs = sorted(runs, key=lambda u: (-u.y0, u.x0))
    lines: list[Line] = []
    cur: list[Run] = []
    for u in runs:
        if cur and abs(u.y0 - cur[0].y0) > max(1.0, 0.35 * max(u.size, cur[0].size)):
            lines.append(_assemble_line(cur))
            cur = []
        cur.append(u)
    if cur:
        lines.append(_assemble_line(cur))
    return [ln for ln in lines if ln.text]


def _assemble_line(runs: list[Run]) -> Line:
    runs.sort(key=lambda u: u.x0)
    parts: list[str] = []
    prev_end = None
    size = max(u.size for u in runs)
    for u in runs:
        if prev_end is not None and u.x0 - prev_end > 0.25 * max(size, 1.0):
            parts.append(" ")
        parts.append(u.text)
        prev_end = max(u.x1, u.x0)
    # drop C0 control chars some ToUnicode CMaps emit for symbol glyphs
    text = re.sub(r"[\x00-\x08\x0b-\x1f]", "", "".join(parts))
    text = re.sub(r"\s+", " ", text).strip()
    return Line(
        runs[0].y0, min(u.x0 for u in runs), max(u.x1 for u in runs), size, text
    )


class Para:
    __slots__ = ("page", "role", "text", "x0", "x1", "y_top", "y_bot", "size")

    def __init__(self, page, lines: list[Line]):
        self.page = page
        self.role = None
        self.text = " ".join(ln.text for ln in lines)
        self.x0 = min(ln.x0 for ln in lines)
        self.x1 = max(ln.x1 for ln in lines)
        self.size = max(ln.size for ln in lines)
        self.y_top = max(ln.y + ln.size for ln in lines)
        self.y_bot = min(ln.y - 0.2 * ln.size for ln in lines)


def lines_to_paras(page: int, lines: list[Line]) -> list[Para]:
    """Merge adjacent lines into paragraphs by vertical gap + size affinity."""
    paras: list[Para] = []
    group: list[Line] = []
    for ln in lines:
        if group:
            prev = group[-1]
            gap = prev.y - ln.y
            same = (
                gap <= 1.7 * max(prev.size, 1.0)
                and abs(ln.size - prev.size) <= 0.2 * max(prev.size, ln.size)
            )
            if not same:
                paras.append(Para(page, group))
                group = []
        group.append(ln)
    if group:
        paras.append(Para(page, group))
    return paras


def classify_roles(all_paras: list[Para]) -> None:
    """Deterministic heading/title roles by relative font size.

    Stand-in for Azure's paragraph roles (reference convert.py:75): body size
    = char-weighted median line size; a short paragraph >= 1.15x body is a
    sectionHeading; the largest heading on page 1 is the title.
    """
    if not all_paras:
        return
    sizes = np.array([p.size for p in all_paras])
    weights = np.array([max(len(p.text), 1) for p in all_paras], dtype=np.int64)
    order = np.argsort(sizes, kind="stable")
    cw = np.cumsum(weights[order])
    body = float(sizes[order][int(np.searchsorted(cw, cw[-1] / 2))])
    title_idx, title_size = -1, 0.0
    for i, p in enumerate(all_paras):
        if p.size >= 1.15 * body and len(p.text) <= 120:
            p.role = "sectionHeading"
            if p.page == 1 and p.size > title_size:
                title_idx, title_size = i, p.size
    if title_idx >= 0:
        all_paras[title_idx].role = "title"


# ------------------------------------------------------------------ Flat out


def extract_paragraphs(data: bytes) -> tuple[list[Para], list[tuple[float, float]]]:
    """PDF bytes -> (paragraphs in reading order, page dims in points)."""
    reader = PdfReader(data)
    pages = reader.pages()
    dims: list[tuple[float, float]] = []
    all_paras: list[Para] = []
    font_cache: dict = {}
    for i, (_num, pd) in enumerate(pages):
        mb = reader.resolve(pd.get("MediaBox")) or [0, 0, 612, 792]
        mb = [float(reader.resolve(v)) for v in mb]
        dims.append((mb[2] - mb[0], mb[3] - mb[1]))
        runs: list[Run] = []
        try:
            # font decoders keyed by (resources id, name): shared across pages
            _extract_page_runs(reader, i + 1, pd, runs, font_cache)
        except PdfError:
            runs = []
        all_paras.extend(lines_to_paras(i + 1, runs_to_lines(runs)))
    classify_roles(all_paras)
    return all_paras, dims


def parse_pdf(data: bytes):
    """PDF bytes -> payload.Flat (the SPDF decode shape).

    The injectable layout kernel for real PDFs (ExtractConfig.parse_fn slot;
    LayoutParser dispatches here by magic sniff when no kernel is injected).
    Span offsets are char offsets into the document's logical content string
    (paragraph texts joined with one separator char), the SPDF convention.
    """
    from .. import vocab
    from ..payload import CELL_DT, Flat, PAGE_DT, PARA_DT, TAB_DT

    paras, dims = extract_paragraphs(data)
    pages_arr = np.zeros(len(dims), dtype=PAGE_DT)
    for i, (w, h) in enumerate(dims):
        pages_arr[i] = (w / 72.0, h / 72.0)
    pa_arr = np.zeros(len(paras), dtype=PARA_DT)
    texts: list[bytes] = []
    off = 0
    for i, p in enumerate(paras):
        tb = p.text.encode("utf-8")
        role = vocab.ROLE_TO_ID.get(p.role, vocab.NO_ROLE) if p.role else vocab.NO_ROLE
        h_pts = dims[p.page - 1][1]
        x0, x1 = p.x0 / 72.0, p.x1 / 72.0
        yt, yb = (h_pts - p.y_top) / 72.0, (h_pts - p.y_bot) / 72.0
        poly = (x0, yt, x1, yt, x1, yb, x0, yb)
        pa_arr[i] = (
            p.page, role, off, len(p.text), vocab.FLAG_HAS_REGION,
            len(tb), 0, 0, poly,
        )
        texts.append(tb)
        off += len(p.text) + 1  # one separator char in the logical string
    return Flat(
        pages=pages_arr,
        paras=pa_arr,
        tables=np.zeros(0, dtype=TAB_DT),
        cells=np.zeros(0, dtype=CELL_DT),
        text_blob=b"".join(texts),
        media_blob=b"",
        cell_blob=b"",
    )


def parse_auto(data: bytes):
    """Magic-sniff layout kernel: SPDF -> structured decode, PDF -> content-
    stream extraction. The LayoutParser default (stages/parse.py)."""
    from .. import payload as spdf

    if data[: len(spdf.MAGIC)] == spdf.MAGIC:
        return spdf.decode(data)
    from .pdfio import is_pdf

    if is_pdf(data):
        return parse_pdf(data)
    raise PdfError("unknown payload format (not SPDF, not PDF)")
