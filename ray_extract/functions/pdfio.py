"""Minimal pure-Python PDF reader/splitter (stdlib only: zlib + re).

Implements exactly the surface the reference engine needs from pypdf
(reference utils.py:117-163 split_into_batches, tests/helpers.py:17-21
is_valid_pdf) without any third-party dependency — this container has no
pypdf, and the engine's PDF codec (codecs.py) must still sniff, count pages
and slice page ranges of real PDF bytes:

- ``is_pdf``: the reference's 8-byte magic sniff.
- ``PdfReader``: object parser covering classic xref tables + trailers,
  cross-reference STREAMS (PDF 1.5+, FlateDecode + PNG predictors 10-15),
  object streams (/Type/ObjStm), /Prev chains and hybrid /XRefStm files,
  and the page-tree walk with attribute inheritance
  (MediaBox/CropBox/Resources/Rotate).
- ``build_subpdf``: re-serialize a page subset as a STANDALONE classic-xref
  PDF — transitive object closure from the selected pages (old page-tree
  nodes excluded and re-created), renumbered, stream bytes copied verbatim
  (filters preserved), inherited attributes materialized onto each page.
- ``split_into_batches``: the reference's split semantics — ceil(P/B)
  standalone sub-documents with 1-indexed INCLUSIVE page ranges
  ((lo, hi) = (i*B+1, min((i+1)*B, P))), ValueError on batch_size < 1.

Not supported (raises PdfError): encrypted files, exotic xref filters.
That is the honest boundary: layout ANALYSIS of PDF content is the job of
an injected parse kernel (the reference calls Azure Document Intelligence);
this module handles the byte-level ingest/route/split surface only.
"""

from __future__ import annotations

import re
import zlib

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMS = b"()<>[]{}/%"


class PdfError(ValueError):
    pass


class Name(str):
    """A PDF name object (/Foo) — distinct from string values."""


class Ref(tuple):
    """Indirect reference (num, gen)."""

    def __new__(cls, num, gen=0):
        return super().__new__(cls, (num, gen))


class Stream:
    """A stream object: its dict + raw (still-encoded) bytes."""

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw


def is_pdf(data: bytes) -> bool:
    """The reference's magic sniff (tests/helpers.py:17-21)."""
    return data[:8].startswith(b"%PDF-1.")


# ------------------------------------------------------------------ tokenizer


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in WHITESPACE:
            pos += 1
        elif c == 0x25:  # '%' comment to EOL
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R(?![a-zA-Z])")


def _parse_name(data: bytes, pos: int):
    # pos at '/'
    pos += 1
    out = bytearray()
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in WHITESPACE or c in DELIMS:
            break
        if c == 0x23 and pos + 2 < n:  # '#xx'
            out.append(int(data[pos + 1 : pos + 3], 16))
            pos += 3
        else:
            out.append(c)
            pos += 1
    return Name(out.decode("latin-1")), pos


def _parse_literal_string(data: bytes, pos: int):
    # pos at '('
    pos += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C and pos + 1 < n:  # backslash
            nxt = data[pos + 1]
            esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
            if nxt in esc:
                out.append(esc[nxt])
                pos += 2
            elif nxt in b"01234567":
                oct_digits = data[pos + 1 : pos + 4]
                m = re.match(rb"[0-7]{1,3}", oct_digits)
                out.append(int(m.group(), 8) & 0xFF)
                pos += 1 + len(m.group())
            elif nxt in b"\r\n":  # line continuation
                pos += 2
                if nxt == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:
                out.append(nxt)
                pos += 2
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise PdfError("unterminated string")


def parse_object(data: bytes, pos: int):
    """Parse one object at pos; returns (obj, next_pos)."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfError("eof while parsing")
    c = data[pos]
    if c == 0x2F:  # /
        return _parse_name(data, pos)
    if c == 0x28:  # (
        return _parse_literal_string(data, pos)
    if c == 0x3C:  # < or <<
        if data[pos : pos + 2] == b"<<":
            pos += 2
            d = {}
            while True:
                pos = _skip_ws(data, pos)
                if data[pos : pos + 2] == b">>":
                    return d, pos + 2
                key, pos = parse_object(data, pos)
                if not isinstance(key, Name):
                    raise PdfError(f"dict key is not a name: {key!r}")
                val, pos = parse_object(data, pos)
                d[str(key)] = val
        end = data.index(b">", pos + 1)
        hexs = re.sub(rb"\s", b"", data[pos + 1 : end])
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii")), end + 1
    if c == 0x5B:  # [
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(data, pos)
            if data[pos] == 0x5D:
                return arr, pos + 1
            item, pos = parse_object(data, pos)
            arr.append(item)
    if data.startswith(b"true", pos):
        return True, pos + 4
    if data.startswith(b"false", pos):
        return False, pos + 5
    if data.startswith(b"null", pos):
        return None, pos + 4
    m = _REF_RE.match(data, pos)
    if m:
        return Ref(int(m.group(1)), int(m.group(2))), m.end()
    m = _NUM_RE.match(data, pos)
    if m:
        tok = m.group()
        val = float(tok) if b"." in tok else int(tok)
        return val, m.end()
    raise PdfError(f"unparseable object at {pos}: {data[pos:pos+20]!r}")


# ------------------------------------------------------------ stream decoding


def _png_unpredict(data: bytes, columns: int, colors: int = 1, bpc: int = 8) -> bytes:
    bpp = max(1, (colors * bpc) // 8)
    rowlen = columns * bpp
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    while pos + 1 + rowlen <= len(data) + rowlen and pos < len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + rowlen])
        pos += 1 + rowlen
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise PdfError(f"unsupported PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def decode_stream(stream: Stream, resolve) -> bytes:
    """Decode a stream's raw bytes per /Filter (+ /DecodeParms)."""
    d = stream.dict
    filt = resolve(d.get("Filter"))
    parms = resolve(d.get("DecodeParms")) or resolve(d.get("DP")) or {}
    if filt is None:
        return stream.raw
    filters = filt if isinstance(filt, list) else [filt]
    parms_list = parms if isinstance(parms, list) else [parms]
    data = stream.raw
    for i, f in enumerate(filters):
        f = str(resolve(f))
        p = resolve(parms_list[i]) if i < len(parms_list) else {}
        p = p or {}
        if f == "FlateDecode":
            data = zlib.decompress(data)
            pred = resolve(p.get("Predictor", 1)) or 1
            if pred >= 10:
                data = _png_unpredict(
                    data,
                    int(resolve(p.get("Columns", 1)) or 1),
                    int(resolve(p.get("Colors", 1)) or 1),
                    int(resolve(p.get("BitsPerComponent", 8)) or 8),
                )
            elif pred != 1:
                raise PdfError(f"unsupported predictor {pred}")
        else:
            raise PdfError(f"unsupported stream filter {f}")
    return data


# -------------------------------------------------------------------- reader

_OBJ_AT_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfReader:
    """Random-access reader over one PDF byte string."""

    def __init__(self, data: bytes):
        if not is_pdf(data):
            raise PdfError("not a PDF (magic)")
        self.data = data
        if b"/Encrypt" in data:
            raise PdfError("encrypted PDFs not supported")
        self.xref: dict[int, tuple] = {}  # num -> ('o', offset) | ('s', stm, idx)
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self._load_xref_chain()

    # ---- xref parsing
    def _load_xref_chain(self):
        tail = self.data[-2048:]
        m = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not m:
            raise PdfError("no startxref")
        seen = set()
        queue = [int(m[-1].group(1))]
        while queue:
            off = queue.pop(0)
            if off in seen or off <= 0 or off >= len(self.data):
                continue
            seen.add(off)
            pos = _skip_ws(self.data, off)
            if self.data.startswith(b"xref", pos):
                trailer = self._parse_classic_xref(pos + 4)
            else:
                trailer = self._parse_xref_stream(pos)
            for key in ("XRefStm", "Prev"):
                if key in trailer:
                    queue.append(int(trailer[key]))
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)

    def _parse_classic_xref(self, pos: int) -> dict:
        data = self.data
        while True:
            pos = _skip_ws(data, pos)
            if data.startswith(b"trailer", pos):
                trailer, _ = parse_object(data, pos + 7)
                return trailer
            m = re.match(rb"(\d+)\s+(\d+)", data[pos : pos + 40])
            if not m:
                raise PdfError(f"bad xref subsection at {pos}")
            start, count = int(m.group(1)), int(m.group(2))
            pos = _skip_ws(data, pos + m.end())
            for i in range(count):
                ent = data[pos : pos + 20]
                em = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", ent)
                if not em:
                    raise PdfError(f"bad xref entry at {pos}: {ent!r}")
                if em.group(3) == b"n":
                    self.xref.setdefault(start + i, ("o", int(em.group(1))))
                # entries are exactly 20 bytes in spec but be tolerant
                pos += em.end()
                pos = _skip_ws(data, pos)

    def _parse_xref_stream(self, pos: int) -> dict:
        num, _gen, obj = self._parse_indirect_at(pos)
        if not isinstance(obj, Stream):
            raise PdfError("xref stream expected")
        d = obj.dict
        payload = decode_stream(obj, self._resolve_simple)
        w = [int(x) for x in d["W"]]
        size = int(d["Size"])
        index = d.get("Index", [0, size])
        index = [int(x) for x in index]
        rowlen = sum(w)
        p = 0

        def field(row, a, b):
            return int.from_bytes(row[a:b], "big") if b > a else None

        for k in range(0, len(index), 2):
            start, count = index[k], index[k + 1]
            for i in range(count):
                row = payload[p : p + rowlen]
                p += rowlen
                if len(row) < rowlen:
                    break
                o = 0
                t = field(row, 0, w[0])
                if w[0] == 0:
                    t = 1
                f2 = field(row, w[0], w[0] + w[1])
                f3 = field(row, w[0] + w[1], w[0] + w[1] + w[2]) or 0
                onum = start + i
                if t == 1:
                    self.xref.setdefault(onum, ("o", f2))
                elif t == 2:
                    self.xref.setdefault(onum, ("s", f2, f3))
        return d

    # ---- object access
    def _parse_indirect_at(self, off: int):
        data = self.data
        pos = _skip_ws(data, off)
        m = _OBJ_AT_RE.match(data, pos)
        if not m:
            raise PdfError(f"no 'N G obj' at {off}")
        num, gen = int(m.group(1)), int(m.group(2))
        obj, pos = parse_object(data, m.end())
        pos = _skip_ws(data, pos)
        if data.startswith(b"stream", pos):
            pos += 6
            if data[pos : pos + 2] == b"\r\n":
                pos += 2
            elif data[pos : pos + 1] in (b"\n", b"\r"):
                pos += 1
            length = self._resolve_simple(obj.get("Length"))
            if not isinstance(length, int):
                raise PdfError("stream without integer /Length")
            raw = data[pos : pos + length]
            obj = Stream(obj, raw)
        return num, gen, obj

    def _resolve_simple(self, v):
        return self.get(v[0]) if isinstance(v, Ref) else v

    def resolve(self, v):
        return self._resolve_simple(v)

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            self._cache[num] = None
            return None
        if ent[0] == "o":
            try:
                _n, _g, obj = self._parse_indirect_at(ent[1])
            except PdfError:
                obj = None
        else:
            obj = self._objstm_member(ent[1], num)
        self._cache[num] = obj
        return obj

    def _objstm_member(self, stm_num: int, want: int):
        members = self._objstm_cache.get(stm_num)
        if members is None:
            stm = self.get(stm_num)
            if not isinstance(stm, Stream):
                raise PdfError(f"object stream {stm_num} missing")
            payload = decode_stream(stm, self._resolve_simple)
            n = int(self._resolve_simple(stm.dict["N"]))
            first = int(self._resolve_simple(stm.dict["First"]))
            header = payload[:first].split()
            members = {}
            for i in range(n):
                onum = int(header[2 * i])
                ooff = int(header[2 * i + 1])
                obj, _ = parse_object(payload, first + ooff)
                members[onum] = obj
            self._objstm_cache[stm_num] = members
        return members.get(want)

    # ---- page tree
    _INHERITABLE = ("Resources", "MediaBox", "CropBox", "Rotate")

    def pages(self) -> list[tuple[int, dict]]:
        """[(page_obj_num, page_dict_with_inherited_attrs)] in document order."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("no /Root catalog")
        pages_ref = root.get("Pages")
        out: list[tuple[int, dict]] = []
        seen: set[int] = set()

        def walk(ref, inherited):
            if not isinstance(ref, Ref) or ref[0] in seen:
                return
            seen.add(ref[0])
            node = self.resolve(ref)
            if not isinstance(node, dict):
                return
            inh = dict(inherited)
            for k in self._INHERITABLE:
                if k in node:
                    inh[k] = node[k]
            ntype = str(node.get("Type", ""))
            if ntype == "Page" or ("Kids" not in node and ntype != "Pages"):
                page = dict(node)
                for k, v in inh.items():
                    page.setdefault(k, v)
                out.append((ref[0], page))
                return
            for kid in self.resolve(node.get("Kids")) or []:
                walk(kid, inh)

        walk(pages_ref, {})
        return out

    def count_pages(self) -> int:
        return len(self.pages())


# -------------------------------------------------------------------- writer


def _serialize(obj, renum: dict[int, int], out: bytearray):
    if isinstance(obj, Stream):
        _serialize(obj.dict, renum, out)
        out += b"\nstream\n"
        out += obj.raw
        out += b"\nendstream"
    elif isinstance(obj, Ref):
        new = renum.get(obj[0])
        out += f"{new} 0 R".encode() if new is not None else b"null"
    elif isinstance(obj, Name):
        safe = "".join(
            ch if (33 <= ord(ch) <= 126 and ch not in "()<>[]{}/%#") else f"#{ord(ch):02X}"
            for ch in obj
        )
        out += b"/" + safe.encode("latin-1")
    elif isinstance(obj, dict):
        out += b"<<"
        for k, v in obj.items():
            _serialize(Name(k), renum, out)
            out += b" "
            _serialize(v, renum, out)
            out += b" "
        out += b">>"
    elif isinstance(obj, list):
        out += b"["
        for v in obj:
            _serialize(v, renum, out)
            out += b" "
        out += b"]"
    elif isinstance(obj, bool):
        out += b"true" if obj else b"false"
    elif obj is None:
        out += b"null"
    elif isinstance(obj, bytes):
        out += b"<" + obj.hex().encode() + b">"
    elif isinstance(obj, float):
        out += f"{obj:.6f}".rstrip("0").rstrip(".").encode() or b"0"
    elif isinstance(obj, int):
        out += str(obj).encode()
    else:
        raise PdfError(f"unserializable {type(obj)}")


def build_subpdf(reader: PdfReader, page_indices: list[int]) -> bytes:
    """A standalone PDF containing the given 0-based pages of ``reader``.

    Object closure from each selected page (Parent excluded — the page tree
    is rebuilt); references to old /Type/Pages nodes (e.g. via /Dest or
    /Annots) serialize as null; inherited attributes were materialized by
    ``PdfReader.pages``.
    """
    pages = reader.pages()
    chosen = [pages[i] for i in page_indices]

    # transitive closure of old object numbers reachable from the pages
    keep: dict[int, object] = {}
    excluded: set[int] = set()
    stack: list[object] = []
    for _num, pd in chosen:
        for k, v in pd.items():
            if k != "Parent":
                stack.append(v)
    while stack:
        v = stack.pop()
        if isinstance(v, Ref):
            num = v[0]
            if num in keep or num in excluded:
                continue
            tgt = reader.get(num)
            t = tgt.dict if isinstance(tgt, Stream) else tgt
            if isinstance(t, dict) and str(t.get("Type", "")) == "Pages":
                excluded.add(num)
                continue
            keep[num] = tgt
            stack.append(t)
        elif isinstance(v, Stream):
            stack.append(v.dict)
        elif isinstance(v, dict):
            stack.extend(v.values())
        elif isinstance(v, list):
            stack.extend(v)

    # number map: 1 = catalog, 2 = pages node, 3.. = page dicts, then closure
    renum: dict[int, int] = {}
    next_num = 3
    page_new_nums = []
    for num, _pd in chosen:
        renum[num] = next_num
        page_new_nums.append(next_num)
        next_num += 1
    for num in sorted(keep):
        if num not in renum:
            renum[num] = next_num
            next_num += 1
    for num in excluded:
        renum.pop(num, None)

    objects: dict[int, object] = {
        1: {"Type": Name("Catalog"), "Pages": Ref(-2)},
        2: {
            "Type": Name("Pages"),
            "Kids": [Ref(-100 - i) for i in range(len(chosen))],
            "Count": len(chosen),
        },
    }
    # sentinel refs: -2 -> new obj 2, -100-i -> i-th new page number
    renum[-2] = 2
    for i, pn in enumerate(page_new_nums):
        renum[-100 - i] = pn
    for (num, pd), _pn in zip(chosen, page_new_nums):
        page = {k: v for k, v in pd.items() if k != "Parent"}
        page["Parent"] = Ref(-2)
        page.setdefault("Type", Name("Page"))
        objects[renum[num]] = page
    for num, obj in keep.items():
        objects[renum[num]] = obj

    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for new_num in sorted(objects):
        offsets[new_num] = len(out)
        out += f"{new_num} 0 obj\n".encode()
        _serialize(objects[new_num], renum, out)
        out += b"\nendobj\n"
    xref_off = len(out)
    size = max(objects) + 1
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for n in range(1, size):
        out += f"{offsets[n]:010d} 00000 n \n".encode()
    out += b"trailer\n"
    trailer = {"Size": size, "Root": Ref(-1)}
    renum[-1] = 1
    _serialize(trailer, renum, out)
    out += f"\nstartxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


def count_pages(data: bytes) -> int:
    return PdfReader(data).count_pages()


def split_into_batches(data: bytes, batch_size: int) -> list[tuple[bytes, tuple[int, int]]]:
    """Reference split semantics (utils.py:117-163): ceil(P/B) standalone
    sub-PDFs; 1-indexed inclusive page ranges; ValueError on batch_size < 1."""
    if batch_size < 1:
        raise ValueError("Batch size must be greater than 0.")
    reader = PdfReader(data)
    n = reader.count_pages()
    out = []
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        sub = build_subpdf(reader, idxs)
        out.append((sub, (idxs[0] + 1, idxs[-1] + 1)))
    return out
