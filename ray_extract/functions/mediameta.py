"""From-scratch media metadata codecs (stdlib/numpy only): BMP
(BITMAPINFOHEADER, 24bpp BI_RGB, full pixel decode), JPEG (marker walk to
SOF dimensions), TIFF (dual-endian IFD walk), MPEG-1 Layer III frame
chain (length-formula hopping), and ID3v2 (syncsafe sizes).

Each format's decoder validates the structural invariants a real ingest
relies on (magic, lengths, padding, sync) and raises ValueError on
malformed input — the pipeline layer maps that to dead-letters.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ BMP


def bmp_encode(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 BGR array as a real 24bpp BI_RGB BMP
    (bottom-up rows, 4-byte row padding)."""
    if pixels.shape != (height, width, 3):
        raise ValueError("pixel shape mismatch")
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    body = b"".join(
        pixels[y].tobytes() + b"\x00" * pad
        for y in range(height - 1, -1, -1)  # bottom-up
    )
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return hdr + info + body


def bmp_decode(blob: bytes) -> dict:
    """Decode a 24bpp BI_RGB BMP back to top-down (h, w, 3) BGR pixels."""
    if blob[:2] != b"BM" or len(blob) < 54:
        raise ValueError("not a BMP")
    _, fsize, _, _, off = struct.unpack("<2sIHHI", blob[:14])
    (hsz, w, h, planes, bpp, comp, _, _, _, _, _) = struct.unpack(
        "<IiiHHIIiiII", blob[14:54]
    )
    if hsz != 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant")
    if h <= 0 or w <= 0:
        raise ValueError("top-down/empty BMP unsupported")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = off + stride * h
    if len(blob) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(blob, np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    return {"width": w, "height": h, "pixels": rows[::-1].copy()}


# ----------------------------------------------------------------- JPEG

_STANDALONE = {0xD8, 0xD9} | set(range(0xD0, 0xD8))  # SOI/EOI/RSTn


def jpeg_build(width: int, height: int, n_comments: int) -> bytes:
    """Minimal structurally-valid JPEG: SOI, APP0/JFIF, n COM segments,
    DQT stub, SOF0 with the dimensions, DHT stub, SOS + scan + EOI."""
    out = [b"\xff\xd8"]  # SOI

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out.append(seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"))
    for c in range(n_comments):
        out.append(seg(0xFE, f"comment {c}".encode()))
    out.append(seg(0xDB, b"\x00" + bytes(64)))  # DQT stub
    out.append(
        seg(
            0xC0,
            struct.pack(">BHHB", 8, height, width, 3)
            + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01",
        )
    )
    out.append(seg(0xC4, b"\x00" + bytes(16) + b"\x00"))  # DHT stub
    out.append(seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00"))
    out.append(b"\x12\x34\x56")  # scan bytes (never parsed)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


def jpeg_dimensions(blob: bytes) -> dict:
    """Walk JPEG markers to the SOF segment; returns width/height and the
    number of non-standalone segments before SOS. A segment-length error
    derails the walk — structure is load-bearing."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos, n_seg = 2, 0
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = blob[pos + 1]
        if marker in _STANDALONE:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2):
            _, h, w, _ = struct.unpack(">BHHB", blob[pos + 4 : pos + 10])
            return {"width": w, "height": h, "n_segments": n_seg}
        if marker == 0xDA:
            raise ValueError("SOS before SOF")
        n_seg += 1
        pos += 2 + ln
    raise ValueError("no SOF marker")


# ----------------------------------------------------------------- TIFF


def tiff_build(width: int, height: int, bits: int, big_endian: bool) -> bytes:
    """Minimal single-IFD TIFF in either byte order."""
    e = ">" if big_endian else "<"
    hdr = (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, 8)
    entries = [(256, 3, 1, width), (257, 3, 1, height), (258, 3, 1, bits)]
    ifd = struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        # SHORT values sit left-justified in the 4-byte value slot
        vbytes = struct.pack(e + "H", val) + b"\x00\x00"
        ifd += struct.pack(e + "HHI", tag, typ, cnt) + vbytes
    ifd += struct.pack(e + "I", 0)  # no next IFD
    return hdr + ifd


def tiff_parse(blob: bytes) -> dict:
    """Parse the first IFD honouring the declared byte order."""
    order = blob[:2]
    if order == b"II":
        e, big = "<", False
    elif order == b"MM":
        e, big = ">", True
    else:
        raise ValueError("not a TIFF")
    magic, off = struct.unpack(e + "HI", blob[2:8])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (n,) = struct.unpack(e + "H", blob[off : off + 2])
    out = {"big_endian": big}
    names = {256: "width", 257: "height", 258: "bits"}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(e + "HHI", blob[base : base + 8])
        if tag in names:
            if typ != 3 or cnt != 1:
                raise ValueError("unexpected entry shape")
            (val,) = struct.unpack(e + "H", blob[base + 8 : base + 10])
            out[names[tag]] = val
    if set(names.values()) - set(out):
        raise ValueError("missing required tags")
    return out


# ------------------------------------------------------------------ MP3

MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320]  # MPEG-1 Layer III, kbps
MP3_RATES = [44100, 48000, 32000]


def mp3_build(frames: list[tuple[int, int, int]]) -> bytes:
    """Build a chain of MPEG-1 Layer III frames from (bitrate_idx,
    samplerate_idx, padding) triples; each frame's byte length follows
    the standard 144*bitrate/samplerate + padding formula."""
    out = []
    for br_i, sr_i, pad in frames:
        if not (1 <= br_i <= 14) or not (0 <= sr_i <= 2) or pad not in (0, 1):
            raise ValueError("bad frame spec")
        # sync(11) ver=11(MPEG1) layer=01(III) noprot=1 -> 0xFFFB
        b2 = (br_i << 4) | (sr_i << 2) | (pad << 1)
        hdr = bytes([0xFF, 0xFB, b2, 0x00])
        ln = 144 * MP3_BITRATES[br_i] * 1000 // MP3_RATES[sr_i] + pad
        out.append(hdr + bytes([(ln - 4) % 251]) * (ln - 4))
    return b"".join(out)


def mp3_parse(blob: bytes) -> dict:
    """Walk the frame chain: validate sync, decode header fields, compute
    each frame's length to find the next — a formula error desyncs."""
    pos, n, kbps_sum, total = 0, 0, 0, 0
    while pos < len(blob):
        if pos + 4 > len(blob) or blob[pos] != 0xFF or (blob[pos + 1] & 0xFE) != 0xFA:
            raise ValueError("frame desync")
        b2 = blob[pos + 2]
        br_i, sr_i, pad = b2 >> 4, (b2 >> 2) & 3, (b2 >> 1) & 1
        if br_i in (0, 15) or sr_i == 3:
            raise ValueError("bad header fields")
        ln = 144 * MP3_BITRATES[br_i] * 1000 // MP3_RATES[sr_i] + pad
        if pos + ln > len(blob):
            raise ValueError("truncated frame")
        n += 1
        kbps_sum += MP3_BITRATES[br_i]
        total += ln
        pos += ln
    return {"n_frames": n, "kbps_sum": kbps_sum, "total_bytes": total}


# ------------------------------------------------------------------ ID3


def _syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError("syncsafe overflow")
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _unsyncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("non-syncsafe byte")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def id3_build(title: str, artist: str) -> bytes:
    """ID3v2.4 tag with TIT2/TPE1 latin-1 text frames and a SYNCSAFE
    total size (the classic 7-bit-per-byte gotcha)."""
    frames = b""
    for fid, text in ((b"TIT2", title), (b"TPE1", artist)):
        payload = b"\x00" + text.encode("latin-1")
        frames += fid + _syncsafe(len(payload)) + b"\x00\x00" + payload
    return b"ID3\x04\x00\x00" + _syncsafe(len(frames)) + frames


def id3_parse(blob: bytes) -> dict:
    """Parse the tag: syncsafe sizes at both levels, frame walk must land
    exactly on the declared tag end."""
    if blob[:3] != b"ID3":
        raise ValueError("not ID3")
    size = _unsyncsafe(blob[6:10])
    pos, end = 10, 10 + size
    out = {"tag_size": size, "n_frames": 0}
    while pos < end:
        fid = blob[pos : pos + 4].decode("latin-1")
        fsz = _unsyncsafe(blob[pos + 4 : pos + 8])
        payload = blob[pos + 10 : pos + 10 + fsz]
        if payload[:1] != b"\x00":
            raise ValueError("unexpected text encoding")
        out[fid] = payload[1:].decode("latin-1")
        out["n_frames"] += 1
        pos += 10 + fsz
    if pos != end:
        raise ValueError("frame walk missed tag end")
    return out


# ----------------------------------------------------------- MP4 / BMFF


def mp4_build(doc_id: int) -> bytes:
    """Deterministic ISO-BMFF container: ftyp + moov(mvhd + k traks of
    tkhd) with REAL box sizes (mvhd v0 = 108 bytes, tkhd v0 = 92) —
    timescale 1000 + id%9000, movie duration id*37 % 100000, track m
    duration (id*13 + m*7) % 50000, width (64+m) px, height (48+m) px
    in 16.16 fixed point."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", doc_id % 1000))
    mvhd_payload = (
        b"\x00\x00\x00\x00"                       # version + flags
        + struct.pack(">II", 0, 0)                  # ctime, mtime
        + struct.pack(">I", 1000 + doc_id % 9000)   # timescale
        + struct.pack(">I", doc_id * 37 % 100000)   # duration
        + struct.pack(">I", 0x00010000)             # rate
        + struct.pack(">H", 0x0100)                 # volume
        + b"\x00" * 10                               # reserved
        + b"\x00" * 36                               # matrix
        + b"\x00" * 24                               # predefined
        + struct.pack(">I", 2)                       # next track id
    )
    assert len(mvhd_payload) == 100
    traks = b""
    for m in range(1 + doc_id % 3):
        tkhd_payload = (
            b"\x00\x00\x00\x07"                      # version + flags
            + struct.pack(">II", 0, 0)                # ctime, mtime
            + struct.pack(">I", m + 1)                # track id
            + b"\x00" * 4                              # reserved
            + struct.pack(">I", (doc_id * 13 + m * 7) % 50000)  # duration
            + b"\x00" * 8                              # reserved
            + struct.pack(">HHHH", 0, 0, 0, 0)        # layer/alt/vol/res
            + b"\x00" * 36                             # matrix
            + struct.pack(">I", (64 + m) << 16)       # width 16.16
            + struct.pack(">I", (48 + m) << 16)       # height 16.16
        )
        assert len(tkhd_payload) == 84
        traks += box(b"trak", box(b"tkhd", tkhd_payload))
    moov = box(b"moov", box(b"mvhd", mvhd_payload) + traks)
    return ftyp + moov


def mp4_walk(buf: bytes) -> dict:
    """Walk the top-level and moov box trees: sizes must nest EXACTLY
    (a single bad length raises), mvhd yields timescale/duration, each
    trak's tkhd yields duration and width."""
    import struct

    def boxes(b: bytes, lo: int, hi: int):
        pos = lo
        while pos < hi:
            if pos + 8 > hi:
                raise ValueError("truncated box header")
            size = struct.unpack(">I", b[pos:pos + 4])[0]
            btype = b[pos + 4:pos + 8]
            if size < 8 or pos + size > hi:
                raise ValueError("box size escapes its container")
            yield btype, pos + 8, pos + size
            pos += size
        if pos != hi:
            raise ValueError("container not exactly filled")

    out = {"timescale": 0, "duration": 0, "n_traks": 0,
           "sum_track_duration": 0, "sum_width_px": 0}
    for btype, lo, hi in boxes(buf, 0, len(buf)):
        if btype != b"moov":
            continue
        for ityp, ilo, ihi in boxes(buf, lo, hi):
            if ityp == b"mvhd":
                out["timescale"] = struct.unpack(
                    ">I", buf[ilo + 12:ilo + 16])[0]
                out["duration"] = struct.unpack(
                    ">I", buf[ilo + 16:ilo + 20])[0]
            elif ityp == b"trak":
                for ttyp, tlo, thi in boxes(buf, ilo, ihi):
                    if ttyp == b"tkhd":
                        out["n_traks"] += 1
                        out["sum_track_duration"] += struct.unpack(
                            ">I", buf[tlo + 20:tlo + 24])[0]
                        out["sum_width_px"] += struct.unpack(
                            ">I", buf[thi - 8:thi - 4])[0] >> 16
    return out


# ------------------------------------------------------------------ GIF


def gif_build(doc_id: int) -> bytes:
    """Deterministic GIF89a: header + logical screen descriptor (LE
    width 10 + id%300, height 8 + id%200, global color table of
    2^(1 + id%3 + 1) entries) + the color table + trailer."""
    import struct

    w = 10 + doc_id % 300
    h = 8 + doc_id % 200
    gct_exp = 1 + doc_id % 3                   # table size = 2^(exp+1)
    packed = 0x80 | (gct_exp & 0x07)           # GCT flag + size bits
    lsd = struct.pack("<HH", w, h) + bytes([packed, doc_id % 256, 0])
    n_entries = 1 << (gct_exp + 1)
    gct = bytes(
        (doc_id + 3 * i + ch) % 256
        for i in range(n_entries) for ch in range(3)
    )
    return b"GIF89a" + lsd + gct + b"\x3b"


def gif_parse(buf: bytes) -> dict:
    """Parse header + LSD + global color table: little-endian fields,
    size-bits decode, and the palette byte sum — a wrong LE read or
    table length breaks equality."""
    import struct

    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    w, h = struct.unpack("<HH", buf[6:10])
    packed = buf[10]
    if not packed & 0x80:
        raise ValueError("missing global color table")
    n_entries = 1 << ((packed & 0x07) + 1)
    gct = buf[13:13 + 3 * n_entries]
    if len(gct) != 3 * n_entries or buf[13 + 3 * n_entries:14 + 3 * n_entries] != b"\x3b":
        raise ValueError("truncated color table")
    return {
        "width": w,
        "height": h,
        "n_palette": n_entries,
        "palette_byte_sum": int(sum(gct)),
        "bg_index": buf[11],
    }


# ------------------------------------------------------------------ ICO


def ico_build(doc_id: int) -> bytes:
    """Deterministic ICO: ICONDIR (reserved 0, type 1, count 1+id%4) +
    one ICONDIRENTRY per image m (width (16+8m)%256, height (16+8m)%256,
    bpp 32, payload size 40+id%1000+m, offset chained) + opaque
    payloads of the declared sizes filled with byte (id+m)%256."""
    import struct

    n = 1 + doc_id % 4
    sizes = [40 + (doc_id % 1000) + m for m in range(n)]
    header = struct.pack("<HHH", 0, 1, n)
    offset = 6 + 16 * n
    entries = b""
    for m in range(n):
        w = (16 + 8 * m) % 256
        entries += struct.pack(
            "<BBBBHHII", w, w, 0, 0, 1, 32, sizes[m], offset
        )
        offset += sizes[m]
    payloads = b"".join(
        bytes([(doc_id + m) % 256]) * sizes[m] for m in range(n)
    )
    return header + entries + payloads


def ico_parse(buf: bytes) -> dict:
    """Parse ICONDIR + entries, follow each offset, and actually sum the
    payload bytes — a wrong offset chain or size field breaks equality
    with the formula oracle."""
    import struct

    reserved, ftype, n = struct.unpack("<HHH", buf[0:6])
    if reserved != 0 or ftype != 1:
        raise ValueError("bad ICO header")
    total = psum = wsum = 0
    for m in range(n):
        e = buf[6 + 16 * m:6 + 16 * (m + 1)]
        w, h, _, _, planes, bpp, size, off = struct.unpack("<BBBBHHII", e)
        data = buf[off:off + size]
        if len(data) != size:
            raise ValueError("payload escapes file")
        total += size
        psum += int(sum(data))
        wsum += w
    return {"n_images": n, "total_bytes": total,
            "payload_byte_sum": psum, "width_sum": wsum}
