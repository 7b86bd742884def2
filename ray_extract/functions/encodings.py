"""Vectorized transfer-encoding codecs (numpy, no per-row Python in the
decode path): base64 and LEB128 varints.

Both decoders operate on a FLAT concatenated byte buffer plus per-document
offsets — the natural Arrow binary-column layout — so one numpy pass
decodes a whole batch regardless of how many documents it holds.
"""

from __future__ import annotations

import numpy as np

def flat_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data, offsets) view of a String/Binary Arrow array
    (plain or Large, sliced or not): offsets are normalized to start at 0
    and index into the returned uint8 data view."""
    import pyarrow as pa

    width = 8 if col.type in (pa.large_string(), pa.large_binary()) else 4
    dt = np.int64 if width == 8 else np.int32
    offs = np.frombuffer(
        col.buffers()[1], dt, count=len(col) + 1, offset=col.offset * width
    ).astype(np.int64)
    data = np.frombuffer(
        col.buffers()[2], np.uint8, count=int(offs[-1])
    )[offs[0]:]
    return data, offs - offs[0]


_B64_LUT = np.full(256, 255, np.uint8)
for _i, _c in enumerate(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
):
    _B64_LUT[_c] = _i
_PAD = ord("=")


def b64_decode_flat(
    flat: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode concatenated base64 documents in one vectorized pass.

    ``flat`` is uint8 base64 text; ``offsets`` (int64, len n_docs+1) mark
    each document's char range, every document length a multiple of 4.
    Returns ``(decoded, out_offsets, valid)`` where ``decoded`` is the
    uint8 output buffer (3 bytes per quad, including up to 2 junk padding
    bytes per document), ``out_offsets`` maps documents into it, and
    ``valid`` masks the real (non-padding) bytes.
    """
    if len(flat) % 4:
        raise ValueError("base64 stream length not a multiple of 4")
    if ((offsets[1:] - offsets[:-1]) % 4).any():
        raise ValueError("document not quad-aligned")
    vals = _B64_LUT[flat]
    pad = flat == _PAD
    if (vals[~pad] == 255).any():
        raise ValueError("invalid base64 character")
    v = np.where(pad, 0, vals).astype(np.uint16).reshape(-1, 4)
    out = np.empty((len(v), 3), np.uint8)
    out[:, 0] = (v[:, 0] << 2 | v[:, 1] >> 4) & 0xFF
    out[:, 1] = ((v[:, 1] & 0xF) << 4 | v[:, 2] >> 2) & 0xFF
    out[:, 2] = ((v[:, 2] & 0x3) << 6 | v[:, 3]) & 0xFF
    decoded = out.reshape(-1)
    out_offsets = offsets * 3 // 4
    # padding only legal in a document's final quad; count per doc
    pad_cum = np.r_[0, np.cumsum(pad)]
    npad = pad_cum[offsets[1:]] - pad_cum[offsets[:-1]]
    if (npad > 2).any():
        raise ValueError("more than 2 padding chars in a document")
    valid = np.ones(len(decoded), bool)
    ends = out_offsets[1:]
    one = npad >= 1
    two = npad == 2
    valid[ends[one] - 1] = False
    valid[ends[two] - 2] = False
    return decoded, out_offsets, valid


def varint_decode_flat(
    flat: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode concatenated LEB128 varint streams in one vectorized pass.

    ``flat`` is the uint8 stream, ``offsets`` the per-document byte
    ranges (each document holds whole varints). Returns ``(values,
    counts)``: all decoded uint64 values in stream order and the number of
    values per document.
    """
    b = flat.astype(np.int64)
    ends = np.flatnonzero(b < 128)
    if len(flat) and (len(ends) == 0 or ends[-1] != len(flat) - 1):
        raise ValueError("truncated varint stream")
    # group id per byte = number of value-ends strictly before it
    gid = np.zeros(len(b), np.int64)
    gid[ends[:-1] + 1] = 1
    gid = np.cumsum(gid)
    starts = np.r_[0, ends[:-1] + 1]
    pos = np.arange(len(b), dtype=np.int64) - starts[gid]
    if (pos > 9).any():
        raise ValueError("varint longer than 10 bytes")
    contrib = (b & 0x7F) << (7 * pos)
    values = np.add.reduceat(contrib, starts) if len(b) else np.empty(
        0, np.int64
    )
    # per-document value counts: ends falling inside each doc range
    counts = (
        np.searchsorted(ends, offsets[1:] - 1, side="right")
        - np.searchsorted(ends, offsets[:-1] - 1, side="right")
    )
    # every doc boundary must align with a value boundary
    inner = offsets[1:-1]
    if len(inner) and not np.isin(inner - 1, ends).all():
        raise ValueError("document boundary splits a varint")
    return values, counts.astype(np.int64)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode int64 values (synth-side helper; per-value loop is
    fine — encode is not the kernel under test)."""
    out = bytearray()
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError("negative varint")
        while True:
            byte = v & 0x7F
            v >>= 7
            if v:
                out.append(byte | 0x80)
            else:
                out.append(byte)
                break
    return bytes(out)
