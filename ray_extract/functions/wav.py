"""From-scratch RIFF/WAVE PCM codec (stdlib only).

The reference outsources all media handling (azure-pdf-parser keeps media
as opaque references); a real extraction pipeline at scale needs an
in-process audio featurization path. This module is the WAV counterpart
of functions/png.py: a minimal but real container codec — RIFF chunk
framing, fmt parsing, 16-bit little-endian PCM — so the actor-pool decode
stage in pipelines/media.py exercises genuine byte-level decode work
inside the sandbox (no external audio libs available).

Scope: PCM (format tag 1), 16-bit, mono/stereo. The encoder emits an
extra non-essential LIST/INFO chunk between fmt and data so the decoder's
chunk walk is tested against real-world chunk layouts (many encoders
place LIST, fact or cue chunks before data).
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples (1-D mono or [n, ch] interleaved) as a WAV blob.

    Includes a LIST/INFO chunk before data so decoders must actually walk
    chunks rather than assume a fixed 44-byte header.
    """
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        n_channels = 1
    elif arr.ndim == 2:
        n_channels = arr.shape[1]
    else:
        raise ValueError("samples must be 1-D or 2-D")
    data = arr.tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    info = b"INFOISFT" + struct.pack("<I", 8) + b"rayext\x00\x00"
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:  # RIFF chunks are word-aligned
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decode(blob: bytes) -> dict:
    """Decode a PCM-16 WAV blob -> dict(sample_rate, n_channels, samples).

    ``samples`` is an int16 numpy array, shape [n] mono or [n, ch].
    Walks the RIFF chunk list (tolerating LIST/fact/cue and other
    non-essential chunks in any position), validates framing, and raises
    ValueError on malformed input — callers dead-letter on that, the same
    contract as png.png_decode.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    if riff_size + 8 > len(blob):
        raise ValueError("RIFF size exceeds blob")
    pos = 12
    fmt_info = None
    data = None
    end = 8 + riff_size
    while pos + 8 <= end:
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError(f"chunk {cid!r} overruns RIFF payload")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            tag, n_ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", blob, body_start
            )
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported format tag={tag} bits={bits}")
            if n_ch < 1:
                raise ValueError("zero channels")
            fmt_info = (n_ch, rate)
        elif cid == b"data":
            data = blob[body_start:body_start + size]
        pos = body_start + size + (size & 1)  # word alignment
    if fmt_info is None or data is None:
        raise ValueError("missing fmt or data chunk")
    n_ch, rate = fmt_info
    if len(data) % (2 * n_ch):
        raise ValueError("data chunk not frame-aligned")
    arr = np.frombuffer(data, dtype="<i2")
    if n_ch > 1:
        arr = arr.reshape(-1, n_ch)
    return {"sample_rate": rate, "n_channels": n_ch, "samples": arr}
