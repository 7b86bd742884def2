"""Multimodal (media-span) processing plumbing.

Media spans are interleaved with text in the input documents (kind="media",
``media_ref`` set, empty text). This module runs the extraction pipeline,
selects the media spans, and feeds them through a stateful actor-pool decode
stage. PNG bytes decode FOR REAL via the from-scratch stdlib codec
(``functions/png.py`` — zlib inflate + scanline unfilter; see
``PngFeatureExtractor`` / ``media_decode_png``); formats that genuinely need
external libraries (JPEG, audio, video) stay STUBBED behind a deterministic
fake, with the Ray-side plumbing — schema, batch shape, actor signature,
output layout — real throughout:

    MediaDecoder.__init__   loads the (stub) codec once per actor
    MediaDecoder.__call__   batch of media refs -> features

The deterministic fake (md5 of the media_ref + size fields derived from its
length) keeps the stage SQL-checkable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .extract import ExtractConfig, extract_from_payloads, flatten_blocks
from ..sources.synth import synth_dataset


class MediaDecoder:
    """Actor-pool media decode stage (stub codec, real plumbing)."""

    def __init__(self):
        # A real deployment would load image/audio codecs or a feature model
        # here, once per actor. This repo carries REAL from-scratch codecs
        # for PNG (functions/png.py), WAV (functions/wav.py), BMP/JPEG-dims/
        # TIFF/MP3/ID3 (functions/mediameta.py) — each a queries() op; only
        # full JPEG/video pixel decode genuinely needs external libs absent
        # from this container:
        self.real_codec = None  # import cv2/PIL/torchaudio -> NotImplementedError

    def decode_bytes(self, payload: bytes) -> dict:
        """Real byte decode: PNG decodes fully (width/height/pixel stats
        from actual scanlines); formats needing absent external libs are
        stubbed (see __init__ for the real-codec inventory)."""
        from ..functions.png import is_png, png_decode

        if is_png(payload):
            d = png_decode(payload)
            px = d["pixels"]
            return {
                "width": d["width"],
                "height": d["height"],
                "channels": d["channels"],
                "pixel_sum": int(px.astype(np.int64).sum()),
                "pixel_min": int(px.min()),
                "pixel_max": int(px.max()),
            }
        raise NotImplementedError(
            "non-PNG media byte decoding requires image/audio libs"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # md5 is per-element by nature; feed it zero-copy slices of the
        # Arrow string buffer instead of materializing Python strings
        refs = pc.cast(batch.column("media_ref").combine_chunks(), pa.string())
        offs = np.frombuffer(refs.buffers()[1], dtype=np.int32)[
            refs.offset : refs.offset + len(refs) + 1
        ]
        data = memoryview(refs.buffers()[2])
        feats = [
            hashlib.md5(data[offs[i] : offs[i + 1]]).hexdigest()
            for i in range(len(refs))
        ]
        lens = np.diff(offs).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "ord": batch.column("ord"),
                "media_ref": batch.column("media_ref"),
                "feature_hash": pa.array(feats, type=pa.string()),
                "width": pa.array(64 + lens % 32),
                "height": pa.array(64 + lens % 17),
            }
        )


def media_features(sf_dir: str, cfg: ExtractConfig | None = None):
    """Extract pipeline -> media spans -> actor-pool decode stage."""
    out = extract_from_payloads(
        synth_dataset(f"{sf_dir}/documents.parquet"), cfg or ExtractConfig()
    )
    flat = out.map_batches(flatten_blocks, batch_format="pyarrow")
    media = flat.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "media")).select(
            ["doc_id", "ord", "media_ref"]
        ),
        batch_format="pyarrow",
    )
    # fixed pool: autoscaling (1, N) pools were measured to never ramp
    # (see ExtractConfig.parse_concurrency notes in pipelines/extract.py)
    return media.map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=4096, concurrency=2
    ).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("ord"), "ord", pc.cast(t.column("ord"), pa.int64())
        ),
        batch_format="pyarrow",
    )


class FrameSampler:
    """Actor-pool frame-sampling stage (video -> every ``stride``-th frame).

    Real plumbing, stubbed probe: a real deployment would open the
    container in ``__init__`` (once per actor) and read stream metadata;
    here the frame count derives deterministically from the ref so the
    stage stays SQL-checkable. The fan-out itself — one row per sampled
    frame, vectorized repeat, no Python loop over frames — is exactly the
    shape a real ffmpeg-backed sampler emits.
    """

    def __init__(self, stride: int = 2):
        self.stride = stride
        self.probe = None  # real: av.open / ffprobe handle per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref")
        lens = pc.binary_length(refs).to_numpy().astype(np.int64)
        n_frames = 8 + lens % 8
        n_samp = (n_frames + self.stride - 1) // self.stride
        total = int(n_samp.sum())
        row = np.repeat(np.arange(len(batch), dtype=np.int64), n_samp)
        offs = np.arange(total) - np.repeat(
            np.cumsum(n_samp) - n_samp, n_samp
        )
        fidx = offs * self.stride
        ref_rep = pc.take(refs, pa.array(row))
        frame_ref = pc.binary_join_element_wise(
            pc.cast(ref_rep, pa.string()),
            pc.cast(pa.array(fidx), pa.string()),
            "#f",
        )
        return pa.table(
            {
                "doc_id": pc.take(batch.column("doc_id"), pa.array(row)),
                "ord": pc.take(batch.column("ord"), pa.array(row)),
                "media_ref": ref_rep,
                "frame_idx": pa.array(fidx),
                "frame_ref": frame_ref,
                "pts_ms": pa.array(fidx * 40),
            }
        )


def media_frame_sample(sf_dir: str, stride: int = 2,
                       cfg: ExtractConfig | None = None):
    """Extract pipeline -> media spans -> actor-pool frame sampling.

    Same scale shape as media_features: the fan-out multiplies rows by
    ~n_frames/stride, so batch_size is kept small enough that an output
    batch (rows x refs) stays block-sized.
    """
    out = extract_from_payloads(
        synth_dataset(f"{sf_dir}/documents.parquet"), cfg or ExtractConfig()
    )
    flat = out.map_batches(flatten_blocks, batch_format="pyarrow")
    media = flat.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "media")).select(
            ["doc_id", "ord", "media_ref"]
        ),
        batch_format="pyarrow",
    )
    sampler = media.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=2048, concurrency=2,
    )
    return sampler.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("ord"), "ord",
            pc.cast(t.column("ord"), pa.int64()),
        ),
        batch_format="pyarrow",
    )

class PngFeatureExtractor:
    """Actor-pool REAL image decode stage: PNG bytes in, pixel statistics
    out, via the from-scratch stdlib codec (functions/png.py). This is the
    non-stub counterpart of MediaDecoder.decode_bytes — the plumbing a real
    image-featurization stage uses, with a codec that actually runs in this
    sandbox."""

    def __init__(self):
        from ..functions import png  # codec "loaded" once per actor

        self._decode = png.png_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        payloads = batch.column("png").combine_chunks()
        w = np.empty(len(ids), np.int64)
        h = np.empty(len(ids), np.int64)
        s = np.empty(len(ids), np.int64)
        mn = np.empty(len(ids), np.int64)
        mx = np.empty(len(ids), np.int64)
        for i in range(len(ids)):  # per-image: decode is inherently per-blob
            d = self._decode(payloads[i].as_py())
            px = d["pixels"].astype(np.int64)
            w[i], h[i] = d["width"], d["height"]
            s[i], mn[i], mx[i] = px.sum(), px.min(), px.max()
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "width": pa.array(w),
                "height": pa.array(h),
                "pixel_sum": pa.array(s),
                "pixel_min": pa.array(mn),
                "pixel_max": pa.array(mx),
            }
        )


def media_decode_png(sf_dir: str, sample_mod: int = 17):
    """REAL raster decode end-to-end: deterministic grayscale PNGs are
    synthesized per sampled document (one per ``doc_id % sample_mod == 0``,
    width 16 + id%16, height 8 + id%8, pixel(y, x) = (3*id + x + 7*y) % 251,
    scanline filters cycling through all five PNG filter types), then a
    stateful actor pool DECODES THE BYTES — zlib inflate, chunk CRC checks,
    scanline unfilter — and emits pixel statistics. The DuckDB oracle
    recomputes the statistics from the generative formula, so any codec
    error (filter math, chunk framing, dimension parse) breaks equality.

    Scale shape: synth and decode are both pure map stages (no shuffle);
    decode is a fixed-size actor pool exactly like a real image-feature
    stage; payload bytes never leave the stage that consumes them.

    Output: (doc_id, width, height, pixel_sum, pixel_min, pixel_max).
    """
    import ray.data as rd

    from ..functions.png import png_encode_gray
    from ..functions.tables import strip_schema_metadata

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids = ids[ids % sample_mod == 0]
        blobs = []
        for did in ids:  # encode is per-blob by nature (zlib stream each)
            w = 16 + int(did) % 16
            h = 8 + int(did) % 8
            yy, xx = np.mgrid[0:h, 0:w]
            px = ((3 * int(did) + xx + 7 * yy) % 251).astype(np.uint8)
            blobs.append(png_encode_gray(px))
        return pa.table(
            {"doc_id": pa.array(ids), "png": pa.array(blobs, type=pa.binary())}
        )

    ds = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    )
    return ds.map_batches(synth, batch_format="pyarrow").map_batches(
        PngFeatureExtractor, batch_format="pyarrow", batch_size=2048,
        concurrency=2,
    )


class WavFeatureExtractor:
    """Actor-pool REAL audio decode stage: RIFF/WAVE PCM-16 bytes in,
    waveform statistics out, via the from-scratch stdlib codec
    (functions/wav.py). Counterpart of PngFeatureExtractor for the audio
    modality — chunk walk, fmt parse, and frame alignment all run for
    real; any framing or sample-decode defect breaks the oracle equality.
    """

    def __init__(self):
        from ..functions import wav  # codec bound once per actor

        self._decode = wav.wav_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        payloads = batch.column("wav").combine_chunks()
        rate = np.empty(len(ids), np.int64)
        n = np.empty(len(ids), np.int64)
        peak = np.empty(len(ids), np.int64)
        sabs = np.empty(len(ids), np.int64)
        nneg = np.empty(len(ids), np.int64)
        for i in range(len(ids)):  # per-blob: each WAV is its own stream
            d = self._decode(payloads[i].as_py())
            s = d["samples"].astype(np.int64)
            rate[i] = d["sample_rate"]
            n[i] = len(s)
            a = np.abs(s)
            peak[i], sabs[i] = a.max(), a.sum()
            nneg[i] = int((s < 0).sum())
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sample_rate": pa.array(rate),
                "n_samples": pa.array(n),
                "peak_abs": pa.array(peak),
                "sum_abs": pa.array(sabs),
                "n_neg": pa.array(nneg),
            }
        )


def media_decode_wav(sf_dir: str, sample_mod: int = 13):
    """REAL audio decode end-to-end: a deterministic mono PCM-16 WAV is
    synthesized per sampled document (``doc_id % sample_mod == 0``;
    n = 200 + id%257 samples at 8000 + (id%5)*1000 Hz, sample(i) =
    (7*id + 31*i) % 4001 - 2000, with a LIST chunk between fmt and data so
    the decoder must walk chunks), then a stateful actor pool DECODES THE
    BYTES — RIFF framing, fmt parse, int16 frame extraction — and emits
    waveform statistics. The DuckDB oracle recomputes the statistics from
    the generative formula, so any codec error breaks equality.

    Scale shape: synth and decode are pure map stages (no shuffle); decode
    is a fixed-size actor pool exactly like a real audio-feature stage;
    payload bytes never leave the consuming stage.

    Output: (doc_id, sample_rate, n_samples, peak_abs, sum_abs, n_neg).
    """
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata
    from ..functions.wav import wav_encode_pcm16

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids = ids[ids % sample_mod == 0]
        blobs = []
        for did in ids:  # encode is per-blob (one RIFF stream each)
            did = int(did)
            n = 200 + did % 257
            i = np.arange(n, dtype=np.int64)
            s = ((7 * did + 31 * i) % 4001 - 2000).astype(np.int16)
            blobs.append(wav_encode_pcm16(s, 8000 + (did % 5) * 1000))
        return pa.table(
            {"doc_id": pa.array(ids), "wav": pa.array(blobs, type=pa.binary())}
        )

    ds = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    )
    return ds.map_batches(synth, batch_format="pyarrow").map_batches(
        WavFeatureExtractor, batch_format="pyarrow", batch_size=2048,
        concurrency=2,
    )


def _codec_query(sf_dir: str, sample_mod: int, synth_fn, decode_cls):
    """Pruned doc_id-only scan -> synth (filters to ids % sample_mod == 0)
    -> actor-pool decode: the shared shape of the metadata-codec ops."""
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    ds = strip_schema_metadata(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    )
    return ds.map_batches(synth_fn, batch_format="pyarrow").map_batches(
        decode_cls, batch_format="pyarrow", batch_size=2048, concurrency=2
    )


class BmpFeatureExtractor:
    """Actor-pool REAL BMP decode: header parse, bottom-up row flip,
    padding strip, per-channel pixel sums (functions/mediameta.py)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.mediameta import bmp_decode

        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        payloads = batch.column("bmp").combine_chunks()
        w = np.empty(len(ids), np.int64)
        h = np.empty(len(ids), np.int64)
        sums = np.empty((len(ids), 3), np.int64)
        for i in range(len(ids)):  # per-blob: each BMP is its own stream
            d = bmp_decode(payloads[i].as_py())
            w[i], h[i] = d["width"], d["height"]
            sums[i] = d["pixels"].reshape(-1, 3).astype(np.int64).sum(axis=0)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "width": pa.array(w),
                "height": pa.array(h),
                "sum_b": pa.array(sums[:, 0]),
                "sum_g": pa.array(sums[:, 1]),
                "sum_r": pa.array(sums[:, 2]),
            }
        )


def media_decode_bmp(sf_dir: str, sample_mod: int = 11):
    """REAL image decode end-to-end: a deterministic 24bpp BI_RGB BMP per
    sampled doc (w = 3 + id%6, h = 2 + id%5, pixel(y, x) BGR =
    ((id+3x+7y)%256, (2id+x)%256, (xy+id)%256)), decoded by an actor pool
    — header parse, bottom-up flip, row-padding strip — emitting
    per-channel pixel sums the oracle recomputes from the formula. Any
    stride/flip/padding defect breaks equality. Complements
    media_decode_png (zlib path) with the uncompressed-raster path.

    Output: (doc_id, width, height, sum_b, sum_g, sum_r).
    """
    from ..functions.mediameta import bmp_encode

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids = ids[ids % sample_mod == 0]
        blobs = []
        for did in ids:
            did = int(did)
            w, h = 3 + did % 6, 2 + did % 5
            y, x = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (did + 3 * x + 7 * y) % 256,
                    (2 * did + x) % 256,
                    (x * y + did) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            blobs.append(bmp_encode(w, h, px))
        return pa.table(
            {"doc_id": pa.array(ids), "bmp": pa.array(blobs, pa.binary())}
        )

    return _codec_query(sf_dir, sample_mod, synth, BmpFeatureExtractor)


class JpegHeaderParser:
    """Actor-pool JPEG marker walk (functions/mediameta.py): segment
    lengths are load-bearing — one bad hop and the SOF is never found."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.mediameta import jpeg_dimensions

        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        payloads = batch.column("jpeg").combine_chunks()
        out = np.empty((len(ids), 3), np.int64)
        for i in range(len(ids)):
            d = jpeg_dimensions(payloads[i].as_py())
            out[i] = (d["width"], d["height"], d["n_segments"])
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "width": pa.array(out[:, 0]),
                "height": pa.array(out[:, 1]),
                "n_segments": pa.array(out[:, 2]),
            }
        )


def media_jpeg_dimensions(sf_dir: str, sample_mod: int = 19):
    """JPEG dimension sniff WITHOUT decode — the thumbnail-planner /
    layout pass every image pipeline runs first. Synth builds a
    structurally-valid JPEG (SOI, APP0, id%3 COM segments, DQT, SOF0 with
    w = 100 + id%900 / h = 50 + id%450, DHT, SOS); the parser walks
    marker segments by declared length to the SOF.

    Output: (doc_id, width, height, n_segments) — n_segments counts
    non-standalone segments before the SOF (2 + id%3).
    """
    from ..functions.mediameta import jpeg_build

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids = ids[ids % sample_mod == 0]
        blobs = [
            jpeg_build(100 + int(d) % 900, 50 + int(d) % 450, int(d) % 3)
            for d in ids
        ]
        return pa.table(
            {"doc_id": pa.array(ids), "jpeg": pa.array(blobs, pa.binary())}
        )

    return _codec_query(sf_dir, sample_mod, synth, JpegHeaderParser)


class TiffIfdParser:
    """Actor-pool TIFF IFD walk honouring BOTH byte orders."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.mediameta import tiff_parse

        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        payloads = batch.column("tiff").combine_chunks()
        out = np.empty((len(ids), 4), np.int64)
        for i in range(len(ids)):
            d = tiff_parse(payloads[i].as_py())
            out[i] = (d["width"], d["height"], d["bits"],
                      int(d["big_endian"]))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "width": pa.array(out[:, 0]),
                "height": pa.array(out[:, 1]),
                "bits": pa.array(out[:, 2]),
                "big_endian": pa.array(out[:, 3]),
            }
        )


def media_tiff_ifd(sf_dir: str, sample_mod: int = 23):
    """TIFF IFD metadata walk in BOTH byte orders (odd ids are
    big-endian 'MM', even little-endian 'II'): w = 16 + id%1000,
    h = 16 + id%800, bits 16 when id%3==0 else 8. An endianness mix-up
    byte-swaps every field — the oracle catches it.

    Output: (doc_id, width, height, bits, big_endian).
    """
    from ..functions.mediameta import tiff_build

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids = ids[ids % sample_mod == 0]
        blobs = [
            tiff_build(
                16 + int(d) % 1000, 16 + int(d) % 800,
                16 if int(d) % 3 == 0 else 8, int(d) % 2 == 1,
            )
            for d in ids
        ]
        return pa.table(
            {"doc_id": pa.array(ids), "tiff": pa.array(blobs, pa.binary())}
        )

    return _codec_query(sf_dir, sample_mod, synth, TiffIfdParser)


class Mp3FrameWalker:
    """Actor-pool MPEG-1 Layer III frame-chain walk: the parser must
    recompute each frame's length (144*bitrate/samplerate + padding) to
    find the next sync — the real structure of an MP3 stream."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.mediameta import mp3_parse

        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        payloads = batch.column("mp3").combine_chunks()
        out = np.empty((len(ids), 3), np.int64)
        for i in range(len(ids)):
            d = mp3_parse(payloads[i].as_py())
            out[i] = (d["n_frames"], d["kbps_sum"], d["total_bytes"])
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_frames": pa.array(out[:, 0]),
                "kbps_sum": pa.array(out[:, 1]),
                "total_bytes": pa.array(out[:, 2]),
            }
        )


def media_mp3_frames(sf_dir: str, sample_mod: int = 29):
    """MP3 frame-chain audit: 1 + id%8 MPEG-1 Layer III frames per
    sampled doc (bitrate index 1 + (id+f)%14, samplerate index id%3,
    padding (id+f)%2); the walker hops frame to frame via the length
    formula and folds frame count, bitrate sum, and total bytes — the
    oracle recomputes all three from the bitrate/samplerate tables.

    Output: (doc_id, n_frames, kbps_sum, total_bytes).
    """
    from ..functions.mediameta import mp3_build

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids = ids[ids % sample_mod == 0]
        blobs = []
        for did in ids:
            did = int(did)
            blobs.append(
                mp3_build(
                    [
                        (1 + (did + f) % 14, did % 3, (did + f) % 2)
                        for f in range(did % 8 + 1)
                    ]
                )
            )
        return pa.table(
            {"doc_id": pa.array(ids), "mp3": pa.array(blobs, pa.binary())}
        )

    return _codec_query(sf_dir, sample_mod, synth, Mp3FrameWalker)


class Id3TagParser:
    """Actor-pool ID3v2.4 tag parse with syncsafe sizes at both levels;
    the walk must land exactly on the declared tag end."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.mediameta import id3_parse

        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        payloads = batch.column("id3").combine_chunks()
        out = np.empty((len(ids), 4), np.int64)
        for i in range(len(ids)):
            d = id3_parse(payloads[i].as_py())
            out[i] = (d["tag_size"], d["n_frames"], len(d["TIT2"]),
                      len(d["TPE1"]))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "tag_size": pa.array(out[:, 0]),
                "n_frames": pa.array(out[:, 1]),
                "title_len": pa.array(out[:, 2]),
                "artist_len": pa.array(out[:, 3]),
            }
        )


def media_id3_tags(sf_dir: str, sample_mod: int = 37):
    """ID3v2.4 tag parse — the metadata sidecar of every audio corpus.
    Title 'Track {id}' and artist 'Artist {id%50}' ship in TIT2/TPE1
    frames with SYNCSAFE sizes (7 bits per byte — the gotcha that makes
    naive big-endian reads drift); the oracle pins tag size, frame count
    and both decoded text lengths.

    Output: (doc_id, tag_size, n_frames, title_len, artist_len).
    """
    from ..functions.mediameta import id3_build

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids = ids[ids % sample_mod == 0]
        blobs = [
            id3_build(f"Track {int(d)}", f"Artist {int(d) % 50}")
            for d in ids
        ]
        return pa.table(
            {"doc_id": pa.array(ids), "id3": pa.array(blobs, pa.binary())}
        )

    return _codec_query(sf_dir, sample_mod, synth, Id3TagParser)


class Mp4BoxWalker:
    """Actor-pool ISO-BMFF walk (functions/mediameta.py): nested box
    sizes are load-bearing — a single wrong length fails containment."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.mediameta import mp4_walk

        ids, ts, dur, nt, std, sw = [], [], [], [], [], []
        blobs = batch.column("mp4")
        did = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        for i in range(batch.num_rows):
            r = mp4_walk(blobs[i].as_py())
            ids.append(int(did[i]))
            ts.append(r["timescale"])
            dur.append(r["duration"])
            nt.append(r["n_traks"])
            std.append(r["sum_track_duration"])
            sw.append(r["sum_width_px"])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "timescale": pa.array(ts, pa.int64()),
                "duration": pa.array(dur, pa.int64()),
                "n_traks": pa.array(nt, pa.int64()),
                "sum_track_duration": pa.array(std, pa.int64()),
                "sum_width_px": pa.array(sw, pa.int64()),
            }
        )


def media_mp4_boxes(sf_dir: str, sample_mod: int = 13):
    """REAL ISO-BMFF (MP4) metadata walk: sampled docs ship as correctly
    nested ftyp/moov/mvhd/trak/tkhd containers (true v0 box sizes: mvhd
    108, tkhd 92) and the actor-pool walker re-derives movie timescale
    and duration plus per-track durations and pixel widths — every value
    recomputed by the oracle from the synthesis formulas, and a single
    bad box length breaks containment.

    Output: (doc_id, timescale, duration, n_traks, sum_track_duration,
    sum_width_px).
    """
    from ..functions.mediameta import mp4_build

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids = ids[ids % sample_mod == 0]
        blobs = [mp4_build(int(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids), "mp4": pa.array(blobs, pa.binary())}
        )

    return _codec_query(sf_dir, sample_mod, synth, Mp4BoxWalker)


class GifHeaderParser:
    """Actor-pool GIF header/LSD parse (functions/mediameta.py):
    little-endian dimensions and size-bit palette decode."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.mediameta import gif_parse

        did = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        rows = {k: [] for k in ("doc_id", "width", "height", "n_palette",
                                "palette_byte_sum", "bg_index")}
        blobs = batch.column("gif")
        for i in range(batch.num_rows):
            r = gif_parse(blobs[i].as_py())
            rows["doc_id"].append(int(did[i]))
            for k in ("width", "height", "n_palette", "palette_byte_sum",
                      "bg_index"):
                rows[k].append(int(r[k]))
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in rows.items()}
        )


def media_gif_headers(sf_dir: str, sample_mod: int = 17):
    """REAL GIF header decode: sampled docs ship as GIF89a containers
    (little-endian logical screen descriptor, size-bit-encoded global
    color table) and the actor-pool parser re-derives dimensions,
    palette size and the palette byte sum — all recomputed by the
    oracle from the synthesis formulas. Complements the big-endian MP4
    walk with the little-endian format family.

    Output: (doc_id, width, height, n_palette, palette_byte_sum,
    bg_index).
    """
    from ..functions.mediameta import gif_build

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids = ids[ids % sample_mod == 0]
        blobs = [gif_build(int(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids), "gif": pa.array(blobs, pa.binary())}
        )

    return _codec_query(sf_dir, sample_mod, synth, GifHeaderParser)


class IcoDirectoryParser:
    """Actor-pool ICO directory walk (functions/mediameta.py): the
    offset chain and declared sizes are load-bearing."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.mediameta import ico_parse

        did = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        rows = {k: [] for k in ("doc_id", "n_images", "total_bytes",
                                "payload_byte_sum", "width_sum")}
        blobs = batch.column("ico")
        for i in range(batch.num_rows):
            r = ico_parse(blobs[i].as_py())
            rows["doc_id"].append(int(did[i]))
            for k in ("n_images", "total_bytes", "payload_byte_sum",
                      "width_sum"):
                rows[k].append(int(r[k]))
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in rows.items()}
        )


def media_ico_directory(sf_dir: str, sample_mod: int = 19):
    """REAL ICO directory decode: sampled docs ship as multi-image ICO
    containers (little-endian ICONDIR, 16-byte entries, chained payload
    offsets) and the actor-pool parser follows every offset and sums the
    actual payload bytes — all recomputed by the oracle from the
    synthesis formulas.

    Output: (doc_id, n_images, total_bytes, payload_byte_sum,
    width_sum).
    """
    from ..functions.mediameta import ico_build

    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
        ids = ids[ids % sample_mod == 0]
        blobs = [ico_build(int(d)) for d in ids]
        return pa.table(
            {"doc_id": pa.array(ids), "ico": pa.array(blobs, pa.binary())}
        )

    return _codec_query(sf_dir, sample_mod, synth, IcoDirectoryParser)
