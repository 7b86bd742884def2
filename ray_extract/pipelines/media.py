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
        # here, once per actor. PNG is carried by the from-scratch stdlib
        # codec (functions/png.py); JPEG/audio/video genuinely need external
        # libs that are not in this container:
        self.real_codec = None  # import cv2/PIL/torchaudio -> NotImplementedError

    def decode_bytes(self, payload: bytes) -> dict:
        """Real byte decode: PNG decodes fully (width/height/pixel stats
        from actual scanlines); other formats are stubbed in this
        environment."""
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
