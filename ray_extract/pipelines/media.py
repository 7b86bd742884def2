"""Multimodal (media-span) processing plumbing.

Media spans are interleaved with text in the input documents (kind="media",
``media_ref`` set, empty text). This module runs the extraction pipeline,
selects the media spans, and feeds them through a stateful actor-pool decode
stage. The actual byte decoding (image/audio libraries are not available in
this container) is STUBBED behind a deterministic fake, but the Ray-side
plumbing — schema, batch shape, actor signature, output layout — is real:

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
        # here, once per actor. Not available in this container:
        self.real_codec = None  # import cv2/PIL/torchaudio -> NotImplementedError

    def decode_bytes(self, payload: bytes):
        """Real byte decode path — stubbed in this environment."""
        raise NotImplementedError("media byte decoding requires image/audio libs")

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
