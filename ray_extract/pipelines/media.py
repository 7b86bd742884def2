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
        refs = batch.column("media_ref").to_pylist()
        feats = [hashlib.md5(r.encode()).hexdigest() for r in refs]
        lens = np.array([len(r) for r in refs], dtype=np.int64)
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
