"""P0: payload validation + md5 + page-count peek (dead-letter, never raise).

Mirrors the reference's input handling: magic-byte format sniff
(tests/helpers.py:17-21), md5 of the document bytes (utils.py:166-168), and the
silent-drop-on-failure policy (run.py:38-39) — except failed documents become
dead-letter rows with ``status="error"`` instead of disappearing, so one bad
document can't poison a batch and corpus-level error metrics are exact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..payload import validate_batch
from ..schema import META_FIELDS


def decode_stage(batch: pa.Table) -> pa.Table:
    """(doc_id, payload[, ...]) -> + status, error, md5, n_pages_doc.

    Validation is STRUCTURAL (magic, lengths, internal count/offset
    consistency — payload.validate_deep) so a poisoned document becomes a
    dead-letter row here rather than crashing a parse task downstream.
    Keeps the payload column for the split stage.

    Identity metadata (META_FIELDS) is optional on the input: missing columns
    are injected as nulls so the shard schema stays uniform. When a
    ``cdn_object`` column IS present, non-null values must end in ".pdf"
    (the reference's conversion-error check, convert.py:261-268) — violations
    dead-letter the document here instead of raising mid-conversion.
    """
    payloads = batch.column("payload").combine_chunks()
    n = len(batch)
    status = np.full(n, "ok", dtype=object)
    error = np.full(n, "", dtype=object)
    cdn = (
        batch.column("cdn_object").to_pylist()
        if "cdn_object" in batch.column_names
        else None
    )
    raws = [payloads[i].as_py() for i in range(n)]
    md5 = np.array([hashlib.md5(r).hexdigest() for r in raws], dtype=object)
    # batched structural + UTF-8 validation (validate_batch == validate_deep
    # semantics, vectorized across the batch)
    reasons, n_pages = validate_batch(raws)
    # rows in a NON-native registered format (e.g. real PDF bytes) fail the
    # SPDF magic above; re-validate them through their codec (codecs.py) so
    # they route/split like any other document instead of dead-lettering
    from ..codecs import codec_for
    from ..payload import MAGIC as _SPDF_MAGIC

    for i, r in enumerate(raws):
        if reasons[i] and not r.startswith(_SPDF_MAGIC):
            c = codec_for(r)
            if c is not None:
                reason = c.validate(r)
                reasons[i] = reason
                n_pages[i] = 0 if reason else c.page_count(r)
    for i in range(n):
        # case-insensitive, matching the reference's check
        # (convert.py: document_cdn_object.lower().endswith(".pdf"))
        if cdn is not None and cdn[i] is not None and not cdn[i].lower().endswith(".pdf"):
            status[i] = "error"
            error[i] = f"invalid document_cdn_object (not a .pdf): {cdn[i]}"
            n_pages[i] = 0
        elif reasons[i]:
            status[i] = "error"
            error[i] = reasons[i]
    out = batch
    for name in META_FIELDS:
        if name not in out.column_names:
            out = out.append_column(name, pa.nulls(n, type=pa.string()))
    for name, arr in [
        ("status", pa.array(status, type=pa.string())),
        ("error", pa.array(error, type=pa.string())),
        ("md5", pa.array(md5, type=pa.string())),
        ("n_pages_doc", pa.array(n_pages, type=pa.int32())),
    ]:
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, arr)
    return out
