"""P1: page-range split flat-map — skew defusal for heavy-tail documents.

Reference semantics: split_into_batches (utils.py:117-163) — a document of P
pages becomes ceil(P / batch_size) standalone page-range shards, 1-indexed
inclusive ranges, batch_number 0-indexed. The reference splits only when the
Azure page limit forces it (README.md:92); this engine splits whenever
``n_pages > threshold`` so a 10^4-page document becomes uniform units of work
BEFORE the parse stage instead of a straggler task.

Documents at or under the threshold pass through as a single shard
(batch_number=0, full range, n_shards=1) so downstream schemas are uniform.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import SpdfCodec, codec_for
from ..payload import split_page_ranges


def make_split_stage(threshold_pages: int, batch_pages: int):
    """Returns a map_batches fn emitting one row per page-range shard."""
    if batch_pages < 1:
        raise ValueError("Batch size must be greater than 0.")

    def split_stage(batch: pa.Table) -> pa.Table:
        n_pages = batch.column("n_pages_doc").to_numpy()
        status = batch.column("status").to_pylist()
        payloads = batch.column("payload").combine_chunks()

        out_parent: list[int] = []
        out_batchnum: list[int] = []
        out_lo: list[int] = []
        out_hi: list[int] = []
        out_nshards: list[int] = []
        out_payload: list[bytes] = []

        for i in range(len(batch)):
            raw = payloads[i].as_py()
            if status[i] != "ok" or n_pages[i] <= threshold_pages:
                out_parent.append(i)
                out_batchnum.append(0)
                out_lo.append(1)
                out_hi.append(int(n_pages[i]))
                out_nshards.append(1)
                out_payload.append(raw if status[i] == "ok" else b"")
                continue
            # codec dispatch (codecs.py): the decode stage validated this row
            # through SOME registered codec, so codec_for cannot miss here.
            # SPDF is the hot path; real-PDF shards are standalone sub-PDFs
            # with the reference's split_into_batches semantics.
            codec = SpdfCodec if SpdfCodec.sniff(raw) else codec_for(raw)
            handle = codec.open(raw)
            ranges = split_page_ranges(int(n_pages[i]), batch_pages)
            for bn, (lo, hi) in enumerate(ranges):
                out_parent.append(i)
                out_batchnum.append(bn)
                out_lo.append(lo)
                out_hi.append(hi)
                out_nshards.append(len(ranges))
                out_payload.append(codec.slice_pages(handle, lo, hi))

        idx = np.asarray(out_parent, dtype=np.int64)
        taken = batch.drop_columns(["payload"]).take(idx)
        cols = {name: taken.column(name) for name in taken.column_names}
        cols["batch_number"] = pa.array(out_batchnum, type=pa.int32())
        cols["range_lo"] = pa.array(out_lo, type=pa.int32())
        cols["range_hi"] = pa.array(out_hi, type=pa.int32())
        cols["n_shards"] = pa.array(out_nshards, type=pa.int32())
        cols["payload"] = pa.array(out_payload, type=pa.large_binary())
        return pa.table(cols)

    return split_stage
