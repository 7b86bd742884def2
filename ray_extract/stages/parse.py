"""P2: the local layout parser — the stateful actor-pool stage.

This stage replaces the reference's Azure Document Intelligence round-trip
(`azure_wrapper.py:22-61`: one warm ``DocumentAnalysisClient`` reused for every
document, LRO polling loop) with an in-process layout parse of the SPDF
byte-stream. It is a callable CLASS for ``map_batches(..., concurrency=N)``:
``__init__`` runs once per actor and holds the warm parser state (vocab
tables, compiled dtypes — the slot where a real layout model would load);
``__call__`` parses a batch of page-range shards into the flat columnar shard
representation (see `ray_extract.schema`).

Page numbers are propagated to document-global here (reference
propagate_page_number, utils.py:35-78: local + range_lo - 1) so the merge
stage is a pure ordered concat.

Hot-loop structure: the per-shard work is only the structured-array decode
(numpy views) and list appends; all field extraction, page-offset application
and Arrow array construction happen ONCE per batch over the concatenated
structured arrays (vectorized across shards).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import vocab
from ..payload import (
    CELL_DT,
    MAGIC as SPDF_MAGIC,
    PAGE_DT,
    PARA_DT,
    TAB_DT,
    concat_structured as _concat,
    strings_from_lens,
)
from ..schema import LIST_COLUMNS, SCALAR_FIELDS


class LayoutParser:
    """Warm-state layout parser for map_batches actor pools.

    ``max_retries``/``retry_exceptions`` implement the reference's bounded
    retry policy (utils.py:18-32 via azure_wrapper.py:86-92): each document's
    parse call is attempted up to ``max_retries`` times; on final failure the
    document becomes a dead-letter row (status="error") instead of the
    reference's silent drop. ``parse_fn`` is injectable for fault-injection
    tests (the reference mocks its Azure client the same way,
    tests/test_utils.py:19-48).

    ``split_fallback`` is the reference's error-driven fallback (run.py:27-39):
    when a WHOLE document's parse fails after retries, the document re-enters
    the split path in-kernel — its payload is sliced into page-range shards
    (``fallback_batch_pages`` pages each, via the codec registry) and each
    shard is parsed with its own bounded retries. The shard rows flow to the
    downstream merge exactly like metadata-driven splits; only if the fallback
    also fails does the document dead-letter with the original error."""

    def __init__(self, max_retries: int = 3, parse_fn=None,
                 retry_exceptions: tuple = (Exception,),
                 split_fallback: bool = True, fallback_batch_pages: int = 4):
        # Warm per-actor state (the analogue of the reference's authenticated
        # client built once in AzureApiWrapper.__init__, azure_wrapper.py:22-30;
        # a real model's weights would load here).
        self.api_version = vocab.API_VERSION
        self.model_id = vocab.MODEL_ID
        self.roles = list(vocab.ROLES)
        self.max_retries = max_retries
        self.retry_exceptions = retry_exceptions
        # default kernel dispatches by magic sniff: SPDF -> structured
        # decode, real PDF bytes -> the from-scratch content-stream text
        # extractor (functions/pdftext.py — the local replacement for the
        # reference's Azure round-trip, azure_wrapper.py:32-61). Payloads in
        # no registered format fail fast with an actionable reason instead
        # of retrying a parse that can never succeed.
        self.auto_kernel = parse_fn is None
        if parse_fn is None:
            from ..functions.pdftext import parse_auto

            parse_fn = parse_auto
        self.parse_fn = parse_fn
        self.split_fallback = split_fallback
        self.fallback_batch_pages = fallback_batch_pages

    def _try_split_fallback(self, raw: bytes):
        """F4: slice a failed whole document into page-range shards and parse
        each (reference run.py:27-39). Returns [(flat, lo, hi), ...] on full
        success, None on any failure (caller dead-letters with the ORIGINAL
        whole-parse error)."""
        from ..codecs import codec_for
        from ..functions.retry import call_with_retries
        from ..payload import split_page_ranges

        try:
            codec = codec_for(raw)
            if codec is None:
                return None
            npages = codec.page_count(raw)
            if npages <= 1:
                return None  # nothing to split; fallback cannot help
            handle = codec.open(raw)
            out = []
            for lo, hi in split_page_ranges(npages, self.fallback_batch_pages):
                sub = codec.slice_pages(handle, lo, hi)
                flat = call_with_retries(
                    self.parse_fn, sub,
                    max_retries=self.max_retries,
                    retry_exceptions=self.retry_exceptions,
                )
                out.append((flat, lo, hi))
            return out
        except Exception:
            return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.retry import call_with_retries

        n = len(batch)
        status = batch.column("status").to_pylist()
        error = batch.column("error").to_pylist()
        payloads = batch.column("payload").combine_chunks()
        range_lo = batch.column("range_lo").to_numpy()
        n_shards_in = batch.column("n_shards").to_numpy()

        # ---- phase 1: parse every live row (bounded retries per doc);
        # a failed UNSPLIT doc re-enters the split path in-kernel (F4) ----
        flats: list = [None] * n
        expansions: dict[int, list] = {}
        for i in range(n):
            raw = payloads[i].as_py()
            if status[i] != "ok" or not raw:
                continue
            if self.auto_kernel and not raw.startswith(SPDF_MAGIC):
                from ..codecs import codec_for

                if codec_for(raw) is None:
                    status[i] = "error"
                    error[i] = ("no layout kernel for format 'unknown': the "
                                "default kernels read SPDF and PDF — inject "
                                "one via ExtractConfig.parse_fn")
                    continue
            try:
                flats[i] = call_with_retries(
                    self.parse_fn, raw,
                    max_retries=self.max_retries,
                    retry_exceptions=self.retry_exceptions,
                )
            except Exception as e:
                if self.split_fallback and n_shards_in[i] == 1:
                    exp = self._try_split_fallback(raw)
                    if exp is not None:
                        expansions[i] = exp
                        continue
                # retries exhausted -> dead-letter the shard (reference drops
                # the whole document silently here, run.py:38-39)
                status[i] = "error"
                error[i] = f"parse failed after {self.max_retries} attempts: {e}"

        # ---- phase 2: expand fallback docs into shard rows so the batch is
        # again one row per shard; downstream merge reassembles them exactly
        # like metadata-driven splits ----
        if expansions:
            bn_in = batch.column("batch_number").to_numpy()
            hi_in = batch.column("range_hi").to_numpy()
            row_map: list[int] = []
            st2, er2, fl2 = [], [], []
            bn2, lo2, hi2, nsh2 = [], [], [], []
            for i in range(n):
                if i in expansions:
                    shards = expansions[i]
                    for bn, (flat, lo, hi) in enumerate(shards):
                        row_map.append(i)
                        st2.append("ok"); er2.append(""); fl2.append(flat)
                        bn2.append(bn); lo2.append(lo); hi2.append(hi)
                        nsh2.append(len(shards))
                else:
                    row_map.append(i)
                    st2.append(status[i]); er2.append(error[i])
                    fl2.append(flats[i])
                    bn2.append(int(bn_in[i])); lo2.append(int(range_lo[i]))
                    hi2.append(int(hi_in[i])); nsh2.append(int(n_shards_in[i]))
            batch = batch.take(pa.array(row_map, type=pa.int64()))
            for name, arr in (("batch_number", bn2), ("range_lo", lo2),
                              ("range_hi", hi2), ("n_shards", nsh2)):
                batch = batch.set_column(
                    batch.schema.get_field_index(name), name,
                    pa.array(arr, type=pa.int32()),
                )
            status, error, flats = st2, er2, fl2
            range_lo = np.asarray(lo2, dtype=np.int64)
            n = len(flats)

        # ---- phase 3: vectorized construction over parsed flats ----
        pages_l, paras_l, tabs_l, cells_l = [], [], [], []
        text_blobs, media_blobs, cell_blobs = [], [], []
        n_pages = np.zeros(n, dtype=np.int64)
        n_paras = np.zeros(n, dtype=np.int64)
        n_tabs = np.zeros(n, dtype=np.int64)
        n_cells = np.zeros(n, dtype=np.int64)
        offs = np.zeros(n, dtype=np.int32)  # page offset per shard

        for i in range(n):
            flat = flats[i]
            if flat is None:
                continue
            pages_l.append(flat["pages"])
            paras_l.append(flat["paras"])
            tabs_l.append(flat["tables"])
            cells_l.append(flat["cells"])
            text_blobs.append(flat["text_blob"])
            media_blobs.append(flat["media_blob"])
            cell_blobs.append(flat["cell_blob"])
            n_pages[i] = len(flat["pages"])
            n_paras[i] = len(flat["paras"])
            n_tabs[i] = len(flat["tables"])
            n_cells[i] = len(flat["cells"])
            offs[i] = range_lo[i] - 1

        pages = _concat(pages_l, PAGE_DT)
        paras = _concat(paras_l, PARA_DT)
        tabs = _concat(tabs_l, TAB_DT)
        cells = _concat(cells_l, CELL_DT)

        # reading-order sort: paragraphs ordered by (page, top-y, left-x)
        # within each shard — STABLE, so byte-streams already in reading order
        # (the common case) keep their exact order, and unordered input is
        # normalized. This is the layout parser's reading-order pass (the
        # reference relies on Azure emitting paragraphs in reading order;
        # paragraph order defines span order, SURVEY §1.3).
        para_shard = np.repeat(np.arange(n, dtype=np.int64), n_paras)
        order = np.lexsort(
            (paras["poly"][:, 0], paras["poly"][:, 1], paras["page"], para_shard)
        )
        # string values index the blobs in ENCODED order; build them first,
        # permute together with the records only when reordering is needed
        c = np.ascontiguousarray
        para_text = strings_from_lens(c(paras["text_len"]), b"".join(text_blobs))
        para_media = strings_from_lens(c(paras["media_len"]), b"".join(media_blobs))
        if not np.array_equal(order, np.arange(len(paras))):
            paras = paras[order]
            idx = pa.array(order)
            para_text = para_text.take(idx)
            para_media = para_media.take(idx)

        # vectorized page propagation across the whole batch
        page_off_pg = np.repeat(offs, n_pages)
        page_off_pa = np.repeat(offs, n_paras)
        page_off_tb = np.repeat(offs, n_tabs)
        page_off_cl = np.repeat(offs, n_cells)

        # local page numbers of the pages array are implicit (1..k per shard)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(n_pages[:-1], out=starts[1:])
        page_number = (
            np.arange(len(pages), dtype=np.int32)
            - np.repeat(starts, n_pages).astype(np.int32)
            + 1
            + page_off_pg
        )

        values: dict[str, object] = {
            "page_number": page_number,
            "page_width": c(pages["width"]),
            "page_height": c(pages["height"]),
            "para_role": c(paras["role"]),
            "para_page": paras["page"] + page_off_pa,
            "para_offset": c(paras["offset"]),
            "para_length": c(paras["length"]),
            "para_flags": c(paras["flags"]),
            "para_poly": c(paras["poly"]).ravel(),
            "tab_page": tabs["page"] + page_off_tb,
            "tab_rows": c(tabs["row_count"]),
            "tab_cols": c(tabs["col_count"]),
            "tab_ncells": c(tabs["ncells"]),
            "tab_offset": c(tabs["offset"]),
            "tab_length": c(tabs["length"]),
            "tab_poly": c(tabs["poly"]).ravel(),
            "cell_kind": c(cells["kind"]),
            "cell_row": c(cells["row"]),
            "cell_col": c(cells["col"]),
            "cell_rowspan": c(cells["rowspan"]),
            "cell_colspan": c(cells["colspan"]),
            "cell_offset": c(cells["offset"]),
            "cell_length": c(cells["length"]),
            "cell_flags": c(cells["flags"]),
            "cell_page": cells["page"] + page_off_cl,
            "cell_poly": c(cells["poly"]).ravel(),
            "para_text": para_text,
            "para_media": para_media,
            "cell_text": strings_from_lens(c(cells["text_len"]), b"".join(cell_blobs)),
        }

        counts = {
            "page": n_pages, "para": n_paras, "para8": n_paras * 8,
            "tab": n_tabs, "tab8": n_tabs * 8, "cell": n_cells, "cell8": n_cells * 8,
        }

        def list_array(name: str) -> pa.ListArray:
            vtype, group = LIST_COLUMNS[name]
            offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(counts[group], out=offsets[1:])
            v = values[name]
            if not isinstance(v, pa.Array):
                np_dtype = np.int32 if pa.types.is_int32(vtype) else np.float64
                v = pa.array(np.asarray(v).astype(np_dtype, copy=False), type=vtype)
            return pa.ListArray.from_arrays(pa.array(offsets), v)

        cols: dict[str, pa.Array] = {}
        for name, _t in SCALAR_FIELDS:
            if name == "api_version":
                cols[name] = pa.array([self.api_version] * n, type=pa.string())
            elif name == "model_id":
                cols[name] = pa.array([self.model_id] * n, type=pa.string())
            elif name == "status":
                cols[name] = pa.array(status, type=pa.string())
            elif name == "error":
                cols[name] = pa.array(error, type=pa.string())
            else:
                cols[name] = batch.column(name)
        for name in LIST_COLUMNS:
            cols[name] = list_array(name)
        return pa.table(cols)
