"""The flagship pipeline: payload corpus -> ParserOutput rows.

Stage map (SURVEY.md §3 target lifecycle):

    P0 decode   map_batches  validate + md5 + page peek (dead-letter rows)
    P1 split    map_batches  flat-map docs over the page threshold into
                             page-range shards (skew defusal)
    P2 parse    map_batches(LayoutParser, concurrency=...)  actor pool,
                             warm layout-parser state
    P3 merge    groupby(doc_id).map_groups  ordered shard concat — the ONE
                             all-to-all shuffle, and only the parsed flat
                             columns move (payload bytes are dropped at parse)
    P4 convert  map_batches  vectorized ParserOutput assembly + languages

Two topologies:

- ``extract_from_payloads``: unified — every document flows through the
  groupby. Correct for any input; used when the input has no page-count
  metadata to route on.
- ``extract_routed``: skew-aware routing — the input parquet carries
  ``n_pages``, so two filtered reads (predicate pushdown at the scan) send
  at-or-under-threshold documents down a shuffle-free path and only the
  heavy tail through split + groupby merge. At 100 TB this keeps the
  all-to-all exchange proportional to the (rare) huge documents instead of
  the whole corpus.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

import pyarrow as pa

from ..stages.convert import make_convert_stage
from ..stages.decode import decode_stage
from ..stages.merge import merge_group
from ..stages.parse import LayoutParser
from ..stages.split import make_split_stage


@dataclass
class ExtractConfig:
    # documents with more pages than this are split into page-range shards
    split_threshold_pages: int = 4
    # pages per shard (reference DEFAULT_BATCH_SIZE=50, utils.py:15; small
    # default so the synthetic corpora exercise the split/merge path)
    split_batch_pages: int = 4
    decode_batch_size: int = 1024
    parse_batch_size: int = 512
    # actor pool size for the parse stage; None -> (1, 8) autoscaling.
    # Keep pools autoscaling with min=1: the routed topology runs TWO parse
    # pools concurrently, and fixed pools that together reserve every CPU
    # starve the task-pool stages (observed deadlock at num_cpus=4 with two
    # fixed pools of 2).
    parse_concurrency: Union[int, tuple, None] = None
    convert_batch_size: int = 1024
    experimental_tables: bool = True

    def pool(self):
        return self.parse_concurrency if self.parse_concurrency is not None else (1, 8)


def _front(ds, cfg: ExtractConfig):
    """decode -> split -> parse (shared by both topologies)."""
    ds = ds.map_batches(
        decode_stage, batch_format="pyarrow", batch_size=cfg.decode_batch_size
    )
    ds = ds.map_batches(
        make_split_stage(cfg.split_threshold_pages, cfg.split_batch_pages),
        batch_format="pyarrow",
        batch_size=cfg.decode_batch_size,
    )
    return ds.map_batches(
        LayoutParser,
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
        concurrency=cfg.pool(),
    )


def extract_from_payloads(ds, cfg: Optional[ExtractConfig] = None):
    """Unified topology: (doc_id, payload[, ...]) Dataset -> output Dataset."""
    cfg = cfg or ExtractConfig()
    ds = _front(ds, cfg)
    ds = ds.groupby("doc_id").map_groups(merge_group, batch_format="pyarrow")
    return ds.map_batches(
        make_convert_stage(cfg.experimental_tables),
        batch_format="pyarrow",
        batch_size=cfg.convert_batch_size,
    )


def extract_routed(corpus_dir: str, cfg: Optional[ExtractConfig] = None):
    """Skew-aware topology over a payload parquet corpus with an ``n_pages``
    column: small docs bypass the shuffle entirely."""
    import pyarrow.dataset as pads
    import ray.data as rd

    cfg = cfg or ExtractConfig()
    cols = ["doc_id", "payload", "n_pages"]
    small = rd.read_parquet(
        corpus_dir, columns=cols, filter=pads.field("n_pages") <= cfg.split_threshold_pages
    )
    large = rd.read_parquet(
        corpus_dir, columns=cols, filter=pads.field("n_pages") > cfg.split_threshold_pages
    )
    small_parsed = _front(small, cfg)  # every doc is a single shard: no shuffle
    large_merged = _front(large, cfg).groupby("doc_id").map_groups(
        merge_group, batch_format="pyarrow"
    )
    return small_parsed.union(large_merged).map_batches(
        make_convert_stage(cfg.experimental_tables),
        batch_format="pyarrow",
        batch_size=cfg.convert_batch_size,
    )


def flatten_blocks(batch: pa.Table) -> pa.Table:
    """Output rows -> one row per text block (the flat equality surface)."""
    import numpy as np
    import pyarrow.compute as pc

    tb = batch.column("text_blocks").combine_chunks()
    counts = pc.list_value_length(tb).to_numpy().astype(np.int64)
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    flat = tb.flatten()
    ord_ = np.arange(len(flat), dtype=np.int64)
    starts = np.zeros(len(batch), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    ord_ = ord_ - np.repeat(starts, counts)
    lang_list = batch.column("languages").combine_chunks()
    doc_ids = batch.column("doc_id").combine_chunks().take(pa.array(parent))
    return pa.table(
        {
            "doc_id": doc_ids,
            "ord": pa.array(ord_, type=pa.int32()),
            "block_id": flat.field("text_block_id"),
            "kind": flat.field("type"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
            "length": flat.field("length"),
            "page_number": flat.field("page_number"),
            "language": flat.field("language"),
        }
    )
