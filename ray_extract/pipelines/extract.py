"""The flagship pipeline: payload corpus -> ParserOutput rows.

Stage map (SURVEY.md §3 target lifecycle):

    P0 decode   map_batches  validate + md5 + page peek (dead-letter rows)
    P1 split    map_batches  flat-map docs over the page threshold into
                             page-range shards (skew defusal)
    P2 parse    map_batches(LayoutParser, concurrency=...)  actor pool,
                             warm layout-parser state
    P3 merge    hash-bucketed groupby + vectorized per-bucket ordered
                             concat (stages/merge.merge_bucketed) — the ONE
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
from typing import Callable, Optional, Union

import pyarrow as pa

from ..stages.convert import make_convert_stage
from ..stages.decode import decode_stage
from ..stages.merge import merge_bucketed
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
    # actor pool size for the parse stage. None -> sized from the cluster's
    # CPU count at pipeline build. Measured behavior (x128 corpus, 32 CPUs):
    # an autoscaling (1, 24) pool never ramps and runs 2x slower than a fixed
    # pool, so defaults are FIXED pools — and OVERSIZED pools actively hurt:
    # idle actors still reserve whole CPUs from the streaming executor,
    # starving the task stages (measured: pool 20 -> 10.5s, pool 14 -> 8.0s,
    # pool 6-8 -> ~7.0s on the solo small branch). Size pools to the parse
    # stage's CPU share of the pipeline (~25-35%), never "most of the node".
    parse_concurrency: Union[int, tuple, None] = None
    # CPUs requested per task-stage task. 0.5 doubles schedulable task slots
    # per core; with ~40-60% streaming-executor utilization per slot the
    # oversubscription keeps cores busy (measured 12.9s -> 9.6s solo)
    task_num_cpus: float = 0.5
    convert_batch_size: int = 1024
    experimental_tables: bool = True
    # bounded in-kernel retry per document parse (reference utils.py:18-32);
    # final failure dead-letters the document
    parse_max_retries: int = 3
    # injectable layout-parse kernel: raw payload bytes -> the flat dict
    # payload.decode returns. None -> SPDF decode. This is how a real-PDF
    # layout parser plugs in on top of the codec routing (codecs.py): the
    # decode/split stages already validate + shard any registered format,
    # and this kernel turns each (sub-)payload into layout records. Must be
    # a picklable callable (module-level function or callable instance).
    parse_fn: Optional[Callable] = None
    # F4 error-driven fallback (reference run.py:27-39): a whole-doc parse
    # failure re-enters the split path in-kernel (slice via codec, parse each
    # shard with its own retries) before dead-lettering
    split_fallback: bool = True
    # language detector used by the convert stage (A1): None -> the
    # 5-language deterministic default (SQL-oracle-reproducible); pass
    # functions.language.detect_languages_arrow_wide for ~34-language
    # coverage (script ranges + wide marker table, still deterministic).
    # Must be a picklable callable with the detect_languages_arrow contract.
    language_detector: Optional[Callable] = None
    # actor-level fault tolerance: restart parse actors killed by the OS
    # (OOM) or lost with a node, and re-run the in-flight task. Application
    # exceptions never re-execute tasks (retry_exceptions stays False) — a
    # poison document is dead-lettered in-kernel, not retried batch-wide.
    actor_max_restarts: int = 4
    actor_max_task_retries: int = 3
    # parse-pool CPU shares for the two branches of the routed/job topology.
    # The pool SIZE (actor count) sets the parse stage's throughput ceiling
    # (~13k docs/s/actor); the CPUs RESERVED are size x parse_actor_num_cpus.
    # With 0.5-cpu actors a share of 0.30 gives enough actors to never be
    # the pipeline bottleneck while reserving only ~15% of the cluster.
    small_share: float = 0.30
    large_share: float = 0.18
    # CPUs reserved per parse actor: fractional actors decouple parse
    # parallelism from CPU reservation (idle reserved CPUs starve the task
    # stages; see parse_concurrency note)
    parse_actor_num_cpus: float = 0.5
    # routed topology: read-parallelism overrides. The large-doc side is few
    # rows but HUGE rows; without an override it collapses into a handful of
    # blocks and the merge/convert stages lose parallelism (one task per
    # block). None -> Ray's defaults.
    small_blocks: Optional[int] = None
    large_blocks: Optional[int] = None

    def pool(self, share: float = 0.25):
        if self.parse_concurrency is not None:
            return self.parse_concurrency
        cpus = _cluster_cpus()
        if cpus < 12:
            # tiny clusters: autoscale so concurrent pools can't reserve every
            # CPU and starve the task stages
            return (1, max(2, cpus // 2))
        # `share` is the CPU share; the actor COUNT scales it by the
        # fractional per-actor reservation so parse parallelism (the
        # throughput ceiling) stays high while reserved CPUs stay low
        return max(2, int(cpus * share / max(self.parse_actor_num_cpus, 0.1)))


def _cluster_cpus() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def _front(ds, cfg: ExtractConfig, pool_share: float = 0.25):
    """decode -> split -> parse (shared by both topologies)."""
    ds = ds.map_batches(
        decode_stage, batch_format="pyarrow", batch_size=cfg.decode_batch_size,
        zero_copy_batch=True, num_cpus=cfg.task_num_cpus,
    )
    ds = ds.map_batches(
        make_split_stage(cfg.split_threshold_pages, cfg.split_batch_pages),
        batch_format="pyarrow",
        batch_size=cfg.decode_batch_size,
        zero_copy_batch=True,
        num_cpus=cfg.task_num_cpus,
    )
    return ds.map_batches(
        LayoutParser,
        fn_constructor_kwargs={"max_retries": cfg.parse_max_retries,
                               "parse_fn": cfg.parse_fn,
                               "split_fallback": cfg.split_fallback,
                               "fallback_batch_pages": cfg.split_batch_pages},
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
        concurrency=cfg.pool(pool_share),
        zero_copy_batch=True,
        num_cpus=cfg.parse_actor_num_cpus,
        max_restarts=cfg.actor_max_restarts,
        max_task_retries=cfg.actor_max_task_retries,
    )


def extract_from_payloads(ds, cfg: Optional[ExtractConfig] = None):
    """Unified topology: (doc_id, payload[, ...]) Dataset -> output Dataset."""
    cfg = cfg or ExtractConfig()
    ds = _front(ds, cfg)
    ds = merge_bucketed(ds, num_buckets=4 * _cluster_cpus())
    return ds.map_batches(
        make_convert_stage(cfg.experimental_tables, cfg.language_detector),
        batch_format="pyarrow",
        batch_size=cfg.convert_batch_size,
        zero_copy_batch=True,
        num_cpus=cfg.task_num_cpus,
    )


def extract_routed(corpus_dir: str, cfg: Optional[ExtractConfig] = None):
    """Skew-aware topology over a payload parquet corpus with an ``n_pages``
    column: small docs bypass the shuffle entirely.

    .. warning:: This entrypoint MATERIALIZES both branches' converted rows
       in the object store before unioning them (see the threading note
       below) — fine for gate/test corpora, wrong for a 100-TB run. For
       large corpora use ``job.run_extract_job``: the production topology
       with the same branch structure, but each branch STREAMS to
       partitioned parquet with per-partition resumable checkpoints and
       nothing is held in the object store. ``tests/test_routed_corpus.py``
       asserts the two paths produce identical rows."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from ..functions.tables import strip_schema_metadata

    cfg = cfg or ExtractConfig()
    cols = ["doc_id", "payload", "n_pages"]
    # strip pandas parquet metadata at the read: metadata-carrying schemas
    # are unhashable and defeat shuffle schema-dedup downstream
    small = strip_schema_metadata(rd.read_parquet(
        corpus_dir, columns=cols,
        filter=pads.field("n_pages") <= cfg.split_threshold_pages,
    ))
    large = strip_schema_metadata(rd.read_parquet(
        corpus_dir, columns=cols,
        filter=pads.field("n_pages") > cfg.split_threshold_pages,
    ))
    if cfg.small_blocks:
        small = small.repartition(cfg.small_blocks)
    if cfg.large_blocks:
        # few rows but huge rows: spread them so split/parse/merge/convert all
        # get block-level parallelism (one map task per block)
        large = large.repartition(cfg.large_blocks)
    convert = make_convert_stage(cfg.experimental_tables, cfg.language_detector)
    small_out = _front(small, cfg, pool_share=cfg.small_share).map_batches(  # no shuffle
        convert, batch_format="pyarrow", batch_size=cfg.convert_batch_size,
        zero_copy_batch=True, num_cpus=cfg.task_num_cpus,
    )
    large_out = merge_bucketed(
        _front(large, cfg, pool_share=cfg.large_share), num_buckets=4 * _cluster_cpus()
    ).map_batches(
        convert, batch_format="pyarrow", batch_size=cfg.convert_batch_size,
        zero_copy_batch=True, num_cpus=cfg.task_num_cpus,
    )
    # A lazy `small.union(large)` SERIALIZES the two branch executions
    # (measured 4x slower, see job.py module docstring) — so, like the
    # production job topology (job.py runs each branch as its own concurrent
    # Dataset execution writing parquet), execute both branches concurrently
    # on driver threads and union the already-computed results (a metadata
    # concat). The materialization here is of the FINAL converted rows, the
    # same payload job.py holds in its output sink.
    import threading

    done: dict[str, object] = {}
    errs: list[BaseException] = []

    def run(name: str, pipe):
        try:
            done[name] = pipe.materialize()
        except BaseException as e:  # surface to the main thread
            errs.append(e)

    threads = [
        threading.Thread(target=run, args=("small", small_out)),
        threading.Thread(target=run, args=("large", large_out)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
    return done["small"].union(done["large"])


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
