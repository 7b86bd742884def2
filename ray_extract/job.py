"""Job driver: the full extraction job with routing, checkpointing, metrics.

``run_extract_job`` is what `ray job submit -- python -m ray_extract.job ...`
runs on a cluster. Topology (measured on the x128 bench corpus, 32 CPUs):

- The small-doc branch (shuffle-free) and the heavy-tail branch (split +
  groupby merge) run as CONCURRENT Dataset executions (two driver threads
  sharing the Ray cluster). A single `union` pipeline was measured 4x slower
  (36s vs 8.3s) — the union serializes the branches and couples their
  backpressure; separate executions let the streaming executor saturate the
  node with both workloads.
- Each branch is divided into partitions (groups of input files); each
  partition is one Dataset execution written atomically with a manifest
  (state/checkpoint.py) -> exact resume, per-partition lineage + metrics.

Usage:
    python -m ray_extract.job --input <corpus_dir> --output <out_dir>
        [--partitions-per-branch K] [--no-resume]
"""

from __future__ import annotations

import glob
import os
import threading
from typing import Optional

from .pipelines.extract import ExtractConfig, _cluster_cpus, _front
from .stages.convert import make_convert_stage
from .stages.merge import merge_bucketed

# pool shares live on ExtractConfig (small_share / large_share): parse needs
# ~25-35% of pipeline CPU; oversized pools reserve idle CPUs and starve the
# task stages (see ExtractConfig.parse_concurrency)


def _pin_fsspec_http_stub():
    """Ray's path resolution does `from fsspec.implementations.http import
    HTTPFileSystem` catching only ModuleNotFoundError; with aiohttp missing,
    two branch threads importing it concurrently can observe a partial module
    and crash with a bare ImportError. Pin a stub once, on the main thread."""
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # only ever isinstance-checked
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


def _branch_front(corpus_files, cfg: ExtractConfig, branch: str, share_div: int = 1,
                  pre_routed: bool = False):
    """read -> decode -> split -> parse (the raw-IR dataset, SHARD_SCHEMA).

    ``pre_routed``: the corpus was partitioned by the routing key at ingest
    (materialize_corpus route_threshold_pages) — each branch reads its OWN
    files with no filter and no repartition: one scan of the corpus total
    instead of two filtered full scans, and no exchange on the heavy side.
    """
    import pyarrow.dataset as pads
    import pyarrow.fs as pafs
    import ray.data as rd

    # explicit local filesystem: path-list resolution otherwise imports
    # fsspec HTTP support that this container lacks
    fs = pafs.LocalFileSystem()
    cols = ["doc_id", "payload", "n_pages"]
    if branch == "small":
        ds = rd.read_parquet(
            corpus_files,
            filesystem=fs,
            columns=cols,
            filter=None if pre_routed
            else pads.field("n_pages") <= cfg.split_threshold_pages,
        )
        return _front(ds, cfg, pool_share=cfg.small_share / share_div)
    ds = rd.read_parquet(
        corpus_files,
        filesystem=fs,
        columns=cols,
        filter=None if pre_routed
        else pads.field("n_pages") > cfg.split_threshold_pages,
    )
    # coalescing the heavy side into ~3x-cpus blocks was measured faster than
    # consuming many small read blocks (68.7s vs 90.6s solo at 16 cpus) —
    # keep it regardless of corpus layout
    if cfg.large_blocks:
        ds = ds.repartition(cfg.large_blocks)
    return _front(ds, cfg, pool_share=cfg.large_share / share_div)


def _branch_finish(raw_ds, cfg: ExtractConfig, branch: str):
    """(merge for the heavy tail) -> convert (ParserOutput rows)."""
    conv = make_convert_stage(cfg.experimental_tables, cfg.language_detector)
    if branch == "large":
        raw_ds = merge_bucketed(raw_ds, num_buckets=4 * _cluster_cpus())
    return raw_ds.map_batches(
        conv, batch_format="pyarrow", batch_size=cfg.convert_batch_size,
        zero_copy_batch=True, num_cpus=cfg.task_num_cpus,
    )


def _branch_build(corpus_files, cfg: ExtractConfig, branch: str, share_div: int = 1,
                  pre_routed: bool = False):
    return _branch_finish(
        _branch_front(corpus_files, cfg, branch, share_div, pre_routed), cfg, branch
    )


def _empty_shard_table():
    from .schema import SHARD_SCHEMA

    return SHARD_SCHEMA.empty_table()


def auto_partitions_per_branch(cpus: Optional[int] = None) -> int:
    """Partition-count default that scales with cluster size.

    Interleaved A/B on the x768 bench corpus (quiet window, same host
    state): at 4 cpus one partition per branch beats two (275 vs 302 s —
    the fixed ~4-6 s per-execution cost of actor-pool spin-up + write
    finalization dominates), at 16 cpus two beat one (71-78 vs 84-97 s —
    branch-TAIL packing dominates: with one partition per branch the
    small branch drains first and the final ~20% of the large branch
    runs the cluster half-idle), and four per branch is worse everywhere
    measured (49.7 vs 27.6 s at 32 cpus on x128 — every extra execution
    wave re-pays the fixed cost). Rule: one partition per branch up to 8
    cpus, two above — enough in-flight executions that branch tails
    overlap, few enough that the fixed cost stays amortized. On a real
    multi-node cluster the same principle scales the count further
    (partition wall kept >= ~10x the fixed per-execution cost), and the
    checkpoint manifest granularity scales with it for free.
    """
    import ray

    if cpus is None:
        cpus = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
    return 1 if cpus <= 8 else 2


def run_extract_job(
    corpus_dir: str,
    out_dir: str,
    cfg: Optional[ExtractConfig] = None,
    partitions_per_branch: Optional[int] = None,
    resume: bool = True,
    max_concurrent: int = 2,
    save_raw: bool = False,
) -> dict:
    """Run the full job; returns {manifests, rows, wall_s per partition}.

    Partitions (branch x file-group) are drained from a work queue by
    ``max_concurrent`` driver threads — concurrent Dataset executions overlap
    each other's barriers (sort/write finalization) on the shared cluster.

    ``save_raw=True`` runs two phases per partition: the parse-stage IR
    (AnalyzeResult-equivalent shard rows) is written to ``<out>/raw-<pid>/``
    with its own manifest, then merge+convert reads it back. This is the
    reference's --save-raw-azure-response debug tap (run.py:157-160, K2)
    upgraded to a checkpoint: a resume after a crash in convert re-reads the
    raw IR instead of re-parsing the corpus.
    """
    import queue

    from .state.checkpoint import partition_inputs, run_partition

    _pin_fsspec_http_stub()
    cfg = cfg or ExtractConfig()
    if partitions_per_branch is None:
        partitions_per_branch = auto_partitions_per_branch()
    # pre-routed corpus layout (materialize_corpus route_threshold_pages):
    # <corpus>/small/*.parquet + <corpus>/large/*.parquet — each branch scans
    # only its own files. The unfiltered fast path is ONLY valid when the
    # layout's recorded routing threshold (_routing.json) equals this job's
    # split threshold: at a mismatched (higher) routing threshold, small-
    # branch docs with pages in (split, route] would be split into shards the
    # small branch never merges — duplicate partial rows per doc_id. Missing
    # or mismatched manifest -> fall back to filtered scans over ALL files,
    # which are correct for any layout.
    routed_files = {
        b: sorted(glob.glob(os.path.join(corpus_dir, b, "*.parquet")))
        for b in ("small", "large")
    }
    pre_routed = False
    if any(routed_files.values()):
        try:
            import json as _json

            with open(os.path.join(corpus_dir, "_routing.json")) as f:
                route_thresh = _json.load(f).get("route_threshold_pages")
        except (OSError, ValueError):
            route_thresh = None
        pre_routed = route_thresh == cfg.split_threshold_pages

    if pre_routed:
        groups_by_branch = {
            b: [g for g in partition_inputs(fs, partitions_per_branch) if g]
            for b, fs in routed_files.items()
        }
    else:
        files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
        files += routed_files["small"] + routed_files["large"]
        groups = [g for g in partition_inputs(files, partitions_per_branch) if g]
        groups_by_branch = {"small": groups, "large": groups}
    if not any(f for g in groups_by_branch.values() for grp in g for f in grp):
        raise FileNotFoundError(f"no parquet files under {corpus_dir}")

    work: "queue.Queue[tuple[str, int]]" = queue.Queue()
    # interleave branches so both are in flight early
    for gi in range(max(len(g) for g in groups_by_branch.values())):
        for branch in ("small", "large"):
            if gi < len(groups_by_branch[branch]):
                work.put((branch, gi))

    results: dict[str, dict] = {}
    errors: list[BaseException] = []
    lock = threading.Lock()

    def worker():
        while True:
            try:
                branch, gi = work.get_nowait()
            except queue.Empty:
                return
            try:
                pid = f"{branch}-{gi:04d}"
                # fixed actor pools must never over-reserve the cluster when
                # several executions run at once (observed deadlock otherwise)
                share_div = max(1, max_concurrent // 2)
                if save_raw:
                    raw_m = run_partition(
                        out_dir,
                        f"raw-{pid}",
                        groups_by_branch[branch][gi],
                        lambda fs: _branch_front(fs, cfg, branch,
                                                 share_div=share_div,
                                                 pre_routed=pre_routed),
                        resume=resume,
                        extra_meta={"branch": branch, "phase": "raw"},
                    )
                    import pyarrow.fs as pafs
                    import ray.data as rd

                    raw_dir = os.path.join(out_dir, f"raw-{pid}")
                    m = run_partition(
                        out_dir,
                        pid,
                        sorted(glob.glob(os.path.join(raw_dir, "*.parquet"))),
                        lambda fs: _branch_finish(
                            rd.read_parquet(fs, filesystem=pafs.LocalFileSystem())
                            if fs
                            else rd.from_arrow(_empty_shard_table()),
                            cfg,
                            branch,
                        ),
                        resume=resume,
                        extra_meta={"branch": branch, "raw_rows": raw_m["rows"]},
                    )
                else:
                    m = run_partition(
                        out_dir,
                        pid,
                        groups_by_branch[branch][gi],
                        lambda fs: _branch_build(fs, cfg, branch,
                                                 share_div=share_div,
                                                 pre_routed=pre_routed),
                        resume=resume,
                        extra_meta={"branch": branch},
                    )
                with lock:
                    results[pid] = m
            except BaseException as e:  # surface to the main thread
                errors.append(e)
                return

    n_parts = sum(len(g) for g in groups_by_branch.values())
    threads = [
        threading.Thread(target=worker)
        for _ in range(min(max_concurrent, n_parts))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return {
        "partitions": results,
        "rows": sum(m["rows"] for m in results.values()),
        "skipped": sum(1 for m in results.values() if m.get("skipped")),
    }


def main():
    import argparse

    import ray
    from ray.data import DataContext

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    # default None -> auto_partitions_per_branch (scales with cluster size);
    # pass an explicit K for reproducible checkpoint granularity
    p.add_argument("--partitions-per-branch", type=int, default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--save-raw", action="store_true",
                   help="write the parse-stage IR (raw shard rows) as its own "
                        "checkpointed phase (reference --save-raw-azure-response)")
    p.add_argument("--split-threshold-pages", type=int, default=8)
    p.add_argument("--split-batch-pages", type=int, default=16)
    args = p.parse_args()

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False

    cfg = ExtractConfig(
        split_threshold_pages=args.split_threshold_pages,
        split_batch_pages=args.split_batch_pages,
        decode_batch_size=256,
        parse_batch_size=256,
        convert_batch_size=512,
        large_blocks=3 * _cluster_cpus(),
    )
    res = run_extract_job(
        args.input, args.output, cfg,
        partitions_per_branch=args.partitions_per_branch,
        resume=not args.no_resume,
        save_raw=args.save_raw,
    )
    print({"rows": res["rows"], "skipped_partitions": res["skipped"]})
    if owns_session:
        ray.shutdown()


if __name__ == "__main__":
    main()
