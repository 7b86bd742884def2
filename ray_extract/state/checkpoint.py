"""Per-partition checkpointing with lineage + metrics for exact resume.

A job is divided into partitions (input parquet file groups x branch). Each
partition is processed by its own Dataset execution and written atomically:

    <out_dir>/<partition_id>/...parquet     (written to a tmp dir, then rename)
    <out_dir>/<partition_id>.manifest.json  (lineage + row metrics + wall time)

A partition whose manifest exists and whose output dir is present is SKIPPED
on resume — the reference achieves per-document idempotency by overwriting
one JSON file per doc id (run.py:88); this engine upgrades that to
per-partition manifests so a killed 10^12-doc job restarts where it stopped
instead of re-parsing everything.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Optional


def partition_inputs(files: list[str], num_partitions: int) -> list[list[str]]:
    """Deterministic round-robin assignment of input files to partitions."""
    num_partitions = max(1, min(num_partitions, len(files)))
    groups: list[list[str]] = [[] for _ in range(num_partitions)]
    for i, f in enumerate(sorted(files)):
        groups[i % num_partitions].append(f)
    return groups


def manifest_path(out_dir: str, pid: str) -> str:
    return os.path.join(out_dir, f"{pid}.manifest.json")


def is_done(out_dir: str, pid: str) -> bool:
    mp = manifest_path(out_dir, pid)
    part_dir = os.path.join(out_dir, pid)
    if not (os.path.exists(mp) and os.path.isdir(part_dir)):
        return False
    try:
        with open(mp) as f:
            m = json.load(f)
        return m.get("status") == "done"
    except Exception:
        return False


def run_partition(
    out_dir: str,
    pid: str,
    input_files: list[str],
    build: Callable[[list[str]], "object"],
    resume: bool = True,
    extra_meta: Optional[dict] = None,
) -> dict:
    """Execute one partition: build(files) -> Dataset, write atomically, record
    the manifest. Returns the manifest dict (cached one if already done)."""
    os.makedirs(out_dir, exist_ok=True)
    if resume and is_done(out_dir, pid):
        with open(manifest_path(out_dir, pid)) as f:
            m = json.load(f)
        m["skipped"] = True
        return m

    part_dir = os.path.join(out_dir, pid)
    tmp_dir = os.path.join(out_dir, f"_tmp_{pid}")
    for d in (part_dir, tmp_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)

    t0 = time.time()
    ds = build(input_files)
    ds.write_parquet(tmp_dir)
    # an empty partition (all rows filtered) writes no directory at all
    os.makedirs(tmp_dir, exist_ok=True)
    # row metrics from the written files' parquet footers (no re-execution)
    import pyarrow.parquet as pq

    rows = 0
    for fn in os.listdir(tmp_dir):
        if fn.endswith(".parquet"):
            rows += pq.ParquetFile(os.path.join(tmp_dir, fn)).metadata.num_rows
    os.rename(tmp_dir, part_dir)

    manifest = {
        "partition_id": pid,
        "status": "done",
        "input_files": sorted(input_files),
        "rows": rows,
        "wall_s": round(time.time() - t0, 3),
        "finished_at": time.time(),
        **(extra_meta or {}),
    }
    tmp_manifest = manifest_path(out_dir, pid) + ".tmp"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_manifest, manifest_path(out_dir, pid))
    return manifest
