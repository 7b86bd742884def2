"""Controlled headline-job sampler: N repeated runs in one process.

Usage: python tools/bench_headline.py [runs] [amplify] [num_cpus]
Prints one line per run plus per-partition wall times for the last run.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
AMP = sys.argv[2] if len(sys.argv) > 2 else "128"
NCPU = int(sys.argv[3]) if len(sys.argv) > 3 else 32
PARTS = int(os.environ.get("BENCH_PARTS", "1"))
MAXC = int(os.environ.get("BENCH_MAXC", "2"))

os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")
import ray  # noqa: E402
from ray.data import DataContext  # noqa: E402

ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
         logging_level="ERROR")
ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.enable_tensor_extension_casting = False
ctx.target_max_block_size = 32 * 1024 * 1024

from ray_extract.job import run_extract_job  # noqa: E402
from ray_extract.pipelines.extract import ExtractConfig  # noqa: E402

corpus = f"/tmp/ray_extract_bench/corpus_root_testdata_sf0.1_x{AMP}"
if os.environ.get("BENCH_FLAT") != "1" and os.path.isdir(corpus + "_r2"):
    corpus = corpus + "_r2"  # pre-routed layout (small/ + large/)
B = int(os.environ.get("BENCH_BATCH", "1024"))
cfg = ExtractConfig(
    split_threshold_pages=8, split_batch_pages=16, decode_batch_size=B,
    parse_batch_size=B, convert_batch_size=2 * B, large_blocks=3 * NCPU,
)

import pyarrow.dataset as pads  # noqa: E402

for b in pads.dataset(corpus).to_batches(
    columns=["doc_id", "payload", "n_pages"], batch_size=65536
):
    del b

res = None
for i in range(RUNS):
    out = f"/dev/shm/ray_extract_bench_out/ctl_{i}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    res = run_extract_job(corpus, out, cfg, partitions_per_branch=PARTS,
                          resume=False, max_concurrent=MAXC)
    w = time.time() - t0
    print(f"run {i}: {w:.2f}s rows={res['rows']}", flush=True)
    shutil.rmtree(out, ignore_errors=True)
if res:
    for pid, m in sorted(res["partitions"].items()):
        print(f"  {pid}: wall={m.get('wall_s')}s rows={m.get('rows')}")
ray.shutdown()
