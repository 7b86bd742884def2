"""In-process A/B of full-job configs (alternating, same Ray session)."""

import os
import shutil
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")
import ray
from ray.data import DataContext

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.enable_tensor_extension_casting = False
ctx.target_max_block_size = 32 * 1024 * 1024

from ray_extract.job import run_extract_job
from ray_extract.pipelines.extract import ExtractConfig

corpus = "/tmp/ray_extract_bench/corpus_root_testdata_sf0.1_x128"
import pyarrow.dataset as pads

for b in pads.dataset(corpus).to_batches(
    columns=["doc_id", "payload", "n_pages"], batch_size=65536
):
    del b


def mk(shares, cpus, batch):
    return ExtractConfig(
        split_threshold_pages=8, split_batch_pages=16,
        decode_batch_size=batch, parse_batch_size=batch,
        convert_batch_size=2 * batch, large_blocks=96,
        task_num_cpus=cpus, small_share=shares[0], large_share=shares[1],
    )


CFGS = {
    "old(.45/.30,c1,b256)": mk((0.45, 0.30), 1.0, 256),
    "new(.18/.10,c.5,b256)": mk((0.18, 0.10), 0.5, 256),
    "new(.18/.10,c.5,b1024)": mk((0.18, 0.10), 0.5, 1024),
    "mid(.30/.15,c.5,b256)": mk((0.30, 0.15), 0.5, 256),
}

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
for r in range(rounds):
    for name, cfg in CFGS.items():
        out = "/dev/shm/ray_extract_bench_out/ab"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        res = run_extract_job(corpus, out, cfg, partitions_per_branch=1, resume=False)
        print(f"{name}: {time.time()-t0:.2f}s rows={res['rows']}", flush=True)
        shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
