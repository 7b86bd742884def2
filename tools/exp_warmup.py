"""Fresh-process check: does a small warm-up run (x128) bring the x768
headline to steady-state (~78s at 16 cpus) vs the ~149s cold first run?"""
import os, shutil, sys, time
sys.path.insert(0, ".")
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")
import ray
from ray.data import DataContext

NCPU = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.enable_tensor_extension_casting = False
ctx.target_max_block_size = 32 * 1024 * 1024

from ray_extract.job import run_extract_job
from ray_extract.pipelines.extract import ExtractConfig

def cfg():
    return ExtractConfig(split_threshold_pages=8, split_batch_pages=16,
                         decode_batch_size=1024, parse_batch_size=1024,
                         convert_batch_size=2048, large_blocks=3 * NCPU)

warm_corpus = "/tmp/ray_extract_bench/corpus_root_testdata_sf0.1_x128_r2"
corpus = "/tmp/ray_extract_bench/corpus_root_testdata_sf0.1_x768_r2"
import pyarrow.dataset as pads
for b in pads.dataset(corpus).to_batches(columns=["doc_id", "payload", "n_pages"], batch_size=65536):
    del b

t0 = time.time()
out = "/dev/shm/ray_extract_bench_out/warmup"
shutil.rmtree(out, ignore_errors=True)
run_extract_job(warm_corpus, out, cfg(), partitions_per_branch=1, resume=False)
shutil.rmtree(out, ignore_errors=True)
print(f"warmup(x128): {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
out = "/dev/shm/ray_extract_bench_out/timed"
shutil.rmtree(out, ignore_errors=True)
res = run_extract_job(corpus, out, cfg(), partitions_per_branch=1, resume=False)
w = time.time() - t0
shutil.rmtree(out, ignore_errors=True)
print(f"timed(x768): {w:.2f}s rows={res['rows']}", flush=True)
ray.shutdown()
