"""One-off executor-knob experiments on the solo small branch."""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")
import ray
from ray.data import DataContext

KNOB = sys.argv[1] if len(sys.argv) > 1 else "base"
NCPU = 32

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.enable_tensor_extension_casting = False
ctx.target_max_block_size = 32 * 1024 * 1024

import glob

import pyarrow.dataset as pads
import ray.data as rd
import pyarrow.fs as pafs

from ray_extract.job import _pin_fsspec_http_stub
from ray_extract.pipelines.extract import ExtractConfig
from ray_extract.stages.convert import make_convert_stage
from ray_extract.stages.decode import decode_stage
from ray_extract.stages.parse import LayoutParser
from ray_extract.stages.split import make_split_stage

_pin_fsspec_http_stub()
corpus = "/tmp/ray_extract_bench/corpus_root_testdata_sf0.1_x128"
files = sorted(glob.glob(corpus + "/*.parquet"))
for b in pads.dataset(corpus).to_batches(
    columns=["doc_id", "payload", "n_pages"], batch_size=65536
):
    del b

cfg = ExtractConfig(
    split_threshold_pages=8, split_batch_pages=16, decode_batch_size=256,
    parse_batch_size=256, convert_batch_size=512,
)

task_cpus = 1.0
pool = 14
batch = 256
if KNOB == "cpu_oversub":
    from ray.data import ExecutionResources

    ctx.execution_options.resource_limits = ExecutionResources(cpu=64)
elif KNOB == "frac_cpus":
    task_cpus = 0.5
elif KNOB == "big_batch":
    batch = 1024
elif KNOB == "small_pool":
    pool = 6
elif KNOB == "pool_and_frac":
    task_cpus = 0.5
    pool = 10
elif KNOB == "combo":
    task_cpus = 0.5
    batch = 1024
elif KNOB == "combo_small_pool":
    task_cpus = 0.5
    batch = 1024
    pool = 8
elif KNOB == "combo_frac_pool":
    task_cpus = 0.5
    batch = 1024
    pool = 20
elif KNOB == "combo_pool4":
    task_cpus = 0.5
    batch = 1024
    pool = 4
elif KNOB == "combo_pool6":
    task_cpus = 0.5
    batch = 1024
    pool = 6
elif KNOB == "combo_q":
    task_cpus = 0.25
    batch = 1024
    pool = 8

import pyarrow.dataset as pds

ds = rd.read_parquet(
    files, filesystem=pafs.LocalFileSystem(),
    columns=["doc_id", "payload", "n_pages"],
    filter=pds.field("n_pages") <= 8,
)
ds = ds.map_batches(decode_stage, batch_format="pyarrow", batch_size=batch,
                    zero_copy_batch=True, num_cpus=task_cpus)
ds = ds.map_batches(make_split_stage(8, 16), batch_format="pyarrow",
                    batch_size=batch, zero_copy_batch=True, num_cpus=task_cpus)
ds = ds.map_batches(LayoutParser, fn_constructor_kwargs={"max_retries": 3},
                    batch_format="pyarrow", batch_size=batch, concurrency=pool,
                    zero_copy_batch=True, max_restarts=4, max_task_retries=3)
ds = ds.map_batches(make_convert_stage(True), batch_format="pyarrow",
                    batch_size=2 * batch, zero_copy_batch=True, num_cpus=task_cpus)

t0 = time.time()
n = 0
for bt in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
    n += len(bt)
print(f"knob={KNOB}: {time.time()-t0:.2f}s rows={n}", flush=True)
ray.shutdown()
