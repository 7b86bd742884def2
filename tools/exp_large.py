"""Large-branch solo experiments at a given cpu count."""

import glob
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")
import ray
from ray.data import DataContext

KNOB = sys.argv[1] if len(sys.argv) > 1 else "base"
NCPU = int(sys.argv[2]) if len(sys.argv) > 2 else 16
AMP = sys.argv[3] if len(sys.argv) > 3 else "768"

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.enable_tensor_extension_casting = False
ctx.target_max_block_size = 32 * 1024 * 1024

import pyarrow.dataset as pads
import pyarrow.fs as pafs
import ray.data as rd

from ray_extract.job import _pin_fsspec_http_stub
from ray_extract.pipelines.extract import ExtractConfig, _front
from ray_extract.stages.convert import make_convert_stage
from ray_extract.stages.merge import merge_bucketed

_pin_fsspec_http_stub()
corpus = f"/tmp/ray_extract_bench/corpus_root_testdata_sf0.1_x{AMP}"
files = sorted(glob.glob(corpus + "/*.parquet"))
cfg = ExtractConfig(
    split_threshold_pages=8, split_batch_pages=16, decode_batch_size=256,
    parse_batch_size=256, convert_batch_size=512,
)

# warm only the large rows (cheap)
for b in pads.dataset(corpus).to_batches(
    columns=["doc_id", "payload", "n_pages"], batch_size=65536
):
    del b

ds = rd.read_parquet(
    files, filesystem=pafs.LocalFileSystem(),
    columns=["doc_id", "payload", "n_pages"],
    filter=pads.field("n_pages") > 8,
)
if KNOB == "repart":
    ds = ds.repartition(3 * NCPU)
elif KNOB == "repart_shuffleless":
    ds = ds.repartition(3 * NCPU, shuffle=False)
elif KNOB == "repart_objmem":
    from ray.data import ExecutionResources

    ctx.execution_options.resource_limits = ExecutionResources(
        object_store_memory=32 * 1024**3
    )
    ds = ds.repartition(3 * NCPU)
elif KNOB == "repart_preserve":
    ctx.execution_options.preserve_order = False
    ds = ds.repartition(3 * NCPU)

ds = _front(ds, cfg, pool_share=cfg.large_share)
ds = merge_bucketed(ds, num_buckets=4 * NCPU)
ds = ds.map_batches(
    make_convert_stage(True), batch_format="pyarrow",
    batch_size=cfg.convert_batch_size, zero_copy_batch=True,
    num_cpus=cfg.task_num_cpus,
)
t0 = time.time()
n = 0
for bt in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
    n += len(bt)
print(f"large knob={KNOB} ncpu={NCPU}: {time.time()-t0:.2f}s rows={n}", flush=True)
if os.environ.get("EXP_STATS") == "1":
    print(ds.stats())
ray.shutdown()
