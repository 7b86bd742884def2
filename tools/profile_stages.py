"""One-off: run the two branch pipelines separately and print ds.stats()."""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")
import ray
from ray.data import DataContext

NCPU = int(sys.argv[1]) if len(sys.argv) > 1 else 32
BRANCH = sys.argv[2] if len(sys.argv) > 2 else "small"
AMP = sys.argv[3] if len(sys.argv) > 3 else "128"

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.enable_tensor_extension_casting = False
ctx.target_max_block_size = 32 * 1024 * 1024

from ray_extract.job import _branch_build, _pin_fsspec_http_stub
from ray_extract.pipelines.extract import ExtractConfig

_pin_fsspec_http_stub()
corpus = f"/tmp/ray_extract_bench/corpus_root_testdata_sf0.1_x{AMP}"
import glob

files = sorted(glob.glob(corpus + "/*.parquet"))
cfg = ExtractConfig(
    split_threshold_pages=8, split_batch_pages=16, decode_batch_size=256,
    parse_batch_size=256, convert_batch_size=512, large_blocks=3 * NCPU,
)

import pyarrow.dataset as pads

for b in pads.dataset(corpus).to_batches(
    columns=["doc_id", "payload", "n_pages"], batch_size=65536
):
    del b

# solo branch run: full pool share since nothing runs concurrently
ds = _branch_build(files, cfg, BRANCH, share_div=1)
t0 = time.time()
n = 0
for bt in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
    n += len(bt)
print(f"{BRANCH} solo: {time.time()-t0:.2f}s rows={n}")
print(ds.stats())
ray.shutdown()
