"""Interleaved in-process A/B: per-band_key map_groups vs 64-bucket merge
for the simhash pair-verify stage. Usage: python tools/exp_simhash_verify.py [reps]"""
import sys, time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

ctx = DataContext.get_current()
ctx.enable_progress_bars = False

from ray_extract.pipelines.dedup import _docs  # noqa: E402
from ray_extract.functions.hashing import simhash32_batch  # noqa: E402
import pyarrow.compute as pc  # noqa: E402

SF = "/root/testdata/sf0.1"
MAXH = 3
N_BANDS = 4
edges = np.linspace(0, 32, N_BANDS + 1).astype(np.int64)


def band_stage(batch: pa.Table) -> pa.Table:
    sigs = simhash32_batch(batch.column("text").to_pylist()).astype(np.uint32)
    ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy()
    n = len(ids)
    out_id = np.repeat(ids, N_BANDS)
    out_sig = np.repeat(sigs.astype(np.int64), N_BANDS)
    keys = np.empty((n, N_BANDS), dtype=np.int64)
    for b in range(N_BANDS):
        lo, hi = int(edges[b]), int(edges[b + 1])
        val = (sigs >> lo) & np.uint32((1 << (hi - lo)) - 1)
        keys[:, b] = b * (1 << 32) + val.astype(np.int64)
    return pa.table({"doc_id": pa.array(out_id), "sig": pa.array(out_sig),
                     "band_key": pa.array(keys.ravel())})


def verify_pairs(g):
    import pandas as pd

    left = g[["band_key", "doc_id", "sig"]]
    m = left.merge(left, on="band_key", suffixes=("_a", "_b"))
    m = m[m["doc_id_a"] < m["doc_id_b"]]
    x = (m["sig_a"].to_numpy().astype(np.uint32)
         ^ m["sig_b"].to_numpy().astype(np.uint32))
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 4), axis=1).sum(1)
    keep = ham <= MAXH
    import pandas as pd
    return pd.DataFrame({"doc_a": m["doc_id_a"].to_numpy()[keep],
                         "doc_b": m["doc_id_b"].to_numpy()[keep],
                         "hamming": ham[keep].astype(np.int64)})


def add_vbucket(batch: pa.Table) -> pa.Table:
    bk = batch.column("band_key").to_numpy().astype(np.uint64)
    return batch.append_column(
        "vbucket",
        pa.array(((bk * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(64)).astype(np.int64)),
    )


def run_perkey():
    bands = _docs(SF).map_batches(band_stage, batch_format="pyarrow")
    return bands.groupby("band_key").map_groups(
        verify_pairs, batch_format="pandas").count()


def run_bucketed():
    bands = _docs(SF).map_batches(band_stage, batch_format="pyarrow")
    return (bands.map_batches(add_vbucket, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("vbucket")
            .map_groups(verify_pairs, batch_format="pandas").count())


reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
for r in range(reps):
    for name, fn in (("perkey", run_perkey), ("bucketed", run_bucketed)):
        t0 = time.time()
        n = fn()
        print(f"rep{r} {name}: {time.time()-t0:.2f}s pairs={n}", flush=True)
ray.shutdown()
