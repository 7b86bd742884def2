"""Checkpoint/resume: a killed job restarts where it stopped and produces
output logically identical to an uninterrupted run."""

import glob
import json
import os
import shutil

import duckdb
import pytest

from ray_extract.job import run_extract_job
from ray_extract.pipelines.extract import ExtractConfig
from ray_extract.sources.synth import materialize_corpus

CFG = ExtractConfig(
    split_threshold_pages=4, split_batch_pages=4, parse_concurrency=(1, 2)
)


def _doc_table(out_dir: str):
    files = sorted(glob.glob(os.path.join(out_dir, "*", "*.parquet")))
    con = duckdb.connect()
    return con.execute(
        "SELECT doc_id, md5sum, n_pages, n_text_blocks, status "
        f"FROM read_parquet({files!r}) ORDER BY doc_id"
    ).df()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume") / "corpus"
    materialize_corpus(
        "/root/testdata/sf0.001/documents.parquet", str(d), num_files=8
    )
    return str(d)


def test_resume_identical_output(ray_session, corpus, tmp_path):
    full_dir = str(tmp_path / "full")
    res_full = run_extract_job(corpus, full_dir, CFG, partitions_per_branch=4)
    assert res_full["rows"] == 500
    assert res_full["skipped"] == 0

    # "crash" partway: run once, then delete two partitions' outputs+manifests
    crash_dir = str(tmp_path / "crash")
    run_extract_job(corpus, crash_dir, CFG, partitions_per_branch=4)
    killed = ["small-0001", "large-0002"]
    for pid in killed:
        shutil.rmtree(os.path.join(crash_dir, pid))
        os.remove(os.path.join(crash_dir, f"{pid}.manifest.json"))
    # also leave a dangling tmp dir as a real crash would
    os.makedirs(os.path.join(crash_dir, "_tmp_small-0001"))

    res2 = run_extract_job(corpus, crash_dir, CFG, partitions_per_branch=4)
    assert res2["skipped"] == 8 - len(killed)
    assert res2["rows"] == 500

    got, want = _doc_table(crash_dir), _doc_table(full_dir)
    assert got.equals(want)


def test_save_raw_two_phase(ray_session, corpus, tmp_path):
    """K2 raw-IR tap: phase-A shard rows persist, phase-B output matches the
    direct path, and resume skips both phases."""
    import glob

    import duckdb

    out = str(tmp_path / "raw_mode")
    res = run_extract_job(corpus, out, CFG, partitions_per_branch=2, save_raw=True)
    assert res["rows"] == 500
    raw_files = glob.glob(os.path.join(out, "raw-*", "*.parquet"))
    assert raw_files
    con = duckdb.connect()
    (n_shards,) = con.execute(
        f"SELECT count(*) FROM read_parquet({raw_files!r})"
    ).fetchone()
    assert n_shards >= 500  # split docs contribute multiple shards
    res2 = run_extract_job(corpus, out, CFG, partitions_per_branch=2, save_raw=True)
    assert res2["skipped"] == 4 and res2["rows"] == 500


def test_manifest_lineage(ray_session, corpus, tmp_path):
    out = str(tmp_path / "lin")
    run_extract_job(corpus, out, CFG, partitions_per_branch=2)
    manifests = sorted(glob.glob(os.path.join(out, "*.manifest.json")))
    assert len(manifests) == 4  # 2 branches x 2 partitions
    total = 0
    for mp in manifests:
        with open(mp) as f:
            m = json.load(f)
        assert m["status"] == "done"
        assert m["branch"] in ("small", "large")
        assert m["input_files"] and all(f.endswith(".parquet") for f in m["input_files"])
        assert m["wall_s"] > 0
        total += m["rows"]
    assert total == 500  # every document in exactly one partition
