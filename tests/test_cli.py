"""CLI end-to-end (reference tests/test_cli.py analogue): the job entrypoint
over a temp corpus produces validated outputs keyed by doc id."""

import glob
import sys

import duckdb
import pytest


def test_job_cli_end_to_end(ray_session, tmp_path, monkeypatch):
    from ray_extract.job import main
    from ray_extract.sources.synth import materialize_corpus

    corpus = str(tmp_path / "corpus")
    materialize_corpus("/root/testdata/sf0.001/documents.parquet", corpus, num_files=4)
    out = str(tmp_path / "out")
    monkeypatch.setattr(
        sys,
        "argv",
        ["job", "--input", corpus, "--output", out, "--partitions-per-branch", "2",
         "--split-threshold-pages", "4", "--split-batch-pages", "4"],
    )
    main()
    files = glob.glob(f"{out}/*/*.parquet")
    assert files
    con = duckdb.connect()
    n, ok = con.execute(
        f"SELECT count(*), count(*) FILTER (status = 'ok') FROM read_parquet({files!r})"
    ).fetchone()
    assert n == 500 and ok == 500
    # manifests exist for all four partitions
    assert len(glob.glob(f"{out}/*.manifest.json")) == 4


def test_polygon_must_have_four_points():
    # reference convert.py:40-41 / tests/test_convert.py:48-61
    from ray_extract.oracle import _poly_px

    assert _poly_px([0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0]) == [
        (0.0, 0.0), (72.0, 0.0), (72.0, 72.0), (0.0, 72.0)
    ]
    with pytest.raises(ValueError, match="exactly four points"):
        _poly_px([0.0, 0.0, 1.0, 0.0, 1.0, 1.0])
