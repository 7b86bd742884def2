"""Semantic pins for the tar/decay/log2 batch beyond oracle parity:
the ustar walker against Python's own tarfile reader, checksum-defect
detection, exact power-of-two decay mass, and log2 bucket edges.
"""

import io
import tarfile

import numpy as np

SF = "/root/testdata/sf0.001"


def test_tar_blobs_readable_by_stdlib_tarfile(ray_session):
    from ray_extract.pipelines.containers import _tar_build
    import pyarrow as pa

    batch = pa.table({"doc_id": pa.array([0, 7, 21, 49], pa.int64())})
    built = _tar_build(batch)
    for i in range(built.num_rows):
        did = built.column("doc_id")[i].as_py()
        blob = built.column("tar")[i].as_py()
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            members = tf.getmembers()
            assert len(members) == 1 + did % 4
            for m, mem in enumerate(members):
                size = 10 + (did * 7 + m * 13) % 90
                assert mem.name == f"m{m}.txt"
                assert mem.size == size
                assert mem.mtime == did * 100 + m
                data = tf.extractfile(mem).read()
                assert data == bytes([(did + m) % 256]) * size


def test_tar_walker_rejects_checksum_defect():
    import pyarrow as pa
    import pytest

    from ray_extract.pipelines.containers import TarWalker, _tar_build

    built = _tar_build(pa.table({"doc_id": pa.array([7], pa.int64())}))
    blob = bytearray(built.column("tar")[0].as_py())
    blob[0] ^= 0xFF  # flip a name byte after the checksum was written
    bad = pa.table(
        {"doc_id": pa.array([7], pa.int64()),
         "tar": pa.array([bytes(blob)], pa.binary())}
    )
    with pytest.raises(Exception, match="checksum"):
        TarWalker()(bad)


def test_decayed_mass_power_structure(ray_session):
    import duckdb

    from ray_extract.pipelines.events import decayed_event_mass

    df = decayed_event_mass(SF, horizon_days=30).to_pandas()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert int(df["n_events"].sum()) == n
    # every recent event contributes at least 1 and at most 2^30
    assert (df["decayed_mass"] >= df["n_recent"]).all()
    assert (df["decayed_mass"] <= df["n_recent"] * (1 << 30)).all()


def test_log2_buckets_are_exact_edges(ray_session):
    import duckdb

    from ray_extract.pipelines.events import value_log2_histogram

    df = value_log2_histogram(SF).to_pandas()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert int(df["n_events"].sum()) == n
    for _, r in df[df["bucket"] >= 0].iterrows():
        lo = 1 << int(r["bucket"])
        hi = 1 << (int(r["bucket"]) + 1)
        # mean cents of the bucket lies inside its half-open range
        assert lo * r["n_events"] <= r["sum_cents"] < hi * r["n_events"]
