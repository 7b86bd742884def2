"""File sources/sinks, geometry kernel, and the driver entry contract."""

import json
import os

import pyarrow as pa


def test_read_document_dir_and_json_sink(ray_session, tmp_path):
    from ray_extract.derive import derive_payload
    from ray_extract.pipelines.extract import ExtractConfig, extract_from_payloads
    from ray_extract.sources.files import read_document_dir, write_json_per_doc

    src = tmp_path / "docs"
    src.mkdir()
    texts = {
        "alpha": "a b c d e f g h i j k l",
        "beta": " ".join(f"w{i}" for i in range(30)),
    }
    for name, text in texts.items():
        (src / f"{name}.spdf").write_bytes(derive_payload(name, text))

    ds = read_document_dir(str(src))
    rows = {r["doc_id"]: r["payload"] for r in ds.take_all()}
    assert set(rows) == {"alpha", "beta"}  # doc_id = filename stem (S1)

    out = extract_from_payloads(
        ds, ExtractConfig(split_threshold_pages=4, split_batch_pages=4,
                          parse_concurrency=(1, 2))
    )
    sink = tmp_path / "json_out"
    n = write_json_per_doc(out, str(sink))
    assert n == 2
    data = json.load(open(sink / "alpha.json"))
    assert data["doc_id"] == "alpha"
    assert [b["text"] for b in data["text_blocks"]][0] == "a b c d"
    # overwrite-idempotent (K1, reference run.py:88)
    assert write_json_per_doc(out, str(sink)) == 2


def test_vertical_flip(ray_session):
    from ray_extract.derive import derive_payload
    from ray_extract.functions.geometry import vertically_flip_text_blocks
    from ray_extract.pipelines.extract import ExtractConfig, extract_from_payloads
    import ray.data as rd

    pl = derive_payload("d", " ".join(f"w{i}" for i in range(40)))
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(["d"]), "payload": pa.array([pl], type=pa.large_binary())})
    )
    out = extract_from_payloads(ds, ExtractConfig(parse_concurrency=(1, 2)))
    tbl = pa.concat_tables(
        [b for b in out.map_batches(vertically_flip_text_blocks,
                                    batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")]
    )
    row = tbl.to_pylist()[0]
    page_h = row["page_metadata"][0]["height"]  # 792.0
    b0 = row["text_blocks"][0]
    # original polygon TL y = 0.5in*72 = 36 -> flipped = 792-36 = 756
    assert b0["coords"][0]["y"] == page_h - 36.0
    assert b0["coords"][0]["x"] == 72.0  # x untouched
    # tbl is already flipped once; one more flip restores the original coords
    twice = vertically_flip_text_blocks(tbl).to_pylist()[0]
    assert twice["text_blocks"][0]["coords"] == [
        {"x": 72.0, "y": 36.0}, {"x": 540.0, "y": 36.0},
        {"x": 540.0, "y": 144.0}, {"x": 72.0, "y": 144.0},
    ]


def test_entry_contract(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    res = E.entry()
    df = res.to_pandas()
    assert len(df) > 0
    assert {"doc_id", "ord", "kind", "text", "media_ref"} <= set(df.columns)
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query callable is importable and lazy-constructs a Dataset quickly
    assert len(qs) >= 20


def test_read_corpus_contract_parquet_backend(ray_session, tmp_path):
    """Pins the read_corpus contract the (untestable-here) Lance branch must
    match: column projection, filter pushdown semantics, default columns."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ray_extract.sources.corpus import have_lance, read_corpus

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(20)]),
            "payload": pa.array([b"x" * (i + 1) for i in range(20)], type=pa.large_binary()),
            "n_pages": pa.array([i % 7 for i in range(20)], type=pa.int64()),
            "extra": pa.array(range(20)),
        }
    )
    path = str(tmp_path / "corpus")
    os.makedirs(path)
    pq.write_table(t, f"{path}/part-0.parquet")

    # default projection drops unknown columns
    got = read_corpus(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "payload", "n_pages"]
    assert len(got) == 20

    # explicit projection + filter match a plain filtered read
    got = read_corpus(path, columns=["doc_id", "n_pages"],
                      filter_expr=pads.field("n_pages") > 3).to_pandas()
    want = t.to_pandas()[["doc_id", "n_pages"]].query("n_pages > 3")
    assert sorted(got.doc_id) == sorted(want.doc_id)
    assert list(got.columns) == ["doc_id", "n_pages"]

    assert not have_lance()  # sandbox invariant the branches below rely on


def test_read_corpus_lance_missing_raises_actionable(tmp_path):
    import pytest

    from ray_extract.sources.corpus import read_corpus

    with pytest.raises(RuntimeError, match="lance"):
        read_corpus(str(tmp_path / "corpus.lance"))

    # a directory with lance-style entries is detected even without suffix
    d = tmp_path / "ds"
    os.makedirs(d / "_versions")
    with pytest.raises(RuntimeError, match="not installed"):
        read_corpus(str(d))


def test_read_documents_jsonl_matches_parquet_schema(ray_session, tmp_path):
    """A JSONL corpus round-trips into the documents schema and feeds the
    text pipelines identically to the parquet source."""
    import json

    import pyarrow.parquet as pq

    from ray_extract.sources.files import read_documents_jsonl

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet")
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for row in t.slice(0, 40).to_pylist():
            f.write(json.dumps(row) + "\n")
    ds = read_documents_jsonl(str(p))
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = t.slice(0, 40).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "text", "lang", "source", "n_chars"]
    assert (df["text"] == want["text"]).all()
    assert (df["n_chars"] == want["n_chars"]).all()

    # missing optional fields default instead of failing
    p2 = tmp_path / "min.jsonl"
    with open(p2, "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "hello world"}) + "\n")
    df2 = read_documents_jsonl(str(p2)).to_pandas()
    assert df2.iloc[0]["n_chars"] == 11
    assert df2.iloc[0]["lang"] == ""


def test_read_documents_csv_matches_parquet_schema(ray_session, tmp_path):
    """A CSV corpus round-trips into the documents schema; missing optional
    columns default (same contract as the JSONL source)."""
    import csv

    import pyarrow.parquet as pq

    from ray_extract.sources.files import read_documents_csv

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet")
    p = tmp_path / "docs.csv"
    rows = t.slice(0, 40).to_pylist()
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["doc_id", "text", "lang", "source", "n_chars"])
        w.writeheader()
        for row in rows:
            w.writerow(row)
    df = read_documents_csv(str(p)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = t.slice(0, 40).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "text", "lang", "source", "n_chars"]
    assert (df["text"] == want["text"]).all()
    assert (df["n_chars"] == want["n_chars"]).all()

    p2 = tmp_path / "min.csv"
    with open(p2, "w", newline="") as f:
        f.write("doc_id,text\n1,hello world\n")
    df2 = read_documents_csv(str(p2)).to_pandas()
    assert df2.iloc[0]["n_chars"] == 11
    assert df2.iloc[0]["lang"] == ""


def test_read_documents_arrow_ipc_matches_parquet_schema(ray_session,
                                                         tmp_path):
    """An Arrow IPC (Feather v2) shard dir round-trips into the documents
    schema — both file-format and stream-format shards load."""
    import pyarrow as pa
    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    from ray_extract.sources.files import read_documents_arrow_ipc

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet")
    d = tmp_path / "shards"
    d.mkdir()
    # shard 0: file format
    with ipc.new_file(str(d / "s0.arrow"), t.slice(0, 20).schema) as w:
        w.write_table(t.slice(0, 20))
    # shard 1: stream format (the fallback path)
    with pa.OSFile(str(d / "s1.arrow"), "wb") as sink:
        with ipc.new_stream(sink, t.slice(20, 20).schema) as w:
            w.write_table(t.slice(20, 20))
    df = (
        read_documents_arrow_ipc(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = t.slice(0, 40).to_pandas().sort_values("doc_id").reset_index(
        drop=True
    )
    assert list(df.columns) == ["doc_id", "text", "lang", "source", "n_chars"]
    assert len(df) == 40
    assert (df["text"] == want["text"]).all()

    # minimal schema defaults instead of failing
    mini = pa.table({"doc_id": pa.array([1], pa.int64()),
                     "text": pa.array(["hello world"])})
    with ipc.new_file(str(tmp_path / "min.arrow"), mini.schema) as w:
        w.write_table(mini)
    df2 = read_documents_arrow_ipc(str(tmp_path / "min.arrow")).to_pandas()
    assert df2.iloc[0]["n_chars"] == 11
    assert df2.iloc[0]["lang"] == ""
