"""Stage-level unit tests on single Arrow batches (no Ray needed)."""

import numpy as np
import pyarrow as pa

from ray_extract import payload as P
from ray_extract.derive import derive_payload
from ray_extract.fixtures import edge_corpus
from ray_extract.stages.convert import make_convert_stage, rows_in
from ray_extract.stages.decode import decode_stage
from ray_extract.stages.merge import merge_group
from ray_extract.stages.parse import LayoutParser
from ray_extract.stages.split import make_split_stage


def _batch(docs: dict[str, bytes]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(list(docs), type=pa.string()),
            "payload": pa.array(list(docs.values()), type=pa.large_binary()),
        }
    )


def _through_front(docs, threshold=4, batch_pages=4):
    t = decode_stage(_batch(docs))
    t = make_split_stage(threshold, batch_pages)(t)
    return LayoutParser()(t)


def test_decode_stage_md5_and_errors():
    docs = {"a": derive_payload("a", "x y z w"), "bad": b"nope"}
    out = decode_stage(_batch(docs))
    assert out.column("status").to_pylist() == ["ok", "error"]
    import hashlib

    assert out.column("md5").to_pylist()[0] == hashlib.md5(docs["a"]).hexdigest()
    assert out.column("n_pages_doc").to_pylist() == [1, 0]


def test_split_stage_shard_counts_and_ranges():
    ec = edge_corpus()
    docs = {"edge.sixty8": ec["edge.sixty8"], "small": derive_payload("small", "a b c d")}
    t = decode_stage(_batch(docs))
    shards = make_split_stage(4, 12)(t)
    s68 = shards.filter(pa.compute.equal(shards["doc_id"], "edge.sixty8"))
    assert s68.num_rows == 6
    assert s68.column("range_lo").to_pylist() == [1, 13, 25, 37, 49, 61]
    assert s68.column("range_hi").to_pylist() == [12, 24, 36, 48, 60, 68]
    assert s68.column("batch_number").to_pylist() == [0, 1, 2, 3, 4, 5]
    assert set(s68.column("n_shards").to_pylist()) == {6}
    # every shard payload is itself a valid standalone document
    for raw in s68.column("payload").to_pylist():
        assert P.is_valid(raw)
    small = shards.filter(pa.compute.equal(shards["doc_id"], "small"))
    assert small.num_rows == 1 and small.column("n_shards").to_pylist() == [1]


def test_parse_propagates_global_pages():
    ec = edge_corpus()
    parsed = _through_front({"edge.sixty8": ec["edge.sixty8"]}, threshold=4, batch_pages=12)
    assert parsed.num_rows == 6
    last = parsed.slice(5, 1)
    # shard 5 covers pages 61..68; parse emits GLOBAL page numbers
    assert last.column("page_number").to_pylist()[0] == list(range(61, 69))
    assert last.column("para_page").to_pylist()[0] == list(range(61, 69))


def test_merge_group_ordered_concat():
    ec = edge_corpus()
    parsed = _through_front({"edge.sixty8": ec["edge.sixty8"]}, threshold=4, batch_pages=12)
    # shuffle the shard order to prove merge sorts by batch_number
    perm = np.array([3, 0, 5, 1, 4, 2])
    merged = merge_group(parsed.take(pa.array(perm)))
    assert merged.num_rows == 1
    assert merged.column("para_page").to_pylist()[0] == list(range(1, 69))
    assert merged.column("n_shards").to_pylist() == [6]
    assert merged.column("range_lo").to_pylist() == [1]
    assert merged.column("range_hi").to_pylist() == [68]
    texts = merged.column("para_text").to_pylist()[0]
    assert texts[0] == "page 1 text" and texts[-1] == "page 68 text"
    # merged output equals the whole-document parse
    whole = _through_front({"edge.sixty8": ec["edge.sixty8"]}, threshold=100, batch_pages=12)
    for name in whole.column_names:
        if name in ("batch_number", "range_lo", "range_hi", "n_shards"):
            continue
        assert merged.column(name).to_pylist() == whole.column(name).to_pylist(), name


def test_convert_stage_single_shard():
    docs = {"d": derive_payload("d", " ".join(f"w{i}" for i in range(60)))}
    parsed = _through_front(docs, threshold=100)
    out = make_convert_stage(True)(parsed)
    from ray_extract import oracle as O

    exp = O.extract_document("d", docs["d"])
    row = out.to_pylist()[0]
    assert [(s["kind"], s["text"]) for s in row["spans"]] == [
        (s["kind"], s["text"]) for s in exp["spans"]
    ]


def test_rows_in_key_order():
    a = np.array([[0, 9, 3], [0, 3, 9]], dtype=np.int64)
    b = np.array([[0, 3, 9]], dtype=np.int64)
    assert rows_in(a, b).tolist() == [False, True]
    assert rows_in(a, np.zeros((0, 3), dtype=np.int64)).tolist() == [False, False]


def test_reading_order_sort():
    """Paragraphs encoded out of reading order are normalized by the parse
    stage's stable (page, y, x) sort — and the oracle mirrors it."""
    from ray_extract.fixtures import build_flat
    from ray_extract import payload as P
    from ray_extract import oracle as O

    # paragraphs are page-sorted (a format invariant, needed for page
    # slicing) but WITHIN page 1 they are encoded out of reading order
    flat = build_flat(
        pages=[(8.5, 11.0), (8.5, 11.0)],
        paras=[
            {"page": 1, "role": None, "text": "second", "offset": 10, "length": 6},
            {"page": 1, "role": "title", "text": "first", "offset": 0, "length": 5},
            {"page": 1, "role": None, "text": "third", "offset": 20, "length": 5},
            {"page": 2, "role": None, "text": "fourth", "offset": 30, "length": 6},
        ],
    )
    # distinct y positions: first at top of page 1, then second, then third
    flat["paras"]["poly"][1][1] = 0.5   # "first" top y
    flat["paras"]["poly"][0][1] = 3.0   # "second"
    flat["paras"]["poly"][2][1] = 6.0   # "third"
    flat["paras"]["poly"][3][1] = 1.0   # "fourth" (page 2)
    raw = P.encode(flat)

    out = O.extract_document("ro", raw)
    assert [b["text"][0] for b in out["text_blocks"]] == [
        "first", "second", "third", "fourth"
    ]
    # ids are assigned AFTER ordering (enumerate over reading order)
    assert [b["text_block_id"] for b in out["text_blocks"]] == ["0", "1", "2", "3"]

    # pipeline parse agrees
    parsed = _through_front({"ro": raw}, threshold=100)
    assert parsed.column("para_text").to_pylist()[0] == [
        "first", "second", "third", "fourth"
    ]


def test_role_vocabulary_passthrough():
    """Every reference role (incl. 'Document Header', 'pageNumber') survives
    conversion as the block type (reference convert.py:75)."""
    from ray_extract.fixtures import build_flat
    from ray_extract import payload as P, oracle as O
    from ray_extract.vocab import ROLES

    roles = [r for r in ROLES if r != "media"]
    flat = build_flat(
        pages=[(8.5, 11.0)],
        paras=[
            {"page": 1, "role": r, "text": f"t{i}", "offset": 3 * i, "length": 2}
            for i, r in enumerate(roles)
        ],
    )
    out = O.extract_document("roles", P.encode(flat))
    assert [b["type"] for b in out["text_blocks"]] == roles
    parsed = _through_front({"roles": P.encode(flat)}, threshold=100)
    conv = make_convert_stage(True)(parsed).to_pylist()[0]
    assert [b["type"] for b in conv["text_blocks"]] == roles


def test_pipeline_determinism_across_batch_sizes(ray_session):
    """Identical output regardless of batching / task layout (SURVEY §7:
    ordering must not depend on arrival order)."""
    import ray.data as rd
    from ray_extract.pipelines.extract import ExtractConfig, extract_from_payloads

    docs = {
        f"d{i}": derive_payload(f"d{i}", " ".join(f"w{j}" for j in range(20 + 17 * i)))
        for i in range(30)
    }
    tbl = _batch(docs)

    def run(decode_bs, parse_bs):
        cfg = ExtractConfig(
            split_threshold_pages=2, split_batch_pages=2,
            decode_batch_size=decode_bs, parse_batch_size=parse_bs,
            parse_concurrency=(1, 2),
        )
        df = extract_from_payloads(rd.from_arrow(tbl), cfg).to_pandas()
        df = df.sort_values("doc_id").reset_index(drop=True)
        return [
            (r.doc_id, tuple((s["kind"], s["text"], s["offset"]) for s in r.spans))
            for r in df.itertuples()
        ]

    assert run(4, 3) == run(30, 30) == run(1, 1)
