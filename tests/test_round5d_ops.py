"""Semantic pins for the round-5 fourth-batch operators beyond oracle
parity: two_hop_reach vs an in-test set-based BFS, user_day_impurity_terms
vs a pandas brute force, bm25_terms vs per-doc Python re counts,
misra_gries_heavy_hitters' eviction path on a skewed synthetic corpus, and
pq_code_histogram vs a dense numpy assign.
"""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_two_hop_reach_brute_force(ray_session):
    """Histogram equals the set-based |N1(v) u N2(v)| per node."""
    from ray_extract.pipelines.dedup import simhash_pairs, two_hop_reach

    pairs = simhash_pairs(SF).to_pandas()
    adj: dict[int, set[int]] = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    want: dict[int, int] = {}
    for v, nb in adj.items():
        reach = set(nb)
        for m in nb:
            reach |= adj[m]
        reach.discard(v)
        want[len(reach)] = want.get(len(reach), 0) + 1

    got = two_hop_reach(SF).to_pandas()
    assert dict(zip(got["reach"], got["n_nodes"])) == want


def test_two_hop_reach_path_graph(ray_session, tmp_path):
    """On a 4-chain (0-1-2-3) reaches are 2,3,3,2 — dist-2 counted once."""
    from ray_extract.pipelines import dedup as dd

    pairs = pa.table(
        {
            "doc_a": pa.array([0, 1, 2], pa.int64()),
            "doc_b": pa.array([1, 2, 3], pa.int64()),
        }
    )
    import ray.data as rd

    orig = dd.simhash_pairs_cached
    dd.simhash_pairs_cached = lambda sf_dir, **kw: rd.from_arrow(pairs)
    try:
        got = dd.two_hop_reach("unused").to_pandas()
    finally:
        dd.simhash_pairs_cached = orig
    assert dict(zip(got["reach"], got["n_nodes"])) == {2: 2, 3: 2}


def test_user_day_impurity_brute_force(ray_session):
    from ray_extract.pipelines.events import user_day_impurity_terms

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).to_pandas()
    ev["day"] = ev["ts"].to_numpy().astype("datetime64[D]")
    c = ev.groupby(["user_id", "day", "event_type"]).size().reset_index(
        name="c"
    )
    c["csq"] = c["c"] * c["c"]
    g = c.groupby(["user_id", "day"]).agg(
        n=("c", "sum"), ssq=("csq", "sum")
    )
    want = g.groupby("n").agg(
        n_user_days=("n", "size"), sum_ssq=("ssq", "sum")
    )

    got = user_day_impurity_terms(SF).to_pandas().set_index("n_events")
    assert got["n_user_days"].to_dict() == want["n_user_days"].to_dict()
    assert got["sum_ssq"].to_dict() == want["sum_ssq"].to_dict()
    # impurity 1 - ssq/n^2 must be a valid Gini value for every band
    assert (got["sum_ssq"] <= got.index.to_numpy() ** 2
            * got["n_user_days"]).all()


def test_bm25_terms_brute_force(ray_session):
    from ray_extract.pipelines.text import bm25_terms

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    got = bm25_terms(SF).to_pandas()
    for term in ("merge", "scan", "spark", "window"):
        tf = docs["text"].map(
            lambda t, rx=re.compile(rf"\b{term}\b"): len(rx.findall(t))
        ).to_numpy()
        dl = docs["text"].map(lambda t: len(t.split(" "))).to_numpy()
        nz = np.nonzero(tf > 0)[0]
        order = nz[np.lexsort((docs["doc_id"].to_numpy()[nz], -tf[nz]))][:50]
        want = [
            (int(docs["doc_id"].iloc[i]), int(tf[i]), int(dl[i]), len(nz))
            for i in order
        ]
        g = got[got["term"] == term]
        have = list(zip(g["doc_id"], g["tf"], g["dl"], g["df"]))
        assert sorted(have) == sorted(want), term


def test_misra_gries_eviction_path(ray_session, tmp_path):
    """Vocabulary >> k forces per-block counter eviction; the verify pass
    still recovers the exact heavy hitters (superset guarantee)."""
    from ray_extract.pipelines.text import misra_gries_heavy_hitters

    rng = np.random.default_rng(7)
    texts = []
    for i in range(400):
        words = ["hot"] * 5 + [f"rare{rng.integers(0, 800)}" for _ in range(15)]
        if i % 2 == 0:
            words += ["warm"] * 3
        texts.append(" ".join(words))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(400, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = misra_gries_heavy_hitters(str(tmp_path), k=39).to_pandas()
    all_words = pd.Series(" ".join(texts).split(" ")).value_counts()
    total = int(all_words.sum())
    want = {w: int(n) for w, n in all_words.items() if n * 40 > total}
    assert dict(zip(got["word"], got["n_occurrences"])) == want
    assert "hot" in want and "warm" in want  # the test corpus has hitters
    # output ordering contract: n DESC, then word
    key = list(zip(-got["n_occurrences"], got["word"]))
    assert key == sorted(key)


def test_pq_code_histogram_brute_force(ray_session):
    from ray_extract.pipelines.similarity import pq_code_histogram

    emb = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = emb.column("vec_id").to_numpy()
    e = np.stack(emb.column("embedding").to_pylist()).astype(np.float64)
    q = np.floor(e * 1000.0 + 0.5).astype(np.int64)
    cb = q[np.argsort(ids)[np.searchsorted(np.sort(ids), np.arange(8))]]
    want: dict[tuple[int, int], int] = {}
    w = q.shape[1] // 4
    for s in range(4):
        d = (
            (q[:, None, s * w:(s + 1) * w] - cb[None, :, s * w:(s + 1) * w])
            ** 2
        ).sum(axis=2)
        for code in np.argmin(d, axis=1):
            want[(s, int(code))] = want.get((s, int(code)), 0) + 1

    got = pq_code_histogram(SF).to_pandas()
    have = {
        (int(r.subspace), int(r.code)): int(r.n_vecs)
        for r in got.itertuples()
    }
    assert have == want
