"""Semantic pins for the round-5 sixth-batch operators beyond oracle
parity: modularity_terms invariants, lpa_community_histogram's 2-round
schedule on a hand-computed barbell (where LPA splits what CC joins),
spearman_rank_terms vs pandas average ranks, and
embedding_pca_power_terms vs a NumPy power iteration.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_modularity_terms_invariants(ray_session):
    from ray_extract.pipelines.dedup import (
        modularity_terms,
        simhash_pairs,
    )

    got = modularity_terms(SF).to_pandas()
    m = len(simhash_pairs(SF).to_pandas())
    assert (got["m_edges"] == m).all()
    # CC partition: every edge internal, degree sum = 2x internal edges
    assert int(got["n_intra_edges"].sum()) == m
    assert (got["sum_deg"] == 2 * got["n_intra_edges"]).all()
    # Q in [-0.5, 1) once assembled
    q = (got["n_intra_edges"] / m - (got["sum_deg"] / (2 * m)) ** 2).sum()
    assert -0.5 <= q < 1.0


def test_lpa_barbell_splits_bridge(ray_session):
    """Two triangles bridged by one edge: CC sees one component of 6, the
    2-round LPA vote splits it (hand-computed: labels [0,0,0,3,2,2])."""
    import ray.data as rd

    from ray_extract.pipelines import dedup as dd

    pairs = pa.table(
        {
            "doc_a": pa.array([0, 0, 1, 3, 3, 4, 2], pa.int64()),
            "doc_b": pa.array([1, 2, 2, 4, 5, 5, 3], pa.int64()),
        }
    )
    orig = dd.simhash_pairs_cached
    dd.simhash_pairs_cached = lambda sf_dir, **kw: rd.from_arrow(pairs)
    try:
        got = dd.lpa_community_histogram("unused").to_pandas()
    finally:
        dd.simhash_pairs_cached = orig
    assert dict(zip(got["size"], got["n_communities"])) == {1: 1, 2: 1, 3: 1}


def test_lpa_brute_force(ray_session):
    from ray_extract.pipelines.dedup import (
        lpa_community_histogram,
        simhash_pairs,
    )

    pairs = simhash_pairs(SF).to_pandas()
    adj: dict[int, list[int]] = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    lab = {v: v for v in adj}
    for _ in range(2):
        new = {}
        for v, nbrs in adj.items():
            votes: dict[int, int] = {}
            for u in nbrs:
                votes[lab[u]] = votes.get(lab[u], 0) + 1
            new[v] = min(
                k for k, c in votes.items()
                if c == max(votes.values())
            )
        lab = new
    sizes = pd.Series(list(lab.values())).value_counts()
    want = sizes.value_counts().sort_index()

    got = lpa_community_histogram(SF).to_pandas()
    assert dict(zip(got["size"], got["n_communities"])) == want.to_dict()


def test_spearman_terms_brute_force(ray_session):
    from ray_extract.pipelines.relational import spearman_rank_terms

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    ).to_pandas()
    x = np.floor(li["l_quantity"].to_numpy() * 100 + 0.5).astype(np.int64)
    y = np.floor(
        li["l_extendedprice"].to_numpy() * 100 + 0.5
    ).astype(np.int64)
    rx = (2 * pd.Series(x).rank(method="average")).astype(np.int64)
    ry = (2 * pd.Series(y).rank(method="average")).astype(np.int64)

    got = spearman_rank_terms(SF).to_pandas().iloc[0]
    n = len(x)
    assert int(got["n"]) == n
    assert int(got["sum_rx"]) == int(rx.sum()) == n * (n + 1)
    assert int(got["sum_ry"]) == int(ry.sum())
    assert int(got["sum_rxy"]) == int((rx.to_numpy() * ry.to_numpy()).sum())
    assert int(got["sum_rxx"]) == int((rx.to_numpy() ** 2).sum())
    assert int(got["sum_ryy"]) == int((ry.to_numpy() ** 2).sum())
    # assembled rho is a valid correlation (the synthetic corpus draws
    # price independently of quantity, so it sits near 0)
    num = int(n * got["sum_rxy"]) - int(got["sum_rx"]) * int(got["sum_ry"])
    den = np.sqrt(
        float(int(n * got["sum_rxx"]) - int(got["sum_rx"]) ** 2)
        * float(int(n * got["sum_ryy"]) - int(got["sum_ry"]) ** 2)
    )
    assert -1.0 <= num / den <= 1.0


def test_pca_power_brute_force(ray_session):
    from ray_extract.pipelines.similarity import embedding_pca_power_terms

    emb = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["embedding"]
    )
    e = np.stack(emb.column("embedding").to_pylist()).astype(np.float64)
    q = np.floor(e * 1000.0 + 0.5).astype(object)  # Python-int matmuls
    v = np.ones(q.shape[1], dtype=object)
    for _ in range(2):
        w = q @ v
        s = q.T @ w
        v = np.array(
            [(1 if t >= 0 else -1) * (abs(int(t)) // (1 << 20)) for t in s],
            dtype=object,
        )

    got = embedding_pca_power_terms(SF).to_pandas()
    assert [int(t) for t in v] == got.sort_values("dim")["v"].tolist()
