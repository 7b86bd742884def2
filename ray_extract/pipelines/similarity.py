"""Similarity search over the ``embeddings`` table (list<float> column).

- ``ann_bruteforce``: exact cosine top-k — the query matrix is read once
  (small side), broadcast via ray.put, and every batch computes a float64
  matmul against it; per-batch partial top-k rows are then reduced per query.
  This is the scale pattern: the corpus streams, only (n_queries x k) rows per
  batch leave the workers.
- ``ann_lsh``: random-hyperplane LSH variant — corpus and queries are bucketed
  by sign bits; only same-bucket candidates are scored. Approximate (may miss
  neighbors), so it gets a rows-only correctness check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.dataset as pads

    tbl = (
        pads.dataset(f"{sf_dir}/embeddings.parquet")
        .to_table(columns=["vec_id", "embedding"], filter=pads.field("vec_id") < n_queries)
    )
    qids = tbl.column("vec_id").to_numpy()
    q = np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    order = np.argsort(qids)
    return qids[order], q[order]


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    la = batch.column("embedding").combine_chunks()
    dim = len(la[0])
    flat = la.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return ids, flat.reshape(len(ids), dim)


def ann_bruteforce(sf_dir: str, n_queries: int = 10, k: int = 5):
    """Exact cosine top-k neighbors (self excluded), deterministic tiebreak
    (score desc, vec_id asc)."""
    import ray
    import ray.data as rd

    qids, q = _read_queries(sf_dir, n_queries)
    qref = ray.put((qids, q))

    def score_batch(batch: pa.Table) -> pa.Table:
        qids_, q_ = ray.get(qref)
        ids, e = _emb_matrix(batch)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        scores = e @ q_.T  # (B, Q)
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(ids))
        for j in range(len(qids_)):
            s = scores[:, j].copy()
            s[ids == qids_[j]] = -np.inf  # exclude self
            # in-batch truncation must use the GLOBAL tiebreak (score desc,
            # vec_id asc): a plain argpartition on score alone can drop the
            # smaller-vec_id member of an exact score tie at the k boundary,
            # which the global reduce would have ranked.
            top = np.lexsort((ids, -s))[:kk]
            out_q.append(np.full(len(top), qids_[j], dtype=np.int64))
            out_v.append(ids[top].astype(np.int64))
            out_s.append(s[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    def final_topk(g):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        import pandas as pd

        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["vec_id"].astype("int64"),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partial = ds.map_batches(score_batch, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def embedding_dedup(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-duplicate pairs: all (a < b) with cosine >=
    threshold. The full signature matrix (n_docs x dim floats) is broadcast
    once via ray.put; each batch computes a vectorized matmul against it —
    at larger scale the matrix shards by vec_id range and batches sweep the
    shards (same pattern, one more loop)."""
    import ray
    import ray.data as rd

    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    E = np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    ref = ray.put((ids, E))

    def pair_batch(batch: pa.Table) -> pa.Table:
        all_ids, allE = ray.get(ref)
        bids, e = _emb_matrix(batch)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        scores = e @ allE.T
        keep = (scores >= threshold) & (bids[:, None] < all_ids[None, :])
        ai, bi = np.nonzero(keep)
        return pa.table(
            {
                "vec_a": pa.array(bids[ai].astype(np.int64)),
                "vec_b": pa.array(all_ids[bi].astype(np.int64)),
                "cos_sim": pa.array(np.round(scores[ai, bi], 6)),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(pair_batch, batch_format="pyarrow")


def ann_ivf(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 3,
    kmeans_iters: int = 5,
):
    """IVF-style ANN: coarse-quantize the corpus into centroid buckets, probe
    only the query's ``n_probe`` nearest buckets.

    The centroid codebook is "trained" deterministically (k-means seeded from
    the first ``n_centroids`` vectors, fixed iteration count) on the small
    query-side read, broadcast once, and each corpus batch assigns its rows
    vectorized. At scale the train step runs on a sample and the inverted
    lists become the partitioning key for the corpus layout. Approximate by
    design -> rows-only correctness check."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"]
    )
    ids_all = tbl.column("vec_id").to_numpy()
    E = np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)

    # deterministic k-means (cosine/Euclidean on normalized vectors)
    order = np.argsort(ids_all)
    cent = En[order[:n_centroids]].copy()
    for _ in range(kmeans_iters):
        assign = np.argmax(En @ cent.T, axis=1)
        for c in range(n_centroids):
            members = En[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) or 1.0)

    qmask = ids_all < n_queries
    qids, q = ids_all[qmask], En[qmask]
    qorder = np.argsort(qids)
    qids, q = qids[qorder], q[qorder]
    # buckets each query probes
    qprobe = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, q, cent, qprobe))

    def score_batch(batch: pa.Table) -> pa.Table:
        qids_, q_, cent_, qprobe_ = ray.get(ref)
        ids, e = _emb_matrix(batch)
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        assign = np.argmax(en @ cent_.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for j in range(len(qids_)):
            cand = np.nonzero(np.isin(assign, qprobe_[j]) & (ids != qids_[j]))[0]
            if len(cand) == 0:
                continue
            s = en[cand] @ q_[j]
            kk = min(k, len(cand))
            top = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            out_q.append(np.full(len(top), qids_[j], dtype=np.int64))
            out_v.append(ids[cand[top]].astype(np.int64))
            out_s.append(s[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    def final_topk(g):
        import pandas as pd

        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64").to_numpy(),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["vec_id"].astype("int64").to_numpy(),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partial = ds.map_batches(score_batch, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def ann_lsh(sf_dir: str, n_queries: int = 10, k: int = 5, n_planes: int = 8, seed: int = 7):
    """LSH-bucketed approximate top-k: score only candidates whose sign-bucket
    matches the query's. Rows-only correctness (approximate by design)."""
    import ray
    import ray.data as rd

    qids, q = _read_queries(sf_dir, n_queries)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((q.shape[1], n_planes))
    qbuckets = (q @ planes > 0) @ (1 << np.arange(n_planes))
    qref = ray.put((qids, q, planes, qbuckets))

    def score_batch(batch: pa.Table) -> pa.Table:
        qids_, q_, planes_, qb_ = ray.get(qref)
        ids, e = _emb_matrix(batch)
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        buckets = (en @ planes_ > 0) @ (1 << np.arange(planes_.shape[1]))
        out_q, out_v, out_s = [], [], []
        for j in range(len(qids_)):
            cand = np.nonzero((buckets == qb_[j]) & (ids != qids_[j]))[0]
            if len(cand) == 0:
                continue
            s = en[cand] @ q_[j]
            kk = min(k, len(cand))
            top = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            out_q.append(np.full(len(top), qids_[j], dtype=np.int64))
            out_v.append(ids[cand[top]].astype(np.int64))
            out_s.append(s[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    def final_topk(g):
        import pandas as pd

        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64").to_numpy(),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["vec_id"].astype("int64").to_numpy(),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partial = ds.map_batches(score_batch, batch_format="pyarrow")
    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")
