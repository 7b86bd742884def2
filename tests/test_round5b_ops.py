"""Semantic pins for the round-5 second-batch operators beyond oracle parity:
the range-join window boundary of order_burst_counts, the lower-median
(quantile_disc) convention of mad_outliers, PMI-term consistency of
collocation_pmi_terms, and mass/corner invariants of the two new graph
readouts (cluster_size_histogram, clustering_coefficient).
"""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_order_burst_window_boundary_inclusive(ray_session):
    """Brute-force per-customer count with an inclusive +/-30-day window."""
    from ray_extract.pipelines.relational import order_burst_counts

    got = (
        order_burst_counts(SF)
        .to_pandas()
        .sort_values("burst_count")
        .reset_index(drop=True)
    )
    o = duckdb.sql(
        f"SELECT o_custkey, o_orderdate FROM '{SF}/orders.parquet'"
    ).df()
    sec = o["o_orderdate"].astype("datetime64[us]").astype(np.int64) // 1_000_000
    W = 30 * 86400
    bursts = []
    for _, grp in pd.DataFrame({"ck": o["o_custkey"], "s": sec}).groupby("ck"):
        s = grp["s"].to_numpy()
        for x in s:
            bursts.append(int((np.abs(s - x) <= W).sum()) - 1)  # inclusive edge
    want = (
        pd.Series(bursts).value_counts().sort_index().rename_axis("burst_count")
        .reset_index(name="n_orders")
    )
    assert (got["burst_count"].to_numpy() == want["burst_count"].to_numpy()).all()
    assert (got["n_orders"].to_numpy() == want["n_orders"].to_numpy()).all()
    # histogram mass = order count (every order is classified exactly once)
    assert got["n_orders"].sum() == len(o)


def test_mad_outliers_lower_median_convention(ray_session):
    """med/MAD are LOWER medians (sorted[(n-1)//2]) — numpy brute force."""
    from ray_extract.pipelines.text import mad_outliers

    got = mad_outliers(SF).to_pandas().set_index("source")
    d = duckdb.sql(f"SELECT source, n_chars FROM '{SF}/documents.parquet'").df()
    for src, grp in d.groupby("source"):
        v = np.sort(grp["n_chars"].to_numpy())
        med = int(v[(len(v) - 1) // 2])
        dev = np.sort(np.abs(grp["n_chars"].to_numpy() - med))
        mad = int(dev[(len(dev) - 1) // 2])
        row = got.loc[src]
        assert row["med_chars"] == med and row["mad_chars"] == mad
        assert row["n_outliers"] == int(
            (np.abs(grp["n_chars"].to_numpy() - med) > 3 * mad).sum()
        )
        assert row["n_docs"] == len(grp)


def test_collocation_pmi_terms_consistency(ray_session):
    """Unigram counts attached to each bigram agree with a direct count,
    totals are constant columns, and the min-count filter is a >= gate."""
    from ray_extract.pipelines.text import collocation_pmi_terms

    got = collocation_pmi_terms(SF).to_pandas()
    d = duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet'").df()
    toks = [t.split(" ") for t in d["text"]]
    from collections import Counter

    uni = Counter(w for ws in toks for w in ws)
    big = Counter(
        f"{a} {b}" for ws in toks for a, b in zip(ws, ws[1:])
    )
    n_words = sum(uni.values())
    n_pairs = sum(big.values())
    assert (got["n_pairs"] == n_pairs).all() and (got["n_words"] == n_words).all()
    assert (got["n_ab"] >= 5).all()
    assert set(got["bigram"]) == {b for b, c in big.items() if c >= 5}
    for _, r in got.iterrows():
        lw, rw = r["bigram"].split(" ")
        assert r["n_ab"] == big[r["bigram"]]
        assert r["n_left"] == uni[lw] and r["n_right"] == uni[rw]


def _sym_pairs():
    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con.execute(E.oracle_sql()["dedup_simhash"]).df()


def test_cluster_size_histogram_mass_and_floor(ray_session):
    """Cluster sizes are >= 2 (every clustered doc has a partner) and the
    histogram mass equals the clustered-node count."""
    from ray_extract.pipelines.dedup import (
        cluster_size_histogram,
        duplicate_clusters,
    )

    got = cluster_size_histogram(SF)
    import pyarrow as pa

    g = got.to_pandas() if isinstance(got, pa.Table) else got.to_pandas()
    assert (g["cluster_size"] >= 2).all()
    labels = duplicate_clusters(SF)
    lab = labels.to_pandas() if isinstance(labels, pa.Table) else labels.to_pandas()
    assert (g["cluster_size"] * g["n_clusters"]).sum() == len(lab)
    assert g["n_clusters"].sum() == lab["cluster_id"].nunique()


def test_clustering_coefficient_invariants(ray_session):
    """Histogram mass = node count; sum(degree*n_nodes) = 2|E|;
    sum(n_tri*n_nodes) = 3 * global triangle count; n_tri <= C(degree,2)."""
    from ray_extract.pipelines.dedup import clustering_coefficient, triangle_count

    got = clustering_coefficient(SF).to_pandas()
    pairs = _sym_pairs()
    n_nodes = len(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    assert got["n_nodes"].sum() == n_nodes
    assert (got["degree"] * got["n_nodes"]).sum() == 2 * len(pairs)
    tri = triangle_count(SF).to_pandas()
    assert (got["n_tri"] * got["n_nodes"]).sum() == 3 * int(tri["n_triangles"].iloc[0])
    assert (got["n_tri"] <= got["degree"] * (got["degree"] - 1) // 2).all()


def test_winnowing_bounds_and_scalar_brute_force(ray_session):
    """Selected-count bounds + a scalar-spec reimplementation on real docs."""
    from ray_extract.functions.hashing import MULT_A, rolling31
    from ray_extract.pipelines.text import winnowing_fingerprints

    got = winnowing_fingerprints(SF).to_pandas().set_index("doc_id")
    assert (got.loc[got["n_grams"] > 0, "n_selected"] >= 1).all()
    assert (got.loc[got["n_grams"] == 0, "n_selected"] == 0).all()
    # at most one fingerprint per valid window start
    lim = np.maximum(got["n_grams"] - 3, 1)
    assert (got["n_selected"] <= lim.where(got["n_grams"] > 0, 0)).all()

    d = duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet' LIMIT 25").df()
    for _, row in d.iterrows():
        ws = row["text"].split(" ")
        grams = [" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)]
        pks = [rolling31(g, MULT_A) * (1 << 20) + i + 1 for i, g in enumerate(grams)]
        sel = {min(pks[i:i + 4]) for i in range(max(len(pks) - 3, 1))} if pks else set()
        assert got.loc[row["doc_id"], "n_grams"] == len(grams)
        assert got.loc[row["doc_id"], "n_selected"] == len(sel)


def test_theil_sen_brute_force(ray_session):
    """Independent per-nation brute force over the monthly revenue series."""
    from ray_extract.pipelines.relational import theil_sen_trend

    got = theil_sen_trend(SF).to_pandas().set_index("n_name")
    rev = duckdb.sql(f"""
        SELECT n.n_name,
               CAST(date_part('year', o.o_orderdate) * 12
                    + date_part('month', o.o_orderdate) - 1 AS BIGINT) AS m,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS r
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{SF}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2""").df()
    for name, grp in rev.groupby("n_name"):
        grp = grp.sort_values("m")
        m = grp["m"].to_numpy()
        r = grp["r"].to_numpy()
        slopes = []
        for i in range(len(m)):
            for j in range(i + 1, len(m)):
                num, den = int(r[j] - r[i]), int(m[j] - m[i])
                slopes.append((num / den, num, den))
        if not slopes:
            assert name not in got.index
            continue
        slopes.sort()
        _, num, den = slopes[(len(slopes) - 1) // 2]
        row = got.loc[name]
        assert row["n_months"] == len(m) and row["n_pairs"] == len(slopes)
        assert row["med_num_cents"] == num and row["med_den_months"] == den


def test_drift_psi_brute_force(ray_session):
    """Numpy reimplementation: midpoint split, cume_dist>=q edges, strict
    bin assignment, full mass conservation."""
    import math

    from ray_extract.pipelines.events import drift_psi_terms

    got = drift_psi_terms(SF).to_pandas().sort_values("bin").reset_index(drop=True)
    e = duckdb.sql(f"SELECT ts, value FROM '{SF}/events.parquet'").df()
    us = e["ts"].astype("datetime64[us]").astype(np.int64)
    v = np.floor(e["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    cut = (int(us.min()) + int(us.max())) // 2
    ref, cur = v[us < cut], v[us >= cut]
    sref = np.sort(ref)
    edges = np.array(
        [sref[math.ceil(len(sref) * (b / 10)) - 1] for b in range(1, 10)]
    )
    rb = np.searchsorted(edges, ref, side="left")
    cb = np.searchsorted(edges, cur, side="left")
    want_ref = np.bincount(rb, minlength=10)
    want_cur = np.bincount(cb, minlength=10)
    full = np.zeros((10, 2), dtype=np.int64)
    full[got["bin"].to_numpy(), 0] = got["n_ref"].to_numpy()
    full[got["bin"].to_numpy(), 1] = got["n_cur"].to_numpy()
    assert (full[:, 0] == want_ref).all() and (full[:, 1] == want_cur).all()
    assert full.sum() == len(e)


def test_rank_fusion_agrees_with_ann_and_is_well_formed(ray_session):
    """The rank_cos<=5 slice must be exactly ann_bruteforce's top-5; both
    per-scorer top-5 sets are complete; ranks are 1-based positives."""
    from ray_extract.pipelines.similarity import ann_bruteforce, rank_fusion_terms

    got = rank_fusion_terms(SF).to_pandas()
    assert (got["rank_cos"] >= 1).all() and (got["rank_q8"] >= 1).all()
    for _, grp in got.groupby("query_id"):
        assert (grp["rank_cos"] <= 5).sum() == 5
        assert (grp["rank_q8"] <= 5).sum() == 5
        assert grp["neighbor_id"].is_unique
    ann = ann_bruteforce(SF).to_pandas()
    cos_top = (
        got[got["rank_cos"] <= 5]
        .rename(columns={"rank_cos": "rank"})[["query_id", "rank", "neighbor_id"]]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ann = ann.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert cos_top[["query_id", "rank", "neighbor_id"]].equals(
        ann[["query_id", "rank", "neighbor_id"]]
    )


def test_bfs_depths_brute_force(ray_session):
    """Python BFS from each cluster canonical over the symmetric pair set."""
    from collections import defaultdict, deque

    from ray_extract.pipelines.dedup import dup_graph_bfs_depths, duplicate_clusters

    got = dup_graph_bfs_depths(SF).to_pandas().sort_values("depth")
    pairs = _sym_pairs()
    adj = defaultdict(list)
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        adj[a].append(b)
        adj[b].append(a)
    lab = duplicate_clusters(SF).to_pandas()
    seeds = sorted(set(lab["cluster_id"]))
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    want = pd.Series(list(dist.values())).value_counts().sort_index()
    assert got["depth"].tolist() == want.index.tolist()
    assert got["n_nodes"].tolist() == want.tolist()
    # depth-0 mass = number of clusters; total mass = clustered nodes
    assert got.loc[got["depth"] == 0, "n_nodes"].iloc[0] == len(seeds)
    assert got["n_nodes"].sum() == len(lab)
